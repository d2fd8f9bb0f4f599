"""Vector similarity-search query library (SURVEY.md §2.10).

Brute-force cosine top-k is the exact baseline (full DuckDB oracle via
zipped UNNEST — both engines fold the arrays in element order with
float64 accumulation, so scores are bit-identical). The IVF and
hyperplane-LSH variants are the approximate scale path: rows-only
driver checks, recall-vs-brute-force asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    cosine,
    ivf_topk,
    neardup_pairs_blocked,
    norm_sq,
)
from ..tables import load_table
from . import register
from .helpers import dec_avg_sql

# cosine in SQL — EXACTLY the formula operators.similarity.cosine uses:
# dot / sqrt(|a|^2 * |b|^2)
_DOT = (
    "(SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
    " FROM (SELECT unnest({a}) x, unnest({b}) y))"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / sqrt(({na}) * ({nb}))"


@register(
    "emb_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding qe FROM embeddings
               WHERE vec_id % 100 = 0),
         scored AS (
        SELECT q.q_id, c.vec_id AS c_id,
               {_cos_sql('q.qe', 'c.embedding')} AS cos_sim
        FROM embeddings c, q
    )
    SELECT q_id, c_id, cos_sim, rank FROM (
        SELECT q_id, c_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cos_sim DESC, c_id) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def emb_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the vec_id%100==0 query set — the
    correctness baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    return brute_force_topk(queries, corpus, k=10)


@register(
    "emb_neardup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} > 0.35
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs blocked on label (the
    coarse-bucket equi-join shape used at 100 TB; the label plays the
    role of an IVF cell / LSH bucket)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_blocked(
        emb, block_col="label", id_col="vec_id", vec="embedding", threshold=0.35
    )


@register(
    "emb_norm_stats",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           {dec_avg_sql(
               "sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
               " FROM (SELECT unnest(embedding) x)))"
           )} AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile (embedding QA before indexing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(norm_sq(F.col("embedding")))
    from .helpers import dec_avg

    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        dec_avg(norm).alias("avg_norm"),
    )


@register("emb_ivf_topk")  # rows-only: approximate by construction
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-label centroids as the coarse quantizer,
    n_probe=2 — each query scans ~2/10 of the corpus. Recall vs
    emb_knn_bruteforce asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return ivf_topk(queries, emb.select(F.col("vec_id").alias("c_id"), "embedding", "label"),
                    n_probe=2, k=10)


@register("emb_lsh_neardup_pairs")  # rows-only: hash-bucket blocking
def emb_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ANN dedup with multi-table hyperplane LSH blocking
    (8 tables × 4 planes) and exact cosine verification — the fully
    self-contained 100 TB shape, no pre-existing cluster structure
    required. Recall vs the label-blocked exhaustive pairs is asserted
    in tests."""
    from ..operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(emb, threshold=0.35, n_tables=8, n_planes=4)


@register("emb_knn_vectorized")  # rows-only: BLAS float low bits differ
def emb_knn_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput variant of emb_knn_bruteforce: numpy matmul per Arrow
    batch (operators/similarity.brute_force_topk_vectorized). Same
    neighbor sets as the exact query (asserted in tests)."""
    from ..operators.similarity import brute_force_topk_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    return brute_force_topk_vectorized(queries, corpus, k=10)
