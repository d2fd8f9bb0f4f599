"""Mergeable HyperLogLog distinct-count sketches (Apache DataSketches
via Spark's native ``hll_sketch_agg`` family — JVM-side, no UDF).

``COUNT(DISTINCT)`` at 100 TB has the same failure mode as the naive
heavy-hitter aggregate (operators/frequent.py): one hash-set entry per
distinct value. The sketch answer is mergeable summaries (Agarwal et
al., PODS'12): each partition/day/shard folds its values into a fixed
``2^lg_k``-register HLL sketch, and sketches UNION losslessly — the
union of two sketches equals the sketch of the concatenated input, by
construction (register-wise max), independent of order and grouping.

That union property is what makes PERSISTED rollups work: materialize
one tiny sketch per (group, day) once, and any later "distinct users
over an arbitrary day range / group subset" is a union of pre-built
sketches — no rescan of the raw events, ever. The rollup table is a
few KB per group-day regardless of how many events fed it.

Accuracy contract: a DataSketches HLL stays in its exact (coupon
list/set) mode until the distinct count approaches ~3/4 of ``2^lg_k``
and is EXACT there; beyond, the dense estimator's relative standard
error is ~1.04/sqrt(2^lg_k) (~0.8% at lg_k=14). The registered query
keeps its DuckDB ``COUNT(DISTINCT)`` oracle because the test corpus
sits squarely in the exact regime (1,500 distinct users at sf0.1 vs a
~12k promotion point); the beyond-exact-regime error bound is pinned
separately in tests with a 100k-distinct synthetic input.

Reference scope: the reference engine has no approximate tier at all
(SURVEY §2.6 — its one distinct count is a pandas nunique); this is
the 100 TB profiling capability BASELINE.json's north star names.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default register count exponent: 2^14 registers = 16 KiB dense,
#: exact to ~12k distinct, ±0.8% beyond — the profiling sweet spot
DEFAULT_LG_K = 14


def build_distinct_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch (binary column) per group — the build side of a
    persisted rollup. Map-side partial aggregation applies: each task
    folds its rows into a local sketch and only sketches shuffle."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def merge_distinct_estimate(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Union pre-built sketches (optionally re-grouped coarser than
    they were built) and estimate. ``allowDifferentLgConfigK=False``:
    mixing register sizes silently degrades every union to the
    coarser sketch — refuse instead; rebuild with one lg_k."""
    merged = F.hll_union_agg(sketch_col, F.lit(False))
    agg = F.hll_sketch_estimate(merged).alias(estimate_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches: the SET-OPERATION tier HLL lacks.
# HLL union is lossless but HLL cannot intersect; a KMV sketch (the k
# smallest distinct 60-bit md5 hashes of the values) supports union,
# intersection, and Jaccard estimates (Beyer et al., SIGMOD'07), and —
# like the quantile sketch's exact regime — IS the exact value set
# whenever a group holds fewer than k distinct values, which is what
# lets a registered query keep a plain COUNT(DISTINCT)/INTERSECT
# oracle at test scales. All arithmetic below is JVM-side Catalyst
# array expressions; the only Python is the bounded-state build.
# ---------------------------------------------------------------------------

#: default KMV size: exact under 512 distinct, ~4.4% RSE beyond
DEFAULT_KMV_K = 512

#: the md5-hash value space, 2^60
_KMV_SPACE = float(1 << 60)


def _hash60(col: str) -> Column:
    """60-bit md5 hash in [0, 2^60) — bit-identical to DuckDB's
    ``CAST(concat('0x', substr(md5(CAST(c AS VARCHAR)), 1, 15)) AS
    BIGINT)``. Delegates to the ONE definition of the construction
    (text_dedup.md5_token_hash, the same family plans/helpers.md5_long
    wraps) so the subtle binary-cast/15-digit recipe cannot drift."""
    from .text_dedup import md5_token_hash

    return md5_token_hash(F.col(col).cast("string"))


def _kmv_partition_topk(group_cols: list[str], k: int):
    """Arrow kernel: prune one partition's (group, hash) stream to the
    k smallest hashes per group — state ≤ k int64 per group per task
    (the bounded-memory half; the array-expression merge is the
    other)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        state: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                arr = grp["__h"].to_numpy(np.int64)
                cur = state.get(key)
                if cur is not None:
                    arr = np.concatenate([cur, arr])
                if len(arr) > k:
                    arr = np.partition(arr, k - 1)[:k]
                state[key] = arr
        if state:
            yield pd.DataFrame(
                [(*key, hs.tolist()) for key, hs in state.items()],
                columns=[*group_cols, "__hs"],
            )

    return fn


def build_kmv_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: int = DEFAULT_KMV_K,
    sketch_col: str = "kmv",
) -> DataFrame:
    """One KMV sketch (sorted ``array<long>`` of the k smallest
    distinct hashes) per group. NULL values are excluded by contract
    (COUNT(DISTINCT) semantics). Build shape: hash + distinct (one
    shuffle, co-locating (group, hash)), a bounded-state partition
    prune, then an array merge over ≤ partitions x k survivors per
    group — no per-group window, no unbounded collect."""
    group_cols = list(group_cols)
    import pyspark.sql.types as T

    uh = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, _hash60(value_col).alias("__h"))
        .distinct()
    )
    schema = T.StructType(
        [*[uh.schema[c] for c in group_cols],
         T.StructField("__hs", T.ArrayType(T.LongType()))]
    )
    pruned = uh.mapInPandas(_kmv_partition_topk(group_cols, k), schema)
    return pruned.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__hs"))), 1, k
        ).alias(sketch_col)
    )


def kmv_distinct_estimate(sketch: Column, k: int = DEFAULT_KMV_K) -> Column:
    """Distinct-count estimate from a KMV sketch: EXACT (the sketch
    size) while the group held fewer than k distinct values, else the
    classic (k-1) / normalized-kth-minimum estimator."""
    kth = F.element_at(sketch, k)
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / (kth + F.lit(1)).cast("double")
    )


def kmv_union_sketch(a: Column, b: Column, k: int = DEFAULT_KMV_K) -> Column:
    """KMV of the union: the k smallest of the combined sketches —
    closed under the same size bound, so unions chain."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_overlap(
    a: Column, b: Column, k: int = DEFAULT_KMV_K
) -> dict[str, Column]:
    """Set-operation estimates for two KMV sketches: ``n_a``, ``n_b``,
    ``n_union``, ``n_intersect``, ``jaccard`` (Beyer et al. 2007: the
    union sketch K is a uniform sample of A ∪ B; every member of K is
    ≤ both sketches' k-th minima, so membership of K's values in the
    A and B sketches is decisive, and ρ = |K ∩ A ∩ B| / |K| estimates
    the Jaccard similarity; intersection = ρ × |A ∪ B|). In the exact
    regime (|K| < k) every formula degenerates to exact set
    arithmetic."""
    u = kmv_union_sketch(a, b, k)
    union_est = kmv_distinct_estimate(u, k)
    n_inter_members = F.size(F.array_intersect(F.array_intersect(u, a), b))
    # |K| is the sample size (== k once saturated; slice caps it there)
    rho = F.when(F.size(u) == 0, F.lit(0.0)).otherwise(
        n_inter_members.cast("double") / F.size(u).cast("double")
    )
    return {
        "n_a": kmv_distinct_estimate(a, k),
        "n_b": kmv_distinct_estimate(b, k),
        "n_union": union_est,
        "n_intersect": rho * union_est,
        "jaccard": rho,
    }
