"""Text-analysis query library (SURVEY.md §2.10; driver north star).

Training-data-pipeline text operators over the ``documents`` table:
token statistics, quality scoring, language-ID heuristic, document
fingerprinting. Everything is built-in column expressions (regex, list
lambdas, md5) — per-row, no shuffle beyond the final aggregates, no
Python. At 100 TB these run map-only inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import WS_CLASS as _WS  # \s diverges Java/RE2
from ..functions.tokenize import TOKEN_RE, word_tokens as tokens
from ..tables import load_table
from . import register
from .helpers import dec_avg_sql, dec_sum, dec_sum_sql

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "is", "and"],
    "fr": ["le", "la", "et", "un", "des"],
    "es": ["el", "los", "y", "una", "que"],
    "de": ["der", "die", "und", "ein", "nicht"],
}
STOPWORDS = LANG_MARKERS["en"]


#: BPE-ish pre-tokenization pattern (GPT-2 style, lowercase form):
#: contraction suffixes, space-prefixed letter runs, digit runs, and
#: punctuation runs — the segmentation a byte-pair encoder starts
#: from, so its match count tracks LLM token counts far better than
#: whitespace splitting. Plain alternation only, and whitespace is an
#: EXPLICIT char class rather than \s: Java's \s includes U+000B
#: (vertical tab) while RE2's does not, so \s would silently diverge
#: between the Spark plan and the DuckDB oracle on \x0B-bearing text.
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\ra-z0-9]+"


def _hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def _hits_sql(words: list[str]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE}'), t -> t IN ({quoted})))"


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT)
               AS n_unique_tokens,
           CAST(len(string_split_regex(text, '{_WS}+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{BPE_RE.replace("'", "''")}'))
               AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, three ways: whitespace split, word-regex
    tokenizer, and a BPE-ish pre-tokenization count (GPT-2-style
    segmentation — the best cheap proxy for LLM token budgets)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.size(F.split(F.col("text"), _WS + "+")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


@register(
    "doc_quality_scores",
    oracle=f"""
    SELECT doc_id, n_tokens, stopword_ratio, mean_token_len,
           0.4 * least(1.0, n_tokens / 200.0)
             + 0.3 * (1.0 - stopword_ratio)
             + 0.3 * least(1.0, mean_token_len / 6.0) AS quality_score
    FROM (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
               CAST({_hits_sql(STOPWORDS)} AS DOUBLE)
                   / len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS stopword_ratio,
               CAST(list_sum(list_transform(regexp_extract_all(lower(text), '{TOKEN_RE}'),
                                            t -> length(t))) AS DOUBLE)
                   / len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS mean_token_len
        FROM documents
        WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) > 0
    )
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/word-shape quality scoring (the filter stage of
    an LLM-data pipeline). Identical arithmetic order on both engines
    keeps the doubles bit-equal."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = _hits(toks, STOPWORDS).cast("double") / F.size(toks)
    token_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    mean_len = token_len_sum.cast("double") / F.size(toks)
    base = docs.filter(F.size(toks) > 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
    )
    quality = (
        0.4 * F.least(F.lit(1.0), F.col("n_tokens") / 200.0)
        + 0.3 * (1.0 - F.col("stopword_ratio"))
        + 0.3 * F.least(F.lit(1.0), F.col("mean_token_len") / 6.0)
    )
    return base.withColumn("quality_score", quality)


@register(
    "doc_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE
             WHEN en >= fr AND en >= es AND en >= de AND en > 0 THEN 'en'
             WHEN fr >= es AND fr >= de AND fr > 0 THEN 'fr'
             WHEN es >= de AND es > 0 THEN 'es'
             WHEN de > 0 THEN 'de'
             ELSE 'unknown'
           END AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               {_hits_sql(LANG_MARKERS['en'])} AS en,
               {_hits_sql(LANG_MARKERS['fr'])} AS fr,
               {_hits_sql(LANG_MARKERS['es'])} AS es,
               {_hits_sql(LANG_MARKERS['de'])} AS de
        FROM documents
    )
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language identification with a deterministic
    argmax tie-break (en > fr > es > de)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        "doc_id",
        "lang",
        _hits(toks, LANG_MARKERS["en"]).alias("en"),
        _hits(toks, LANG_MARKERS["fr"]).alias("fr"),
        _hits(toks, LANG_MARKERS["es"]).alias("es"),
        _hits(toks, LANG_MARKERS["de"]).alias("de"),
    )
    en, fr, es, de = (F.col(c) for c in ("en", "fr", "es", "de"))
    predicted = (
        F.when((en >= fr) & (en >= es) & (en >= de) & (en > 0), "en")
        .when((fr >= es) & (fr >= de) & (fr > 0), "fr")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("unknown")
    )
    return scored.select("doc_id", "lang", predicted.alias("predicted_lang"))


@register(
    "docs_stats_by_lang_source",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {dec_avg_sql('n_chars')} AS avg_chars,
           {dec_sum_sql(f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))")} AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def docs_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile: per (lang, source) volume and token totals."""
    docs = load_table(spark, sf_dir, "documents")
    from .helpers import dec_avg

    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        dec_avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        dec_sum(F.size(tokens("text")).cast("double")).alias("total_tokens"),
    )


@register(
    "doc_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY term
    )
    SELECT doc_id, term, tf, df, rank FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.df ASC, tf.term
               ) AS INTEGER) AS rank
        FROM tf JOIN df ON tf.term = df.term
    ) WHERE rank <= 3
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document, TF-IDF-style: rank by
    (tf DESC, df ASC, term) — the integer-pair ordering equivalent to
    weighting rare terms higher, with no float ln() in the hashed
    output, so the DuckDB oracle matches bit-exactly (a float
    ``tf*ln((N+1)/(df+1))`` score differs across engine libm in the
    last ulp; this ordering is deterministic on both engines).

    Shape at scale: explode → two aggregations sharing the token scan;
    df is a small per-term table broadcast back; the top-k window
    partitions by doc_id (no global sort)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


@register(
    "docs_with_embeddings_profile",
    oracle=f"""
    SELECT d.lang, e.label,
           COUNT(*) AS n_docs,
           {dec_sum_sql('d.n_chars')} AS total_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def docs_with_embeddings_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text rows to their embedding rows (doc_id =
    vec_id) — the multimodal-table star-join shape."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec_sum(F.col("n_chars").cast("double")).alias("total_chars"),
        )
    )
