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
from ..operators.text_dedup import _CACHED_FRAMES
from ..tables import load_table
from . import register
from .helpers import (
    MD5_LONG_SQL,
    dec_avg_sql,
    dec_sum,
    dec_sum_sql,
    md5_long,
    scratch_dir,
)

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
    # r7: pytest-oracled — per-doc length/token counts are a strict
    # subset of doc_quality_scores' profile; its driver slot rotated
    # to inverted_index_probe (the persisted BM25 postings index)
    driver=False,
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
    # r6: demoted to pytest-oracled — a plain two-key GROUP BY whose
    # shape several driver rows already prove (events_cube_profile,
    # corpus_mixture_weights' token rollup); its slot went to
    # docs_hybrid_rrf_search (sparse+dense RRF retrieval, a whole
    # capability). The local oracle replica still hash-checks it.
    driver=False,
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
    "doc_unigram_surprisal",
    driver=False,  # surface capped at 50; pytest-oracled
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    counts AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY term
    ),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts),
    rarity AS (
        SELECT term, CAST(length(bin(t // c)) - 1 AS BIGINT) AS bits
        FROM counts, total
    )
    SELECT toks.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS avg_bits
    FROM toks JOIN rarity ON toks.term = rarity.term
    GROUP BY toks.doc_id
    """,
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprisal under the corpus's own unigram LM — the
    classic perplexity-style quality filter (CCNet/Gopher shape: score
    each doc by how "expected" its tokens are; outliers both ways are
    boilerplate or garbage), with the model trained and applied in the
    same two-pass plan.

    Each token's surprisal −log2 p(w) = log2(T / c_w) is QUANTIZED to
    its integer floor, computed exactly as ``length(bin(T div c_w))−1``
    (for positive ints, floor(log2(T/c)) == floor(log2(T div c)) —
    T/c ≥ 2^k iff T ≥ c·2^k iff T div c ≥ 2^k since c·2^k is an
    integer). No float log appears anywhere, so Spark and the DuckDB
    oracle hash-match bit-exactly (same reason doc_tfidf_top_terms
    ranks on integer pairs); the only float is one exact-int division
    per output row, correctly rounded identically on both engines.

    Scale shape: two map-only passes over the corpus tokens (model
    counts, then scoring — Spark physically re-scans rather than
    materializing the explode); the rarity table is vocab-sized
    (heavy-tail bounded, ≪ corpus) and broadcast back onto the token
    stream; the per-doc aggregate map-side combines. No driver-side
    model state — the "LM" is a DataFrame end to end."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    rarity = counts.crossJoin(F.broadcast(total)).select(
        "term",
        (F.length(F.bin(F.expr("t div c"))) - 1).cast("bigint").alias("bits"),
    )
    return (
        toks.join(F.broadcast(rarity), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").alias("total_bits"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("avg_bits"),
        )
    )


@register(
    "docs_with_embeddings_profile",
    # r5: demoted to pytest-oracled — the cross-modal join shape is a
    # two-line groupBy; its driver slot went to events_heavy_hitters
    # (the bounded-state sketch tier); local oracle still checks it
    driver=False,
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


# ---------------------------------------------------------------------------
# Document fingerprinting: winnowing (Schleimer/Wilkerson/Aiken,
# SIGMOD'03 — the MOSS algorithm). Character k-grams are hashed, and
# each sliding window of _FP_W consecutive k-gram hashes contributes
# its minimum — dense enough that any shared substring of length
# k + _FP_W - 1 is guaranteed to produce a shared fingerprint, sparse
# enough that only ~2/(w+1) of positions survive. The production hash
# is a Rabin-Karp-style polynomial over codepoints mod 2^61-1
# (vectorizes to K numpy sweeps per batch AND replays exactly in the
# DuckDB oracle's HUGEINT arithmetic); an md5 tier (the
# engine-reproducible 60-bit family SimHash/KMV use) remains as the
# cross-engine md5 anchor. The selection guarantees are hash-agnostic.
# ---------------------------------------------------------------------------

#: k-gram length: 16 chars. Short grams (8) collide on common phrase
#: fragments ("of the th…") and give unrelated same-lang pairs a
#: nonzero shared-fingerprint floor (measured p50=4 at k=8 vs p50=1 at
#: k=16 on the sf0.01 corpus); 16 keeps only genuinely copied text.
_FP_K = 16
#: winnowing window: guarantee window (w=4) — every run of 4
#: consecutive k-grams yields at least one fingerprint.
_FP_W = 4
#: fingerprints appearing in more than this many documents are
#: boilerplate (the MOSS "ignore over-common" rule) and are dropped
#: before the pair join — also the skew guard bounding any single
#: join bucket, exactly like minhash max_bucket_size.
_FP_CAP = 50
#: minimum shared fingerprints for a reported overlap pair: at k=16 /
#: w=4 the sf0.01 corpus shows unrelated pairs share ≤ ~5 and planted
#: near-dups share ≥ ~20, so 10 cleanly separates the modes.
_FP_MIN_SHARED = 10

_FP_NORM_SQL = f"trim(regexp_replace(lower(text), '{_WS}+', ' ', 'g'))"

#: production k-gram hash: polynomial rolling hash over codepoints,
#: mod the Mersenne prime 2^61-1. Chosen over md5 for the hot path
#: because it vectorizes — one numpy multiply-add sweep per k-gram
#: OFFSET (16 sweeps per batch) instead of one interpreted md5 call
#: per CHARACTER POSITION — while staying exactly replayable in SQL:
#: DuckDB evaluates Sum(code_j * B^(K-1-j)) in HUGEINT and reduces
#: % P, landing on the identical 61-bit integer.
_POLY_P = (1 << 61) - 1
_POLY_B = 1_000_003
_POLY_POW = tuple(pow(_POLY_B, _FP_K - 1 - j, _POLY_P) for j in range(_FP_K))

_POLY_H_SQL = (
    "("
    + " + ".join(
        f"CAST(unicode(substr(t, CAST(pos + {j} AS INTEGER), 1)) AS HUGEINT)"
        f" * {c}"
        for j, c in enumerate(_POLY_POW)
    )
    + f") % {_POLY_P}"
)

_FP_SEL_SQL = f"""
    norm AS (
        SELECT doc_id, {_FP_NORM_SQL} AS t FROM documents
    ),
    pos AS (
        SELECT doc_id, t, UNNEST(range(1, length(t) - {_FP_K - 2})) AS pos
        FROM norm WHERE length(t) >= {_FP_K}
    ),
    grams AS (
        SELECT doc_id, pos,
               CAST({_POLY_H_SQL} AS BIGINT) AS h
        FROM pos
    ),
    sel AS (
        SELECT DISTINCT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN {_FP_W - 1} PRECEDING AND CURRENT ROW)
                   AS fp
        FROM grams
    )
"""


def _poly_rolling_hashes(codes, np):
    """Vectorized k-gram hashes over a codepoint array: K multiply-add
    sweeps in exact mod-(2^61-1) arithmetic (the 30/31-bit split keeps
    every intermediate under 2^63 — no uint64 overflow, no Python loop
    over positions). Returns int64 in [0, 2^61-1) for every position,
    bit-equal to the oracle's HUGEINT evaluation of the polynomial.

    The caller passes the WHOLE Arrow batch's documents concatenated:
    each position's hash depends only on its own K characters, so the
    per-document hash slices are read back by offset afterwards — the
    sweeps amortize over the batch instead of paying numpy dispatch
    per document (positions straddling a document boundary are
    computed and discarded by the slicing; K-1 waste rows per doc)."""
    n = len(codes) - (_FP_K - 1)
    m61 = np.uint64(_POLY_P)
    m30 = np.uint64((1 << 30) - 1)
    s31 = np.uint64(31)
    s30 = np.uint64(30)
    s61 = np.uint64(61)
    acc = np.zeros(n, dtype=np.uint64)
    t1 = np.empty(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    last = len(_POLY_POW) - 1
    for j, c in enumerate(_POLY_POW):
        seg = codes[j : j + n]  # codepoints < 2^21
        # (seg * (c>>31)) * 2^31 mod P via 2^61 === 1 (mod P),
        # all in-place on two scratch buffers (the kernel is
        # memory-bound: every avoided temporary is an avoided pass)
        np.multiply(seg, np.uint64(c >> 31), out=t1)  # < 2^51
        np.bitwise_and(t1, m30, out=tmp)
        np.left_shift(tmp, s31, out=tmp)
        np.right_shift(t1, s30, out=t1)
        np.add(t1, tmp, out=t1)  # < 2^61 + 2^21
        acc += t1
        np.multiply(seg, np.uint64(c & 0x7FFFFFFF), out=t1)  # < 2^52
        acc += t1
        if j % 2 == 1 or j == last:
            # fold every OTHER sweep: two unfolded terms keep
            # acc < 3 * 2^61 < 2^64, and halving the folds saves
            # three array passes per skipped sweep
            np.bitwise_and(acc, m61, out=tmp)
            np.right_shift(acc, s61, out=acc)
            np.add(acc, tmp, out=acc)
    np.bitwise_and(acc, m61, out=tmp)
    np.right_shift(acc, s61, out=acc)
    np.add(acc, tmp, out=acc)
    return np.where(acc >= m61, acc - m61, acc).astype(np.int64)


def _winnow_norm(docs: DataFrame) -> DataFrame:
    norm = F.trim(F.regexp_replace(F.lower("text"), _WS + "+", " "))
    return docs.select("doc_id", norm.alias("t")).filter(
        F.length("t") >= _FP_K
    )


def _winnow_fingerprints(docs: DataFrame, tier: str = "poly") -> DataFrame:
    """(doc_id, fp) distinct winnowing fingerprints — one Arrow pass,
    MAP-ONLY: the sliding window-min is per-document state, so with
    whole documents in hand no shuffle or global window is needed at
    all (the expression form below pays a doc_id shuffle for its
    window). Per batch: k-gram hashes, vectorized trailing-min over W
    shifted views, per-doc ``np.unique``.

    Two hash tiers, same selection machinery (the winnowing guarantees
    — density ~2/(w+1), every k+w-1 shared run leaves a shared
    fingerprint — are hash-agnostic):

    - ``poly`` (production, default): :func:`_poly_kgram_hashes` — no
      per-position interpreter work at all; the inner loop is K numpy
      sweeps over the whole document. This is what the driver queries
      run, and the oracle replays the identical polynomial in HUGEINT.
    - ``md5``: one interpreted ``hashlib.md5`` call per position
      (``digest()[:8] >> 4`` IS the first 15 hex digits, the same
      60-bit integer the SimHash/KMV family uses). Kept as the
      cross-engine md5 anchor, bit-parity-tested against
      :func:`_winnow_fingerprints_expr`; per-character interpreter
      cost makes it the slow tier at 100 TB.

    Partial windows at the doc head are included (the first k-gram
    always fingerprints) — a deterministic variant that only ADDS
    coverage near position 1; the oracle mirrors it because its
    trailing window min auto-clamps at the partition start."""
    if tier not in ("poly", "md5"):
        raise ValueError(f"unknown winnowing hash tier {tier!r}")
    base = _winnow_norm(docs).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )

    def fn(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["t"].tolist()
            if tier == "poly":
                # hash the whole batch in one shot: one utf-32 decode
                # + K sweeps over the concatenation, sliced back per
                # document below
                lens = np.array([len(t) for t in texts], dtype=np.int64)
                codes = np.frombuffer(
                    "".join(texts).encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                batch_hs = _poly_rolling_hashes(codes, np)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            ids, fps = [], []
            for i, (did, t) in enumerate(zip(pdf["doc_id"].to_numpy(), texts)):
                n = len(t) - (_FP_K - 1)
                if tier == "poly":
                    hs = batch_hs[starts[i] : starts[i] + n]
                else:
                    hs = np.empty(n, dtype=np.int64)
                    md5 = hashlib.md5
                    for p in range(n):
                        hs[p] = (
                            int.from_bytes(
                                md5(t[p : p + _FP_K].encode()).digest()[:8],
                                "big",
                            )
                            >> 4
                        )
                m = hs.copy()
                for j in range(1, _FP_W):
                    np.minimum(m[j:], hs[:-j], out=m[j:])
                u = np.unique(m)
                ids.append(np.full(len(u), did, dtype=np.int64))
                fps.append(u)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
                )

    return base.mapInPandas(fn, schema="doc_id long, fp long")


def _winnow_fingerprints_expr(docs: DataFrame) -> DataFrame:
    """Pure-expression md5 twin of the kernel's ``md5`` tier (explode
    k-gram positions → md5/conv hash → trailing window min →
    distinct). Kept as the in-Spark md5 parity anchor; the driver
    oracle now replays the ``poly`` tier's polynomial directly
    (``_POLY_H_SQL``), and the Arrow kernel is the production path."""
    from pyspark.sql.window import Window

    base = _winnow_norm(docs)
    grams = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t") - (_FP_K - 1))).alias(
            "pos"
        ),
        "t",
    ).select(
        "doc_id",
        "pos",
        F.conv(
            F.substring(
                F.md5(
                    F.col("t").substr(F.col("pos"), F.lit(_FP_K)).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_FP_W - 1), 0)
    )
    return grams.select("doc_id", F.min("h").over(w).alias("fp")).distinct()


@register(
    "doc_fingerprint_winnowing",
    # r11: rotated OFF the driver surface (slot for
    # docs_global_shuffle_order, VERDICT r10 #4): the winnowing
    # machinery itself — normalization, k-gram hashing, the window
    # min, the selected-fingerprint set (the `sel` CTE) — rides
    # VERBATIM inside docs_fingerprint_overlap_pairs' oracle, which
    # stays on the surface; only the per-doc profile aggregation
    # (count/xor/min over the same sel rows) moves to the local
    # pytest oracle, the docs_dsir_selection→token_budget precedent.
    driver=False,
    oracle=f"""
    WITH {_FP_SEL_SQL}
    SELECT s.doc_id, d.n_kgrams, COUNT(*) AS n_fingerprints,
           CAST(bit_xor(fp) AS BIGINT) AS fp_xor, MIN(fp) AS fp_min
    FROM sel s JOIN (SELECT doc_id, length(t) - {_FP_K - 1} AS n_kgrams
                     FROM norm WHERE length(t) >= {_FP_K}) d USING (doc_id)
    GROUP BY s.doc_id, d.n_kgrams
    """,
)
def doc_fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint profile: k-gram count, number
    of selected fingerprints (density ~2/(w+1) of positions), and an
    order-independent XOR signature of the fingerprint set — the
    compact per-doc identity used for copy detection and incremental
    re-fingerprinting.

    Shape at scale: the k-gram explode is a map-only stage (rows =
    corpus characters), the window min partitions by doc_id (one
    shuffle), and the aggregate reuses the same key — no global sort,
    no Python. bit_xor keeps the signature order-independent so the
    result is partitioning-invariant."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), _WS + "+", " "))
    lengths = docs.select(
        "doc_id", (F.length(norm) - (_FP_K - 1)).cast("long").alias("n_kgrams")
    ).filter(F.col("n_kgrams") >= 1)
    agg = (
        _winnow_fingerprints(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.expr("bit_xor(fp)").cast("long").alias("fp_xor"),
            F.min("fp").alias("fp_min"),
        )
    )
    return agg.join(lengths, "doc_id").select(
        "doc_id", "n_kgrams", "n_fingerprints", "fp_xor", "fp_min"
    )


@register(
    "docs_fingerprint_overlap_pairs",
    oracle=f"""
    WITH {_FP_SEL_SQL},
    rare AS (
        SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {_FP_CAP}
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM sel a JOIN sel b USING (fp) JOIN rare USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= {_FP_MIN_SHARED}
    """,
)
def docs_fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style copy detection: pairs of documents sharing >=
    _FP_MIN_SHARED winnowing fingerprints. A fourth near-dup tier next
    to MinHash/SimHash/embedding-LSH, with a different signal — shared
    *contiguous substrings* (any common run of k+w-1 chars must leave
    a shared fingerprint) rather than bag-of-shingles similarity, so
    it catches partial plagiarism that global Jaccard dilutes.

    Shape at scale: the pair join keys on the fingerprint value and
    carries ids only; over-common fingerprints (> _FP_CAP docs) are
    dropped first — boilerplate suppression AND the skew bound, since
    a fingerprint bucket of B docs yields B²/2 pair rows. The shared
    count aggregates on (id_a, id_b) — the same banded ids-only
    bucket-join shape as the MinHash tier."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    # cache AFTER the cap filter: the left/right self-join branches
    # then reread the capped frame instead of re-running the
    # fingerprint pipeline + fp-window once per branch
    rare = (
        _winnow_fingerprints(docs)
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("__n") <= _FP_CAP)
        .select("doc_id", "fp")
        .cache()
    )
    _CACHED_FRAMES.append(rare)  # released via text_dedup.release_cached
    left = rare.select(F.col("doc_id").alias("id_a"), "fp")
    right = rare.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        left.join(right, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _FP_MIN_SHARED)
    )


@register(
    "docs_train_val_split",
    # pytest-oracled only (driver surface is capped at 50): the split
    # operator is infrastructure for the other pipelines rather than a
    # standalone capability row
    driver=False,
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 95 THEN 'train'
                WHEN b < 99 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS b
        FROM documents
    )
    """,
)
def docs_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95/4/1 train/val/test split on a hash of the
    stable document id — the assignment every run, engine, and rerun
    reproduces (a seeded ``rand()`` split changes membership whenever
    partitioning changes; a hash split never does, which is what makes
    held-out sets trustworthy across pipeline versions). Map-only at
    any scale."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        md5_long(F.col("doc_id"))
        % 100
    )
    return docs.select(
        "doc_id",
        F.when(b < 95, "train").when(b < 99, "val").otherwise("test").alias(
            "split"
        ),
    )


# ---------------------------------------------------------------------------
# Training-sequence packing and split decontamination — the two steps
# between "clean corpus" and "tensors": concatenate documents into
# fixed-length training sequences, and prove the held-out splits share
# no copied text with train. Both are shard/fingerprint-parallel (no
# global sort, no all-pairs) and exactly SQL-replayable.
# ---------------------------------------------------------------------------

#: training sequence length (tokens) for docs_pack_sequences
_PACK_LEN = 2048
#: number of packing shards: each shard packs independently (one
#: window per shard — the parallel unit at 100 TB; a GLOBAL document
#: order would funnel the cumsum through one task)
_PACK_SHARDS = 8

_MD5_LONG_SQL = MD5_LONG_SQL  # the shared md5_long twin (helpers)


@register(
    "docs_pack_sequences",
    # pytest-oracled (driver surface capped at 50): packing is pipeline
    # infrastructure, like docs_train_val_split
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               {_MD5_LONG_SQL.format(c='doc_id')} % {_PACK_SHARDS} AS shard,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM toks WHERE n_tokens > 0
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum_before // {_PACK_LEN} AS BIGINT) AS seq_id,
           CAST(cum_before % {_PACK_LEN} AS BIGINT) AS seq_offset
    FROM packed
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style training-sequence packing: documents are concatenated
    in a deterministic order and split into fixed _PACK_LEN-token
    sequences (documents may straddle a boundary — the standard
    concat-then-chunk regime). Each document's placement is
    ``(shard, seq_id, seq_offset)``.

    Shape at scale: documents hash (md5 of the stable id — the same
    engine-reproducible family as the split assignment) into
    _PACK_SHARDS independent shards; each shard runs ONE running-sum
    window over its own documents ordered by id. Packing is
    embarrassingly parallel across shards — the global-concatenation
    order no one actually needs is the one thing this refuses to
    compute, because it would serialize the cumsum through a single
    task. Determinism: placement is a pure function of (doc ids,
    token counts), invariant across partitioning and reruns — the
    property that makes a training run resumable and auditable."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    md5l = md5_long(F.col("doc_id"))
    toks = docs.select(
        "doc_id",
        (md5l % _PACK_SHARDS).alias("shard"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        cum.alias("__cum"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"__cum div {_PACK_LEN}").alias("seq_id"),
        (F.col("__cum") % _PACK_LEN).alias("seq_offset"),
    )


@register(
    "docs_pack_nostraddle",
    # pytest-oracled (driver surface capped at 50): the second
    # standard packing regime, next to concat-then-chunk
    driver=False,
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               {_MD5_LONG_SQL.format(c='doc_id')} % {_PACK_SHARDS}
                   AS shard,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                   AS BIGINT) AS n_tokens,
               ROW_NUMBER() OVER (
                   PARTITION BY {_MD5_LONG_SQL.format(c='doc_id')}
                       % {_PACK_SHARDS}
                   ORDER BY doc_id) AS rn
        FROM documents
        WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) > 0
    ),
    pack(shard, rn, doc_id, n_tokens, seq_id, seq_offset, fill) AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN 0 ELSE p.fill END,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN t.n_tokens ELSE p.fill + t.n_tokens END
        FROM pack p JOIN toks t
             ON t.shard = p.shard AND t.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_tokens, seq_id, seq_offset FROM pack
    """,
)
def docs_pack_nostraddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-STRADDLE sequence packing (next-fit): a document never
    crosses a sequence boundary — if it doesn't fit the current
    sequence's remaining budget, a new sequence starts (an oversized
    document occupies a sequence alone). The regime used when
    cross-document attention contamination matters more than the
    padding waste concat-then-chunk avoids; ``docs_pack_sequences``
    is the straddling twin, same shard family, same order.

    Next-fit is a SEQUENTIAL fold (each placement depends on the
    running fill, which resets data-dependently — not expressible as
    a window function), so the Spark side runs it as one
    Arrow-batched ``applyInPandas`` per shard: the shard is the
    parallel unit, exactly the contract the packer family documents —
    at 100 TB the shard count scales out with the corpus and each
    shard's fold streams its own docs once. The oracle replays the
    fold as a recursive CTE (one recursion level per within-shard
    position, all shards advancing in parallel), so the
    state-machine semantics are hash-checked exactly."""
    docs = load_table(spark, sf_dir, "documents")
    import pandas as pd

    cap = _PACK_LEN
    toks = docs.select(
        "doc_id",
        (md5_long(F.col("doc_id")) % _PACK_SHARDS).alias("shard"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        # seed so the FIRST row takes the oracle's base-case branch
        # (seq 0, offset 0, fill = its tokens) through the same rule
        # the recursion applies to every later row
        seq, fill = -1, cap + 1
        seqs, offs = [], []
        for n in pdf["n_tokens"]:
            if fill + n > cap:
                seq += 1
                offs.append(0)
                fill = int(n)
            else:
                offs.append(fill)
                fill += int(n)
            seqs.append(seq)
        pdf["seq_id"] = pd.Series(seqs, dtype="int64")
        pdf["seq_offset"] = pd.Series(offs, dtype="int64")
        return pdf[["doc_id", "shard", "n_tokens", "seq_id", "seq_offset"]]

    return toks.groupBy("shard").applyInPandas(
        pack,
        schema=(
            "doc_id long, shard long, n_tokens long, "
            "seq_id long, seq_offset long"
        ),
    )


@register(
    "split_contamination_pairs",
    # pytest-oracled: decontamination audit over the winnowing
    # fingerprint machinery (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH {_FP_SEL_SQL},
    assign AS (
        SELECT doc_id,
               CASE WHEN {_MD5_LONG_SQL.format(c='doc_id')} % 100 < 95
                    THEN 'train' ELSE 'heldout' END AS split
        FROM documents
    ),
    rare AS (
        SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {_FP_CAP}
    )
    SELECT a.doc_id AS train_id, b.doc_id AS heldout_id,
           COUNT(*) AS n_shared
    FROM sel a JOIN sel b USING (fp) JOIN rare USING (fp)
         JOIN assign sa ON sa.doc_id = a.doc_id
         JOIN assign sb ON sb.doc_id = b.doc_id
    WHERE sa.split = 'train' AND sb.split = 'heldout'
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_FP_MIN_SHARED}
    """,
)
def split_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/held-out contamination audit: pairs (train doc, held-out
    doc) sharing >= _FP_MIN_SHARED winnowing fingerprints — copied
    passages crossing the split boundary, the leak that silently
    inflates eval numbers. The split is the same deterministic md5
    bucket assignment as docs_train_val_split (val+test fused into
    'heldout' — contamination severity does not depend on which
    held-out slice leaked).

    Shape at scale: identical to docs_fingerprint_overlap_pairs — the
    fingerprint equi-join carries ids only, over-common fingerprints
    are dropped first (boilerplate suppression AND the per-bucket skew
    bound) — plus a broadcast-size split assignment derived from the
    id, so the cross-split restriction is a filter, not a new join
    against data."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    md5l = md5_long(F.col("doc_id"))
    split = F.when((md5l % 100) < 95, "train").otherwise("heldout")
    assign = docs.select("doc_id", split.alias("split"))
    rare = (
        _winnow_fingerprints(docs)
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("__n") <= _FP_CAP)
        .select("doc_id", "fp")
        .join(assign, "doc_id")
        .cache()
    )
    _CACHED_FRAMES.append(rare)  # released via text_dedup.release_cached
    left = rare.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "fp"
    )
    right = rare.filter(F.col("split") == "heldout").select(
        F.col("doc_id").alias("heldout_id"), "fp"
    )
    return (
        left.join(right, "fp")
        .groupBy("train_id", "heldout_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _FP_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Corpus rebalancing — per-stratum deterministic downsampling.
# ---------------------------------------------------------------------------

#: per-language keep-rates (percent) for docs_rebalance_sample: the
#: dominant language is downsampled, the rest kept — the standard move
#: when a web corpus is 10:1 English and the training mix shouldn't be.
_REBALANCE_PCT = {"en": 25}
_REBALANCE_DEFAULT_PCT = 100


@register(
    "docs_rebalance_sample",
    # pytest-oracled (driver surface capped at 50): sampling is
    # pipeline infrastructure, like the split assignment
    driver=False,
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_MD5_LONG_SQL.format(c="concat('rb:', doc_id)")} % 100 <
          CASE lang WHEN 'en' THEN {_REBALANCE_PCT['en']}
                    ELSE {_REBALANCE_DEFAULT_PCT} END
    """,
)
def docs_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep ``pct[lang]`` % of
    each language's documents, decided by a salted hash of the stable
    doc id — so membership is reproducible across runs, engines, and
    repartitioning (a seeded ``df.sample`` is none of those), and a
    document's fate never changes when OTHER documents are added,
    which is what makes incremental corpus rebuilds consistent.

    Shape at scale: map-only — one hash + one comparison per row, no
    shuffle, no per-stratum state; the rate table rides the closure.
    The salt ("rb:") decorrelates this decision from the train/val
    split hash so sampling doesn't bias split membership."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("rb:"), F.col("doc_id").cast("string")))
    pct = F.lit(_REBALANCE_DEFAULT_PCT)
    for lang, p in _REBALANCE_PCT.items():
        pct = F.when(F.col("lang") == lang, p).otherwise(pct)
    return docs.where((h % 100) < pct).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Repetition-based quality filtering (the Gopher/MassiveText rules,
# Rae et al. 2021 §A1.1, adapted to token fractions): a document
# dominated by one repeated 2-gram, or whose 2-grams are mostly
# duplicates, is boilerplate/spam and gets filtered before training.
# ---------------------------------------------------------------------------


@register(
    "docs_repetition_stats",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    grams AS (
        SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS gram
        FROM toks, UNNEST(range(1, len(ts))) AS r(i)
        WHERE len(ts) >= 2
    ),
    gc AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) + 1 AS BIGINT) AS n_tokens,
           CAST(2 * MAX(c) AS DOUBLE) / (SUM(c) + 1) AS top_bigram_share,
           1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS dup_bigram_frac
    FROM gc
    GROUP BY doc_id
    """,
)
def docs_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics for quality filtering:
    ``top_bigram_share`` (fraction of tokens covered by the single most
    frequent 2-gram — Gopher cuts at 0.20) and ``dup_bigram_frac``
    (fraction of 2-gram occurrences that are repeats). Documents with
    fewer than two tokens have no 2-grams and are excluded (nothing to
    measure).

    Shape at scale: tokenize + 2-gram construction are MAP-ONLY (the
    2-gram array is built by a ``transform`` over the token array — no
    self-join on position); then one shuffle keyed (doc_id, gram) and
    one keyed doc_id. ``n_tokens`` is recovered as total 2-gram
    occurrences + 1 (each adjacent pair is counted exactly once), so
    no join back to a per-document table is needed at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts")).where(
        F.size("ts") >= 2
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(ts, 1, size(ts) - 1),"
                " (t, i) -> concat(t, ' ', element_at(ts, i + 2)))"
            )
        ).alias("gram"),
    )
    gc = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return gc.groupBy("doc_id").agg(
        (F.sum("c") + 1).cast("long").alias("n_tokens"),
        ((F.max("c") * 2).cast("double") / (F.sum("c") + 1)).alias(
            "top_bigram_share"
        ),
        (
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c")
        ).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson et al., Okapi; the Lucene idf form).
# ---------------------------------------------------------------------------

#: fixed query-term list for the registered search query (a search
#: SERVICE parameterizes these; the oracle needs literals)
_BM25_TERMS = ("spark", "window", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


#: module constant (not inline) so the hybrid-RRF query in
#: plans/similarity.py can embed the SAME ranked list as a subquery —
#: one BM25 recipe, two consumers, zero drift between them
_BM25_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    hits AS (
        SELECT doc_id, len(ts) AS dl, t.term
        FROM toks, UNNEST(ts) AS t(term)
        WHERE t.term IN ('spark', 'window', 'vector')
    ),
    tf AS (
        SELECT doc_id, dl,
               CAST(COUNT(*) FILTER (term = 'spark') AS BIGINT) AS tf0,
               CAST(COUNT(*) FILTER (term = 'window') AS BIGINT) AS tf1,
               CAST(COUNT(*) FILTER (term = 'vector') AS BIGINT) AS tf2
        FROM hits GROUP BY doc_id, dl
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(len(ts)) / COUNT(*) AS avgdl
        FROM toks
    ),
    df AS (
        SELECT CAST(COUNT(*) FILTER (tf0 > 0) AS BIGINT) AS df0,
               CAST(COUNT(*) FILTER (tf1 > 0) AS BIGINT) AS df1,
               CAST(COUNT(*) FILTER (tf2 > 0) AS BIGINT) AS df2
        FROM tf
    ),
    scored AS (
        SELECT doc_id, dl, tf0, tf1, tf2,
               ROUND(
                 CASE WHEN tf0 = 0 THEN 0.0 ELSE
                   ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                   * (tf0 * {_BM25_K1 + 1.0}) / (tf0 + {_BM25_K1} *
                     (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) END
               + CASE WHEN tf1 = 0 THEN 0.0 ELSE
                   ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                   * (tf1 * {_BM25_K1 + 1.0}) / (tf1 + {_BM25_K1} *
                     (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) END
               + CASE WHEN tf2 = 0 THEN 0.0 ELSE
                   ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                   * (tf2 * {_BM25_K1 + 1.0}) / (tf2 + {_BM25_K1} *
                     (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) END
               , 6) AS score
        FROM tf, corpus, df
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM scored
    QUALIFY rank <= {_BM25_TOPK}
    """


@register(
    "docs_bm25_search",
    # r5: promoted to the driver surface (slot from emb_norm_stats).
    # r8: demoted — inverted_index_probe carries this exact oracle
    # verbatim (the redundant-twin rule), freeing the slot for
    # docs_quality_classifier; still pytest-oracled here.
    driver=False,
    oracle=_BM25_ORACLE,
)
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (Lucene idf form, k1=1.2, b=0.75)
    for a fixed query-term set, top-20 (_BM25_TOPK) by score.

    Shape at scale: the token explode FILTERS to the query terms
    BEFORE any shuffle (the selective predicate is map-side, so only
    rows containing query terms ever move), document length rides the
    exploded rows (no join back to a doc-length table), corpus stats
    (N, avgdl, per-term df) are scalar/tiny broadcasts, and the final
    top-k is one WindowGroupLimit. Cross-engine determinism: per-term
    score components are computed with an identical expression tree in
    a FIXED term order (conditional aggregation per term, not
    sum-over-rows, whose accumulation order would be partition-
    dependent), so the only divergence risk is libm ln() ulps —
    absorbed by rounding to 6 dp before ranking."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    hits = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("dl"),
        F.explode("ts").alias("term"),
    ).where(F.col("term").isin(*_BM25_TERMS))
    aggs = [
        F.count(F.when(F.col("term") == t, 1)).cast("long").alias(f"tf{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    tf = hits.groupBy("doc_id", "dl").agg(*aggs)
    corpus = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.size("ts").cast("long")) / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    dfs = tf.agg(
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ]
    )
    scored = tf.crossJoin(F.broadcast(corpus)).crossJoin(F.broadcast(dfs))
    # THE scoring kernel — shared with InvertedTextIndex.probe so the
    # one-shot query and the persisted-index path compile the same
    # expression tree (operators/text_index.bm25_score)
    from ..operators.text_index import bm25_score

    comp = bm25_score(_BM25_TERMS, _BM25_K1, _BM25_B)
    from pyspark.sql.window import Window

    ranked = scored.select(
        "doc_id", F.round(comp, 6).alias("score")
    ).withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("long"),
    )
    return ranked.where(F.col("rank") <= _BM25_TOPK)


@register(
    "inverted_index_probe",
    # r7: the 50th driver slot — the PERSISTED BM25 inverted index
    # (t_bucket= postings, pruned probe, incremental append) must land
    # on the exact same rows as the one-shot TF/DF recompute, so it
    # shares docs_bm25_search's oracle verbatim (same terms, k1/b,
    # top-k) — the ivf_index_probe pattern for the retrieval tier
    oracle=_BM25_ORACLE,
)
def inverted_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index BM25 under the hash check: build an
    ``InvertedTextIndex`` over the documents table (tokenize + one
    partial-aggregated (term, doc_id) shuffle + a ``t_bucket=``
    partitioned write, doc length denormalized onto the postings),
    probe the standard query terms, and return the same
    ``(doc_id, score, rank)`` surface as ``docs_bm25_search`` — the
    oracle is shared verbatim, so the equality proves the on-disk
    layout + touched-bucket pruning change WHERE the bytes are read,
    not WHAT comes back. The probe's postings scan carries non-empty
    PartitionFilters AND the term filter pushed to the parquet reader
    (plan-pinned in tests/test_scale_patterns.py). Scoring compiles
    the SAME expression kernel as the one-shot query
    (operators/text_index.bm25_score — one definition, zero drift).

    Fresh throwaway index per call (driver and bench call queries
    repeatedly); cost is one tokenize + postings pass over the corpus.
    The incremental append / compaction paths are exercised by
    tests/test_operators.py."""
    from ..operators.text_index import InvertedTextIndex

    docs = load_table(spark, sf_dir, "documents")
    idx = InvertedTextIndex(spark, scratch_dir("inv_idx_"))
    idx.build(docs)
    return idx.probe(_BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK)


# ---------------------------------------------------------------------------
# Retrieval-side chunking — the sibling of docs_pack_sequences: packing
# concatenates documents into training sequences; chunking splits each
# document into overlapping windows for embedding/retrieval (RAG).
# ---------------------------------------------------------------------------

_CHUNK_LEN = 256   # tokens per chunk
_CHUNK_STRIDE = 192  # tokens between chunk starts (64-token overlap)


@register(
    "docs_chunk_windows",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(least({_CHUNK_LEN}, n_tokens - i * {_CHUNK_STRIDE}) AS BIGINT)
               AS chunk_tokens
    FROM toks,
         UNNEST(range(0, CAST(
             greatest(1, ceil((n_tokens - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) + 1)
             AS BIGINT))) AS r(i)
    WHERE n_tokens > 0
    """,
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk placement for retrieval pipelines: each
    document splits into 256-token windows every 192 tokens (64-token
    overlap, so no passage straddles a boundary unseen; constants
    _CHUNK_LEN/_CHUNK_STRIDE). The LAST chunk is short rather than
    dropped — truncating the tail would silently lose up to 255
    tokens per document.

    Map-only at any scale: chunk count derives from the token count
    (one expression), the windows fan out via sequence+explode on
    metadata — the text itself is never exploded or shuffled, the same
    shape as the video frame fan-out in operators/multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.col("n_tokens") - _CHUNK_LEN) / float(_CHUNK_STRIDE)
        ) + 1,
    ).cast("long")
    return toks.select(
        "doc_id",
        "n_tokens",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * _CHUNK_STRIDE).alias("start_tok"),
        F.least(
            F.lit(_CHUNK_LEN).cast("long"),
            F.col("n_tokens") - F.col("chunk_id") * _CHUNK_STRIDE,
        ).alias("chunk_tokens"),
    )


def _bpe_oracle() -> str:
    """Full DuckDB replay of the frozen-merge BPE encoder (r12,
    VERDICT r11 #4 — the docs_pack_nostraddle recursive-CTE
    precedent): the merge table is a literal ranks VALUES list, and
    the encoder's loop — merge the LOWEST-rank adjacent pair present,
    leftmost on rank ties, rescan — is a deterministic state machine
    per word, replayed as a recursive CTE whose recursive term picks
    the next merge via LATERAL argmin (ORDER BY rank, position
    LIMIT 1) and terminates when no pair joins the rank table. Only
    corpus-DISTINCT words enter the recursion (the production tier's
    own vocabulary-not-occurrences shape), then subword counts join
    back onto the exploded words. Closes the registry's last
    rows-only entry."""
    from .bpe_merges import MERGES

    ranks = ", ".join(
        f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(MERGES)
    )
    return f"""
    WITH RECURSIVE
    ranks(rank, a, b) AS (VALUES {ranks}),
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
        FROM documents
    ),
    words AS (
        SELECT DISTINCT t.w FROM toks, UNNEST(ws) AS t(w)
    ),
    enc AS (
        SELECT w, string_split(w, '') AS syms, 0 AS step FROM words
        UNION ALL
        SELECT e.w,
               list_concat(list_concat(e.syms[1:p.bi-1],
                                       [e.syms[p.bi] || e.syms[p.bi+1]]),
                           e.syms[p.bi+2:]),
               e.step + 1
        FROM enc e, LATERAL (
            SELECT i AS bi
            FROM UNNEST(range(1, len(e.syms))) AS t(i)
            JOIN ranks r ON r.a = e.syms[i] AND r.b = e.syms[i+1]
            ORDER BY r.rank, i LIMIT 1
        ) p
    ),
    final AS (
        SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM (
            SELECT w, syms, ROW_NUMBER() OVER (
                PARTITION BY w ORDER BY step DESC) AS rn
            FROM enc) WHERE rn = 1
    ),
    sums AS (
        SELECT e.doc_id, CAST(SUM(f.n_sub) AS BIGINT) AS n_bpe
        FROM (SELECT doc_id, t.w FROM toks, UNNEST(ws) AS t(w)) e
        JOIN final f USING (w)
        GROUP BY e.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ws) AS BIGINT) AS n_words,
           COALESCE(s.n_bpe, 0) AS n_bpe_tokens,
           CASE WHEN len(t.ws) > 0
                THEN CAST(COALESCE(s.n_bpe, 0) AS DOUBLE) / len(t.ws)
                ELSE 0.0 END AS bpe_per_word
    FROM toks t LEFT JOIN sums s USING (doc_id)
    """


@register(
    "doc_bpe_token_stats",
    # r12: the registry's last rows-only entry gains a full DuckDB
    # oracle (VERDICT r11 #4) — the ranked merge loop replayed as a
    # recursive CTE over distinct words (_bpe_oracle). Off the 50-row
    # driver surface as before; the local replica hash-checks it.
    driver=False,
    oracle=_bpe_oracle(),
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL subword token statistics under the frozen BPE merge table
    (plans/bpe_merges.py — trained offline, shipped as a constant,
    exactly the IVF-centroid posture): per document, word count, BPE
    token count, and tokens-per-word. This is the unit LLM training
    budgets are denominated in — the word-count proxies elsewhere in
    the registry over- or under-shoot on morphology-heavy text.

    Production tier (operators/bpe.py:bpe_token_counts_distinct):
    corpus-distinct words are encoded EXACTLY ONCE in the Arrow
    kernel — total Python work ∝ vocabulary, not occurrences — then
    the counts join back and fold per document. The per-task-memo
    tier (bpe_token_counts) remains the small-corpus path; a pytest
    pins the two tiers bit-identical."""
    from ..operators.bpe import bpe_token_counts_distinct
    from .bpe_merges import MERGES

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts_distinct(docs, MERGES).withColumnRenamed(
        "id", "doc_id"
    )


# ---------------------------------------------------------------------------
# Corpus n-gram frequency table (the memorization / contamination audit
# primitive: "which passages does the corpus repeat most?").
# ---------------------------------------------------------------------------

_NGRAM_TOPK = 20


@register(
    "corpus_ngram_topk",
    # r6 continuation: surface at its 50 cap — pytest-oracled.
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    grams AS (
        SELECT doc_id, 1 AS n, t.g AS gram
        FROM toks, UNNEST(ts) AS t(g)
        UNION ALL
        SELECT doc_id, 2, ts[i] || ' ' || ts[i+1]
        FROM toks, UNNEST(range(1, len(ts))) AS u(i)
        UNION ALL
        SELECT doc_id, 3, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
    ),
    agg AS (
        SELECT n, gram,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM grams GROUP BY n, gram
    )
    SELECT CAST(n AS BIGINT) AS n, gram, n_occurrences, n_docs,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY n ORDER BY n_occurrences DESC, gram
           ) AS BIGINT) AS rank
    FROM agg
    QUALIFY rank <= {_NGRAM_TOPK}
    """,
)
def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most frequent 1/2/3-grams — the audit table behind
    repetition boilerplate detection and benchmark-contamination
    triage (which exact passages dominate the corpus). Top
    ``_NGRAM_TOPK`` per n with exact occurrence AND document counts,
    rank ties broken lexicographically so the output is deterministic.

    Shape at scale:
    - ONE scan: all three gram lengths are built map-only from the
      token array (``transform`` + ``concat_ws`` over slices) and
      concatenated into a single tagged array before one explode — no
      per-n re-scan, no positional self-join.
    - Exact ``n_docs`` without ``count_distinct`` at the gram level:
      pre-aggregate on (n, gram, doc_id), then count rows per (n,
      gram) — both levels partial-combine map-side.
    - Top-k WITHOUT a global sort and WITHOUT funneling every
      distinct gram into one partition per n (a 3-partition window
      over a 100 TB vocabulary is the skew failure): the classic
      two-stage top-k — rank within (n, hash-bucket) partitions,
      keep each bucket's top k (a superset of the global top k,
      since each gram lives in exactly one bucket), then rank the
      ≤ n·buckets·k survivors globally.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("ts"), "doc_id").where(
        F.size("ts") > 0
    )
    gram_exprs = [
        "transform(ts, t -> named_struct('n', 1, 'gram', t))",
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
        " (t, i) -> named_struct('n', 2,"
        "   'gram', concat_ws(' ', slice(ts, i + 1, 2))))",
        "transform(slice(ts, 1, greatest(size(ts) - 2, 0)),"
        " (t, i) -> named_struct('n', 3,"
        "   'gram', concat_ws(' ', slice(ts, i + 1, 3))))",
    ]
    exploded = toks.select(
        "doc_id",
        F.explode(F.concat(*[F.expr(e) for e in gram_exprs])).alias("g"),
    ).select(
        "doc_id",
        F.col("g.n").cast("long").alias("n"),
        F.col("g.gram").alias("gram"),
    )
    per_doc = exploded.groupBy("n", "gram", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_doc.groupBy("n", "gram").agg(
        F.sum("c").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    order = [F.col("n_occurrences").desc(), F.col("gram")]
    w_bucket = Window.partitionBy(
        "n", F.pmod(F.hash("gram"), F.lit(32))
    ).orderBy(*order)
    pruned = (
        agg.withColumn("r", F.row_number().over(w_bucket))
        .where(F.col("r") <= _NGRAM_TOPK)
        .drop("r")
    )
    w_global = Window.partitionBy("n").orderBy(*order)
    return (
        pruned.withColumn(
            "rank", F.row_number().over(w_global).cast("long")
        )
        .where(F.col("rank") <= _NGRAM_TOPK)
        .select("n", "gram", "n_occurrences", "n_docs", "rank")
    )


@register(
    "corpus_mixture_weights",
    oracle=f"""
    WITH g AS (
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}')))
                    AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY lang, source
    ), t AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
               CAST(ROUND(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE))
                                   AS DECIMAL(30,10))), 4) AS DOUBLE) AS tot_w
        FROM g
        WHERE n_tokens > 0
    )
    SELECT g.lang, g.source, g.n_docs, g.n_tokens,
           CAST(g.n_tokens AS DOUBLE) / t.tot AS natural_share,
           sqrt(CAST(g.n_tokens AS DOUBLE)) / t.tot_w AS mixture_share,
           (sqrt(CAST(g.n_tokens AS DOUBLE)) / t.tot_w)
               / (CAST(g.n_tokens AS DOUBLE) / t.tot) AS upsample_factor
    FROM g, t
    WHERE g.n_tokens > 0
    """,
    driver=False,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mixture weights per (lang, source)
    stratum — the sampling step between corpus curation and training
    (multilingual-LM practice: raw token shares over-represent the
    largest sources, so strata are sampled ∝ share^α; α=0.5 here, the
    square-root temperature both major multilingual recipes land near).
    Emits each stratum's exact token count, its natural share, its
    α-tempered mixture share, and the resulting upsample factor a
    sampler applies (>1: stratum is over-sampled vs natural).

    Exactness: token counts are integer-exact; sqrt of a bigint-valued
    double is correctly rounded IEEE on both engines; the normalizing
    sum of sqrt values runs through the decimal dec_sum discipline so
    accumulation order cannot perturb low bits; the two divisions then
    divide bit-identical doubles. Scale shape: one groupBy over the
    corpus (map-side combinable), a single-row aggregate over the tiny
    strata table broadcast back onto it — no window, no second corpus
    scan."""
    from .helpers import DEC, OUT

    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
    )
    sqrt_tok = F.sqrt(F.col("n_tokens").cast("double"))
    tot = g.agg(
        F.sum("n_tokens").cast("long").alias("tot"),
        F.sum(sqrt_tok.cast(DEC)).cast(OUT).cast("double").alias("tot_w"),
    )
    natural = F.col("n_tokens").cast("double") / F.col("tot")
    mixture = sqrt_tok / F.col("tot_w")
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        natural.alias("natural_share"),
        mixture.alias("mixture_share"),
        (mixture / natural).alias("upsample_factor"),
    )


# ---------------------------------------------------------------------------
# Phrase search through the inverted index: the two-stage shape every
# positional-free index uses — conjunctive candidates from the pruned
# postings scan, exact adjacency verified against the candidates' text
# only. At 100 TB the corpus is never re-tokenized: stage 1 reads the
# two terms' t_bucket= partitions, stage 2 tokenizes only the docs
# that contain both terms.
# ---------------------------------------------------------------------------

_PHRASE = ("spark", "window")  # adjacent-token phrase, frozen


@register(
    "docs_phrase_search_via_index",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    SELECT doc_id, n_occurrences
    FROM (
        SELECT doc_id,
               CAST(len(list_filter(range(1, len(t)),
                    i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}'))
                    AS BIGINT) AS n_occurrences
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
              FROM documents)
    )
    WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id
    """,
)
def docs_phrase_search_via_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-phrase retrieval through the persisted BM25 index: the
    index holds no positions (the standard tf-only postings trade), so
    phrase queries run the classic two-stage plan — (1) conjunctive
    candidates from the PRUNED postings scan
    (InvertedTextIndex.conjunctive_candidates: only the phrase terms'
    ``t_bucket=`` partitions are read, ids-only aggregate), (2) exact
    adjacency counted map-side over ONLY the candidates' token arrays.
    The oracle scans the whole corpus directly, so the hash equality
    proves the pruned two-stage path returns exactly the full-scan
    answer. Fresh throwaway index per call (the inverted_index_probe
    posture). Candidates guarantee both terms present, so every token
    array has size >= 2 and the adjacency sequence is well-formed."""
    from ..operators.text_index import InvertedTextIndex

    docs = load_table(spark, sf_dir, "documents")
    idx = InvertedTextIndex(spark, scratch_dir("phr_idx_"))
    idx.build(docs)
    cand = idx.conjunctive_candidates(_PHRASE)
    w1, w2 = _PHRASE
    return (
        docs.join(cand, "doc_id")
        .select("doc_id", tokens("text").alias("t"))
        .select(
            "doc_id",
            F.expr(
                f"size(filter(sequence(0, size(t) - 2),"
                f" i -> t[i] = '{w1}' AND t[i + 1] = '{w2}'))"
            ).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") > 0)
        .orderBy(F.desc("n_occurrences"), "doc_id")
    )


@register(
    "docs_phrase_search_positional",
    # r9: rotated ONTO the driver surface (VERDICT r8 #5), taking the
    # slot of emb_ivf_topk — whose oracle ivf_index_probe carries
    # VERBATIM (same quantizer/n_probe/k/query set), the exact
    # docs_bm25_search→inverted_index_probe rationale. Shares the
    # two-stage variant's full-scan oracle verbatim, so the hash
    # equality proves the positional layout answers identically while
    # reading ZERO document text (plan-pinned in
    # tests/test_scale_patterns.py).
    # r12: rotated OFF again (VERDICT r11 #1) — that same shared
    # oracle keeps it hash-checked in the local replica alongside
    # docs_phrase_search_via_index, the plan pin still proves the
    # zero-text-scan property, and its slot went to the r11
    # retrieval/mining tier.
    driver=False,
    oracle=f"""
    SELECT doc_id, n_occurrences
    FROM (
        SELECT doc_id,
               CAST(len(list_filter(range(1, len(t)),
                    i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}'))
                    AS BIGINT) AS n_occurrences
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
              FROM documents)
    )
    WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id
    """,
)
def docs_phrase_search_positional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-phrase retrieval, INDEX-RESIDENT (r8, VERDICT r7 #5): the
    index builds with ``positions=True`` (per-posting sorted offset
    arrays — the Lucene positional layout) and
    ``InvertedTextIndex.phrase_occurrences`` answers the phrase query
    purely from the stored postings: pruned ``t_bucket=`` scan,
    slot-shifted position arrays, one doc_id equi-join per extra
    phrase term, occurrence count = running ``array_intersect`` size.
    The documents table is read ONCE at build time and never again —
    the probe plan contains no docs scan (plan-pinned), which is the
    property the tf-only two-stage plan
    (``docs_phrase_search_via_index``) gives up at 100 TB where even
    a candidates-only text rescan re-reads cold data. The tf-only
    layout stays the DEFAULT (the standard space trade); positions
    are the opt-in for phrase-heavy workloads."""
    from ..operators.text_index import InvertedTextIndex

    docs = load_table(spark, sf_dir, "documents")
    idx = InvertedTextIndex(
        spark, scratch_dir("phrpos_idx_"), positions=True
    )
    idx.build(docs)
    return idx.phrase_occurrences(_PHRASE).orderBy(
        F.desc("n_occurrences"), "doc_id"
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling" — public method):
# score every raw document by how much more likely its hashed n-gram
# bag is under a target distribution than under the raw distribution,
# then keep the top-k. The feature extractor is the paper's hashed
# unigram+bigram bag; the two bag-of-buckets models are Laplace-
# smoothed bucket frequencies.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096  # hashed n-gram feature dimension
_DSIR_TOPK = 200


@register(
    "docs_dsir_selection",
    # r10 rotation: OFF the driver surface — its entire oracle
    # (feats/raw/tgt/tot/ratio + the per-doc decimal aggregate) rides
    # verbatim inside docs_token_budget_selection's, which took the
    # slot (VERDICT r9 #5); still pytest-oracled via the registry
    driver=False,
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, lang,
               {_MD5_LONG_SQL.format(c='g')} % {_DSIR_BUCKETS} AS b
        FROM (
            SELECT doc_id, lang,
                   unnest(list_concat(
                       t,
                       list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])
                   )) AS g
            FROM (SELECT doc_id, lang,
                         regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
                  FROM documents)
        )
    ),
    raw AS (SELECT b, COUNT(*) AS c_r FROM feats GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS c_t FROM feats
            WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM feats) AS t_r,
                   (SELECT COUNT(*) FROM feats WHERE lang = 'en') AS t_t),
    ratio AS (
        SELECT r.b,
               ln( (COALESCE(g.c_t, 0) + 1)
                   * (t.t_r + {_DSIR_BUCKETS}.0)
                   / ((r.c_r + 1) * (t.t_t + {_DSIR_BUCKETS}.0)) ) AS w
        FROM raw r LEFT JOIN tgt g USING (b), tot t
    )
    SELECT f.doc_id,
           any_value(f.lang) AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           {dec_sum_sql('rt.w')} AS log_weight
    FROM feats f JOIN ratio rt USING (b)
    GROUP BY f.doc_id
    ORDER BY log_weight DESC, f.doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def docs_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: select the raw documents whose
    hashed-n-gram distribution looks most like the target slice's
    (here target = the ``lang = 'en'`` documents — the "trusted
    corpus" stand-in; raw = everything). Per doc,
    ``log w = Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))]``
    over unigrams + bigrams hashed into ``_DSIR_BUCKETS`` buckets with
    the engine-reproducible md5 family; both bag models are
    Laplace-smoothed. Deterministic top-k by (weight, doc_id).

    Hash-match discipline: each bucket's log-ratio is one double
    (identical int-ratio input on both engines), and the per-doc sum
    goes through the decimal cast (plans/helpers.dec_sum), so the
    ranking never sees order-dependent float error.

    Scale shape: three map-only token-explode passes (raw bucket
    counts; target bucket counts under a PUSHED lang filter; scoring —
    the re-scan discipline of doc_unigram_surprisal). The Laplace
    totals are Σ_b of the bucket counts, so they fold out of the
    4096-row model frame (pinned with localCheckpoint — eager,
    driver-bounded) instead of paying a fourth corpus pass. The ratio
    model is exactly ``_DSIR_BUCKETS`` rows regardless of corpus size
    and broadcasts onto the feature stream; the per-doc aggregate
    map-side combines to (doc_id, partial decimal) before its single
    shuffle; the top-k compiles to TakeOrderedAndProject (no global
    sort). The single-row totals aggregate broadcasts (the documented
    corpus_mixture_weights shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _dsir_rank(docs)
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(_DSIR_TOPK)
    )


_TOKEN_BUDGET = 5_000  # training-mix budget (tokens), the selection cap


@register(
    "docs_token_budget_selection",
    # r10: ON the driver surface (VERDICT r9 #5) — the newest
    # selection-tier capability, whose TakeOrdered-fed global
    # running-sum window is exactly the plan shape worth the hard
    # hash signal; it took docs_dsir_selection's slot, whose oracle
    # the `sel` CTE below carries verbatim
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, lang,
               {_MD5_LONG_SQL.format(c='g')} % {_DSIR_BUCKETS} AS b
        FROM (
            SELECT doc_id, lang,
                   unnest(list_concat(
                       t,
                       list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])
                   )) AS g
            FROM (SELECT doc_id, lang,
                         regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
                  FROM documents)
        )
    ),
    raw AS (SELECT b, COUNT(*) AS c_r FROM feats GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS c_t FROM feats
            WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM feats) AS t_r,
                   (SELECT COUNT(*) FROM feats WHERE lang = 'en') AS t_t),
    ratio AS (
        SELECT r.b,
               ln( (COALESCE(g.c_t, 0) + 1)
                   * (t.t_r + {_DSIR_BUCKETS}.0)
                   / ((r.c_r + 1) * (t.t_t + {_DSIR_BUCKETS}.0)) ) AS w
        FROM raw r LEFT JOIN tgt g USING (b), tot t
    ),
    sel AS (
        SELECT f.doc_id,
               any_value(f.lang) AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_feats,
               {dec_sum_sql('rt.w')} AS log_weight
        FROM feats f JOIN ratio rt USING (b)
        GROUP BY f.doc_id
    ),
    ntok AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                    AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_feats, n_tokens, log_weight, cum_tokens
    FROM (
        SELECT s.doc_id, s.lang, s.n_feats, t.n_tokens, s.log_weight,
               CAST(SUM(t.n_tokens) OVER (
                   ORDER BY s.log_weight DESC, s.doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM sel s JOIN ntok t USING (doc_id)
    ) WHERE cum_tokens <= {_TOKEN_BUDGET}
    ORDER BY cum_tokens
    """,
)
def docs_token_budget_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budgeted training-mix fill: rank the corpus by DSIR
    importance (the ``_dsir_rank`` core — same model, same weights as
    the registered selection query) and keep the highest-weight PREFIX
    whose cumulative token count fits ``_TOKEN_BUDGET`` — the step
    that turns "score every document" into "assemble exactly the
    n-token training mix", which is how selection budgets are actually
    specified (tokens, not document counts).

    Exactness: token counts and the running sum are integers; the
    ordering key is the decimal-summed log_weight both engines already
    hash-match; the prefix rule (keep iff cumulative INCLUDING the doc
    fits) is a plain running-sum window both engines evaluate over the
    identical order.

    Scale shape: every scored doc carries ≥1 token (zero-gram docs
    never enter the ranking), so at most ``_TOKEN_BUDGET`` docs can
    fit — the frame pre-limits to that many rows via
    TakeOrderedAndProject (per-partition top-k, no global sort of the
    corpus) and the global running-sum window then touches only the
    budget-bounded prefix, the docs_bm25_search global-window
    discipline. The DSIR scoring underneath keeps its documented
    three-pass, 4096-row-model shape."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    from pyspark.sql.window import Window as _W

    capped = (
        _dsir_rank(docs)
        .join(ntok, "doc_id")
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(_TOKEN_BUDGET)
    )
    w = _W.orderBy(F.desc("log_weight"), "doc_id").rowsBetween(
        _W.unboundedPreceding, 0
    )
    return (
        capped.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select(
            "doc_id", "lang", "n_feats", "n_tokens",
            "log_weight", "cum_tokens",
        )
        .orderBy("cum_tokens")
    )


def _gram_features(docs: DataFrame) -> DataFrame:
    """Instance-level hashed unigram+bigram features over a
    (doc_id, lang, text) frame: one row per gram INSTANCE as
    (doc_id, lang, g, b) — the shared feature extraction under both
    DSIR paths (the batch ranker below and the delta-aware refresh's
    per-doc histograms, streaming/ingest.py). Kept as one function so
    the two paths cannot drift on tokenization, gram construction, or
    bucket hashing — drift here would silently break the delta
    refresh's bit-identity contract."""
    toks = docs.select(
        "doc_id", "lang", tokens("text").alias("t")
    )
    # the shared guarded gram expression (defined with the quality
    # classifier below): slice(t, 1, size(t) - 1) raises
    # INVALID_PARAMETER_VALUE.LENGTH for zero-token docs (size-1 = -1),
    # and empty/punctuation-only text is a supported input (P10 only
    # filters empty STRINGS) — so the bigram branch is guarded exactly
    # like dedup.py guards sequence(0,-1).
    grams = F.expr(_GRAMS_EXPR)
    return toks.select(
        "doc_id", "lang", F.explode(grams).alias("g")
    ).withColumn("b", md5_long("g") % _DSIR_BUCKETS)


def _dsir_ratio(model: DataFrame) -> DataFrame:
    """Bucket log-likelihood-ratio weights from a DSIR count model —
    ``model`` is (b, c_r long, c_t nullable long); returns (b, w
    double). Factored so the delta-aware refresh evaluates the EXACT
    same arithmetic (same column types, same operation order — the
    doubles must match bit-for-bit) over a model it folded from
    persisted per-doc histograms instead of a fresh gram pass."""
    tot = model.agg(
        F.sum("c_r").alias("t_r"),
        F.coalesce(F.sum("c_t"), F.lit(0)).alias("t_t"),
    )
    nb = float(_DSIR_BUCKETS)
    return (
        model
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                * (F.col("t_r") + nb)
                / ((F.col("c_r") + 1) * (F.col("t_t") + nb))
            ).alias("w"),
        )
    )


def _dsir_rank(docs: DataFrame) -> DataFrame:
    """DSIR importance weights over ANY documents frame — the scoring
    core shared by the registered selection query and the curation
    funnel's final stage. Returns (doc_id, lang, n_feats, log_weight)
    unranked; callers order/limit."""
    feats = _gram_features(docs)
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        feats.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    # ≤ _DSIR_BUCKETS rows; pinned so the totals fold below doesn't
    # recompute the two counting passes
    model = raw.join(tgt, "b", "left").localCheckpoint()
    ratio = _dsir_ratio(model)
    return (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_feats"),
            dec_sum("w").alias("log_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Learned quality classifier (the CCNet / GPT-3 Wikipedia-vs-CC filter
# stage; fastText architecture — Joulin et al. 2016): mean-pooled
# hashed unigram+bigram features through a single logistic unit, with
# weights trained OFFLINE by the deterministic trainer
# (operators/logreg.train_logreg_hashed) and shipped frozen
# (plans/quality_weights.py — the bpe_merges/ivf_centroids posture).
# Scoring is a map-only broadcast dot product: grams explode map-side,
# join the 256-row weight table broadcast, and the only shuffle is the
# per-doc aggregate (map-side combined). Fully SQL-replayable.
# ---------------------------------------------------------------------------

_QC_BUCKETS = 256  # hashed feature dimension (fastText-style buckets)

#: the guarded unigram+bigram expression shared with the DSIR plan —
#: zero-token docs produce array() instead of a slice(…, -1) error
_GRAMS_EXPR = (
    "concat(t, CASE WHEN size(t) >= 2 THEN transform("
    "slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', t[i + 1])) "
    "ELSE array() END)"
)

_GRAMS_SQL = (
    "list_concat(t, list_transform(range(1, len(t)),"
    " i -> t[i] || ' ' || t[i+1]))"
)


def _qc_weights_values_sql() -> str:
    """The frozen weight table as a DuckDB VALUES list — the literals
    inline into the oracle exactly as they broadcast into the plan."""
    from .quality_weights import WEIGHTS

    return ", ".join(f"({b}, {w!r})" for b, w in enumerate(WEIGHTS))


def _register_quality_classifier() -> None:
    from .quality_weights import BIAS

    @register(
        "docs_quality_classifier",
        # r8: on the driver surface in the slot of docs_bm25_search,
        # whose oracle inverted_index_probe already carries verbatim
        # (the redundant-twin demotion rule)
        oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang,
                   {_MD5_LONG_SQL.format(c='g')} % {_QC_BUCKETS} AS b
            FROM (
                SELECT doc_id, lang, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id, lang,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM documents)
            )
        ),
        w(b, wt) AS (VALUES {_qc_weights_values_sql()}),
        pooled AS (
            SELECT f.doc_id,
                   any_value(f.lang) AS lang,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   {dec_sum_sql('w.wt')} AS s
            FROM feats f JOIN w ON w.b = f.b
            GROUP BY f.doc_id
        )
        SELECT doc_id, lang, n_grams,
               ROUND(1.0 / (1.0 + exp(-({BIAS!r} + s / n_grams))), 6)
                   AS quality_score,
               ({BIAS!r} + s / n_grams) >= 0.0 AS is_kept
        FROM pooled
        ORDER BY quality_score DESC, doc_id
        """,
    )
    def docs_quality_classifier(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Learned quality classifier — the CCNet / GPT-3
        "Wikipedia-vs-CommonCrawl" filter stage (Wenzek et al. 2019;
        Brown et al. 2020 §A; fastText architecture, Joulin et al.
        2016): every document scores
        ``sigmoid(bias + mean_g w[bucket(g)])`` over hashed
        unigram+bigram features, with weights trained OFFLINE by the
        deterministic distributed trainer
        (operators/logreg.train_logreg_hashed) and shipped frozen
        (plans/quality_weights.py, provenance-pinned: pytest re-runs
        the trainer and asserts the literals). ``is_kept`` is the
        logit-sign keep decision (score ≥ 0.5), evaluated on the
        exact logit so the boundary never depends on exp() rounding.

        Hash-match discipline: the per-doc weight sum goes through
        the decimal cast (dec_sum — identical double on both
        engines), the mean divides by the identical long count, and
        the sigmoid rounds to 6 dp before ranking (the ln()/exp()
        libm-ulp rule).

        Scale shape: grams explode map-side; the 256-row frozen
        weight table broadcasts; the ONLY shuffle is the per-doc
        aggregate (map-side combined, ids+decimal); the sort is by
        the rounded score (a top-level presentation sort a caller
        would LIMIT — the scoring itself is one pass). At 100 TB
        this is the cheapest stage in the curation funnel: no corpus
        statistics, no second pass, no index — exactly why the
        public pipelines run a linear scorer over hashed n-grams."""
        from .quality_weights import BIAS as _bias
        from .quality_weights import WEIGHTS as _w

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select("doc_id", "lang", tokens("text").alias("t"))
        feats = toks.select(
            "doc_id", "lang", F.explode(F.expr(_GRAMS_EXPR)).alias("g")
        ).withColumn("b", md5_long("g") % _QC_BUCKETS)
        wdf = F.broadcast(
            spark.createDataFrame(
                [(b, wt) for b, wt in enumerate(_w)], "b long, wt double"
            )
        )
        pooled = (
            feats.join(wdf, "b")
            .groupBy("doc_id")
            .agg(
                F.any_value("lang").alias("lang"),
                F.count(F.lit(1)).cast("long").alias("n_grams"),
                dec_sum("wt").alias("s"),
            )
        )
        logit = F.lit(_bias) + F.col("s") / F.col("n_grams")
        return pooled.select(
            "doc_id",
            "lang",
            "n_grams",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6
            ).alias("quality_score"),
            (logit >= 0.0).alias("is_kept"),
        ).orderBy(F.desc("quality_score"), "doc_id")


_register_quality_classifier()


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All input columns + ``quality_score`` (double, 6 dp) and
    ``is_kept`` (boolean) under the FROZEN classifier — the reusable
    scoring stage behind ``docs_quality_classifier``, shaped for
    pipeline composition (the WARC ingest tick's quarantine stage
    takes exactly this frame contract). Zero-gram documents (nothing
    tokenizable) score NULL and ``is_kept = false`` — a quality
    filter rejects content it cannot score, mirroring the public
    pipelines' treatment of empty extractions.

    Same plan shape as the registered query: map-side gram explode,
    256-row broadcast, ONE per-doc aggregate, then a broadcast-back
    join keyed on doc_id (the pooled frame is ids+score — small side
    of the join at any corpus scale, but left as a plain equi-join so
    AQE picks the strategy from measured sizes)."""
    from .quality_weights import BIAS as _bias
    from .quality_weights import WEIGHTS as _w

    spark = docs.sparkSession
    feats = docs.select(
        "doc_id", tokens(text_col).alias("t")
    ).select(
        "doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("g")
    ).withColumn("b", md5_long("g") % _QC_BUCKETS)
    wdf = F.broadcast(
        spark.createDataFrame(
            [(b, wt) for b, wt in enumerate(_w)], "b long, wt double"
        )
    )
    logit = F.lit(_bias) + F.col("s") / F.col("n_grams")
    pooled = (
        feats.join(wdf, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            dec_sum("wt").alias("s"),
        )
        .select(
            "doc_id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6
            ).alias("quality_score"),
            (logit >= 0.0).alias("__kept"),
        )
    )
    return docs.join(pooled, "doc_id", "left").withColumn(
        "is_kept", F.coalesce(F.col("__kept"), F.lit(False))
    ).drop("__kept")


def quality_gram_feats(docs: DataFrame) -> DataFrame:
    """Per-doc hashed-gram bucket counts ``(doc_id, b, c, n)`` — the
    feature extractor BOTH the frozen-weight scorer and the trainer
    consume (one definition, so the provenance test trains on exactly
    what the scorer scores). ``n`` is the doc's total gram count,
    denormalized for the mean-pool."""
    from pyspark.sql.window import Window

    feats = docs.select(
        "doc_id", tokens("text").alias("t")
    ).select(
        "doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("g")
    ).withColumn("b", md5_long("g") % _QC_BUCKETS)
    return (
        feats.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "n", F.sum("c").over(Window.partitionBy("doc_id"))
        )
    )


_FUNNEL_TOPK = 100


# Parameterized over the corpus source so curation_mix_diff can run
# the IDENTICAL funnel SQL over two corpus versions (and the corpus-
# release capstone can run it over the filter bank's keepers); the
# registered batch/delta oracles interpolate src='documents',
# producing the same string they always carried. Module-level (r12)
# so plans/release.py chains it verbatim into the capstone oracle.
def funnel_sql(src: str = "documents") -> str:
    from .quality_weights import BIAS

    norm_sql = f"trim(regexp_replace(lower(text), '{_WS}+', ' ', 'g'))"
    return f"""
        WITH qfeats AS (
            SELECT doc_id, {_MD5_LONG_SQL.format(c='g')} % {_QC_BUCKETS} AS b
            FROM (
                SELECT doc_id, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM {src})
            )
        ),
        w(b, wt) AS (VALUES {_qc_weights_values_sql()}),
        pooled AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   {dec_sum_sql('w.wt')} AS s
            FROM qfeats f JOIN w ON w.b = f.b
            GROUP BY f.doc_id
        ),
        kept AS (
            SELECT d.doc_id, d.lang, d.text,
                   ROUND(1.0 / (1.0 + exp(-({BIAS!r} + p.s / p.n_grams))),
                         6) AS quality_score
            FROM {src} d JOIN pooled p USING (doc_id)
            WHERE ({BIAS!r} + p.s / p.n_grams) >= 0.0
        ),
        uniq AS (
            SELECT doc_id, lang, text, quality_score FROM (
                SELECT *,
                       ROW_NUMBER() OVER (PARTITION BY md5({norm_sql})
                                          ORDER BY doc_id) AS rn
                FROM kept
            ) WHERE rn = 1
        ),
        feats AS (
            SELECT doc_id, lang,
                   {_MD5_LONG_SQL.format(c='g')} % {_DSIR_BUCKETS} AS b
            FROM (
                SELECT doc_id, lang, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id, lang,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM uniq)
            )
        ),
        raw AS (SELECT b, COUNT(*) AS c_r FROM feats GROUP BY b),
        tgt AS (SELECT b, COUNT(*) AS c_t FROM feats
                WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT (SELECT COUNT(*) FROM feats) AS t_r,
                       (SELECT COUNT(*) FROM feats WHERE lang = 'en')
                           AS t_t),
        ratio AS (
            SELECT r.b,
                   ln( (COALESCE(g.c_t, 0) + 1)
                       * (t.t_r + {_DSIR_BUCKETS}.0)
                       / ((r.c_r + 1) * (t.t_t + {_DSIR_BUCKETS}.0)) )
                       AS w
            FROM raw r LEFT JOIN tgt g USING (b), tot t
        ),
        ranked AS (
            SELECT f.doc_id,
                   any_value(f.lang) AS lang,
                   CAST(COUNT(*) AS BIGINT) AS n_feats,
                   {dec_sum_sql('rt.w')} AS log_weight
            FROM feats f JOIN ratio rt USING (b)
            GROUP BY f.doc_id
        )
        SELECT r.doc_id, r.lang, u.quality_score, r.n_feats, r.log_weight
        FROM ranked r JOIN uniq u USING (doc_id)
        ORDER BY log_weight DESC, doc_id
        LIMIT {_FUNNEL_TOPK}
        """


def _register_curation_funnel() -> None:
    funnel_oracle = funnel_sql()

    @register(
        "docs_curation_funnel",
        # r11: rotated OFF the driver surface — its oracle rides
        # VERBATIM as docs_curation_refresh_delta's (the shared
        # ``funnel_oracle`` literal below), which runs the SAME batch
        # semantics through the delta-aware incremental machinery; the
        # redundant-twin rule that moved docs_exact_dedup out for this
        # row at r8. Locally pytest-oracled as always.
        driver=False,
        oracle=funnel_oracle,
    )
    def docs_curation_funnel(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The composed curation pipeline under ONE exact hash — the
        end-to-end funnel every public LLM-data recipe runs, stage
        order per CCNet/RefinedWeb practice (cheapest first):

        1. **Quality gate** — the frozen learned classifier
           (``with_quality_score``), keep ``logit >= 0``.
        2. **Exact dedup** — keep-first on the normalized-content md5
           (``docs_exact_dedup``'s rule) among the keepers.
        3. **DSIR selection** — importance-resample the survivors
           toward the target slice (``_dsir_rank``), deterministic
           top-``_FUNNEL_TOPK``.

        Every stage is individually oracled elsewhere; this row proves
        the COMPOSITION is hash-exact — the funnel's intermediate
        frames (kept/uniq) feed stage inputs whose statistics (DSIR's
        raw/target bucket models) are computed OVER THE SURVIVORS, not
        the raw corpus, which is where a subtly-wrong composition
        would diverge (selection statistics contaminated by documents
        the earlier stages removed).

        Scale shape: stage 1 is the one-pass broadcast scorer; stage 2
        one fingerprint shuffle over keepers; stage 3 the DSIR
        three-pass shape over survivors only — strictly less data at
        every stage, no stage re-reads the raw corpus after stage 1's
        gate."""
        return curation_funnel(load_table(spark, sf_dir, "documents"))

    @register(
        "docs_curation_refresh_delta",
        # r11: ON the driver surface (VERDICT r10 #3, the
        # ivm_maintained_view precedent — incremental machinery under
        # the driver's own hash check; slot from docs_curation_funnel,
        # whose oracle this row carries VERBATIM): the delta-aware
        # refresh must land a mix bit-identical to the batch funnel,
        # so the funnel's static SQL IS its exact oracle.
        oracle=funnel_oracle,
    )
    def docs_curation_refresh_delta(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The delta-aware continuous-curation refresh
        (``streaming/ingest.curation_refresh_delta_tick``) under the
        driver's hard hash signal: a SnapshotTable corpus is driven
        through three commits — a bulk load, a copy-on-write takedown,
        and a re-add-plus-backfill append — with a delta refresh tick
        after each, and the FINAL committed mix must hash-match the
        static batch-funnel SQL over the documents table.

        The static-oracle trick (the ``ivm_maintained_view`` pattern):
        every commit derives from a deterministic doc_id predicate and
        the sequence ends with exactly the full table live — load
        ``doc_id % 4 != 3``, take down ``doc_id < 50`` (a pure
        retraction: the tick must score ZERO documents — pinned below
        — while keeper handoff and the shrunken DSIR model re-rank
        exactly), then append everything not currently live (the
        ``% 4 == 3`` holdout plus the re-added takedown docs, which
        must revive through their DEAD stats rows). The hash match
        therefore proves end to end: the signed change feed, the
        carried-survivor skip, per-version (doc_id, __v) state
        serving, tombstone revival, the exact-decimal DSIR re-rank,
        and the shared-txn cursor.

        Fresh throwaway tables per call (driver and bench call queries
        repeatedly); cost is three delta-sized scoring passes plus
        three metadata re-ranks — the batch funnel's one full pass,
        paid incrementally."""
        from ..operators.snapshot import SnapshotTable
        from ..streaming.ingest import curation_refresh_delta_tick

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        corpus = SnapshotTable(spark, scratch_dir("crd_corpus_"))
        sel = SnapshotTable(spark, scratch_dir("crd_sel_"))
        state = scratch_dir("crd_state_")

        corpus.append(docs.where("doc_id % 4 != 3"), txn="b0")
        if not curation_refresh_delta_tick(spark, corpus, sel, state)[
            "fired"
        ]:
            raise RuntimeError("bootstrap refresh did not fire")
        corpus.delete_where([("doc_id", "<", 50)])
        r2 = curation_refresh_delta_tick(spark, corpus, sel, state)
        if r2["docs_scored"] != 0:
            raise RuntimeError(
                "pure retraction re-scored documents — the carried-"
                "survivor skip is broken"
            )
        corpus.append(
            docs.where("doc_id % 4 = 3 or doc_id < 50"), txn="b2"
        )
        if not curation_refresh_delta_tick(spark, corpus, sel, state)[
            "fired"
        ]:
            raise RuntimeError("final refresh did not fire")
        if curation_refresh_delta_tick(spark, corpus, sel, state)[
            "fired"
        ]:
            raise RuntimeError("caught-up tick fired — cursor broken")
        return sel.read()

    @register(
        "curation_mix_diff",
        # pytest-oracled (driver surface capped at 50): the funnel and
        # the delta refresh are both driver-hash-checked; this is the
        # AUDIT over their outputs
        driver=False,
        oracle=f"""
        WITH v1 AS ({funnel_sql(
            "(SELECT * FROM documents WHERE doc_id % 4 <> 3)"
        )}),
        v2 AS ({funnel_sql()})
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    ELSE 'kept' END AS status,
               v1.log_weight AS old_log_weight,
               v2.log_weight AS new_log_weight
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        """,
    )
    def curation_mix_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Training-mix release audit: diff the committed mix between
        two corpus versions — which documents entered, which left, and
        how the selection weight of every survivor moved. The corpus
        versions are the delta-refresh row's own pair (v1 = the
        ``doc_id % 4 != 3`` initial load, v2 = the full table), so the
        audit covers exactly the transition that row replays.

        Why survivors' weights move at all: DSIR's raw/target bucket
        models are statistics OVER THE CORPUS VERSION, so adding
        documents re-weights everyone — a mix release can change
        composition without any shared document changing bytes. That
        is precisely what a release audit must surface (and what a
        naive added/removed id-diff misses); ``status='kept'`` rows
        carry both weights so the drift is the deliverable.

        Scale shape: two funnel runs (each the audited three-stage
        shape over ITS corpus version) + one full outer join on
        doc_id over two top-k-bounded frames — the join input is
        2×topk rows regardless of corpus size."""
        docs = load_table(spark, sf_dir, "documents")
        v1 = curation_funnel(docs.where("doc_id % 4 != 3")).select(
            "doc_id", F.col("log_weight").alias("old_log_weight")
        )
        v2 = curation_funnel(docs).select(
            "doc_id", F.col("log_weight").alias("new_log_weight")
        )
        return v1.join(v2, "doc_id", "full_outer").select(
            "doc_id",
            F.when(F.col("old_log_weight").isNull(), F.lit("added"))
            .when(F.col("new_log_weight").isNull(), F.lit("removed"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            "old_log_weight",
            "new_log_weight",
        )


def exact_fingerprint(text_col: str = "text") -> Column:
    """The funnel's exact-dedup fingerprint: md5 over
    whitespace-normalized lowercased text — factored so the
    delta-aware refresh (streaming/ingest.py) fingerprints its delta
    docs with literally the same expression the batch funnel uses
    (any drift breaks its bit-identity contract)."""
    norm = F.trim(
        F.regexp_replace(F.lower(text_col), _WS + "+", " ")
    )
    return F.md5(norm.cast("binary"))


def curation_funnel(
    docs: DataFrame,
    scorer=None,
    topk: int | None = None,
) -> DataFrame:
    """The composition core behind ``docs_curation_funnel`` (its
    docstring carries the pipeline rationale): quality gate →
    exact-dedup keep-first → DSIR over SURVIVORS, deterministic
    top-``topk``. Factored out (r9, VERDICT r8 #8) so the composition
    itself — not a test-local copy — is exercisable with a pluggable
    ``scorer``: any callable ``docs -> frame`` adding
    ``quality_score`` (double) and ``is_kept`` (boolean) to the input
    columns (the ``with_quality_score`` contract, which is the
    default). The stage-interaction property this enables pinning: a
    document the gate removes must vanish from DSIR's raw/target
    bucket models, and dedup's keep-first runs among gate SURVIVORS
    (a group's lowest-id member being gated hands the group to its
    next survivor)."""
    scorer = with_quality_score if scorer is None else scorer
    kept = scorer(docs).where(F.col("is_kept"))
    from pyspark.sql.window import Window as _W

    uniq = (
        kept.withColumn("fingerprint", exact_fingerprint())
        .withColumn(
            "rn",
            F.row_number().over(
                _W.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "quality_score")
        # pin: _dsir_rank consumes this frame in three passes
        # (raw counts, target counts, scoring) — unpinned, each
        # pass would re-run the scorer + dedup window
        .localCheckpoint()
    )
    return (
        _dsir_rank(uniq.select("doc_id", "lang", "text"))
        .join(uniq.select("doc_id", "quality_score"), "doc_id")
        .select(
            "doc_id", "lang", "quality_score", "n_feats", "log_weight"
        )
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(_FUNNEL_TOPK if topk is None else topk)
    )


_register_curation_funnel()


# ---------------------------------------------------------------------------
# Range-sharded corpus export — the TeraSort architecture with a
# DETERMINISTIC sampler: the final "write the corpus as N
# range-partitioned shards" step of a training-data pipeline, where
# shard boundaries must be reproducible run-over-run (Spark's own
# repartitionByRange samples nondeterministically, so its boundaries
# shift between runs — useless for resumable/auditable exports).
# ---------------------------------------------------------------------------

_EXPORT_SHARDS = 8
_SHARD_SAMPLE_MOD = 8  # ~1/8 of docs feed the boundary sampler
_SHARD_SALT = "shardsmpl-"  # decorrelated from split/rebalance salts


@register(
    "docs_range_sharded_export",
    driver=False,
    oracle=f"""
    WITH sample AS (
        SELECT doc_id FROM documents
        WHERE {_MD5_LONG_SQL.format(
            c="concat('" + _SHARD_SALT + "', CAST(doc_id AS VARCHAR))")}
              % {_SHARD_SAMPLE_MOD} = 0
    ),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM sample
    ),
    bounds AS (
        SELECT list(doc_id ORDER BY doc_id) AS bs
        FROM ranked
        WHERE rn IN ({", ".join(
            f"({k}*n)//{_EXPORT_SHARDS}" for k in range(1, _EXPORT_SHARDS))})
    ),
    assigned AS (
        SELECT d.doc_id, d.n_chars,
               CAST(len(list_filter(b.bs, x -> x < d.doc_id)) AS BIGINT)
                   AS shard_id
        FROM documents d, bounds b
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM assigned GROUP BY shard_id
    """,
)
def docs_range_sharded_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic range sharding for corpus export: per-shard
    manifest (count, id range, byte volume) for an 8-way
    range-partitioned layout whose boundaries come from a
    hash-deterministic sample — the TeraSort sampler made
    reproducible.

    Why not repartitionByRange: its reservoir sampler draws with a
    per-run seed, so two runs of the same export produce different
    shard boundaries — an auditing/resume nightmare. Here sample
    membership is salted-md5 (the registry's one hash family), the
    boundary positions are rank-based selections floor(k·n/8) inside
    the sample (integer arithmetic, no percentile interpolation to
    diverge cross-engine), and every run — any engine, any
    parallelism — lands identical shards.

    Scale shape: the sampler output is small BY CONSTRUCTION (the
    TeraSort premise: boundary error shrinks with sample size, and a
    1/8 hash sample of ids is already far more than the ~100k rows a
    sampler needs — at real scale the mod widens so the sample stays
    bounded); only the sample passes through the single-partition
    rank window, the corpus itself sees a broadcast of 7 boundary
    values and ONE shuffle for the per-shard rollup. The disjoint
    [min_doc_id, max_doc_id] ranges in the output are the proof the
    shards really are range-partitioned."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sample = docs.where(
        md5_long(F.concat(F.lit(_SHARD_SALT), F.col("doc_id").cast("string")))
        % _SHARD_SAMPLE_MOD
        == 0
    ).select("doc_id")
    from pyspark.sql.window import Window as _W

    ranked = sample.select(
        "doc_id",
        F.row_number().over(_W.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1))
        .over(_W.partitionBy().rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing))
        .alias("n"),
    )
    picks = ", ".join(
        f"({k}*n) div {_EXPORT_SHARDS}" for k in range(1, _EXPORT_SHARDS)
    )
    bounds = (
        ranked.where(F.expr(f"rn IN ({picks})"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("bs"))
    )
    assigned = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "n_chars",
        F.expr("size(filter(bs, x -> x < doc_id))")
        .cast("long")
        .alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )


# ---------------------------------------------------------------------------
# Reproducible global training order — the dataloader-facing epoch
# shuffle: every training run needs the corpus in a pseudo-random
# order that is REPRODUCIBLE (resume mid-epoch, re-run a job, audit
# which examples step N saw) and assembled without a global sort.
# ---------------------------------------------------------------------------

_GSHUF_SHARDS = 8
_GSHUF_SALT = "gshuf-e1-"  # epoch folds into the salt: e2, e3, ...


@register(
    "docs_global_shuffle_order",
    # r11: rotated ONTO the driver surface (VERDICT r10 #4) — the
    # reproducible-training-order capability under the hard hash
    # signal; slot from doc_fingerprint_winnowing (its sel CTE rides
    # verbatim in docs_fingerprint_overlap_pairs' surviving oracle)
    oracle=f"""
    SELECT doc_id, shard_id, pos FROM (
        SELECT doc_id,
               h % {_GSHUF_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY h % {_GSHUF_SHARDS}
                   ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM (SELECT doc_id,
                     {_MD5_LONG_SQL.format(
                         c="concat('" + _GSHUF_SALT
                         + "', CAST(doc_id AS VARCHAR))")} AS h
              FROM documents)
    )
    """,
)
def docs_global_shuffle_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reproducible epoch shuffle: assign every document a
    deterministic pseudo-random position — ``(shard_id, pos)`` — for
    training-order consumption. The order key is the salted-md5 hash
    family every deterministic assignment in this registry uses (the
    salt carries the epoch, so epoch 2 is one constant away and
    decorrelated), the shard is ``h % shards``, and the position is a
    per-shard rank on ``(h, doc_id)``.

    Why not ORDER BY rand() or a global sort: rand() is
    irreproducible (resume/audit impossible — the exact failure
    repartitionByRange's sampler has, docs_range_sharded_export's
    rationale), and a single global order would funnel 100 TB through
    one sort. Hash-sharding makes the shuffle embarrassingly
    parallel: each shard ranks only its own partition (the window is
    PARTITIONED — no global window), shards are statistically equal
    by the hash, and a dataloader reading shards round-robin by
    ``pos`` consumes the same global pseudo-order every run. At
    100 TB the shard count scales with the reader fleet; the
    registered instance pins 8 and epoch 1 for the exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    h = md5_long(
        F.concat(F.lit(_GSHUF_SALT), F.col("doc_id").cast("string"))
    )
    hashed = docs.select(
        "doc_id", h.alias("h"), (h % _GSHUF_SHARDS).alias("shard_id")
    )
    return (
        hashed.withColumn(
            "pos",
            F.row_number()
            .over(_W.partitionBy("shard_id").orderBy("h", "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "shard_id", "pos")
    )


#: curriculum band cutoffs on the frozen classifier's rounded score:
#: band 0 = confident keeps, band 1 = marginal keeps (logit just past
#: 0 ⇔ score ≥ 0.5), band 2 = rejects and unscorable (zero-gram docs
#: score NULL and fall through both predicates in BOTH engines)
_CURR_HI = 0.55
_CURR_LO = 0.5
_CURR_SALT = "curr-e1-"  # decorrelated from the plain epoch shuffle


def _register_curriculum_order() -> None:
    from .quality_weights import BIAS

    @register(
        "docs_curriculum_order",
        # pytest-oracled (driver surface capped at 50): the staged-
        # training composition of two driver-checked capabilities
        driver=False,
        oracle=f"""
        WITH qfeats AS (
            SELECT doc_id, {_MD5_LONG_SQL.format(c='g')} % {_QC_BUCKETS} AS b
            FROM (
                SELECT doc_id, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM documents)
            )
        ),
        w(b, wt) AS (VALUES {_qc_weights_values_sql()}),
        pooled AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   {dec_sum_sql('w.wt')} AS s
            FROM qfeats f JOIN w ON w.b = f.b
            GROUP BY f.doc_id
        ),
        scored AS (
            SELECT d.doc_id,
                   ROUND(1.0 / (1.0 + exp(-({BIAS!r} + p.s / p.n_grams))),
                         6) AS quality_score
            FROM documents d LEFT JOIN pooled p USING (doc_id)
        ),
        banded AS (
            SELECT doc_id,
                   CAST(CASE WHEN quality_score >= {_CURR_HI} THEN 0
                             WHEN quality_score >= {_CURR_LO} THEN 1
                             ELSE 2 END AS BIGINT) AS band,
                   h, h % {_GSHUF_SHARDS} AS shard_id
            FROM (SELECT doc_id, quality_score,
                         {_MD5_LONG_SQL.format(
                             c="concat('" + _CURR_SALT
                             + "', CAST(doc_id AS VARCHAR))")} AS h
                  FROM scored)
        )
        SELECT doc_id, band, shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY band, shard_id
                   ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM banded
        """,
    )
    def docs_curriculum_order(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Curriculum training order: the epoch shuffle staged by the
        frozen quality classifier — every document gets
        ``(band, shard_id, pos)`` where band 0 is confident-keep
        content, band 1 marginal keeps, band 2 rejects/unscorable
        (zero-gram docs score NULL and land here in both engines by
        the same fell-through CASE), and within each band the order
        is the salted-hash pseudo-shuffle (fresh salt, so curriculum
        order is decorrelated from the plain epoch order). A
        dataloader consumes band 0's shards round-robin by ``pos``,
        then band 1, then (optionally) band 2 — the
        easy/clean-examples-first schedule public curricula use,
        reproducible and resumable like ``docs_global_shuffle_order``.

        Shape at scale: the scoring stage is the quality classifier's
        (one gram pass, 256-row broadcast, one per-doc aggregate);
        banding is a map; the rank window partitions by
        (band, shard) — finer than the plain shuffle's, still never
        global. Banding by the ROUNDED score keeps the band decision
        bit-identical across engines (both compare the same 6 dp
        double)."""
        docs = load_table(spark, sf_dir, "documents")
        from pyspark.sql.window import Window as _W

        scored = with_quality_score(docs)
        h = md5_long(
            F.concat(F.lit(_CURR_SALT), F.col("doc_id").cast("string"))
        )
        banded = scored.select(
            "doc_id",
            F.when(F.col("quality_score") >= _CURR_HI, F.lit(0))
            .when(F.col("quality_score") >= _CURR_LO, F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("band"),
            h.alias("h"),
            (h % _GSHUF_SHARDS).alias("shard_id"),
        )
        return (
            banded.withColumn(
                "pos",
                F.row_number()
                .over(
                    _W.partitionBy("band", "shard_id").orderBy(
                        "h", "doc_id"
                    )
                )
                .cast("long"),
            )
            .select("doc_id", "band", "shard_id", "pos")
        )


_register_curriculum_order()


@register(
    "docs_shuffled_packing",
    # pytest-oracled (driver surface capped at 50): the composition of
    # two driver-checked halves — VERDICT r10 #5
    driver=False,
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, h,
               h % {_GSHUF_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY h % {_GSHUF_SHARDS}
                   ORDER BY h, doc_id) AS BIGINT) AS pos,
               n_tokens
        FROM (SELECT doc_id,
                     {_MD5_LONG_SQL.format(
                         c="concat('" + _GSHUF_SALT
                         + "', CAST(doc_id AS VARCHAR))")} AS h,
                     CAST(len(regexp_extract_all(lower(text),
                          '{TOKEN_RE}')) AS BIGINT) AS n_tokens
              FROM documents)
    ),
    packed AS (
        SELECT doc_id, shard_id, pos, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM hashed WHERE n_tokens > 0
    )
    SELECT doc_id, shard_id, pos, n_tokens,
           CAST(cum_before // {_PACK_LEN} AS BIGINT) AS seq_id,
           CAST(cum_before % {_PACK_LEN} AS BIGINT) AS seq_offset
    FROM packed
    """,
)
def docs_shuffled_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataloader composition (VERDICT r10 #5):
    ``docs_global_shuffle_order``'s reproducible epoch order FEEDING
    ``docs_pack_sequences``' concat-then-chunk packing — documents
    pack into fixed _PACK_LEN-token sequences in the SHUFFLED order,
    so step N of a training run reads sequence N of a deterministic,
    epoch-salted, resumable layout. The two halves agree on one key
    family by construction: the packing shard IS the shuffle shard
    (``h % shards``) and the packing order IS the shuffle position
    (the per-shard ``(h, doc_id)`` rank) — ``pos`` in this output is
    bit-equal to ``docs_global_shuffle_order``'s for every document
    (additionally pinned as a set-equality in tests), and
    ``(seq_id, seq_offset)`` follow ``docs_pack_sequences``' placement
    rule over that order.

    Shape at scale: identical to its halves — one hash projection, two
    windows over the SAME shard partitioning (Catalyst reuses the
    exchange: one shuffle total, plan-pinned in
    test_scale_patterns.py), no global sort anywhere. Zero-token
    documents hold a shuffle position but pack nothing, exactly like
    the standalone packer's ``n_tokens > 0`` gate."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    h = md5_long(
        F.concat(F.lit(_GSHUF_SALT), F.col("doc_id").cast("string"))
    )
    hashed = docs.select(
        "doc_id",
        h.alias("h"),
        (h % _GSHUF_SHARDS).alias("shard_id"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "pos",
        F.row_number()
        .over(_W.partitionBy("shard_id").orderBy("h", "doc_id"))
        .cast("long"),
    )
    w = (
        _W.partitionBy("shard_id")
        .orderBy("pos")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        hashed.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "shard_id",
            "pos",
            "n_tokens",
            cum.alias("__cum"),
        )
        .select(
            "doc_id",
            "shard_id",
            "pos",
            "n_tokens",
            F.expr(f"__cum div {_PACK_LEN}").alias("seq_id"),
            (F.col("__cum") % _PACK_LEN).alias("seq_offset"),
        )
    )


# ---------------------------------------------------------------------------
# Text-level PII scrubbing — the corpus-release step (C4/Dolma practice:
# mask emails / IPs / phone numbers in the text itself before
# publication; the structured-column twin lives in functions/redaction).
# ---------------------------------------------------------------------------

#: shared Spark/DuckDB regexes — RE2 ∩ Java syntax only (ASCII classes,
#: (?i), \b, bounded repeats; no lookaround, no \p classes)
_PII_EMAIL = r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[- .]\d{3}[- .]\d{4}\b"


@register(
    "docs_pii_scrub",
    # r7: promoted to the driver surface — byte-exact cross-engine
    # PII scrub under the hash check (slot from events_funnel tier)
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(
               regexp_replace(
                   regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed_text
    FROM documents
    """,
)
def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-level PII scrubbing for corpus release (the C4/Dolma
    masking pass): emails, dotted-quad IPs, and NNN-NNN-NNNN phone
    shapes replaced with typed placeholder tokens, per-document match
    counts kept for the release audit. Counts are taken at each stage
    of the SEQUENTIAL replacement (email → IP → phone) so a pattern
    can never double-count text an earlier stage already masked — and
    the stage order is part of the contract (an IP's digits could
    otherwise feed the phone pattern).

    Map-only: three regexp_replace passes over the text column, no
    shuffle at all — at 100 TB this is a pure scan-bandwidth pass.
    Regexes stay inside the RE2 ∩ Java subset (ASCII classes, (?i),
    bounded repeats, no lookaround) so the DuckDB oracle replays them
    byte-for-byte; the synthetic corpus contains no PII (all counts 0
    — itself a fact worth pinning for a release gate), so the planted
    -corpus pytest drives the positive paths against the same oracle."""
    docs = load_table(spark, sf_dir, "documents")
    after_email = F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, _PII_IP, "<IP>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(_PII_IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(after_ip, _PII_PHONE, "<PHONE>").alias(
            "scrubbed_text"
        ),
    )


# ---------------------------------------------------------------------------
# Temperature-sampled language mix — the data-DEPENDENT sibling of
# docs_rebalance_sample: instead of a hand-written rate table, per-
# language keep rates are computed from the corpus's own language
# counts with alpha-power temperature scaling (the multilingual-
# pretraining move: sampling probability proportional to n_l^alpha,
# alpha < 1, flattens the head language and up-weights the tail;
# Conneau et al. 2020 §3.1 use alpha = 0.3-0.7).
# ---------------------------------------------------------------------------

#: total document budget the temperature mix targets (a training-run
#: config, like _TOKEN_BUDGET); alpha is fixed at 0.5 — sqrt is the
#: one power both engines evaluate IEEE-correctly-rounded, so the one
#: float step in the rate computation is bit-identical cross-engine
_TEMP_BUDGET = 300
_TEMP_SALT = "tmix:"


@register(
    "docs_temperature_mix",
    # pytest-oracled (driver surface capped at 50): sampling is
    # pipeline infrastructure, like docs_rebalance_sample
    driver=False,
    oracle=f"""
    WITH counts AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(FLOOR(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS s6
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(s6) AS BIGINT) AS t6 FROM counts),
    rates AS (
        SELECT lang,
               CAST(LEAST(
                   1000000,
                   (1000000 * (({_TEMP_BUDGET} * s6) // t6)) // n_docs
               ) AS BIGINT) AS pct_ppm
        FROM counts, tot
    )
    SELECT d.doc_id, d.lang, r.pct_ppm
    FROM documents d JOIN rates r USING (lang)
    WHERE {_MD5_LONG_SQL.format(c=f"concat('{_TEMP_SALT}', doc_id)")}
          % 1000000 < r.pct_ppm
    """,
)
def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled language rebalancing: per-language keep
    rates are COMPUTED from the corpus (rate_l ∝ sqrt(n_l), scaled to
    a _TEMP_BUDGET-document target and capped at 100%), then each
    document keeps or drops by the salted-hash rule — so the head
    language is downsampled toward the tail exactly as multilingual
    pretraining mixes do, and the mix re-derives itself as the corpus
    grows instead of trusting a stale hand-written table
    (docs_rebalance_sample is that static twin).

    Cross-engine determinism: the ONE float step is sqrt (IEEE
    exact-rounded in both engines) followed by floor into a BIGINT
    millionths grid; everything after — the budget split, the ppm
    threshold, the hash compare — is integer arithmetic, so the
    keep/drop frontier cannot sit on a float rounding edge.

    Shape at scale: a lang-only column-pruned scan feeds the
    map-side-combined groupBy (|langs| rows out), a one-row total is
    broadcast-crossed onto it, and the rate table is broadcast back
    onto the corpus — two pruned scans total, no corpus shuffle, no
    corpus-sized join side."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    counts = counts.withColumn(
        "s6",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000.0).cast(
            "long"
        ),
    )
    total = counts.agg(F.sum("s6").alias("t6"))
    rates = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "target_docs", F.expr(f"({_TEMP_BUDGET} * s6) div t6")
        )
        .select(
            "lang",
            F.least(
                F.lit(1000000).cast("long"),
                F.expr("(1000000 * target_docs) div n_docs"),
            ).alias("pct_ppm"),
        )
    )
    h = md5_long(F.concat(F.lit(_TEMP_SALT), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(rates), "lang")
        .where((h % 1000000) < F.col("pct_ppm"))
        .select("doc_id", "lang", "pct_ppm")
    )


# ---------------------------------------------------------------------------
# Multi-epoch replay mix — materialized sampling WITH replacement:
# per-language replay factors (epochs) expand each document into
# floor(f) copies plus a hash-decided fractional copy, and every copy
# gets its own position in the epoch-shuffle order. This is the
# "2 epochs of the rare language, a quarter epoch of the web crawl"
# schedule training mixes publish, materialized as a deterministic
# dataloader table.
# ---------------------------------------------------------------------------

#: per-language replay factors in parts-per-million (1e6 = one epoch);
#: absent languages run exactly one epoch
_REPLAY_PPM = {"en": 250000, "fr": 2500000}
_REPLAY_DEFAULT_PPM = 1000000
_REPLAY_SALT = "replay:"
_REPLAY_ORD_SALT = "replayord:"


@register(
    "docs_epoch_replay_mix",
    # pytest-oracled (driver surface capped at 50): the with-
    # replacement sibling of the keep/drop samplers
    driver=False,
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang,
               CASE lang
                   WHEN 'en' THEN {_REPLAY_PPM['en']}
                   WHEN 'fr' THEN {_REPLAY_PPM['fr']}
                   ELSE {_REPLAY_DEFAULT_PPM} END AS f_ppm,
               {_MD5_LONG_SQL.format(
                   c=f"concat('{_REPLAY_SALT}', doc_id)")} AS h
        FROM documents
    ),
    copies AS (
        SELECT doc_id, lang,
               CAST(f_ppm // 1000000
                    + CASE WHEN h % 1000000 < f_ppm % 1000000
                           THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM base
    ),
    reps AS (
        SELECT doc_id, lang,
               CAST(unnest(generate_series(1, n_copies)) AS BIGINT)
                   AS replica
        FROM copies WHERE n_copies >= 1
    ),
    ordered AS (
        SELECT doc_id, lang, replica,
               {_MD5_LONG_SQL.format(
                   c=f"concat('{_REPLAY_ORD_SALT}', replica, ':', doc_id)"
               )} AS h2
        FROM reps
    )
    SELECT doc_id, lang, replica,
           CAST(h2 % {_GSHUF_SHARDS} AS BIGINT) AS shard_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY h2 % {_GSHUF_SHARDS}
               ORDER BY h2, doc_id, replica) AS BIGINT) AS pos
    FROM ordered
    """,
)
def docs_epoch_replay_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-factor training mix (sampling WITH replacement,
    materialized): each document appears ``floor(f_lang)`` times plus
    one more copy iff its salted hash lands under the fractional part
    — so a 2.5-epoch language repeats every document twice and half
    the documents (a deterministic, hash-chosen half) a third time,
    and a 0.25-epoch language keeps a quarter of its documents once.
    Every copy then takes its own slot in the epoch-shuffle order
    (fresh per-replica salt, so a document's copies scatter instead
    of clustering back-to-back — the reason naive concat-the-corpus-
    twice schedules are avoided).

    Shape at scale: the copy decision is map-only (the factor table
    rides the closure); materialization is an explode whose fan-out
    is the replay factor (bounded, config-chosen); the order rank is
    the shuffle family's PARTITIONED per-shard window. No corpus
    join, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    f_ppm = F.lit(_REPLAY_DEFAULT_PPM)
    for lang, ppm in _REPLAY_PPM.items():
        f_ppm = F.when(F.col("lang") == lang, ppm).otherwise(f_ppm)
    h = md5_long(
        F.concat(F.lit(_REPLAY_SALT), F.col("doc_id").cast("string"))
    )
    copies = docs.select(
        "doc_id",
        "lang",
        f_ppm.cast("long").alias("f_ppm"),
        h.alias("h"),
    ).select(
        "doc_id",
        "lang",
        (
            F.expr("f_ppm div 1000000")
            + F.when((F.col("h") % 1000000) < (F.col("f_ppm") % 1000000), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_copies"),
    )
    reps = copies.where(F.col("n_copies") >= 1).select(
        "doc_id",
        "lang",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
        ).alias("replica"),
    )
    h2 = md5_long(
        F.concat(
            F.lit(_REPLAY_ORD_SALT),
            F.col("replica").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    return (
        reps.withColumn("h2", h2)
        .withColumn("shard_id", (F.col("h2") % _GSHUF_SHARDS).cast("long"))
        .withColumn(
            "pos",
            F.row_number()
            .over(
                _W.partitionBy("shard_id").orderBy(
                    "h2", "doc_id", "replica"
                )
            )
            .cast("long"),
        )
        .select("doc_id", "lang", "replica", "shard_id", "pos")
    )


# ---------------------------------------------------------------------------
# Packed-sequence document spans — the loss-mask / attention-reset
# metadata a dataloader needs on top of docs_pack_sequences' placement:
# for every (sequence, document) overlap, the token span the document
# occupies inside that sequence. Cross-document attention masking and
# per-document loss weighting both consume exactly this table.
# ---------------------------------------------------------------------------


@register(
    "docs_packed_doc_spans",
    # pytest-oracled (driver surface capped at 50): the span expansion
    # of docs_pack_sequences' placement rule
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               {_MD5_LONG_SQL.format(c='doc_id')} % {_PACK_SHARDS} AS shard,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                   AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, shard, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM toks WHERE n_tokens > 0
    ),
    spans AS (
        SELECT doc_id, shard, n_tokens, cum_before,
               unnest(generate_series(
                   cum_before // {_PACK_LEN},
                   (cum_before + n_tokens - 1) // {_PACK_LEN}
               )) AS s
        FROM packed
    )
    SELECT doc_id, shard,
           CAST(s AS BIGINT) AS seq_id,
           CAST(GREATEST(0, cum_before - s * {_PACK_LEN}) AS BIGINT)
               AS start_tok,
           CAST(LEAST({_PACK_LEN}, cum_before + n_tokens - s * {_PACK_LEN})
               AS BIGINT) AS end_tok
    FROM spans
    """,
)
def docs_packed_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(sequence, document) token spans under docs_pack_sequences'
    concat-then-chunk placement: document d occupying global tokens
    [c, c+n) of its shard's stream appears in sequences
    c div L .. (c+n-1) div L, holding [start_tok, end_tok) inside
    each (end exclusive; interior sequences of a long document span
    the full [0, L)). A trainer uses these rows directly as the
    attention-reset boundaries (no cross-document attention) and the
    loss-mask offsets (e.g. zero-weight a document's first k tokens).

    Shape at scale: the packing computation itself (hash shards, one
    PARTITIONED running-sum window per shard) plus a per-row explode
    whose fan-out is ceil(n_tokens / L) — output rows ≈ corpus tokens
    / L + documents, i.e. linear in the data with no join and no
    global sort. The span arithmetic is all BIGINT, so the oracle
    replays bit-exactly."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    md5l = md5_long(F.col("doc_id"))
    toks = docs.select(
        "doc_id",
        (md5l % _PACK_SHARDS).alias("shard"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        _W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    packed = toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    spans = packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "cum_before",
        F.explode(
            F.sequence(
                F.expr(f"cum_before div {_PACK_LEN}"),
                F.expr(f"(cum_before + n_tokens - 1) div {_PACK_LEN}"),
            )
        ).alias("s"),
    )
    return spans.select(
        "doc_id",
        "shard",
        F.col("s").cast("long").alias("seq_id"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("cum_before") - F.col("s") * _PACK_LEN,
        ).alias("start_tok"),
        F.least(
            F.lit(_PACK_LEN).cast("long"),
            F.col("cum_before") + F.col("n_tokens") - F.col("s") * _PACK_LEN,
        ).alias("end_tok"),
    )


# ---------------------------------------------------------------------------
# Heuristic filter bank — the published rule-based quality gates
# (Gopher / C4 style) as one audited pass. doc_quality_scores is the
# soft SCORE; this is the hard RULE BANK a pretraining pipeline runs
# first: each rule is a named flag so the funnel can report per-rule
# kill counts, and `keep` is their conjunction. Every rule is
# integer-exact (ratio thresholds are cross-multiplied onto BIGINT,
# never computed as floats), so the keep frontier cannot sit on a
# rounding edge and the DuckDB oracle is bit-safe by construction.
# At 100 TB this is one map-only pass inside whole-stage codegen —
# no shuffle, no Python, prunable to (doc_id, text).
# ---------------------------------------------------------------------------

#: Gopher's stop-list (Rae et al. 2021 §A1.1): a doc must contain at
#: least _GOPHER_MIN_STOP of these to pass the stop-word rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_GOPHER_MIN_STOP = 2

_BULLET_RE = r"^[ \t]*[-*•]"  # line starts with a bullet marker
_ELLIPSIS_END_RE = r"\.\.\.$"  # line trails off with an ellipsis


@register(
    "docs_heuristic_filter_bank",
    # pytest-oracled (driver surface capped at 50): the rule bank is
    # upstream of doc_quality_scores' driver-checked soft score
    driver=False,
    oracle=f"""
    SELECT doc_id, n_words,
           CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS ok_word_count,
           CAST(n_words > 0 AND 3 * n_words <= sum_len
                AND sum_len <= 10 * n_words AS BIGINT) AS ok_mean_word_len,
           CAST(10 * n_sym <= n_words AS BIGINT) AS ok_symbol_ratio,
           CAST(10 * n_bullet <= 9 * n_lines AS BIGINT) AS ok_bullet_lines,
           CAST(10 * n_ellipsis <= 3 * n_lines AS BIGINT) AS ok_ellipsis_lines,
           CAST(n_words > 0 AND 5 * n_alpha >= 4 * n_words AS BIGINT)
               AS ok_alpha_words,
           CAST(n_stop >= {_GOPHER_MIN_STOP} AS BIGINT) AS ok_stopwords,
           CAST(n_words BETWEEN 50 AND 100000
                AND n_words > 0 AND 3 * n_words <= sum_len
                AND sum_len <= 10 * n_words
                AND 10 * n_sym <= n_words
                AND 10 * n_bullet <= 9 * n_lines
                AND 10 * n_ellipsis <= 3 * n_lines
                AND 5 * n_alpha >= 4 * n_words
                AND n_stop >= {_GOPHER_MIN_STOP} AS BIGINT) AS keep
    FROM (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                    AS BIGINT) AS sum_len,
               CAST(length(text) - length(replace(text, '#', ''))
                    + len(regexp_extract_all(text, '\\.\\.\\.'))
                    AS BIGINT) AS n_sym,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines,
                        l -> regexp_matches(l, '{_BULLET_RE}')))
                    AS BIGINT) AS n_bullet,
               CAST(len(list_filter(lines,
                        l -> regexp_matches(l, '{_ELLIPSIS_END_RE}')))
                    AS BIGINT) AS n_ellipsis,
               CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                    AS BIGINT) AS n_alpha,
               CAST(len(list_filter(list_distinct(toks),
                        t -> t IN ({", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)})))
                    AS BIGINT) AS n_stop
        FROM (SELECT doc_id, text,
                     regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
                     string_split(text, chr(10)) AS lines
              FROM documents)
    )
    """,
)
def docs_heuristic_filter_bank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rule-based pretraining quality gates (the Gopher filter bank):
    word-count window, mean-word-length window, symbol-to-word ratio,
    bullet-line and ellipsis-line fractions, alphabetic-word fraction,
    and minimum stop-word presence — each surfaced as its own 0/1
    flag plus the conjunctive ``keep``.

    Reference parity: the reference pipeline's only quality gate is
    the empty-text reject (exo_2.py's dropna); this is the rule bank
    a corpus pipeline runs at scale. All thresholds are the published
    Gopher values; every fraction test is cross-multiplied onto
    integers (``10*n_sym <= n_words`` instead of ``n_sym/n_words <=
    0.1``) so the decision is exact on both engines."""
    return filter_bank_flags(load_table(spark, sf_dir, "documents"))


def filter_bank_flags(
    docs: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """The Gopher rule bank over an arbitrary docs frame — factored
    (r12) so the corpus-release capstone applies the bank INLINE over
    its input (map-only, no self-join back to the corpus); ``carry``
    propagates extra input columns (e.g. lang/text for downstream
    funnel stages) through the flags projection."""
    toks = tokens("text")
    lines = F.split(F.col("text"), "\n", -1)
    base = docs.select(
        "doc_id",
        *carry,
        F.size(toks).cast("long").alias("n_words"),
        F.coalesce(
            F.aggregate(
                F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_len"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
            + F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), 0))
        )
        .cast("long")
        .alias("n_sym"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE)))
        .cast("long")
        .alias("n_bullet"),
        F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE)))
        .cast("long")
        .alias("n_ellipsis"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha"),
        F.size(
            F.filter(
                F.array_distinct(toks),
                lambda t: t.isin(GOPHER_STOPWORDS),
            )
        )
        .cast("long")
        .alias("n_stop"),
    )
    c = F.col
    rules = {
        "ok_word_count": c("n_words").between(50, 100000),
        "ok_mean_word_len": (c("n_words") > 0)
        & (3 * c("n_words") <= c("sum_len"))
        & (c("sum_len") <= 10 * c("n_words")),
        "ok_symbol_ratio": 10 * c("n_sym") <= c("n_words"),
        "ok_bullet_lines": 10 * c("n_bullet") <= 9 * c("n_lines"),
        "ok_ellipsis_lines": 10 * c("n_ellipsis") <= 3 * c("n_lines"),
        "ok_alpha_words": (c("n_words") > 0)
        & (5 * c("n_alpha") >= 4 * c("n_words")),
        "ok_stopwords": c("n_stop") >= _GOPHER_MIN_STOP,
    }
    out = base.select(
        "doc_id",
        *carry,
        "n_words",
        *[v.cast("long").alias(k) for k, v in rules.items()],
    )
    keep = None
    for k in rules:
        keep = c(k) == 1 if keep is None else keep & (c(k) == 1)
    return out.withColumn("keep", keep.cast("long"))


# ---------------------------------------------------------------------------
# Intra-document line/paragraph dedup-rewrite (the CCNet / RefinedWeb
# "remove duplicated lines" normalization step): a line is a duplicate
# if an identical normalized, non-empty line appeared EARLIER in the
# same document; the cleaned document is the kept lines re-joined in
# order. The result carries md5(clean_text) so the oracle checks the
# actual rewritten bytes without shipping text through the hash
# harness. docs_repetition_stats is the MEASURE (bigram repetition
# ratios); this is the REWRITE.
# ---------------------------------------------------------------------------


@register(
    "docs_paragraph_dedup",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle="""
    WITH lines AS (
        SELECT doc_id, i AS idx, ls[i] AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM documents),
             UNNEST(range(1, len(ls) + 1)) AS r(i)
    ),
    marked AS (
        SELECT doc_id, idx, line,
               CASE WHEN trim(lower(line)) = '' THEN 0
                    WHEN idx > MIN(idx) OVER (
                        PARTITION BY doc_id, trim(lower(line))) THEN 1
                    ELSE 0 END AS is_dup
        FROM lines
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_lines,
           md5(coalesce(string_agg(CASE WHEN is_dup = 0 THEN line END,
                                   chr(10) ORDER BY idx), '')) AS clean_md5
    FROM marked
    GROUP BY doc_id
    """,
)
def docs_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-line removal (keep-first, normalized
    match), returning per-document counts plus ``md5`` of the
    reconstructed clean text — the rewrite itself is what's checked.

    Shape at scale: posexplode is map-only; the first-occurrence mark
    is ONE window keyed ``(doc_id, normalized_line)`` (doc-local keys,
    so the shuffle is uniformly spread — no global hot key is possible
    by construction); the rebuild is one ``doc_id``-keyed aggregation
    whose collect is ordered by ``sort_array`` over ``(idx, line)``
    structs, never by partition arrival order."""
    from pyspark.sql.window import Window as _W

    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias("idx0", "line"),
    ).select("doc_id", (F.col("idx0") + 1).alias("idx"), "line")
    norm = F.trim(F.lower(F.col("line")))
    marked = lines.withColumn(
        "is_dup",
        F.when(norm == "", F.lit(0))
        .when(
            F.col("idx")
            > F.min("idx").over(_W.partitionBy("doc_id", norm)),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    kept = F.filter(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("is_dup") == 0, F.struct("idx", "line")
                )
            )
        ),
        lambda s: s.isNotNull(),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("is_dup").cast("long").alias("n_dup_lines"),
        F.md5(
            F.array_join(F.transform(kept, lambda s: s["line"]), "\n")
        ).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# Mid-epoch dataloader resume — the consumer-side contract of
# docs_global_shuffle_order: a training job that died G global steps
# into the epoch restarts by recomputing the SAME epoch order and
# dropping exactly the consumed prefix. Round-robin-by-pos consumption
# means after G steps shard s has consumed floor(G/S) + (s < G mod S)
# items — pure arithmetic on the checkpoint, no consumed-id log needed
# anywhere (THE point of a deterministic shuffle: the checkpoint is
# one integer, not a 100 TB bitmap of seen doc_ids).
# ---------------------------------------------------------------------------

_GSHUF_RESUME_STEP = 100  # the pinned checkpoint (global steps consumed)


@register(
    "docs_shuffle_resume",
    # pytest-oracled (driver surface capped at 50): the epoch order
    # itself is driver-hash-checked; this is its resume arithmetic
    driver=False,
    oracle=f"""
    SELECT doc_id, shard_id, pos FROM (
        SELECT doc_id,
               h % {_GSHUF_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY h % {_GSHUF_SHARDS}
                   ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM (SELECT doc_id,
                     {_MD5_LONG_SQL.format(
                         c="concat('" + _GSHUF_SALT
                         + "', CAST(doc_id AS VARCHAR))")} AS h
              FROM documents)
    )
    WHERE pos > {_GSHUF_RESUME_STEP} // {_GSHUF_SHARDS}
              + CASE WHEN shard_id < {_GSHUF_RESUME_STEP % _GSHUF_SHARDS}
                     THEN 1 ELSE 0 END
    """,
)
def docs_shuffle_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume the reproducible epoch shuffle mid-epoch: recompute
    ``docs_global_shuffle_order`` and keep only the NOT-yet-consumed
    suffix implied by a global-step checkpoint (pinned at
    ``_GSHUF_RESUME_STEP`` for the exact oracle; the expression is the
    round-robin consumption count per shard).

    Scale shape: identical to the epoch shuffle (one hash projection +
    one partitioned rank window) plus a map-only filter — the filter
    cannot push below the rank window (pos IS the window's output),
    but it prunes before anything downstream, so a resumed job never
    re-materializes consumed work. The suffix is bit-equal to the full
    order's suffix by construction — both derive from the same salted
    hash — which is the property that makes one integer a sufficient
    checkpoint."""
    full = docs_global_shuffle_order(spark, sf_dir)
    consumed = _GSHUF_RESUME_STEP // _GSHUF_SHARDS
    extra = _GSHUF_RESUME_STEP % _GSHUF_SHARDS
    return full.where(
        F.col("pos")
        > consumed
        + F.when(F.col("shard_id") < extra, 1).otherwise(0)
    )


# ---------------------------------------------------------------------------
# Packing-efficiency audit — the number that decides between the two
# packing regimes: concat-then-chunk wastes only the per-shard tail
# (but lets documents straddle sequence boundaries), no-straddle
# next-fit wastes the per-sequence remainder its placement rule
# refuses to fill. Per (packer, shard): sequences, wasted tokens, and
# utilization on an exact ppm grid — all integer arithmetic, so the
# comparison is bit-safe and the trade-off is a table, not an adjective.
# ---------------------------------------------------------------------------


@register(
    "docs_packing_efficiency",
    # pytest-oracled (driver surface capped at 50): the audit over two
    # pytest-oracled packers
    driver=False,
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               {_MD5_LONG_SQL.format(c='doc_id')} % {_PACK_SHARDS}
                   AS shard,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                   AS BIGINT) AS n_tokens,
               ROW_NUMBER() OVER (
                   PARTITION BY {_MD5_LONG_SQL.format(c='doc_id')}
                       % {_PACK_SHARDS}
                   ORDER BY doc_id) AS rn
        FROM documents
        WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) > 0
    ),
    pack(shard, rn, doc_id, n_tokens, seq_id, seq_offset, fill) AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN 0 ELSE p.fill END,
               CASE WHEN p.fill + t.n_tokens > {_PACK_LEN}
                    THEN t.n_tokens ELSE p.fill + t.n_tokens END
        FROM pack p JOIN toks t
             ON t.shard = p.shard AND t.rn = p.rn + 1
    ),
    concat_side AS (
        SELECT 'concat_chunk' AS packer, shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST((SUM(n_tokens) + {_PACK_LEN} - 1) // {_PACK_LEN}
                   AS BIGINT) AS n_seqs,
               CAST(((SUM(n_tokens) + {_PACK_LEN} - 1) // {_PACK_LEN})
                    * {_PACK_LEN} - SUM(n_tokens) AS BIGINT)
                   AS wasted_tokens
        FROM toks GROUP BY shard
    ),
    ns_seqs AS (
        SELECT shard, seq_id,
               MAX(seq_offset + n_tokens) AS fill,
               COUNT(*) AS n_docs_seq,
               SUM(n_tokens) AS seq_tokens
        FROM pack GROUP BY shard, seq_id
    ),
    ns_side AS (
        SELECT 'no_straddle' AS packer, shard,
               CAST(SUM(n_docs_seq) AS BIGINT) AS n_docs,
               CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_seqs,
               CAST(SUM(GREATEST(0, {_PACK_LEN} - fill)) AS BIGINT)
                   AS wasted_tokens
        FROM ns_seqs GROUP BY shard
    ),
    both_sides AS (
        SELECT * FROM concat_side UNION ALL SELECT * FROM ns_side
    )
    SELECT packer, shard, n_docs, total_tokens, n_seqs, wasted_tokens,
           CAST(1000000 * (n_seqs * {_PACK_LEN} - wasted_tokens)
                // (n_seqs * {_PACK_LEN}) AS BIGINT) AS util_ppm
    FROM both_sides
    """,
)
def docs_packing_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(packer, shard) packing waste: sequences produced, tokens
    wasted (concat-then-chunk: the shard's tail remainder; no-straddle:
    each sequence's unfilled remainder, clipped at zero for oversize
    lone documents), and utilization in exact ppm. The two packers'
    placement rules are individually hash-checked; this is the
    capacity-planning audit a dataloader team reads to pick one.

    Scale shape: the concat side needs only per-shard token SUMS (one
    map-combined aggregation — no placement materialization at all);
    the no-straddle side aggregates its packer's placements per
    (shard, seq_id) then per shard. No joins, no global sort; output
    is 2 × shards rows regardless of corpus size."""
    pseq_src = docs_pack_sequences(spark, sf_dir)
    cap = F.lit(_PACK_LEN).cast("long")
    concat_side = (
        pseq_src.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            F.lit("concat_chunk").alias("packer"),
            "shard",
            "n_docs",
            "total_tokens",
            F.expr(f"(total_tokens + {_PACK_LEN} - 1) div {_PACK_LEN}")
            .cast("long")
            .alias("n_seqs"),
        )
        .withColumn(
            "wasted_tokens",
            (F.col("n_seqs") * cap - F.col("total_tokens")).cast("long"),
        )
    )
    ns = docs_pack_nostraddle(spark, sf_dir)
    ns_seqs = ns.groupBy("shard", "seq_id").agg(
        F.max(F.col("seq_offset") + F.col("n_tokens")).alias("fill"),
        F.count("*").alias("n_docs_seq"),
        F.sum("n_tokens").alias("seq_tokens"),
    )
    ns_side = (
        ns_seqs.groupBy("shard")
        .agg(
            F.sum("n_docs_seq").cast("long").alias("n_docs"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
            F.count("*").cast("long").alias("n_seqs"),
            F.sum(F.greatest(F.lit(0).cast("long"), cap - F.col("fill")))
            .cast("long")
            .alias("wasted_tokens"),
        )
        .select(
            F.lit("no_straddle").alias("packer"),
            "shard",
            "n_docs",
            "total_tokens",
            "n_seqs",
            "wasted_tokens",
        )
    )
    both = concat_side.unionByName(ns_side)
    return both.withColumn(
        "util_ppm",
        F.expr(
            f"(1000000 * (n_seqs * {_PACK_LEN} - wasted_tokens))"
            f" div (n_seqs * {_PACK_LEN})"
        ).cast("long"),
    )


# ---------------------------------------------------------------------------
# Quality-proportional sampled mix — soft quality filtering: instead
# of the hard logit >= 0 gate, keep each document with probability
# equal to its classifier score (the FineWeb-style "sample by quality"
# recipe), derandomized onto the salted-md5 family: keep iff
# hash(doc) mod 1e6 < round(score * 1e6). A marginal doc (score 0.5)
# survives with ~half its mass instead of a cliff at the threshold,
# and the decision replays exactly on both engines (the score is
# frozen-classifier-deterministic at 6 dp, the ppm grid is integer).
# ---------------------------------------------------------------------------

_QSAMP_SALT = "qsamp-e1-"  # epoch folds into the salt


def _register_quality_sampled_mix() -> None:
    from .quality_weights import BIAS

    h_ppm = (
        _MD5_LONG_SQL.format(
            c="concat('" + _QSAMP_SALT + "', CAST(doc_id AS VARCHAR))"
        )
        + " % 1000000"
    )

    @register(
        "docs_quality_sampled_mix",
        # pytest-oracled (driver surface capped at 50): the soft twin
        # of the driver-checked hard-gate docs_quality_classifier
        driver=False,
        oracle=f"""
        WITH qfeats AS (
            SELECT doc_id, {_MD5_LONG_SQL.format(c='g')} % {_QC_BUCKETS} AS b
            FROM (
                SELECT doc_id, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM documents)
            )
        ),
        w(b, wt) AS (VALUES {_qc_weights_values_sql()}),
        pooled AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   {dec_sum_sql('w.wt')} AS s
            FROM qfeats f JOIN w ON w.b = f.b
            GROUP BY f.doc_id
        ),
        scored AS (
            SELECT d.doc_id,
                   ROUND(1.0 / (1.0 + exp(-({BIAS!r} + p.s / p.n_grams))),
                         6) AS quality_score,
                   CAST({h_ppm} AS BIGINT) AS hash_ppm
            FROM documents d JOIN pooled p USING (doc_id)
        )
        SELECT doc_id, quality_score,
               CAST(ROUND(quality_score * 1000000) AS BIGINT) AS keep_ppm,
               hash_ppm
        FROM scored
        WHERE hash_ppm < CAST(ROUND(quality_score * 1000000) AS BIGINT)
        """,
    )
    def docs_quality_sampled_mix(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Soft quality selection: every scorable document is kept
        with probability EQUAL to its frozen-classifier score — the
        published alternative to hard thresholding that preserves a
        calibrated share of mid-quality text — made deterministic by
        comparing the score (floored onto an exact ppm grid) against
        the document's salted-md5 residue. Re-runs, resumes, and the
        DuckDB oracle all pick the identical subset; changing the
        epoch salt redraws the sample without touching the scores.

        Zero-gram documents score NULL and are excluded by the NULL
        comparison in both engines — same contract as the hard gate.

        Scale shape: the classifier's one-gram-pass + 256-row
        broadcast shape, then a map-only hash compare — no new
        shuffle over the corpus at all; the sample rate is a FREE
        column (keep_ppm) rather than a config constant, which is
        what lets one pass implement per-document rates."""
        docs = load_table(spark, sf_dir, "documents")
        scored = with_quality_score(docs).where(
            F.col("quality_score").isNotNull()
        )
        h_ppm_c = (
            md5_long(
                F.concat(
                    F.lit(_QSAMP_SALT), F.col("doc_id").cast("string")
                )
            )
            % 1000000
        ).cast("long")
        keep_ppm = (
            F.round(F.col("quality_score") * 1000000, 0).cast("long")
        )
        return (
            scored.select(
                "doc_id",
                "quality_score",
                keep_ppm.alias("keep_ppm"),
                h_ppm_c.alias("hash_ppm"),
            )
            .where(F.col("hash_ppm") < F.col("keep_ppm"))
        )


_register_quality_sampled_mix()


# ---------------------------------------------------------------------------
# Source-reputation table — crawl curation's domain-level gate: before
# filtering documents one by one, pipelines score whole SOURCES
# (domains / feeds) on volume, duplication rate, and mean content
# quality, and blocklist the ones that are mostly spam or mirror
# farms. Per-source aggregates over the exact-dedup fingerprint and
# the frozen quality classifier, with the blocklist decision as a
# flag — integer ppm for the dup rate, decimal-exact mean for quality.
# ---------------------------------------------------------------------------

_SREP_DUP_PPM = 100_000  # flag sources past 10% exact-dup rate
_SREP_MIN_Q = 0.5  # ... or below this mean classifier score


def _register_source_reputation() -> None:
    from .quality_weights import BIAS

    @register(
        "docs_source_reputation",
        # pytest-oracled (driver surface capped at 50)
        driver=False,
        oracle=f"""
        WITH qfeats AS (
            SELECT doc_id, {_MD5_LONG_SQL.format(c='g')} % {_QC_BUCKETS} AS b
            FROM (
                SELECT doc_id, unnest({_GRAMS_SQL}) AS g
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '{TOKEN_RE}')
                                 AS t
                      FROM documents)
            )
        ),
        w(b, wt) AS (VALUES {_qc_weights_values_sql()}),
        pooled AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   {dec_sum_sql('w.wt')} AS s
            FROM qfeats f JOIN w ON w.b = f.b
            GROUP BY f.doc_id
        ),
        base AS (
            SELECT d.doc_id, d.source,
                   ROUND(1.0 / (1.0 + exp(-({BIAS!r} + p.s / p.n_grams))),
                         6) AS q,
                   md5(trim(regexp_replace(lower(d.text), '{_WS}+', ' ',
                                           'g'))) AS fp
            FROM documents d LEFT JOIN pooled p USING (doc_id)
        ),
        marked AS (
            SELECT source, q,
                   CASE WHEN ROW_NUMBER() OVER (
                            PARTITION BY fp ORDER BY doc_id) > 1
                        THEN 1 ELSE 0 END AS is_dup
            FROM base
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_dup) AS BIGINT) AS n_dups,
               CAST(1000000 * SUM(is_dup) // COUNT(*) AS BIGINT)
                   AS dup_ppm,
               {dec_avg_sql('q')} AS mean_quality,
               CAST((1000000 * SUM(is_dup) // COUNT(*)) > {_SREP_DUP_PPM}
                    OR {dec_avg_sql('q')} < {_SREP_MIN_Q} AS BIGINT)
                   AS flagged
        FROM marked GROUP BY source
        """,
    )
    def docs_source_reputation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-source reputation: document volume, exact-duplicate
        rate (global keep-first fingerprinting — a mirror farm's
        copies count against the COPYING source, not the original's),
        mean frozen-classifier quality over scorable docs, and the
        blocklist flag (dup rate past {10%} ppm OR mean quality below
        0.5). The domain-level gate crawl pipelines run BEFORE
        per-document filtering — one bad source decision prunes
        millions of documents for the cost of one aggregate row.

        Scale shape: the classifier's gram pass + one fingerprint
        window (global dedup keys — the exact-dedup shuffle the
        pipeline already pays) + ONE per-source aggregate; sources are
        the coarsest key in the corpus, so the final groupBy is
        map-combined into almost nothing. Mean quality is
        decimal-summed (order-independent), the dup rate is integer
        ppm — the flag can't sit on a float edge on either engine."""
        docs = load_table(spark, sf_dir, "documents")
        from pyspark.sql.window import Window as _W

        scored = with_quality_score(docs).select(
            "doc_id",
            "source",
            "quality_score",
            exact_fingerprint().alias("fp"),
        )
        marked = scored.select(
            "source",
            "quality_score",
            F.when(
                F.row_number().over(
                    _W.partitionBy("fp").orderBy("doc_id")
                )
                > 1,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("is_dup"),
        )
        from .helpers import dec_avg

        agg = marked.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dups"),
            dec_avg("quality_score").alias("mean_quality"),
        )
        dup_ppm = F.expr("(1000000 * n_dups) div n_docs").cast("long")
        return agg.select(
            "source",
            "n_docs",
            "n_dups",
            dup_ppm.alias("dup_ppm"),
            "mean_quality",
            (
                (dup_ppm > _SREP_DUP_PPM)
                | (F.col("mean_quality") < _SREP_MIN_Q)
            )
            .cast("long")
            .alias("flagged"),
        )


_register_source_reputation()


# ---------------------------------------------------------------------------
# Decontaminated training set — the REWRITE half of
# split_contamination_pairs: the train split with every document that
# shares a copied passage with the held-out split REMOVED (the GPT-3 /
# Llama decontamination action: when train and eval share text, the
# train copy is what gets dropped, because the eval set is the frozen
# asset). Flag → rewrite, the paragraph-dedup pattern applied at the
# split boundary.
# ---------------------------------------------------------------------------


@register(
    "docs_decontaminated_train",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH {_FP_SEL_SQL},
    assign AS (
        SELECT doc_id,
               CASE WHEN {_MD5_LONG_SQL.format(c='doc_id')} % 100 < 95
                    THEN 'train' ELSE 'heldout' END AS split
        FROM documents
    ),
    rare AS (
        SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {_FP_CAP}
    ),
    contaminated AS (
        SELECT a.doc_id
        FROM sel a JOIN sel b USING (fp) JOIN rare USING (fp)
             JOIN assign sa ON sa.doc_id = a.doc_id
             JOIN assign sb ON sb.doc_id = b.doc_id
        WHERE sa.split = 'train' AND sb.split = 'heldout'
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_FP_MIN_SHARED}
    )
    SELECT d.doc_id,
           CAST(len(regexp_extract_all(lower(d.text), '{TOKEN_RE}'))
                AS BIGINT) AS n_tokens
    FROM documents d JOIN assign USING (doc_id)
    WHERE assign.split = 'train'
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def docs_decontaminated_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The train split with contaminated documents removed: a train
    document is dropped iff it forms a ``split_contamination_pairs``
    row with ANY held-out document (>= the shared-fingerprint floor
    over rare winnowing fingerprints). The kept set is what actually
    ships to the trainer — the audit query carries the evidence, this
    carries the corpus.

    Scale shape: the contamination pairs' banded fingerprint join
    (ids only, boilerplate-capped) followed by ONE left-anti join of
    the train split against the distinct contaminated ids — the
    rewrite adds a single ids-only anti-join to the audit's cost."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = split_contamination_pairs(spark, sf_dir)
    md5l = md5_long(F.col("doc_id"))
    train = docs.where((md5l % 100) < 95).select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    contaminated = pairs.select(
        F.col("train_id").alias("doc_id")
    ).distinct()
    return train.join(contaminated, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# Stratified split — exact per-stratum proportions: the plain hash
# split's 95/4/1 is only correct in expectation, so a small stratum
# (a rare language, a tiny source) can land entirely in train by
# chance and ship with NO eval coverage. Ranking within each
# (lang, source) stratum by the salted hash and cutting at exact
# integer boundaries guarantees every stratum contributes its floor
# share to val — the sklearn StratifiedShuffleSplit contract, done
# as two window functions.
# ---------------------------------------------------------------------------

_STRAT_SALT = "strat-e1-"
_STRAT_VAL_PCT = 5  # exact floor(n * 5 / 100) rows per stratum to val


@register(
    "docs_stratified_split",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    SELECT doc_id, lang, source,
           CASE WHEN rk <= n_stratum * {_STRAT_VAL_PCT} // 100
                THEN 'val' ELSE 'train' END AS split
    FROM (
        SELECT doc_id, lang, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang, source ORDER BY h, doc_id
               ) AS BIGINT) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY lang, source)
                    AS BIGINT) AS n_stratum
        FROM (SELECT doc_id, lang, source,
                     {_MD5_LONG_SQL.format(
                         c="concat('" + _STRAT_SALT
                         + "', CAST(doc_id AS VARCHAR))")} AS h
              FROM documents)
    )
    """,
)
def docs_stratified_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified train/val split with EXACT per-stratum counts:
    within every (lang, source) stratum, the ``floor(n · 5%)``
    smallest salted-hash documents go to val — deterministic,
    engine-reproducible, and guaranteed representation for every
    stratum with >= 20 documents (smaller strata keep all rows in
    train, the floor contract, rather than randomly losing eval
    coverage or overdrawing).

    Scale shape: one window pair keyed by the stratum (rank + count
    over the same partitioning → ONE Exchange), map-only otherwise.
    Strata are corpus-level categories, so the window's key count is
    small but each partition is processed distributed per key — at
    100 TB the stratum count (languages × sources) is the
    parallelism floor, which is exactly the operator's semantics
    (an exact per-stratum cut is a per-stratum rank by definition;
    the plain hash split stays the map-only default when
    in-expectation proportions suffice)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    h = md5_long(
        F.concat(F.lit(_STRAT_SALT), F.col("doc_id").cast("string"))
    )
    w = _W.partitionBy("lang", "source")
    ranked = docs.select(
        "doc_id", "lang", "source", h.alias("__h")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.row_number()
        .over(w.orderBy("__h", "doc_id"))
        .cast("long")
        .alias("rk"),
        F.count("*").over(w).cast("long").alias("n_stratum"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("rk")
            <= F.expr(f"(n_stratum * {_STRAT_VAL_PCT}) div 100"),
            "val",
        )
        .otherwise("train")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity filter — the CCNet filter stage's shape (score
# each document by how expected its text is under a language model;
# CCNet uses a 5-gram KenLM, this is the in-engine bigram form trained
# on the corpus itself): per-token probability under an interpolated
# bigram/unigram model, QUANTIZED onto an exact integer ppm grid so no
# float probability or float log appears anywhere (the
# doc_unigram_surprisal discipline, extended to conditional
# probabilities) — Spark and DuckDB hash-match bit-exactly.
# ---------------------------------------------------------------------------

_BILM_LAMBDA_PPM = 900_000  # bigram weight λ = 0.9 on the ppm grid


@register(
    "docs_bigram_lm_perplexity",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    stream AS (
        SELECT doc_id, i AS pos, ts[i] AS term,
               CASE WHEN i > 1 THEN ts[i - 1] END AS prev
        FROM toks, UNNEST(range(1, len(ts) + 1)) AS r(i)
    ),
    uni AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c_uni
        FROM stream GROUP BY term
    ),
    total AS (SELECT CAST(SUM(c_uni) AS BIGINT) AS t FROM uni),
    bi AS (
        SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c_bi
        FROM stream WHERE prev IS NOT NULL GROUP BY prev, term
    ),
    scored AS (
        SELECT s.doc_id,
               GREATEST(1,
                   CASE WHEN s.prev IS NULL
                        THEN (1000000 * u.c_uni) // t.t
                        ELSE ({_BILM_LAMBDA_PPM} * COALESCE(b.c_bi, 0))
                                 // up.c_uni
                             + ((1000000 - {_BILM_LAMBDA_PPM}) * u.c_uni)
                                 // t.t
                   END) AS p_ppm
        FROM stream s
        JOIN uni u ON u.term = s.term
        LEFT JOIN uni up ON up.term = s.prev
        LEFT JOIN bi b ON b.prev = s.prev AND b.term = s.term
        CROSS JOIN total t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(length(bin(1000000 // p_ppm)) - 1 AS BIGINT))
                AS BIGINT) AS total_bits,
           CAST(SUM(CAST(length(bin(1000000 // p_ppm)) - 1 AS BIGINT))
                AS DOUBLE) / COUNT(*) AS avg_bits
    FROM scored
    GROUP BY doc_id
    """,
)
def docs_bigram_lm_perplexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document quantized perplexity under an interpolated
    bigram/unigram LM trained on the corpus itself:
    ``p(w_i | w_{i-1}) = 0.9·c(w_{i-1} w_i)/c(w_{i-1}) +
    0.1·c(w_i)/T``, floored onto an integer ppm grid per term, then
    per-token surprisal as the integer ``floor(log2(1e6 / p_ppm))``
    (``length(bin(x)) - 1`` — no float probability, no float log,
    so both engines agree bit-for-bit; the only float is the final
    exact-int division per output row). High ``avg_bits`` = text the
    corpus LM finds surprising (garbage, wrong-language, encrypted);
    LOW = degenerate boilerplate — the CCNet filter cuts both tails.

    Scale shape: the LM "tables" are DataFrames end to end — one
    token-stream pass builds unigram and bigram counts (map-side
    combined), scoring re-joins them onto the stream keyed by term /
    (prev, term) — the bigram join is the big one and shuffles on
    exactly the key it groups by; the per-doc fold map-combines. The
    per-doc position/lag structure comes from ONE doc-keyed window.
    No driver-side model state at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    stream = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "term")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "term",
    )
    wd = _W.partitionBy("doc_id").orderBy("pos")
    stream = stream.withColumn("prev", F.lag("term").over(wd))
    uni = stream.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c_uni")
    )
    total = uni.agg(F.sum("c_uni").cast("long").alias("t"))
    bi = (
        stream.where(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bi"))
    )
    lam = _BILM_LAMBDA_PPM
    scored = (
        stream.join(uni, "term")
        .join(
            uni.select(
                F.col("term").alias("prev"),
                F.col("c_uni").alias("c_prev"),
            ),
            "prev",
            "left",
        )
        .join(bi, ["prev", "term"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.greatest(
                F.lit(1).cast("long"),
                F.when(
                    F.col("prev").isNull(),
                    F.expr("(1000000 * c_uni) div t"),
                ).otherwise(
                    F.expr(f"({lam} * coalesce(c_bi, 0)) div c_prev")
                    + F.expr(f"((1000000 - {lam}) * c_uni) div t")
                ),
            ).alias("p_ppm"),
        )
    )
    bits = (
        F.length(F.bin(F.expr("1000000 div p_ppm"))) - 1
    ).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(bits).cast("long").alias("total_bits"),
        (F.sum(bits).cast("double") / F.count(F.lit(1))).alias(
            "avg_bits"
        ),
    )


# ---------------------------------------------------------------------------
# Search-result snippets — the serving step after retrieval: for every
# document matching the query, the W-token window that best covers the
# query terms (most DISTINCT terms, then most matches, then leftmost —
# the Lucene highlighter's objective). Window starts are anchored at
# match positions (an optimal window always starts at a match), so the
# candidate set is per-doc match-count-sized, never text-length-sized;
# the snippet's actual bytes are hash-checked via md5 of the token
# window, the paragraph-dedup rewrite discipline.
# ---------------------------------------------------------------------------

_SNIP_W = 15  # snippet width (tokens)


@register(
    "docs_search_snippets",
    # r12: rotated ONTO the driver surface (VERDICT r11 #1) — the
    # sparse match-stream window search (and the md5-of-token-window
    # byte check) under the driver's own hash; took
    # docs_phrase_search_positional's slot (whose oracle the two-stage
    # phrase variant shares verbatim in the local replica)
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id, i AS p, t[i] AS term
        FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
        WHERE t[i] IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
    ),
    wins AS (
        SELECT a.doc_id, a.p AS win_start,
               CAST(COUNT(DISTINCT b.term) AS BIGINT) AS n_terms,
               CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM m a JOIN m b
          ON b.doc_id = a.doc_id
         AND b.p >= a.p AND b.p < a.p + {_SNIP_W}
        GROUP BY a.doc_id, a.p
    ),
    best AS (
        SELECT doc_id, win_start, n_terms, n_matches FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id
                ORDER BY n_terms DESC, n_matches DESC, win_start
            ) AS rn FROM wins
        ) WHERE rn = 1
    )
    SELECT b.doc_id,
           CAST(b.win_start AS BIGINT) AS win_start,
           b.n_terms, b.n_matches,
           md5(array_to_string(
               t[b.win_start : b.win_start + {_SNIP_W} - 1], ' '))
               AS snippet_md5
    FROM best b JOIN toks USING (doc_id)
    """,
)
def docs_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-window snippet per matching document for the registered
    BM25 query terms: maximize distinct query-term coverage in a
    {W}-token window, tie-break by total matches then leftmost start;
    the emitted ``snippet_md5`` hashes the exact token window, so the
    oracle checks the highlighted BYTES, not just the placement.

    Scale shape: the match stream is filtered at the explode (only
    query-term positions move — the BM25 scorer's property); window
    scoring is a per-doc range self-join on that SPARSE stream
    (match-count², not text-length²), one rank window per doc, and
    one join back to the token arrays for the final slice. Every key
    is doc-local; no global sort, no text shuffle beyond the final
    slice projection."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    toks = docs.select("doc_id", tokens("text").alias("t"))
    m = toks.select(
        "doc_id", F.posexplode(F.col("t")).alias("p0", "term")
    ).select(
        "doc_id", (F.col("p0") + 1).alias("p"), "term"
    ).where(F.col("term").isin(*_BM25_TERMS))
    a = m.select("doc_id", F.col("p").alias("win_start"))
    b = m.select("doc_id", F.col("p").alias("bp"), "term")
    wins = (
        a.join(b, "doc_id")
        .where(
            (F.col("bp") >= F.col("win_start"))
            & (F.col("bp") < F.col("win_start") + _SNIP_W)
        )
        .groupBy("doc_id", "win_start")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
        )
    )
    wd = _W.partitionBy("doc_id").orderBy(
        F.desc("n_terms"), F.desc("n_matches"), F.asc("win_start")
    )
    best = (
        wins.withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return best.join(toks, "doc_id").select(
        "doc_id",
        F.col("win_start").cast("long").alias("win_start"),
        "n_terms",
        "n_matches",
        F.md5(
            F.array_join(
                F.slice(F.col("t"), F.col("win_start"), F.lit(_SNIP_W)),
                " ",
            )
        ).alias("snippet_md5"),
    )


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback — the classic query-expansion loop
# (Lavrenko & Croft relevance models, the Anserini/Lucene RM3
# default): run BM25, treat the top-10 as pseudo-relevant, harvest the
# most frequent non-query terms from them, and re-score with the
# expanded weighted query. Dynamic terms break the fixed-term-order
# conditional-aggregation trick the registered BM25 uses, so the
# re-score sums per-(doc, term) components through the EXACT-DECIMAL
# fold (order-independent — the helpers.dec_sum discipline), keeping
# the whole two-stage loop hash-checkable.
# ---------------------------------------------------------------------------

_RM3_FEEDBACK_DOCS = 10
_RM3_EXP_TERMS = 3
_RM3_ORIG_WEIGHT = 2  # original terms count double vs expansions


def _rm3_oracle() -> str:
    k1, b = _BM25_K1, _BM25_B
    orig = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    orig_rows = ", ".join(
        f"('{t}', {_RM3_ORIG_WEIGHT})" for t in _BM25_TERMS
    )
    return f"""
    WITH fb AS (
        SELECT doc_id FROM ({_BM25_ORACLE})
        WHERE rank <= {_RM3_FEEDBACK_DOCS}
    ),
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    expansion AS (
        SELECT term FROM (
            SELECT t.term, CAST(COUNT(*) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (
                       ORDER BY COUNT(*) DESC, t.term) AS rn
            FROM toks JOIN fb USING (doc_id), UNNEST(ts) AS t(term)
            WHERE t.term NOT IN ({orig})
            GROUP BY t.term
        ) WHERE rn <= {_RM3_EXP_TERMS}
    ),
    qterms(term, w) AS (
        SELECT * FROM (VALUES {orig_rows})
        UNION ALL
        SELECT term, 1 FROM expansion
    ),
    hits AS (
        SELECT toks.doc_id, len(ts) AS dl, t.term
        FROM toks, UNNEST(ts) AS t(term)
        WHERE t.term IN (SELECT term FROM qterms)
    ),
    tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM hits GROUP BY doc_id, dl, term
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(len(ts)) / COUNT(*) AS avgdl
        FROM toks
    ),
    tdf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    comp AS (
        SELECT tf.doc_id,
               q.w * ln(1 + (c.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
                   * (tf.tf * {k1 + 1.0}) / (tf.tf + {k1} *
                     (1 - {b} + {b} * tf.dl / c.avgdl)) AS part
        FROM tf
        JOIN tdf USING (term)
        JOIN qterms q USING (term)
        CROSS JOIN corpus c
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                AS BIGINT) AS rank
    FROM (
        SELECT doc_id, {dec_sum_sql('part')} AS score
        FROM comp GROUP BY doc_id
    )
    QUALIFY rank <= {_BM25_TOPK}
    """


@register(
    "docs_rm3_search",
    # r12: rotated ONTO the driver surface (VERDICT r11 #1) — RM3's
    # dynamic-expansion-term decimal fold now runs under the driver's
    # own hash, and its oracle embeds _BM25_ORACLE verbatim, restoring
    # a driver-checked carrier for the BM25 SQL; took
    # cdw_fr_date_roundtrip's slot (subsumed by the other cdw rows)
    oracle=_rm3_oracle(),
)
def docs_rm3_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 + RM3 pseudo-relevance feedback: the registered BM25
    top-{10} act as pseudo-relevant documents, their {3} most frequent
    non-query terms join the query at weight 1 (originals at weight
    {2}), and the expanded query re-ranks the corpus. Expansion terms
    are DATA-DEPENDENT, so the re-score cannot inline per-term
    expression columns — instead each (doc, term) BM25 component is
    weighted and folded through the exact-decimal sum
    (order-independent), which is what keeps a dynamic-term scorer
    hash-checkable at all.

    Scale shape: stage 1 is the registered BM25 plan; term harvesting
    explodes ONLY the 10 feedback docs; the re-score is the BM25
    shape with the term set as a 6-row broadcast frame (never a
    literal list — the terms are data), per-term df/corpus stats tiny,
    one (doc, term)-keyed partial-aggregated shuffle, and a final
    WindowGroupLimit top-k. The second corpus pass is the price of
    feedback everywhere (Anserini pays it identically); everything
    else is broadcast-sized."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    fb = (
        docs_bm25_search(spark, sf_dir)
        .where(F.col("rank") <= _RM3_FEEDBACK_DOCS)
        .select("doc_id")
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    exp = (
        toks.join(fb, "doc_id")
        .select(F.explode("ts").alias("term"))
        .where(~F.col("term").isin(*_BM25_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                _W.orderBy(F.desc("c"), F.asc("term"))
            ),
        )
        .where(F.col("rn") <= _RM3_EXP_TERMS)
        .select("term", F.lit(1).alias("w"))
    )
    qterms = spark.createDataFrame(
        [(t, _RM3_ORIG_WEIGHT) for t in _BM25_TERMS], "term string, w int"
    ).unionByName(exp)
    hits = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("dl"),
        F.explode("ts").alias("term"),
    ).join(F.broadcast(qterms), "term")
    tf = hits.groupBy("doc_id", "dl", "term", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    corpus = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum(F.size("ts").cast("long")) / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    tdf = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    k1, b = _BM25_K1, _BM25_B
    comp = (
        tf.join(F.broadcast(tdf), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.col("w")
                * F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    scored = comp.groupBy("doc_id").agg(dec_sum("part").alias("score"))
    return (
        scored.withColumn(
            "rank",
            F.row_number()
            .over(_W.orderBy(F.col("score").desc(), F.col("doc_id")))
            .cast("long"),
        )
        .where(F.col("rank") <= _BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility — the tokenizer-evaluation number multilingual
# pipelines track per language: BPE tokens per whitespace word
# (fertility ~1 means the vocabulary fits the language; >>1 means the
# language is being byte-shredded and is underserved by the token
# budget). Exact-decimal ratio of two integer sums per (lang, source)
# stratum — the doc_token_stats counters, aggregated where the
# decision is made.
# ---------------------------------------------------------------------------


@register(
    "docs_tokenizer_fertility",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS n_ws_tokens,
           CAST(ROUND(CAST(SUM(n_bpe) AS DECIMAL(30,10))
                      / SUM(n_ws), 6) AS DOUBLE) AS fertility
    FROM (
        SELECT lang,
               CAST(len(regexp_extract_all(lower(text),
                    '{BPE_RE.replace("'", "''")}')) AS BIGINT) AS n_bpe,
               CAST(len(string_split_regex(text, '{_WS}+')) AS BIGINT)
                   AS n_ws
        FROM documents
    )
    GROUP BY lang
    """,
)
def docs_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language tokenizer fertility: BPE-ish tokens per whitespace
    word (the GPT-2-style pre-tokenization count over the whitespace
    denominator — the standard proxy for how efficiently a byte-pair
    vocabulary covers each language; the number multilingual token
    budgets are set against). Integer sums, one exact-decimal
    division per output row, rounded at 6 dp identically on both
    engines.

    Scale shape: map-only token counting inside whole-stage codegen +
    one map-combined per-lang aggregate — the doc_token_stats pass,
    folded to the decision grain."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0)
    ).cast("long")
    n_ws = F.size(F.split(F.col("text"), _WS + "+")).cast("long")
    per_doc = docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        F.sum("n_ws").cast("long").alias("n_ws_tokens"),
        F.round(
            F.sum(F.col("n_bpe").cast("decimal(30,10)"))
            / F.sum("n_ws"),
            6,
        )
        .cast("double")
        .alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Corpus-version drift report — the pre-selection regression gate a
# corpus release runs before any training-mix decision: per source,
# how document and token volume moved between two corpus versions
# (the delta-refresh row's own v1/v2 pair). curation_mix_diff audits
# the SELECTED mix; this audits the RAW corpus it was selected from —
# the two reports together localize whether a mix change came from
# the corpus or from the selection.
# ---------------------------------------------------------------------------


@register(
    "corpus_version_drift",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH per_doc AS (
        SELECT source, doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                    AS BIGINT) AS n_tok,
               CAST(doc_id % 4 <> 3 AS BIGINT) AS in_v1
        FROM documents
    )
    SELECT source,
           CAST(SUM(in_v1) AS BIGINT) AS docs_v1,
           CAST(COUNT(*) AS BIGINT) AS docs_v2,
           CAST(SUM(n_tok * in_v1) AS BIGINT) AS tokens_v1,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_v2,
           CASE WHEN SUM(n_tok * in_v1) = 0 THEN NULL
                ELSE CAST(1000000 * (SUM(n_tok) - SUM(n_tok * in_v1))
                          // SUM(n_tok * in_v1) AS BIGINT)
           END AS token_growth_ppm
    FROM per_doc GROUP BY source
    """,
)
def corpus_version_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source volume drift between two corpus versions (v1 = the
    ``doc_id % 4 != 3`` load, v2 = the full table — the same version
    pair the delta refresh and the mix diff replay): document and
    token counts per version and the token growth on an exact ppm
    grid. A source whose volume jumped 10x between versions is a
    crawler or takedown incident to investigate BEFORE selection
    re-runs — the report that tells corpus ops whether to ship.

    Scale shape: ONE pass over the corpus (the version membership is
    a predicate on the id, so both versions' sums come from the same
    scan via conditional aggregation — never two reads), one
    map-combined per-source aggregate; integer end to end."""
    docs = load_table(spark, sf_dir, "documents")
    in_v1 = (F.col("doc_id") % 4 != 3).cast("long")
    n_tok = F.size(tokens("text")).cast("long")
    per_doc = docs.select(
        "source", in_v1.alias("in_v1"), n_tok.alias("n_tok")
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("in_v1").cast("long").alias("docs_v1"),
        F.count(F.lit(1)).cast("long").alias("docs_v2"),
        F.sum(F.col("n_tok") * F.col("in_v1"))
        .cast("long")
        .alias("tokens_v1"),
        F.sum("n_tok").cast("long").alias("tokens_v2"),
    )
    return agg.withColumn(
        "token_growth_ppm",
        F.when(F.col("tokens_v1") == 0, F.lit(None).cast("long")).otherwise(
            F.expr(
                "(1000000 * (tokens_v2 - tokens_v1)) div tokens_v1"
            ).cast("long")
        ),
    )


# ---------------------------------------------------------------------------
# Span-corruption mask layout — the denoising-objective metadata a
# T5-style training job consumes: which token spans of each document
# are masked. Derandomized the way every sampling decision in this
# registry is (the epoch-shuffle/sampled-mix doctrine): tokens tile
# into fixed-length blocks, and each document masks the block residue
# its salted hash selects — a deterministic ~1/N-rate block layout
# (mean span length = the block size, corruption rate = 1/N exactly
# in the long run), reproducible across reruns, engines, and resumes,
# with the phase decorrelated across documents by the hash.
# ---------------------------------------------------------------------------

_SPANC_BLOCK = 3  # masked-span length (tokens) — T5's mean span
_SPANC_PERIOD = 7  # every 7th block masks => corruption rate 1/7
_SPANC_SALT = "spanc-e1-"


@register(
    "docs_span_corruption_masks",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                    AS BIGINT) AS n_tokens,
               {_MD5_LONG_SQL.format(
                   c="concat('" + _SPANC_SALT
                   + "', CAST(doc_id AS VARCHAR))")} % {_SPANC_PERIOD}
                   AS phase
        FROM documents
    )
    SELECT doc_id, span_id,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(LEAST(start_tok + {_SPANC_BLOCK}, n_tokens) AS BIGINT)
               AS end_tok
    FROM (
        SELECT doc_id, n_tokens,
               CAST(i AS BIGINT) AS span_id,
               (phase + i * {_SPANC_PERIOD}) * {_SPANC_BLOCK}
                   AS start_tok
        FROM toks,
             UNNEST(range(0, 1 + n_tokens
                 // ({_SPANC_BLOCK} * {_SPANC_PERIOD}))) AS r(i)
    )
    WHERE start_tok < n_tokens
    """,
)
def docs_span_corruption_masks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Masked-span layout per document for a denoising objective:
    token positions tile into {block}-token blocks, and blocks whose
    index ≡ hash(doc) (mod {period}) mask — spans
    ``[start_tok, end_tok)`` with the final span clipped at the
    document end. Rate and mean span length are the T5 defaults
    (~15%, 3 tokens) as EXACT integers; the per-document phase
    decorrelates mask positions across documents while keeping the
    layout a pure function of (doc_id, token count) — the property
    that makes the corrupted dataset reproducible and the mask
    auditable (this frame IS the audit).

    Scale shape: map-only per doc + a bounded explode (one row per
    masked span ≈ tokens/21); no joins, no shuffle before the
    output. Composes with ``docs_pack_sequences``' placement the way
    ``docs_packed_doc_spans`` does — both are (doc, span) frames
    keyed in token space."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text")).cast("long")
    phase = (
        md5_long(
            F.concat(F.lit(_SPANC_SALT), F.col("doc_id").cast("string"))
        )
        % _SPANC_PERIOD
    )
    base = docs.select(
        "doc_id", n_tokens.alias("n_tokens"), phase.alias("phase")
    )
    stride = _SPANC_BLOCK * _SPANC_PERIOD
    spans = base.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"n_tokens div {stride}"),
            )
        ).alias("span_id"),
        "phase",
    ).select(
        "doc_id",
        "n_tokens",
        F.col("span_id").cast("long").alias("span_id"),
        (
            (F.col("phase") + F.col("span_id") * _SPANC_PERIOD)
            * _SPANC_BLOCK
        ).alias("start_tok"),
    )
    return spans.where(F.col("start_tok") < F.col("n_tokens")).select(
        "doc_id",
        "span_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(
            F.col("start_tok") + _SPANC_BLOCK, F.col("n_tokens")
        )
        .cast("long")
        .alias("end_tok"),
    )
