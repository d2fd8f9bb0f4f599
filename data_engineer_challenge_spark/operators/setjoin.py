"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family — Bayardo et al. WWW'07, Chaudhuri et al. ICDE'06).

The MinHash tier trades a tiny false-negative probability for fixed
signature cost; THIS tier is the exact-guarantee alternative: every
pair with Jaccard ≥ t is found, with no signatures at all. The
pigeonhole argument: order every document's shingles by a single
global rarity order; a pair meeting the threshold must overlap in at
least ``ceil(t·|r|)`` shingles, so if two documents share NO shingle
within each one's first ``|r| - ceil(t·|r|) + 1`` ordered shingles
(its PREFIX), their overlap cannot reach the bound — candidate
generation can therefore equi-join on prefix shingles only. Rare-first
ordering makes prefixes land on the least common shingles, so the join
fan-out concentrates where buckets are smallest (the opposite of the
boilerplate-shingle hot spot).

Scale shape: one shuffle for global shingle frequencies, one for the
per-document ordered arrays, an equi-join carrying only
(shingle, id, set-size) for PREFIX positions (a ~(1-t) fraction of
positions), an exact integer size filter (``min·q ≥ p·max`` for
t = p/q — a candidate is impossible when the smaller set can't cover
t of the larger), and exact Jaccard verification on candidates only.

Prefix lengths use EXACT integer arithmetic: ``ceil(t·n)`` computed in
floating point is wrong at the boundary (0.8·5 rounds to
4.000000000000000444, whose ceil is 5 — silently SHORTENING the prefix
and dropping true pairs), so the threshold is converted to an exact
fraction p/q and ``ceil(p·n/q) = (p·n + q - 1) div q`` throughout.

Reference scope: the reference engine's dedup is exact equality on a
pandas column (SURVEY §2.3 J1); this operator exists for the 100 TB
near-dup regime, as the zero-false-negative member of the candidate-
generation matrix (MinHash-LSH, SimHash, winnowing, embedding-LSH,
and now prefix filtering).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_dedup import _CACHED_FRAMES, jaccard, word_shingles


def _ceil_frac(n: Column, p: int, q: int) -> Column:
    """ceil(n * p / q) for a long column and exact fraction p/q."""
    return ((n * F.lit(p) + F.lit(q - 1)) / F.lit(q)).cast("long")


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 2,
) -> DataFrame:
    """All pairs with bigram-shingle Jaccard ≥ ``threshold`` —
    EXACTLY (prefix filtering misses nothing; see module docstring).
    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.

    Cache lifetime: the shingle frame is cached across its three
    consumers (frequency count, prefix build, verification) and
    registered in ``text_dedup._CACHED_FRAMES``; call
    ``text_dedup.release_cached()`` after materializing results."""
    fr = Fraction(threshold).limit_denominator(10**6)
    p, q = fr.numerator, fr.denominator

    sh = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(F.col(text_col), shingle_n).alias("__sh"),
        )
        .filter(F.size("__sh") >= 1)
        .cache()
    )
    _CACHED_FRAMES.append(sh)

    # global document frequency per shingle → the rarity order
    freq = (
        sh.select(F.explode("__sh").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    # per-document shingles sorted rare-first (struct order: df, tok —
    # total and deterministic, no global rank materialization)
    ordered = (
        sh.select("__id", F.explode("__sh").alias("tok"))
        .join(freq, "tok")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("tok")))
            ).alias("__ord")
        )
    )
    n = F.size("__ord").cast("long")
    prefix_len = (n - _ceil_frac(n, p, q) + F.lit(1)).cast("int")
    prefixes = ordered.select(
        "__id",
        n.alias("__n"),
        F.posexplode(F.slice("__ord", F.lit(1), prefix_len)).alias(
            "__pos", "__ptok"
        ),
    ).select(
        "__id",
        "__n",
        (F.col("__pos") + 1).alias("__pos"),  # 1-based prefix position
        F.col("__ptok.tok").alias("tok"),
    )

    left = prefixes.select(
        "tok",
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        F.col("__pos").alias("__pa"),
    )
    right = prefixes.select(
        "tok",
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.col("__pos").alias("__pb"),
    )
    # overlap bound in Jaccard terms: J ≥ p/q ⟺ |r∩s| ≥ (p/(p+q))·
    # (|r|+|s|) — exact integer form throughout
    alpha = _ceil_frac(F.col("__na") + F.col("__nb"), p, p + q)
    cands = (
        left.join(right, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # exact integer size filter: J ≤ min/max, so J ≥ p/q needs
        # min·q ≥ p·max — no float boundary hazard
        .filter(
            F.least("__na", "__nb") * F.lit(q)
            >= F.lit(p) * F.greatest("__na", "__nb")
        )
        # PPJoin positional filter: matching at ordered positions
        # (pa, pb) caps the achievable overlap at 1 + the shorter
        # remaining suffix; a true pair's FIRST shared prefix token
        # always passes (PPJoin lemma), so any-occurrence-passes +
        # distinct keeps recall at 1.0 while pruning the candidate
        # mass a small-vocabulary corpus otherwise generates
        .filter(
            F.lit(1)
            + F.least(
                F.col("__na") - F.col("__pa"), F.col("__nb") - F.col("__pb")
            )
            >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard(F.col("__sa"), F.col("__sb")))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
