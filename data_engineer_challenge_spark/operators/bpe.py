"""Byte-pair-encoding tokenization with a FROZEN merge table.

The token-counting tier (functions/tokenize.py) counts words and a
BPE-ish regex segmentation; this module adds REAL subword
tokenization — the unit LLM training budgets are actually denominated
in. The posture mirrors the IVF quantizer (plans/ivf_centroids.py):

- ``train_bpe`` is the OFFLINE step — deterministic greedy pair
  merging (count desc, pair lexicographic on ties) over a word
  frequency table, run once on a sample; at 100 TB the tokenizer is
  always trained offline and shipped to the job as a constant.
- The frozen merge list (plans/bpe_merges.py) broadcasts with the
  closure; ``bpe_token_counts`` applies it in an Arrow kernel with a
  per-unique-word memo (Zipf: a batch's distinct-word count is far
  below its token count, so the merge loop runs once per distinct
  word, not once per occurrence).

Correctness evidence is pytest-side (an independently-written
reference encoder + golden merges on a tiny corpus + determinism):
BPE's iterative ranked merging has no tractable SQL replay, so the
registered query carries the driver's rows-only check — the one
documented oracle exception class (non-SQL-expressible operators).

Reference scope: the reference has no tokenizer at all; this extends
SURVEY §2.10 text analysis ("token counting").
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import word_tokens


def train_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training (Sennrich et al. 2016), deterministic:
    repeatedly merge the most frequent adjacent symbol pair; ties
    break lexicographically on the pair, so the same corpus always
    yields the same merge list regardless of dict order."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            if len(sym) > 1:
                new = []
                i = 0
                while i < len(sym):
                    if (
                        i + 1 < len(sym)
                        and sym[i] == best[0]
                        and sym[i + 1] == best[1]
                    ):
                        new.append(merged)
                        i += 2
                    else:
                        new.append(sym[i])
                        i += 1
                sym = tuple(new)
            out[sym] = out.get(sym, 0) + c
        vocab = out
    return merges


def corpus_word_freqs(
    docs: DataFrame, text_col: str = "text", top_k: int | None = None
) -> dict[str, int]:
    """The distributed HALF of BPE training: the corpus word-frequency
    table, computed with one explode + one shuffle on the word —
    exactly how a 100 TB tokenizer train starts. The collect is
    VOCABULARY-sized (and hard-bounded by ``top_k``, ordered count
    desc with a lexicographic tie-break so truncation is
    deterministic); :func:`train_bpe` then runs on the driver, which
    is the industry posture — pair-merge iterations are tiny once the
    corpus is a frequency table. The frozen production table
    (plans/bpe_merges.py) is regenerable as
    ``train_bpe(corpus_word_freqs(docs), 30)`` — pinned by a pytest
    provenance test."""
    freqs = (
        docs.select(
            F.explode(word_tokens(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if top_k is not None:
        freqs = freqs.orderBy(F.col("c").desc(), "w").limit(top_k)
    return {r["w"]: int(r["c"]) for r in freqs.collect()}


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained rank table: always merge the
    LOWEST-rank (earliest-learned) pair present — the standard
    inference rule, which reproduces the training segmentation."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document subword statistics under the frozen merge table:
    ``(id, n_words, n_bpe_tokens, bpe_per_word)``. One Arrow pass,
    map-only; a per-PARTITION word memo (capped) means the merge loop
    runs once per distinct word a task sees (Zipf makes that a small
    fraction of occurrences). The merge list rides the task closure — the same
    broadcast-constant posture as the IVF centroids."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    base = docs.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("ws")
    )

    def fn(batches):
        import pandas as pd

        memo: dict[str, int] = {}
        # per-partition memo with a hard cap: on high-cardinality text
        # (ids, hashes) an unbounded memo would grow for the task's
        # whole lifetime — clearing keeps the Zipf head hot and the
        # memory bound
        cap = 1_000_000
        for pdf in batches:
            if len(memo) > cap:
                memo.clear()
            ids, n_words, n_bpe = [], [], []
            for i, ws in zip(pdf["id"], pdf["ws"]):
                total = 0
                for w in ws:
                    n = memo.get(w)
                    if n is None:
                        n = len(bpe_encode(w, ranks))
                        memo[w] = n
                    total += n
                ids.append(i)
                n_words.append(len(ws))
                n_bpe.append(total)
            yield pd.DataFrame(
                {"id": ids, "n_words": n_words, "n_bpe_tokens": n_bpe}
            )

    out = base.mapInPandas(fn, schema="id long, n_words long, n_bpe_tokens long")
    return out.select(
        F.col("id"),
        "n_words",
        "n_bpe_tokens",
        F.when(F.col("n_words") > 0,
               F.col("n_bpe_tokens") / F.col("n_words"))
        .otherwise(F.lit(0.0))
        .alias("bpe_per_word"),
    )


def bpe_token_counts_distinct(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The PRODUCTION tier of :func:`bpe_token_counts` — identical
    output, different cost model. The memo tier amortizes the merge
    loop per distinct word PER TASK; at 100 TB the Zipf head is shared
    by every task, so the same hot words re-encode once per task
    (×10⁵ tasks) and cold-cap memo clears re-encode them again. Here
    the corpus-DISTINCT words are computed first (one shuffle on the
    word), each is encoded EXACTLY ONCE in the Arrow kernel — total
    Python work ∝ vocabulary, not occurrences — and the subword
    counts join back onto the exploded words (co-partitioned with the
    distinct's exchange) before a per-document fold. Choose this tier
    when the corpus is large relative to its vocabulary (always, at
    scale); the memo tier wins only when the explode+shuffle costs
    more than the redundant encoding (small corpora, huge vocab).

    Plan shape: scan → explode_outer (zero-word docs keep a null row
    so they surface with zero counts) → distinct(w) → mapInPandas
    encode → shuffle join on w → groupBy(id). No driver collects; the
    vocabulary never materializes outside the cluster."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    base = docs.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("ws")
    )
    words = base.select(
        "id",
        F.size("ws").alias("n_words"),
        F.explode_outer("ws").alias("w"),
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_sub": [
                        len(bpe_encode(w, ranks)) for w in pdf["w"]
                    ],
                }
            )

    enc = (
        words.select("w")
        .where(F.col("w").isNotNull())
        .distinct()
        .mapInPandas(encode, schema="w string, n_sub long")
    )
    return (
        words.join(enc, "w", "left")
        .groupBy("id", "n_words")
        .agg(
            F.sum(F.coalesce(F.col("n_sub"), F.lit(0))).alias(
                "n_bpe_tokens"
            )
        )
        .select(
            "id",
            F.col("n_words").cast("long").alias("n_words"),
            "n_bpe_tokens",
            F.when(
                F.col("n_words") > 0,
                F.col("n_bpe_tokens") / F.col("n_words"),
            )
            .otherwise(F.lit(0.0))
            .alias("bpe_per_word"),
        )
    )
