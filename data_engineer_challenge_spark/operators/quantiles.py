"""Mergeable quantile sketches with a deterministic exact regime.

Spark ships ``approx_percentile`` as a ONE-SHOT aggregate only — there
is no native persisted-sketch surface for quantiles the way
``hll_sketch_agg`` provides one for distinct counts. This module fills
that gap with the same contract as ``operators.sketches``: build one
tiny summary per (group, day/shard) ONCE, persist it, and answer any
later "p99 over an arbitrary day range / group subset" by MERGING the
pre-built summaries — no rescan of the raw rows, ever.

The summary is a sorted list of weighted centroids ``(mean, weight)``
(a deterministic t-digest reduction; Dunning & Ertl's t-digest with the
randomness and the non-uniform scale function removed):

- **Build (bounded state):** each partition streams its rows through a
  per-group buffer; whenever a buffer exceeds ``capacity`` raw values
  it is sorted and compressed to ``k`` equal-weight centroids — so
  per-task state is O(groups × capacity) no matter how many rows flow
  through, the same bounded-state story as the Misra-Gries pass in
  ``operators.frequent``.
- **Merge:** concatenate centroid lists, sort by mean (a stable
  mergesort — the result depends only on the multiset of centroids,
  not arrival order), and compress only if the count exceeds
  ``capacity``. Equal-weight-bucket compression assigns each centroid
  to the bucket containing its cumulative-weight midpoint, so one
  compression step moves any rank estimate by at most W/k.
- **Estimate:** centroid ``i`` represents points whose average rank is
  ``cum_{i-1} + (w_i - 1)/2``; the p-quantile interpolates linearly
  between the two centroids bracketing rank ``(W - 1) * p``.

**Exact regime** (what makes the registered query SQL-replayable):
while a group's total point count stays ≤ ``capacity``, no compression
ever fires, every weight is 1, midpoint ranks degenerate to 0..n-1,
and the estimator IS the classic linear-interpolation percentile —
bit-identical to Spark's ``percentile`` and DuckDB's ``quantile_cont``
(the same pairing ``orders_exact_percentiles`` already pins). Beyond
``capacity`` the sketch genuinely sketches: rank error is bounded by
~W/k per compression level (two levels end-to-end: partition build +
final merge) and pinned empirically in tests/test_approx.py; in the
approximate regime the answer may depend on partitioning within that
bound, exactly like t-digest.

Reference scope: the reference engine's only quantile is a pandas
``describe`` over an in-memory frame (SURVEY §2.6); this tier exists
for the 100 TB profiling regime.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: raw points a sketch may hold before compression fires — also the
#: exactness boundary: groups at or under this size are EXACT
DEFAULT_CAPACITY = 4096
#: centroids after one compression — rank error ~W/k per level
DEFAULT_K = 256


def _compress(means: np.ndarray, weights: np.ndarray, k: int):
    """Sorted weighted points → ≤ k centroids, deterministically.

    Each point lands in the equal-weight bucket containing its
    cumulative-weight midpoint; consecutive same-bucket points fuse
    into one weight-averaged centroid. No RNG, no scale function —
    the reduction is a pure function of the (mean, weight) multiset."""
    total = float(weights.sum())
    mid = np.cumsum(weights, dtype=np.float64) - weights / 2.0
    bucket = np.minimum((mid * k / total).astype(np.int64), k - 1)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    wsum = np.add.reduceat(weights, starts)
    msum = np.add.reduceat(means * weights, starts)
    return msum / wsum, wsum


def _sort_points(means: np.ndarray, weights: np.ndarray):
    order = np.argsort(means, kind="mergesort")
    return means[order], weights[order]


def _quantile(means: np.ndarray, weights: np.ndarray, p: float) -> float:
    """p-quantile from sorted weighted centroids (docstring above).
    With all weights 1 this is exactly ``v[lo] * (1 - frac) +
    v[hi] * frac`` at ``h = (n - 1) * p`` — bit-for-bit DuckDB's
    ``quantile_cont`` interpolation (NOT the algebraically-equal
    ``lo + frac * (hi - lo)``, which differs in the last ulp — the
    exact-regime oracle hash-compares doubles exactly)."""
    total = int(weights.sum())
    cum = np.cumsum(weights, dtype=np.float64)
    ranks = cum - weights + (weights - 1) / 2.0
    h = p * (total - 1)
    if h <= ranks[0]:
        return float(means[0])
    if h >= ranks[-1]:
        return float(means[-1])
    i = int(np.searchsorted(ranks, h, side="right")) - 1
    frac = (h - ranks[i]) / (ranks[i + 1] - ranks[i])
    return float(means[i] * (1.0 - frac) + means[i + 1] * frac)


def _sketch_schema(group_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [
            *group_fields,
            T.StructField("q_means", T.ArrayType(T.DoubleType())),
            T.StructField("q_weights", T.ArrayType(T.LongType())),
        ]
    )


def build_quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    capacity: int = DEFAULT_CAPACITY,
    k: int = DEFAULT_K,
) -> DataFrame:
    """One quantile sketch per group: ``group_cols + (q_means,
    q_weights)``. Two phases, mirroring the MG heavy-hitter shape:
    a bounded-state mapInPandas folds each partition's rows into
    per-group summaries (only summaries shuffle — at most
    ``capacity + k`` floats per group per task), then one applyInPandas
    per group merges the partials. NULL/NaN values are excluded by
    contract (DuckDB's quantile_cont and Spark's percentile both skip
    them); groups with no non-null values emit no row."""
    group_cols = list(group_cols)
    proj = df.select(*group_cols, F.col(value_col).alias("__v")).where(
        ~F.isnull("__v") & ~F.isnan("__v")
    )
    group_fields = [proj.schema[c] for c in group_cols]
    schema = _sketch_schema(group_fields)

    def build_partials(batches):
        import pandas as pd

        bufs: dict = {}  # group key → (list of raw chunks, ...) state

        def fold(key, vals):
            means, weights, chunks, n = bufs.get(key, (None, None, [], 0))
            chunks.append(vals)
            n += len(vals)
            if n > capacity:
                flat = np.concatenate(chunks)
                w = np.ones(len(flat), np.int64)
                if means is not None:
                    flat = np.concatenate([means, flat])
                    w = np.concatenate([weights, w])
                means, weights = _compress(*_sort_points(flat, w), k)
                chunks, n = [], 0
            bufs[key] = (means, weights, chunks, n)

        for pdf in batches:
            # dropna=False: Spark/DuckDB GROUP BY keeps null keys as a
            # group; pandas' default silently discards those rows
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                fold(key, sub["__v"].to_numpy(np.float64))
        out = []
        for key, (means, weights, chunks, n) in bufs.items():
            if chunks:
                # emitted UNSORTED: merge_group re-sorts the concat of
                # all partials anyway, so a flush-time sort is waste
                flat = np.concatenate(chunks)
                w = np.ones(len(flat), np.int64)
                if means is not None:
                    flat = np.concatenate([means, flat])
                    w = np.concatenate([weights, w])
                means, weights = flat, w
            out.append(
                (*key, means.tolist(), weights.tolist())
            )
        if out:
            yield pd.DataFrame(
                out, columns=[*group_cols, "q_means", "q_weights"]
            )

    partials = proj.mapInPandas(build_partials, schema=schema)

    def merge_group(pdf):
        import pandas as pd

        means = np.concatenate([np.asarray(m, np.float64) for m in pdf["q_means"]])
        weights = np.concatenate(
            [np.asarray(w, np.int64) for w in pdf["q_weights"]]
        )
        means, weights = _sort_points(means, weights)
        if len(means) > capacity:
            means, weights = _compress(means, weights, k)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["q_means"] = [means.tolist()]
        row["q_weights"] = [weights.tolist()]
        return pd.DataFrame(row)

    return partials.groupBy(*group_cols).applyInPandas(merge_group, schema=schema)


def quantile_estimates(
    sketches: DataFrame,
    group_cols: Sequence[str],
    probs: dict[str, float],
    capacity: int = DEFAULT_CAPACITY,
    k: int = DEFAULT_K,
    count_col: str = "n_values",
) -> DataFrame:
    """Merge pre-built sketches to (possibly coarser) ``group_cols``
    and emit one scalar column per entry of ``probs`` plus the exact
    total point count. Merging concatenates WITHOUT recompressing when
    the union stays under ``16 * capacity`` centroids (strictly more
    accurate); a pathologically wide union folds down first so the
    estimator's input stays bounded."""
    group_cols = list(group_cols)
    group_fields = [sketches.schema[c] for c in group_cols]
    schema = T.StructType(
        [
            *group_fields,
            T.StructField(count_col, T.LongType()),
            *[T.StructField(name, T.DoubleType()) for name in probs],
        ]
    )

    def estimate(pdf):
        import pandas as pd

        means = np.concatenate([np.asarray(m, np.float64) for m in pdf["q_means"]])
        weights = np.concatenate(
            [np.asarray(w, np.int64) for w in pdf["q_weights"]]
        )
        means, weights = _sort_points(means, weights)
        if len(means) > 16 * capacity:
            means, weights = _compress(means, weights, 4 * k)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row[count_col] = [int(weights.sum())]
        for name, p in probs.items():
            row[name] = [_quantile(means, weights, p)]
        return pd.DataFrame(row)

    return sketches.groupBy(*group_cols).applyInPandas(estimate, schema=schema)
