"""Bounded-state frequent-item (heavy hitter) detection.

The naive "GROUP BY key HAVING COUNT(*) > threshold" is exact but its
hash aggregate carries one state entry PER DISTINCT KEY — at 100 TB a
high-cardinality key column (user ids, IPs, n-grams) makes that state
the job's memory ceiling. The classic fix is a two-pass candidate /
verify split built on the Misra-Gries summary (Misra & Gries 1982;
"mergeable summaries", Agarwal et al., PODS'12):

- **Pass 1 (candidates, bounded state):** every partition streams its
  rows through a Misra-Gries summary with ``capacity`` counters — at
  most ``capacity`` (key, count) pairs of state per task no matter how
  many distinct keys the partition holds. MG's guarantee, summed over
  partitions: any key whose GLOBAL count exceeds ``n / capacity`` must
  survive in at least one partition's summary (if it were evicted
  everywhere, each eviction decrements ≥ ``n_p / capacity`` other
  counters, which bounds its global count below the threshold). The
  union of the per-partition survivors is therefore a complete — if
  over-inclusive — candidate set, of at most ``capacity × partitions``
  keys (driver-bounded: ≤ a few thousand, vs unbounded distinct keys).
- **Pass 2 (verify, exact):** one more scan counts ONLY the candidate
  keys (broadcast semi-join — no shuffle of non-candidates) and keeps
  those with exact count strictly greater than ``n / capacity``.

The output is exact and deterministic — precisely the keys with
``count > n/capacity`` and their true counts, independent of
partitioning, row order, and which extra candidates MG happened to
retain — which is what makes the whole operator SQL-replayable even
though no SQL engine would execute it this way.

Reference scope: the reference engine has no sketching tier at all
(its aggregation is pandas ``value_counts`` in memory); this operator
exists for the 100 TB regime the challenge targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_partition(col: str, capacity: int):
    """Arrow kernel: fold one partition's batches into a Misra-Gries
    summary of at most ``capacity`` counters. Batch-wise merge: add the
    batch's exact value_counts into the summary (transiently larger),
    then if more than ``capacity`` keys survive, subtract the
    (capacity+1)-th largest count from every counter and drop the
    non-positive ones — the standard mergeable-summaries reduction,
    preserving the "global heavies survive somewhere" guarantee.

    Emits ONE row per non-empty partition: ``(part_rows, keys)`` — the
    partition's exact row count plus the surviving candidate keys. The
    row count rides along so the operator's total-n never needs a
    separate scan of the input (three scans → two)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        state: dict = {}
        part_rows = 0
        for pdf in batches:
            part_rows += len(pdf)
            for k, c in pdf[col].value_counts().items():
                state[k] = state.get(k, 0) + int(c)
            if len(state) > capacity:
                counts = np.fromiter(state.values(), dtype=np.int64)
                # value of the (capacity+1)-th largest counter
                cut = int(np.partition(counts, -capacity - 1)[-capacity - 1])
                state = {
                    k: c - cut for k, c in state.items() if c - cut > 0
                }
        if part_rows:
            yield pd.DataFrame(
                {"part_rows": [part_rows], "keys": [list(state.keys())]}
            )

    return fn


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 128
) -> DataFrame:
    """Exact keys of ``df[col]`` with count strictly greater than
    ``total_rows / capacity``, computed with per-task state bounded by
    ``capacity`` counters (docstring above). Returns
    ``(col, n_rows, share)`` — exact count and fraction of the total.

    Exactly TWO scans of the input: pass 1 (the MG kernel) emits one
    tiny ``(part_rows, keys)`` row per partition, carrying both the
    candidate set and the partition's row count — so the total ``n`` is
    a single-row aggregate over the materialized summary, not a third
    scan. The verify pass is a broadcast LEFT SEMI join against the
    (distributed, never driver-collected) candidate frame: at 100 TB
    the candidate set is capacity × tasks keys — fine to broadcast,
    fatal to bake into the plan as IN-list literals. The summary frame
    (≤ one row per task, ≤ capacity keys each) is checkpointed so both
    derivations read one materialization; its footprint is a few KB per
    thousand tasks.

    NULL keys are excluded by contract (filtered before either pass):
    pandas ``value_counts`` and SQL ``IN`` both drop NULLs, so a NULL
    group could never round-trip the two-pass machinery — excluding it
    explicitly keeps the operator's output well-defined and its SQL
    replay exact (the registered oracle filters NULLs identically)."""
    df = df.where(F.col(col).isNotNull())
    key_type = df.select(col).schema[0].dataType
    # localCheckpoint, not persist(): both materialize the tiny
    # summary once for its two consumers, but a CacheManager entry
    # outlives the call (nothing can unpersist it after the lazy
    # result frame escapes), leaking a cached block per invocation
    # for the session lifetime; a checkpointed RDD is released by the
    # ContextCleaner once the result frame is garbage collected. The
    # trade: checkpoint blocks are not lineage-recoverable, so losing
    # an executor that held them between the two passes fails the
    # query instead of recomputing — on a preemptible/dynamic-
    # allocation fleet, point spark.checkpoint.dir at reliable
    # storage and swap this for checkpoint(), same shape.
    summary = df.select(col).mapInPandas(
        _mg_partition(col, capacity),
        schema=T.StructType(
            [
                T.StructField("part_rows", T.LongType()),
                T.StructField("keys", T.ArrayType(key_type)),
            ]
        ),
    ).localCheckpoint()
    # Single-row aggregate collect on the materialized summary.
    n_row = summary.agg(F.sum("part_rows").alias("n")).collect()[0]
    n = int(n_row["n"] or 0)
    if n == 0:
        return df.select(
            df[col],
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0.0).alias("share"),
        ).limit(0)
    cand_df = summary.select(
        F.explode("keys").alias(col)
    ).distinct()
    threshold: Column = F.lit(n) / F.lit(capacity)
    return (
        df.join(F.broadcast(cand_df), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > threshold)
        .withColumn("share", F.col("n_rows") / F.lit(float(n)))
    )
