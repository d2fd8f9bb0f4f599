"""Conditional work-spreading for the Arrow/expression kernels (r14,
guide §2.4 — remove shuffles outright).

Several operators repartition their input to ``defaultParallelism``
before a per-row hashing/scoring kernel. The repartition exists for
ONE reason: a small input (one parquet file at the bench scale factors)
scans as a single task, and without the spread the kernel runs
one-core. But the repartition was unconditional, so at 100 TB — where
the scan already yields thousands of partitions — every one of those
operators paid a full shuffle of its payload (document text, embedding
vectors) purely to fix a local-mode parallelism problem that no longer
exists. Every kernel behind these call sites is row-deterministic
(hashes, signatures, codecs), so partitioning never changes results —
only where rows are computed.

:func:`spread` keeps the local behavior (below-parallelism inputs
still spread, bench timings unchanged) and removes the scale shuffle
(an input already at/above ``defaultParallelism`` passes through
untouched — plan-pinned by tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame, *key_cols: str, min_partitions: int | None = None
) -> DataFrame:
    """``df`` repartitioned by ``key_cols`` to ``min_partitions``
    (default ``defaultParallelism``) ONLY when its planned parallelism
    is below that — identity otherwise."""
    par = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *key_cols)
