"""Streaming deduplication with watermark-bounded state.

The batch engine's exact dedup (operators/dedup.py, plans/dedup.py)
carries one state entry per distinct key for the lifetime of the job —
fine for a bounded input, fatal on an unbounded stream: at 100 TB/day
of events the seen-keys set IS the job's memory ceiling. The streaming
answer is ``dropDuplicatesWithinWatermark``: a duplicate key is
suppressed only while its first arrival is younger than the watermark
delay, after which the key's state is evicted — state is bounded by
(arrival rate x watermark horizon), independent of stream lifetime.

That bound is also the operator's honest contract: a duplicate that
arrives AFTER the original's state expired is re-emitted. For
exactly-once ingest the pattern composes with the keyed-MERGE sink
(streaming/ingest.py): the watermark dedup removes the high-frequency
near-in-time duplicates (retries, at-least-once sources) cheaply in
bounded state, and the idempotent MERGE catches the long tail.

Reference scope: the reference engine re-reads the full drop directory
every 30 s and dedups by file identity in pandas (script.py:28-57) —
the in-flight duplicate problem only appears once ingestion becomes a
real stream, which is why this operator has no reference counterpart
(SURVEY §2.7's T-series generalization).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First arrival per ``keys`` wins; later duplicates arriving
    within ``watermark`` of the first are dropped. On a static frame
    the same builder degenerates to exact keyed dedup (the equivalence
    the stream-vs-batch test pins — on inputs whose duplicates are
    full-row copies, both paths emit the identical row set).

    Unlike plain streaming ``dropDuplicates(keys)`` — which never
    evicts and grows state per distinct key forever — the
    within-watermark variant keys eviction off event time, which is
    what makes it deployable on an unbounded stream."""
    keys = list(keys)
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
