"""Exactly-once streaming ingest into the warehouse
(SURVEY.md §2.7 — the foreachBatch + MERGE pattern).

Structured Streaming's checkpoint gives at-least-once batch delivery;
the keyed MERGE makes the sink idempotent, so replays after failure
produce no duplicates — the standard exactly-once recipe without a
transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import keep_first_dedup
from ..operators.merge import ParquetWarehouse


def ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    wh: ParquetWarehouse,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available files from ``source_dir`` into
    ``wh.table`` via keyed MERGE micro-batches (trigger availableNow —
    bounded, so callers/tests control the lifecycle).

    In-batch key collisions resolve DETERMINISTICALLY (keep-first by
    the row's non-key values as a total order): ``dropDuplicates``
    would keep whichever row survives the shuffle, so a replayed batch
    could commit a different row than the crashed original — values
    must be replay-stable for the exactly-once claim to hold, not just
    row counts."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        others = sorted(c for c in batch_df.columns if c not in keys)
        deduped = keep_first_dedup(
            batch_df, keys, [F.struct(*others)] if others else keys
        )
        wh.merge_upsert(table, deduped, keys)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
