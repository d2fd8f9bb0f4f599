"""Exactly-once streaming ingest into the warehouse
(SURVEY.md §2.7 — the foreachBatch + MERGE pattern).

Structured Streaming's checkpoint gives at-least-once batch delivery;
the keyed MERGE makes the sink idempotent, so replays after failure
produce no duplicates — the standard exactly-once recipe without a
transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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
    bounded, so callers/tests control the lifecycle)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        wh.merge_upsert(table, batch_df.dropDuplicates(keys), keys)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
