"""Warehouse tables + MERGE upsert (SURVEY.md §2.5 K1-K4, §4.3.4).

The reference upserts by UPDATE-every-row-then-INSERT-anti-join
(exo_1.py:206-209) against SQLite. The Spark-native equivalent is
``MERGE INTO`` on a transactional table format; Delta isn't on this
classpath, so ``ParquetWarehouse`` implements the observable MERGE
semantics over plain parquet: matched keys take the source row,
unmatched target rows survive, new source rows append — one anti-join
plus a union, staged to a new directory and atomically swapped
(never reading and overwriting the same files in one job).

On a cluster with Delta/Iceberg available, ``merge_upsert`` is the
single seam to replace with a real ``MERGE INTO``.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class ParquetWarehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        self._stage_and_swap(table, df)

    def merge_upsert(
        self, table: str, source: DataFrame, keys: Sequence[str]
    ) -> None:
        """MERGE semantics (K4): WHEN MATCHED UPDATE SET *,
        WHEN NOT MATCHED INSERT *. Idempotent: merging the same source
        twice leaves the table unchanged (tested)."""
        if not self.exists(table):
            self._stage_and_swap(table, source)
            return
        target = self.read(table)
        kept = target.join(source.select(*keys), on=list(keys), how="left_anti")
        merged = kept.unionByName(source)
        self._stage_and_swap(table, merged)

    def _stage_and_swap(self, table: str, df: DataFrame) -> None:
        final = self.path(table)
        staging = f"{final}.staging-{uuid.uuid4().hex[:8]}"
        # writing the staging dir materializes the plan (which may read
        # the current table) BEFORE the old data is removed
        df.write.mode("overwrite").parquet(staging)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(staging, final)


def scd2_upsert(
    wh: ParquetWarehouse,
    table: str,
    source: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    batch_id: int,
) -> None:
    """Slowly-changing-dimension type-2 upsert: instead of overwriting
    (the reference's UPDATE loop loses history, exo_1.py:134-155), each
    change closes the current row and appends a new version.

    Table gains: __version (per-key ordinal), __valid_from_batch,
    __valid_to_batch (null = current), __is_current.

    One pass: join current rows to the source on the key; unchanged
    rows stay; changed rows are closed (valid_to = batch) and a new
    version appends; brand-new keys start at version 1.
    """
    from pyspark.sql import functions as F

    src = source.select(*keys, *compare_cols).dropDuplicates(list(keys))

    if not wh.exists(table):
        initial = (
            src.withColumn("__version", F.lit(1).cast("int"))
            .withColumn("__valid_from_batch", F.lit(batch_id).cast("long"))
            .withColumn("__valid_to_batch", F.lit(None).cast("long"))
            .withColumn("__is_current", F.lit(True))
        )
        wh.overwrite(table, initial)
        return

    target = wh.read(table)
    history = target.filter(~F.col("__is_current"))
    current = target.filter(F.col("__is_current"))

    cmp_src = src.select(
        *[F.col(k) for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new_vals"),
    )
    joined = current.join(cmp_src, on=list(keys), how="full_outer")
    old_vals = F.struct(*[F.col(c) for c in compare_cols])

    # eqNullSafe: plain struct == yields NULL when a field is null on
    # either side, which would silently drop the row from every branch
    unchanged = joined.filter(
        F.col("__new_vals").isNotNull()
        & F.col("__version").isNotNull()
        & old_vals.eqNullSafe(F.col("__new_vals"))
    ).select(*target.columns)

    # rows whose key vanished from the source stay current (the CDW
    # feed is a full snapshot but absence != deletion, SURVEY §2.7)
    vanished = joined.filter(F.col("__new_vals").isNull()).select(*target.columns)

    changed = joined.filter(
        F.col("__new_vals").isNotNull()
        & F.col("__version").isNotNull()
        & ~old_vals.eqNullSafe(F.col("__new_vals"))
    )
    closed = changed.select(
        *[F.col(c) for c in target.columns if c != "__valid_to_batch" and c != "__is_current"],
        F.lit(batch_id).cast("long").alias("__valid_to_batch"),
        F.lit(False).alias("__is_current"),
    ).select(*target.columns)
    reopened = changed.select(
        *[F.col(k) for k in keys],
        *[F.col("__new_vals").getField(c).alias(c) for c in compare_cols],
        (F.col("__version") + 1).cast("int").alias("__version"),
        F.lit(batch_id).cast("long").alias("__valid_from_batch"),
        F.lit(None).cast("long").alias("__valid_to_batch"),
        F.lit(True).alias("__is_current"),
    ).select(*target.columns)

    brand_new = joined.filter(
        F.col("__new_vals").isNotNull() & F.col("__version").isNull()
    ).select(
        *[F.col(k) for k in keys],
        *[F.col("__new_vals").getField(c).alias(c) for c in compare_cols],
        F.lit(1).cast("int").alias("__version"),
        F.lit(batch_id).cast("long").alias("__valid_from_batch"),
        F.lit(None).cast("long").alias("__valid_to_batch"),
        F.lit(True).alias("__is_current"),
    ).select(*target.columns)

    result = history.unionByName(unchanged).unionByName(vanished).unionByName(
        closed
    ).unionByName(reopened).unionByName(brand_new)
    wh.overwrite(table, result)
