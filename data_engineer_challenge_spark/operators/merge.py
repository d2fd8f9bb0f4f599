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
