"""Generic format readers/writers (pyspark guide: sources & sinks).

Parquet is the engine's native storage; CSV/JSON/ORC cover interchange.
Schemas are always declared — ``inferSchema`` costs an extra full scan
and guesses types (the reference's leading-zero hospital IDs are
exactly what inference destroys, exo_1.py:30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READERS = ("parquet", "orc", "json", "csv")


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    **options: str,
) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Partitioned layout (``partition_by``) is the 100 TB lever:
    partition-pruned scans read only matching directories (verified in
    tests via PartitionFilters in the plan)."""
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def compact(
    spark: SparkSession, path: str, fmt: str = "parquet", target_partitions: int = 1
) -> None:
    """Small-file compaction: rewrite a table directory into
    ``target_partitions`` files per partition dir (micro-batch MERGE
    writers accumulate small files; scans degrade with file count)."""
    df = spark.read.format(fmt).load(path)
    staged = f"{path}.compacting"
    df.coalesce(target_partitions).write.mode("overwrite").format(fmt).save(staged)
    import shutil

    shutil.rmtree(path)
    import os

    os.rename(staged, path)
