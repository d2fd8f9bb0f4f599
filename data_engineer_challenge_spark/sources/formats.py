"""Generic format readers/writers (pyspark guide: sources & sinks).

Parquet is the engine's native storage; CSV/JSON/ORC cover interchange.
Schemas are always declared — ``inferSchema`` costs an extra full scan
and guesses types (the reference's leading-zero hospital IDs are
exactly what inference destroys, exo_1.py:30).
"""

from __future__ import annotations

from collections.abc import Sequence

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
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_partitions: int = 1,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a table directory into
    ``target_partitions`` files (per partition dir when
    ``partition_by`` is given; micro-batch MERGE writers accumulate
    small files and scans degrade with file count).

    A partitioned layout must be declared via ``partition_by`` —
    compacting one without it would silently flatten the directory
    layout and destroy partition pruning, so that case raises. Sidecar
    files (``_wh_meta.json`` etc.) are carried over. The swap keeps
    the previous directory as ``.old`` until the new one is in place.

    Crash contract (weaker than ParquetWarehouse, which heals on
    read): a crash between the two renames leaves the data ONLY at
    ``.old`` — readers fail until the next compact() call, which
    restores it before doing anything else (heal-on-next-compact).
    No crash instant loses data."""
    import os
    import shutil

    # heal a crashed previous swap FIRST: path missing + .old present
    # means a compact died between its two renames
    _old = f"{path}.old"
    if not os.path.isdir(path) and os.path.isdir(_old):
        os.rename(_old, path)

    part_dirs = [
        e for e in os.listdir(path)
        if "=" in e and os.path.isdir(os.path.join(path, e))
    ]
    if part_dirs and not partition_by:
        raise ValueError(
            f"compact: {path!r} has partition dirs ({part_dirs[0]}, …) "
            "but no partition_by was given — compacting would flatten "
            "the layout and break partition pruning"
        )
    sidecars = [
        e for e in os.listdir(path)
        if e.startswith("_") and os.path.isfile(os.path.join(path, e))
        and not e.endswith(".crc") and e != "_SUCCESS"
    ]
    df = spark.read.format(fmt).load(path)
    staged = f"{path}.compacting"
    writer = df.coalesce(target_partitions).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(staged)
    for s in sidecars:
        shutil.copy2(os.path.join(path, s), os.path.join(staged, s))
    old = f"{path}.old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
