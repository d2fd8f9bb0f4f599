"""Loaders for the driver testdata star schema.

``spark.read.parquet`` with the declared schema — Catalyst prunes
columns and pushes filters into the scan; at cluster scale the same
call reads a partitioned/bucketed table layout unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TESTDATA, TESTDATA_TABLES

# events.ts is physically TIMESTAMP(NANOS) which Spark's parquet reader
# rejects; read it as raw nanos (legacy.parquet.nanosAsLong) and divide
# down to micros with exact integer division (truncation — matching how
# DuckDB narrows ns to its µs timestamps).
_EVENTS_RAW = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in TESTDATA["events"].fields
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA:
        raise KeyError(f"unknown testdata table {name!r}")
    # engine semantics are UTC (and the DuckDB oracle is UTC-naive);
    # set defensively in case the caller's session pinned another zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(_EVENTS_RAW).parquet(f"{sf_dir}/{name}.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
