"""Relational core query library (SURVEY.md §2.2-2.6).

The reference has no group-by/window/sort (SURVEY §2.6) — these queries
demonstrate the engine surface its harness requires, expressed so that
Catalyst chooses the physical plan: filters sit next to scans (pushed
into parquet), small dimensions are broadcast, aggregates combine
map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from . import register
from .helpers import bigint_sum_sql, dec_avg, dec_avg_sql, dec_sum, dec_sum_sql

# ---------------------------------------------------------------------------
# Flagship: revenue by nation inside one region over a date window.
# lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region — scan/filter/join/agg/
# sort/limit in one plan (SURVEY §7 phase 0).  At 100 TB: lineitem⋈orders
# is the one big shuffle (both sides huge, equi-key); customer is
# mid-size (shuffle or broadcast per AQE stats); nation/region are
# broadcast.  The date filter prunes at the parquet scan.
# ---------------------------------------------------------------------------


@register(
    "flagship_regional_revenue",
    oracle=f"""
    SELECT n_name,
           {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style revenue rollup (replaces reference per-row lookups,
    exo_2.py:204-217, with hash joins)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(dims, customer.c_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )
