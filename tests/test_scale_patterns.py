"""Scale-pattern verification: salting preserves join semantics, and
bucketed tables co-locate joins (no shuffle Exchange in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineer_challenge_spark.operators.skew import salted_join


def test_salted_join_row_identical(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = {(r["k"], r["payload"], r["dim_val"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["k"], r["payload"], r["dim_val"])
        for r in salted_join(big, small, ["k"], n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 10_000


def test_salted_join_deterministic_salts(spark):
    big = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.range(0, 3).select(F.col("id").alias("k"))
    a = salted_join(big, small, ["k"]).count()
    b = salted_join(big, small, ["k"]).count()
    assert a == b == 1000


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from data_engineer_challenge_spark.tables import load_table

    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    for name, df, key in [("b_lineitem", li, "l_orderkey"), ("b_orders", orders, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(root / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    return "b_lineitem", "b_orders"


def test_bucketed_join_avoids_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    orders = spark.table(o_name)
    joined = li.join(
        orders.hint("merge"), li.l_orderkey == orders.o_orderkey
    ).select("l_orderkey", "o_totalprice")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan  # co-located scan

    # and it still computes the right thing
    expected = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    )
    assert joined.count() == expected
