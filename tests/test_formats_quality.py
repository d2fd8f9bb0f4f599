"""Format round-trips, partition pruning, compaction, quality checks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineer_challenge_spark.operators.quality import (
    check_referential,
    check_unique_key,
    run_checks,
)
from data_engineer_challenge_spark.schemas import TESTDATA
from data_engineer_challenge_spark.sources.formats import compact, read_table, write_table
from data_engineer_challenge_spark.tables import load_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / fmt)
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, TESTDATA["nation"], fmt=fmt)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_table(ev, path, partition_by=["day"])
    assert any(d.startswith("day=") for d in os.listdir(path))

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:80]
    want = ev.filter(F.col("day") == "2024-01-05").count()
    assert back.count() == want > 0


def test_compaction(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "frag")
    ev.repartition(16).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    compact(spark, path, target_partitions=1)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before > n_after == 1
    assert spark.read.parquet(path).count() == ev.count()


def test_run_checks_single_pass(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    results = {
        r.name: r
        for r in run_checks(
            orders,
            {
                "orderkey_not_null": F.col("o_orderkey").isNotNull(),
                "price_positive": F.col("o_totalprice") > 0,
                "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
                "always_fails": F.lit(False),
            },
        )
    }
    assert results["orderkey_not_null"].passed
    assert results["price_positive"].passed
    assert results["status_in_domain"].passed
    assert results["always_fails"].failed_rows == results["always_fails"].total_rows


def test_run_checks_null_condition_counts_as_failure(spark):
    """A check evaluating to NULL (three-valued logic) must fail the
    row — a data-quality gate that lets nulls slip through is a hole."""
    df = spark.createDataFrame([(1,), (None,), (-1,)], "x int")
    res = {r.name: r for r in run_checks(df, {"x_pos": F.col("x") > 0})}
    assert res["x_pos"].failed_rows == 2  # the null AND the negative


def test_asof_join_null_payload_is_still_the_match(spark):
    """A right row whose payload column is legitimately NULL must be
    the match (not fall back to a stale earlier non-null row), and must
    survive how='inner'."""
    from data_engineer_challenge_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10), ("k", 20)], "k string, t long")
    right = spark.createDataFrame(
        [("k", 5, "old"), ("k", 15, None)], "k string, t long, v string"
    )
    out = {
        (r["t"], r["asof_v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"], how="inner",
        ).collect()
    }
    # t=10 matches the t=5 row ('old'); t=20 matches the t=15 row whose
    # payload is genuinely NULL — not 'old', and not dropped
    assert out == {(10, "old"), (20, None)}


def test_unique_and_referential_checks(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    assert check_unique_key(orders, ["o_orderkey"]).passed
    dup = orders.limit(1).unionAll(orders.limit(1))
    assert check_unique_key(dup, ["o_orderkey"]).failed_rows == 2
    fk = check_referential(orders, customer, fk="o_custkey", pk="c_custkey")
    assert fk.passed  # testdata is referentially intact
