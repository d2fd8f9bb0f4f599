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

    # Pick a day that exists in the fixture rather than hardcoding one:
    # the driver regenerates testdata between rounds and individual days
    # can be absent at small scale factors.
    target_day = (
        ev.where(F.col("day").isNotNull())
        .groupBy("day")
        .count()
        .orderBy(F.desc("count"))
        .first()["day"]
    )
    assert target_day is not None, "fixture has no non-null event days"

    back = spark.read.parquet(path).filter(F.col("day") == target_day)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:80]
    want = ev.filter(F.col("day") == target_day).count()
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


def test_asof_join_ignores_null_right_ts_and_validates_how(spark):
    """A right row with NULL right_ts ('as of an unknown time') must
    never be a match — in the ascending nulls-first window it would
    otherwise forward-fill as a bogus match for left rows with no real
    predecessor. And an unknown `how` raises instead of silently
    behaving as 'left'."""
    import pytest

    from data_engineer_challenge_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("k", None, "ghost"), ("k", 15, "future")],
        "k string, t long, v string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_payload=["v"], how="inner",
    ).collect()
    assert out == []  # no real prior row: dropped, not matched 'ghost'

    with pytest.raises(ValueError, match="how"):
        asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"], how="left_outer",
        )


def test_range_join_rejects_outer_how(spark):
    """bucketed_range_join would silently drop an outer join's
    null-extended rows in the containment filter — it must raise."""
    import pytest

    from data_engineer_challenge_spark.operators.range_join import (
        bucketed_range_join,
    )

    pts = spark.createDataFrame([(1.0,)], "x double")
    iv = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="inner"):
        bucketed_range_join(pts, iv, "x", "lo", "hi", 5.0, how="left")


def test_compaction_partitioned(spark, tmp_path):
    """compact() must preserve a partitioned layout when told about
    it, and refuse to silently flatten one when not."""
    import pytest

    from data_engineer_challenge_spark.sources.formats import compact

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "part")
    ev.repartition(4).write.partitionBy("day").parquet(path)
    with pytest.raises(ValueError, match="partition"):
        compact(spark, path)
    dirs_before = {d for d in os.listdir(path) if d.startswith("day=")}
    compact(spark, path, partition_by=["day"], target_partitions=1)
    dirs_after = {d for d in os.listdir(path) if d.startswith("day=")}
    assert dirs_after == dirs_before
    n_files = sum(
        1
        for d in dirs_after
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet")
    )
    assert n_files == len(dirs_after)  # one file per partition dir
    assert spark.read.parquet(path).count() == ev.count()


def test_asof_join_matches_bruteforce_reference(spark):
    """Property check on seeded random data: for every left row the
    as-of match must be the right row with the greatest right_ts <=
    left_ts in the same key group (ties on ts broken by the dedup rule
    callers apply — here right rows are unique per (k, t) by
    construction), computed independently in plain Python."""
    import random

    from data_engineer_challenge_spark.operators.asof import asof_join

    rng = random.Random(42)
    keys = ["a", "b", "c", "d"]
    left_rows = [
        (k, rng.randint(0, 1000)) for k in keys for _ in range(40)
    ]
    right_rows = list(
        {(k, rng.randint(0, 1000)) for k in keys for _ in range(30)}
    )
    right_rows = [(k, t, f"{k}{t}") for k, t in right_rows]

    left = spark.createDataFrame(left_rows, "k string, t long")
    right = spark.createDataFrame(right_rows, "k string, t long, v string")
    got = {
        (r["k"], r["t"], r["asof_v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"], how="left",
        ).collect()
    }

    by_key: dict[str, list[tuple[int, str]]] = {}
    for k, t, v in right_rows:
        by_key.setdefault(k, []).append((t, v))
    want = set()
    for k, t in left_rows:
        prior = [(rt, rv) for rt, rv in by_key.get(k, []) if rt <= t]
        want.add((k, t, max(prior)[1] if prior else None))
    assert got == want


def test_range_join_matches_bruteforce_reference(spark):
    """Property check on seeded random data: bucketed_range_join must
    return exactly the (point, interval) pairs with lo <= p < hi —
    bucketing is an implementation detail that may not change the
    result, including for intervals spanning many buckets and points
    on bucket boundaries."""
    import random

    from data_engineer_challenge_spark.operators.range_join import (
        bucketed_range_join,
    )

    rng = random.Random(7)
    pts = [(i, round(rng.uniform(0, 100), 3)) for i in range(300)]
    ivs = []
    for i in range(60):
        lo = round(rng.uniform(0, 95), 3)
        ivs.append((i, lo, round(lo + rng.uniform(0.1, 30), 3)))

    points = spark.createDataFrame(pts, "pid long, x double")
    intervals = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    got = {
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            points, intervals, "x", "lo", "hi", bucket_width=5.0
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x < hi
    }
    assert got == want and len(want) > 100


def test_unique_and_referential_checks(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    assert check_unique_key(orders, ["o_orderkey"]).passed
    dup = orders.limit(1).unionAll(orders.limit(1))
    assert check_unique_key(dup, ["o_orderkey"]).failed_rows == 2
    fk = check_referential(orders, customer, fk="o_custkey", pk="c_custkey")
    assert fk.passed  # testdata is referentially intact


def test_events_loader_handles_both_timestamp_units(spark, tmp_path):
    """The driver testdata has shipped events.ts as TIMESTAMP(NANOS) in
    some generations and TIMESTAMP(MICROS) in others. load_table sniffs
    the parquet footer and must produce identical wall-clock timestamps
    for both physical encodings — assuming one unit silently compresses
    or inflates every timestamp 1000x (which broke every time-bucketed
    events query in round 3)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineer_challenge_spark.tables import load_table

    ts = [
        datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
        datetime.datetime(2024, 1, 30, 23, 57, 12, 194062),
    ]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(['{"k": 1}', '{"k": 2}']),
    }
    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        table = pa.table({**cols, "ts": pa.array(ts, pa.timestamp(unit))})
        pq.write_table(table, str(d / "events.parquet"))
        got = {
            (r["event_id"], r["ts"])
            for r in load_table(spark, str(d), "events")
            .select("event_id", "ts")
            .collect()
        }
        assert got == {(1, ts[0]), (2, ts[1])}, (unit, got)


def test_compact_heals_crashed_swap(spark, tmp_path):
    """A compact() crash between its two renames leaves the data only
    at .old; the next compact() must restore it before proceeding
    (heal-on-next-compact), never losing rows."""
    import shutil

    from data_engineer_challenge_spark.sources.formats import compact

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "t")
    nation.repartition(4).write.parquet(path)
    n = nation.count()
    # simulate the crash window: path renamed away, staged never landed
    shutil.move(path, path + ".old")
    assert not os.path.isdir(path)
    compact(spark, path, target_partitions=1)
    assert spark.read.parquet(path).count() == n
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 1


def test_asof_join_forward_and_tolerance_match_bruteforce(spark):
    """merge_asof semantics for the new knobs, checked against an
    independent Python reference on seeded random data: 'forward'
    attaches the EARLIEST right with right_ts >= left_ts; tolerance
    discards matches farther than the window (null under 'left');
    and an unknown direction raises."""
    import random

    import pytest

    from data_engineer_challenge_spark.operators.asof import asof_join

    rng = random.Random(7)
    keys = ["a", "b", "c"]
    left_rows = [(k, rng.randint(0, 500)) for k in keys for _ in range(30)]
    right_rows = [
        (k, t, f"{k}{t}")
        for k, t in {(k, rng.randint(0, 500)) for k in keys for _ in range(25)}
    ]
    left = spark.createDataFrame(left_rows, "k string, t long")
    right = spark.createDataFrame(right_rows, "k string, t long, v string")

    by_key: dict[str, list[tuple[int, str]]] = {}
    for k, t, v in right_rows:
        by_key.setdefault(k, []).append((t, v))

    for direction, tol in [("forward", None), ("forward", 40.0),
                           ("backward", 40.0)]:
        got = {
            (r["k"], r["t"], r["asof_v"])
            for r in asof_join(
                left, right, on=["k"], left_ts="t", right_ts="t",
                right_payload=["v"], how="left",
                direction=direction, tolerance=tol,
            ).collect()
        }
        want = set()
        for k, t in left_rows:
            if direction == "forward":
                cand = [(rt, rv) for rt, rv in by_key.get(k, []) if rt >= t]
                best = min(cand) if cand else None
            else:
                cand = [(rt, rv) for rt, rv in by_key.get(k, []) if rt <= t]
                best = max(cand) if cand else None
            if best is not None and tol is not None and abs(best[0] - t) > tol:
                best = None
            want.add((k, t, best[1] if best else None))
        assert got == want, (direction, tol)

    # inner + tolerance: out-of-window rows are DROPPED, not nulled
    inner = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_payload=["v"], how="inner", direction="forward",
        tolerance=40.0,
    ).collect()
    assert all(r["asof_v"] is not None for r in inner)

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"], direction="nearest",
        )


def test_asof_forward_null_left_ts_matches_nothing(spark):
    """'As of an unknown time' matches nothing in BOTH directions: a
    left row with NULL left_ts must traverse before every right row
    (nulls-first in the descending forward sort too), not absorb the
    minimum-ts right payload."""
    from data_engineer_challenge_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", None), ("k", 10)], "k string, t long")
    right = spark.createDataFrame([("k", 15, "next")], "k string, t long, v string")
    out = {
        (r["t"], r["asof_v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"], how="left", direction="forward",
        ).collect()
    }
    assert out == {(None, None), (10, "next")}
