"""Approximate-aggregate accuracy: sketches must track exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_challenge_spark import plans
from data_engineer_challenge_spark.tables import load_table

from .conftest import SF_ORACLE


def test_approx_stats_accuracy(spark):
    # sf0.01, not sf0.001: with 150 distinct users the KMV estimator
    # (k=32) actually engages instead of falling back to the exact
    # count, and the 1/4 hash-sample is ~500 rows per type — large
    # enough that the quantile tolerance below is a real bound rather
    # than sampling noise.
    plans._load()
    approx = {
        r["event_type"]: r
        for r in plans.REGISTRY["events_approx_stats"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for t in exact:
        assert approx[t]["n_events"] == exact[t]["n"]
        # KMV stderr ~ N/sqrt(k-1) ~ 18% at k=32
        assert abs(approx[t]["approx_users"] - exact[t]["users"]) <= max(
            2, 0.4 * exact[t]["users"]
        )
        p50_sketch = approx[t]["p50"]
        spread = max(1.0, abs(exact[t]["p50"]))
        assert abs(p50_sketch - exact[t]["p50"]) / spread < 0.25
        assert approx[t]["p50"] <= approx[t]["p90"] <= approx[t]["p99"]


def test_kmv_bounded_topk_matches_window_form(spark):
    """The production KMV path (per-partition mapInPandas prune +
    merge, bounded state) must compute the exact same k-th-minimum and
    fallback count as the reference rank-window form the DuckDB oracle
    replays — and its plan must contain no Window at all (the window
    form funnels every distinct user hash into ~n_types partitions: a
    skewed single-task sort at 100× scale)."""
    from pyspark.sql.window import Window

    from data_engineer_challenge_spark.plans.advanced import _KMV_K

    plans._load()
    q = plans.REGISTRY["events_approx_stats"].builder(spark, SF_ORACLE)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan, plan

    got = {r["event_type"]: r["approx_users"] for r in q.collect()}

    # reference form, inline: rank ALL distinct hashes, take row k
    ev = load_table(spark, SF_ORACLE, "events")
    h = F.conv(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    uh = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", h.alias("h"))
        .distinct()
    )
    ranked = uh.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    ref = ranked.groupBy("event_type").agg(
        F.max("rn").alias("n_seen"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
    )
    want = {}
    for r in ref.collect():
        if r["kth"] is not None:
            want[r["event_type"]] = (
                float(_KMV_K - 1) * float(2**60) / float(r["kth"] + 1)
            )
        else:
            want[r["event_type"]] = float(r["n_seen"])
    assert got == want


def test_hll_union_equals_direct_sketch(spark):
    """Mergeability, the property the persisted rollup rests on: the
    union of per-day sketches must estimate IDENTICALLY to one sketch
    built over the whole input — register-wise max is order- and
    grouping-independent. Asserted as exact equality, not a bound."""
    from data_engineer_challenge_spark.operators.sketches import (
        build_distinct_sketches,
        merge_distinct_estimate,
    )

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    daily = build_distinct_sketches(
        ev, "user_id", ["event_type", "day"]
    )
    merged = {
        r["event_type"]: r["n_distinct"]
        for r in merge_distinct_estimate(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["n_distinct"]
        for r in merge_distinct_estimate(
            build_distinct_sketches(ev, "user_id", ["event_type"]),
            ["event_type"],
        ).collect()
    }
    assert merged == direct and len(merged) > 0
    # and in the exact coupon regime the estimate IS the exact count
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == exact


def test_hll_error_bound_beyond_exact_regime(spark):
    """Past the coupon promotion point the dense HLL estimator takes
    over; its relative standard error at lg_k=14 is ~0.8%. Pin a 3
    sigma bound on a 100k-distinct synthetic input — the regime the
    oracle-backed query never enters but production would."""
    from data_engineer_challenge_spark.operators.sketches import (
        build_distinct_sketches,
        merge_distinct_estimate,
    )

    n = 100_000
    df = spark.range(n * 3).select(
        (F.col("id") % n).alias("u"), (F.col("id") % 16).alias("shard")
    )
    sk = build_distinct_sketches(df, "u", ["shard"])
    est = merge_distinct_estimate(sk).collect()[0]["n_distinct"]
    assert abs(est - n) / n < 3 * 1.04 / (2**14) ** 0.5


def test_hll_sketch_persisted_rollup_round_trip(spark, tmp_path):
    """The rollup table is real: binary sketches survive a parquet
    round-trip through SnapshotTable, a NEW day appends incrementally
    (no rebuild of prior days), and the range estimate over the
    combined table still equals the exact distinct count."""
    from data_engineer_challenge_spark.operators.sketches import (
        build_distinct_sketches,
        merge_distinct_estimate,
    )
    from data_engineer_challenge_spark.operators.snapshot import (
        SnapshotTable,
    )

    ev = load_table(spark, SF_ORACLE, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    head, tail = days[:-1], days[-1]
    tab = SnapshotTable(spark, str(tmp_path / "sk_rollup"))
    tab.append(
        build_distinct_sketches(
            ev.where(F.col("day") < tail), "user_id", ["day"]
        ),
        txn="d0",
    )
    tab.append(
        build_distinct_sketches(
            ev.where(F.col("day") == tail), "user_id", ["day"]
        ),
        txn="d1",
    )
    est = merge_distinct_estimate(tab.read()).collect()[0]["n_distinct"]
    exact = ev.select("user_id").distinct().count()
    assert est == exact
    assert tab.read().count() == len(days)  # one sketch row per day
