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


def test_quantile_sketch_exact_regime_is_quantile_cont(spark):
    """Below ``capacity`` points per group no compression fires and
    the estimator IS linear-interpolation quantile_cont, bit-for-bit
    (DuckDB's ``lo*(1-frac) + hi*frac`` arithmetic), independent of
    how the build was partitioned."""
    import numpy as np

    from data_engineer_challenge_spark.operators.quantiles import (
        build_quantile_sketches,
        quantile_estimates,
    )

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "value")
    probs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}

    def run(df):
        sk = build_quantile_sketches(df, "value", ["event_type"])
        return {
            r["event_type"]: (r["n_values"], r["p50"], r["p90"], r["p99"])
            for r in quantile_estimates(sk, ["event_type"], probs).collect()
        }

    got = run(ev.repartition(8))
    assert got == run(ev.repartition(2))  # partition-invariant
    # exact ground truth computed with the same formula on sorted values
    rows = ev.collect()
    by_type: dict = {}
    for r in rows:
        if r["value"] is not None and not np.isnan(r["value"]):
            by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        v = np.sort(np.asarray(vals, np.float64))
        n, want = len(v), [got[et][0]]
        assert got[et][0] == n
        for j, p in enumerate([0.5, 0.9, 0.99]):
            h = p * (n - 1)
            lo = int(np.floor(h))
            frac = h - lo
            hi = min(lo + 1, n - 1)
            exact = float(v[lo] * (1.0 - frac) + v[hi] * frac)
            assert got[et][1 + j] == exact, (et, p)


def test_quantile_sketch_bounded_state_and_error_beyond_regime(spark):
    """Past ``capacity`` the sketch genuinely compresses (centroid
    count pinned ≤ capacity, weights > 1) and the merged estimate's
    RANK error stays under 1% on a heavy-tailed 100k-value input —
    the regime the oracle-backed query never enters but production
    would."""
    import numpy as np
    import pandas as pd

    from data_engineer_challenge_spark.operators.quantiles import (
        build_quantile_sketches,
        quantile_estimates,
    )

    rng = np.random.default_rng(42)
    big = rng.lognormal(3.0, 1.5, 100_000)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * len(big), "v": big})
    ).repartition(8)
    sk = build_quantile_sketches(df, "v", ["g"])
    row = sk.collect()[0]
    assert len(row["q_means"]) <= 4096
    assert max(row["q_weights"]) > 1  # compression actually fired
    assert sum(row["q_weights"]) == len(big)  # no points lost
    est = quantile_estimates(
        sk, ["g"], {"p50": 0.5, "p90": 0.9, "p99": 0.99, "p999": 0.999}
    ).collect()[0]
    srt = np.sort(big)
    for name, p in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99), ("p999", 0.999)]:
        rank = np.searchsorted(srt, est[name]) / len(srt)
        assert abs(rank - p) < 0.01, (name, rank)


def test_quantile_sketch_persisted_rollup_round_trip(spark, tmp_path):
    """The rollup table is real: centroid arrays survive a parquet
    round-trip through SnapshotTable, a NEW day appends incrementally
    (no rebuild of prior days), and the day-range estimate over the
    combined table still matches the oracle-exact per-type answer."""
    from data_engineer_challenge_spark.operators.quantiles import (
        build_quantile_sketches,
        quantile_estimates,
    )
    from data_engineer_challenge_spark.operators.snapshot import SnapshotTable

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    tail = days[-1]
    tab = SnapshotTable(spark, str(tmp_path / "q_rollup"))
    tab.append(
        build_quantile_sketches(
            ev.where(F.col("day") < tail), "value", ["event_type", "day"]
        ),
        txn="d0",
    )
    tab.append(
        build_quantile_sketches(
            ev.where(F.col("day") == tail), "value", ["event_type", "day"]
        ),
        txn="d1",
    )
    from_rollup = {
        r["event_type"]: (r["n_values"], r["p50"])
        for r in quantile_estimates(
            tab.read(), ["event_type"], {"p50": 0.5}
        ).collect()
    }
    direct = {
        r["event_type"]: (r["n_values"], r["p50"])
        for r in quantile_estimates(
            build_quantile_sketches(ev, "value", ["event_type"]),
            ["event_type"],
            {"p50": 0.5},
        ).collect()
    }
    assert from_rollup == direct and len(from_rollup) > 0


def test_quantile_rollup_bench_config_actually_compresses(spark):
    """The bench claim is literal: under the registered query's
    capacity=512, sf0.1's (event_type, day) build groups (up to 739
    rows) genuinely compress — weights > 1, centroid counts ≤ k —
    while the sf ≤ 0.01 oracle scales never do."""
    from data_engineer_challenge_spark.operators.quantiles import (
        build_quantile_sketches,
    )

    big = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    rows = build_quantile_sketches(
        big, "value", ["event_type", "day"], capacity=512, k=64
    ).collect()
    assert any(max(r["q_weights"]) > 1 for r in rows)
    assert all(len(r["q_means"]) <= 512 for r in rows)

    small = load_table(spark, SF_ORACLE, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    srows = build_quantile_sketches(
        small, "value", ["event_type", "day"], capacity=512, k=64
    ).collect()
    assert all(max(r["q_weights"]) == 1 for r in srows)  # exact regime


def test_quantile_sketch_keeps_null_group_keys(spark):
    """A null group key is a GROUP in Spark/DuckDB semantics — the
    pandas-side build must not silently drop its rows (groupby
    dropna=False)."""
    import pandas as pd

    from data_engineer_challenge_spark.operators.quantiles import (
        build_quantile_sketches,
        quantile_estimates,
    )

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", None, None, None],
            "v": [1.0, 3.0, 10.0, 20.0, 30.0],
        }
    )
    df = spark.createDataFrame(pdf)
    est = {
        r["g"]: (r["n_values"], r["p50"])
        for r in quantile_estimates(
            build_quantile_sketches(df, "v", ["g"]), ["g"], {"p50": 0.5}
        ).collect()
    }
    assert est["a"] == (2, 2.0)
    assert est[None] == (3, 20.0)


def test_kmv_sketch_exact_regime_and_union_chaining(spark):
    """Below k distinct values the sketch IS the full hash set: every
    estimator returns exact integers, and unioning per-shard sketches
    equals the sketch of the whole (exact-regime mergeability)."""
    from data_engineer_challenge_spark.operators.sketches import (
        build_kmv_sketches,
        kmv_distinct_estimate,
        kmv_overlap,
        kmv_union_sketch,
    )

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    sk = build_kmv_sketches(ev, "user_id", ["event_type"])
    est = {
        r["event_type"]: r["n"]
        for r in sk.select(
            "event_type", kmv_distinct_estimate(F.col("kmv")).alias("n")
        ).collect()
    }
    exact = {
        r["event_type"]: float(r["n"])
        for r in ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est == exact and len(est) > 0

    # shard → union chaining: two half-sketches union to the full one
    half = build_kmv_sketches(
        ev.where("user_id % 2 = 0"), "user_id", ["event_type"], sketch_col="a"
    ).join(
        build_kmv_sketches(
            ev.where("user_id % 2 = 1"), "user_id", ["event_type"],
            sketch_col="b",
        ),
        "event_type",
    )
    chained = {
        r["event_type"]: r["u"]
        for r in half.select(
            "event_type",
            kmv_distinct_estimate(
                kmv_union_sketch(F.col("a"), F.col("b"))
            ).alias("u"),
        ).collect()
    }
    assert chained == exact

    # overlap estimators degenerate to exact set arithmetic
    row = half.where(F.col("event_type") == "view")
    o = kmv_overlap(F.col("a"), F.col("b"))
    r = row.select(
        o["n_intersect"].alias("i"), o["n_union"].alias("u"),
        o["jaccard"].alias("j"),
    ).collect()[0]
    assert r["i"] == 0.0 and r["u"] == exact["view"] and r["j"] == 0.0


def test_kmv_overlap_error_beyond_exact_regime(spark):
    """Past k distinct values the estimators genuinely estimate: on
    60k/50k-distinct synthetic cohorts with 20k true overlap, distinct
    counts land within 5% and Jaccard within 0.05 absolute at k=512
    (RSE ~ 1/sqrt(k) ~ 4.4%)."""
    from data_engineer_challenge_spark.operators.sketches import (
        build_kmv_sketches,
        kmv_overlap,
    )

    # cohort a: ids 0..59999; cohort b: 40000..89999 → overlap 20000,
    # union 90000, jaccard 2/9
    df = spark.range(90_000).select(
        F.col("id"),
        F.when(F.col("id") < 60_000, "a").otherwise(None).alias("in_a"),
        F.when(F.col("id") >= 40_000, "b").otherwise(None).alias("in_b"),
    )
    labeled = df.select(
        F.explode(
            F.array_compact(F.array("in_a", "in_b"))
        ).alias("cohort"),
        F.col("id").alias("uid"),
    )
    sk = build_kmv_sketches(labeled, "uid", ["cohort"])
    a = sk.where("cohort = 'a'").select(F.col("kmv").alias("a"))
    b = sk.where("cohort = 'b'").select(F.col("kmv").alias("b"))
    o = kmv_overlap(F.col("a"), F.col("b"))
    r = a.crossJoin(b).select(
        o["n_a"].alias("na"), o["n_b"].alias("nb"),
        o["n_union"].alias("u"), o["n_intersect"].alias("i"),
        o["jaccard"].alias("j"),
    ).collect()[0]
    assert abs(r["na"] - 60_000) / 60_000 < 0.05
    assert abs(r["nb"] - 50_000) / 50_000 < 0.05
    assert abs(r["u"] - 90_000) / 90_000 < 0.05
    assert abs(r["j"] - 2 / 9) < 0.05
    assert abs(r["i"] - 20_000) / 20_000 < 0.25  # product of two ests


def test_kmv_cohort_overlap_empty_cohort_still_one_row(spark):
    """An empty cohort must not make the overlap row vanish (the
    oracle's scalar subqueries always return one all-zero-overlap
    row): the grand aggregate emits one row with the missing sketch
    coalesced to the empty array."""
    import pandas as pd

    from data_engineer_challenge_spark import plans

    plans._load()
    b = plans.REGISTRY["events_cohort_overlap_sketch"].builder
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev = load_table(spark, SF_ORACLE, "events")
        # keep view rows eligible, push every purchase below threshold
        ev.withColumn(
            "value",
            F.when(F.col("event_type") == "purchase", F.lit(0.0)).otherwise(
                F.col("value")
            ),
        ).write.parquet(f"{d}/events.parquet")
        rows = b(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_purchase_hi"] == 0.0 and r["n_intersect"] == 0.0
    assert r["jaccard"] == 0.0 and r["n_view_hi"] > 0
