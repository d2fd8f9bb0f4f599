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
