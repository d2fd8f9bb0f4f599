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
