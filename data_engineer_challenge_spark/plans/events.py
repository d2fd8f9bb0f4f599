"""Time-series / event-stream query library (SURVEY.md §2.7 T6).

The reference's only temporal machinery is a 30 s polling loop; the
driver's ``events`` table exercises the real streaming surface. These
are the *batch-equivalent* plans (windowed aggregation, sessionization,
gap analysis, JSON props) — the Structured-Streaming versions of the
same aggregations live in ``streaming/`` and are tested there, since
DuckDB can't oracle a streaming query.

Scale notes: every query here groups or windows by (user_id) or a
time bucket — natural partition keys with bounded cardinality; windows
partition by user so no global-sort bottleneck; JSON parsing is
JVM-side ``get_json_object`` (codegen), not Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from . import register
from .helpers import dec_sum, dec_sum_sql


@register(
    "events_hourly_rollup",
    # r7: pytest-oracled — hour-bucket groupBy overlaps the windowed
    # events_sliding_daily_avg row; its driver slot rotated to
    # docs_exact_substring_dedup (the r6 flagship passage-dedup tier)
    driver=False,
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dec_sum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the §2.7 T6 demo)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum("value").alias("total_value"),
    )


@register(
    "events_sliding_daily_avg",
    # r7: rotated off the driver surface for docs_dsir_selection —
    # its sliding-window-over-time signal overlaps the surviving
    # events_training_examples (six RANGE windows on the same axis)
    # and events_weekly_retention; still pytest-oracled here
    driver=False,
    oracle=f"""
    SELECT day, event_type, n_events,
           CAST(ROUND(SUM(CAST(day_value AS DECIMAL(30,10)))
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
               AS value_7d
    FROM (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events,
               {dec_sum_sql('value')} AS day_value
        FROM events GROUP BY 1, 2
    )
    """,
)
def events_sliding_daily_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day window over a pre-aggregated daily rollup — the
    two-level pattern that keeps the window input small at scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("day_value"),
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "event_type",
        "n_events",
        F.sum(F.col("day_value").cast("decimal(30,10)"))
        .over(w)
        .cast("decimal(38,4)")
        .cast("double")
        .alias("value_7d"),
    )


@register(
    "events_sessionization",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               -- DuckDB SUM(int) over a window yields HUGEINT (hashes
               -- as float); Spark yields BIGINT — cast to int64.
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS sid
        FROM tagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {dec_sum_sql('value')} AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) through Spark's native
    ``session_window`` — the SAME operator the streaming twin uses
    (streaming/windows.py session_counts), here in batch mode, so the
    batch/stream parity claim is driver-checked, not just unit-tested.
    The classic lag+cumsum formulation is kept as a tested equivalence
    in tests/test_plans.py (parity on the full events table).

    Semantics edge worth pinning (verified empirically, not assumed):
    ``session_window`` MERGES two events whose gap is exactly the
    30 min gap — an event starting at the previous window's end joins
    that session — so a new session starts only when the gap is
    STRICTLY GREATER than 30 min, and the oracle mirrors that
    (``> INTERVAL 30 MINUTE``) with exact timestamp-interval
    arithmetic: the events table carries sub-second timestamps, so a
    second-truncating date_diff would mis-bucket boundary pairs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_pivot_unpivot",
    oracle="""
    SELECT user_id, event_type, n_events
    FROM (
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
        FROM events
        GROUP BY user_id
    ) UNPIVOT (n_events FOR event_type IN (click, view, purchase, signup, error))
    """,
)
def events_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to one column per event type, then unpivot (stack) back to
    long form — both reshaping directions in one plan. Conditional
    aggregation rather than ``.pivot()``: same plan shape, but zeros
    instead of nulls for absent combinations and no second pass to
    discover pivot values (which at 100 TB would be an extra full
    scan). The unpivot emits zero-count combinations explicitly, unlike
    a plain groupBy(user, type) — that difference is the point of the
    round-trip. DuckDB UNPIVOT drops NULL cells, so both sides emit
    only non-null (here: all) combinations."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(t) for t in types
    ]
    wide = ev.groupBy("user_id").agg(*aggs)
    return wide.unpivot(["user_id"], types, "event_type", "n_events")


@register(
    "events_json_props",
    # r13: rotated OFF the driver surface (VERDICT r12 #7) — its slot
    # went to warc_ingest_refresh (the crawl tier's first driver-hash
    # row). Verbatim-oracle rule: the JVM-side get_json_object /
    # codegen-filter machinery survives on the surface in
    # events_cube_profile's oracle family; the local pytest replica
    # still hash-checks this row every run.
    driver=False,
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k,
           CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50 THEN 'high' ELSE 'low' END
               AS k_band
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON props column — JVM-side get_json_object
    (no Python), filter stays in codegen."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .withColumn("k_band", F.when(F.col("k") >= 50, "high").otherwise("low"))
    )


@register(
    "events_funnel",
    # r7: pytest-oracled — the conditional-min funnel overlaps
    # events_weekly_retention's staged-aggregation shape; its driver
    # slot rotated to docs_pii_scrub (byte-exact cross-engine scrub)
    driver=False,
    oracle="""
    SELECT user_id,
           CAST(first_view IS NOT NULL AS INTEGER) AS viewed,
           CAST(first_click IS NOT NULL
                AND first_click > first_view AS INTEGER) AS clicked_after_view,
           CAST(first_purchase IS NOT NULL AND first_click > first_view
                AND first_purchase > first_click AS INTEGER) AS purchased_after_click
    FROM (
        SELECT user_id,
               MIN(ts) FILTER (event_type = 'view') AS first_view,
               MIN(ts) FILTER (event_type = 'click') AS first_click,
               MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view → click → purchase via conditional MIN —
    one aggregation pass, no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    base = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    clicked = F.col("first_click").isNotNull() & (
        F.col("first_click") > F.col("first_view")
    )
    return base.select(
        "user_id",
        F.col("first_view").isNotNull().cast("int").alias("viewed"),
        clicked.cast("int").alias("clicked_after_view"),
        (
            F.col("first_purchase").isNotNull()
            & clicked
            & (F.col("first_purchase") > F.col("first_click"))
        )
        .cast("int")
        .alias("purchased_after_click"),
    )


@register(
    "events_weekly_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week,
                              date_trunc('week', e.ts)) AS INTEGER) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted per
    weekly offset. The firsts table is user-cardinality (broadcastable
    at any realistic user count relative to the event volume)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp(F.col("cohort_week"))
                    )
                    / (7 * 86400)
                )
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@register(
    "events_cube_profile",
    oracle="""
    SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_band,
           COUNT(*) AS n_events,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 5) AS BIGINT)
               AS grouping_level
    FROM events
    GROUP BY CUBE (event_type, user_id % 5)
    """,
)
def events_cube_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with grouping_id — all 4 aggregation levels
    in one pass (complements the ROLLUP query)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_band", (F.col("user_id") % 5).cast("long")
    )
    return ev.cube("event_type", "user_band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.grouping_id().cast("long").alias("grouping_level"),
    )



#: Misra-Gries capacity for events_heavy_hitters: the per-task state
#: bound AND the support threshold (keys with count > n/capacity are
#: reported). A power of two keeps n/capacity exactly representable,
#: so the Spark and DuckDB HAVING comparisons agree bit-for-bit.
_HH_CAPACITY = 128


@register(
    "events_heavy_hitters",
    # r5: promoted to the driver surface (slot from
    # docs_with_embeddings_profile) — the sketch tier's second
    # bounded-state member after the KMV in events_approx_stats
    oracle=f"""
    WITH nn AS (SELECT user_id FROM events WHERE user_id IS NOT NULL)
    SELECT user_id,
           COUNT(*) AS n_rows,
           COUNT(*) / (SELECT COUNT(*) FROM nn) AS share
    FROM nn
    GROUP BY user_id
    HAVING COUNT(*) > (SELECT COUNT(*) FROM nn) / {_HH_CAPACITY}
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters with BOUNDED aggregation state: users whose
    event count exceeds n/128, via per-partition Misra-Gries candidate
    summaries (≤128 counters per task, any key cardinality) and an
    exact broadcast-verify second pass — the two-pass shape that keeps
    working when the naive GROUP BY's per-distinct-key hash state
    would not (operators/frequent.py docstring for the guarantee).
    The oracle replays the naive exact form: the outputs are provably
    identical, which is the point — determinism and exactness survive
    the bounded-state rewrite."""
    from ..operators.frequent import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", capacity=_HH_CAPACITY)


@register(
    "events_daily_anomalies",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT day, event_type, n_events,
               CAST(SUM(n_events) OVER win AS BIGINT) AS w_n,
               COUNT(*) OVER win AS w_days
        FROM daily
        WINDOW win AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, event_type, n_events,
           ROUND((n_events - w_n / w_days)
                 / sqrt(w_n / w_days), 6) AS volume_z
    FROM w
    WHERE w_days >= 3
      AND abs((n_events - w_n / w_days) / sqrt(w_n / w_days)) > 2.0
    """,
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection per event type: each day's count
    against the trailing seven OBSERVED days of that type (Poisson-
    style z-score:
    deviation over sqrt(mean) — variance = mean for counts, so no
    cross-engine stddev divergence at all; every input to the final
    arithmetic is an exact integer, making the score deterministic up
    to the shared single-expression float evaluation, rounded at 6 dp).

    Shape at scale: raw events collapse to a per-(day, type) rollup
    FIRST (the two-level pattern of events_sliding_daily_avg), so the
    window runs over ~days x types rows, never raw events; trailing
    window excludes the current day (no self-contamination); warm-up
    days (< 3 days of history) emit nothing rather than unstable
    scores. Scope: the baseline is the last 7 OBSERVED (day, type)
    rows — a type that logs nothing on some days stretches its
    baseline back in calendar time, and a fully-silent day emits no
    row at all, so detecting outage-shaped anomalies needs a
    calendar-densified rollup upstream (the ingest layer owns the
    calendar; this query scores what was observed)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    win = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, -1)
    )
    w = daily.select(
        "day",
        "event_type",
        "n_events",
        F.sum("n_events").over(win).alias("w_n"),
        F.count(F.lit(1)).over(win).alias("w_days"),
    )
    mean = F.col("w_n") / F.col("w_days")
    z = (F.col("n_events") - mean) / F.sqrt(mean)
    return (
        w.where(F.col("w_days") >= 3)
        .where(F.abs(z) > 2.0)
        .select(
            "day", "event_type", "n_events", F.round(z, 6).alias("volume_z")
        )
    )


@register(
    "events_distinct_sketch_rollup",
    # r6: new capability, surface is at its 50-query cap — pytest-
    # oracled (the local harness hash-checks it at sf0.001 every run)
    driver=False,
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    GROUP BY event_type
    """,
)
def events_distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type answered FROM PRE-BUILT sketches:
    build one HLL sketch per (event_type, day) — the persisted-rollup
    granularity — then union the daily sketches per type and estimate.
    The raw events are scanned once to BUILD; the per-type answer
    derives entirely from the union (operators/sketches.py), which is
    the shape that answers arbitrary day-range profiling questions at
    100 TB without rescanning history.

    The exact COUNT(DISTINCT) oracle is valid because the corpus sits
    in the sketch's exact coupon regime at every test scale (≤ 1,500
    distinct users vs the lg_k=14 promotion point of ~12k — measured
    1,500 == 1,500 == exact at sf0.1); the beyond-regime ±0.8% error
    band is pinned separately in tests/test_approx.py with a
    100k-distinct synthetic input. A production deployment keeps the
    same plan and trades the oracle for the error bound."""
    from ..operators.sketches import build_distinct_sketches

    ev = load_table(spark, sf_dir, "events")
    daily = build_distinct_sketches(
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
        ),
        value_col="user_id",
        group_cols=["event_type", "day"],
    )
    # one aggregate carries the union AND the day count — a separate
    # n_days join would rebuild the daily sketches a second time
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(False))
        ).alias("distinct_users"),
    )


@register(
    "events_calendar_densified",
    # r6: pytest-oracled (surface at its 50 cap) — closes the seam
    # events_daily_anomalies documents ("detecting outage-shaped
    # anomalies needs a calendar-densified rollup upstream")
    driver=False,
    oracle="""
    WITH span AS (
        SELECT event_type,
               MIN(date_trunc('day', ts)) AS lo,
               MAX(date_trunc('day', ts)) AS hi
        FROM events GROUP BY event_type
    ),
    cal AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM span
    ),
    daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           (d.n_events IS NULL) AS is_gap
    FROM cal c LEFT JOIN daily d
      ON d.event_type = c.event_type AND d.day = c.day
    """,
)
def events_calendar_densified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: every (event_type, day) in each type's
    observed span gets a row, silent days explicitly zero-filled and
    flagged — the upstream an outage detector needs (a rollup over
    observed rows alone cannot represent "nothing arrived today").
    The calendar derives from a per-type min/max aggregate +
    ``sequence``/``explode`` — rows generated ∝ span days x types,
    never a scan blowup — and the left join back to the daily rollup
    is the only shuffle beyond the rollup itself."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    cal = (
        ev.groupBy("event_type")
        .agg(
            F.min(F.date_trunc("day", "ts")).alias("lo"),
            F.max(F.date_trunc("day", "ts")).alias("hi"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return cal.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@register(
    "events_value_quantile_rollup",
    # r6: new capability, surface at its 50-query cap — pytest-oracled
    # (the local harness hash-checks it at sf0.001 every run)
    driver=False,
    oracle="""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n_values,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events
    WHERE NOT isnan(value)
    GROUP BY event_type
    """,
)
def events_value_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles per event type answered FROM PRE-BUILT quantile
    sketches: build one mergeable centroid sketch per (event_type, day)
    — the persisted-rollup granularity — then merge the daily sketches
    per type and interpolate (operators/quantiles.py). The raw events
    are scanned once to BUILD; the per-type answer derives entirely
    from the merge — the shape that answers arbitrary day-range "what
    was p99 latency" questions at 100 TB without rescanning history,
    and the quantile twin of events_distinct_sketch_rollup (Spark has
    hll_sketch_agg for that; it has NO persisted-sketch surface for
    percentiles, so this tier is custom).

    The exact quantile_cont oracle is valid because the oracle scales
    (sf ≤ 0.01) sit in the sketch's EXACT regime under the capacity
    chosen below: no compression ever fires, weights stay 1, and the
    estimator degenerates to quantile_cont's own interpolation,
    bit-for-bit. At sf0.1 the bench runs the genuinely-approximate
    path (day groups exceed capacity — compression pinned in
    tests/test_approx.py, alongside the <1% rank-error band on a
    100k-value synthetic input). A production deployment keeps the
    same plan and trades the oracle for the error bound."""
    from ..operators.quantiles import build_quantile_sketches, quantile_estimates

    ev = load_table(spark, sf_dir, "events")
    # capacity 512 places the exact/approximate boundary BETWEEN the
    # test scales: at sf ≤ 0.01 every (event_type, day) build group
    # (≤ 86 rows) and every per-type merge union (~2k weight-1
    # centroids, under the estimator's 16×capacity refold threshold)
    # stay exact — the oracle regime — while sf0.1's 739-row day
    # groups genuinely compress (weights > 1, pinned in
    # tests/test_approx.py), so the bench measures the real sketch
    # path, not the exact fallback
    daily = build_quantile_sketches(
        ev.select(
            "event_type", F.date_trunc("day", "ts").alias("day"), "value"
        ),
        value_col="value",
        group_cols=["event_type", "day"],
        capacity=512,
        k=64,
    )
    return quantile_estimates(
        daily,
        ["event_type"],
        {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99},
        capacity=512,
        k=64,
    )


@register(
    "events_cohort_overlap_sketch",
    # r6: KMV set-operation tier (surface at its 50 cap — pytest-
    # oracled at sf0.001, squarely in the exact regime)
    driver=False,
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view' AND value >= 150
                 AND user_id IS NOT NULL),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value >= 150
                 AND user_id IS NOT NULL),
         i AS (SELECT count(*) AS n FROM
                 (SELECT * FROM a INTERSECT SELECT * FROM b)),
         u AS (SELECT count(*) AS n FROM
                 (SELECT * FROM a UNION SELECT * FROM b))
    SELECT CAST((SELECT count(*) FROM a) AS DOUBLE) AS n_view_hi,
           CAST((SELECT count(*) FROM b) AS DOUBLE) AS n_purchase_hi,
           CAST((SELECT n FROM u) AS DOUBLE) AS n_union,
           CAST((SELECT n FROM i) AS DOUBLE) AS n_intersect,
           CASE WHEN (SELECT n FROM u) = 0 THEN 0.0
                ELSE CAST((SELECT n FROM i) AS DOUBLE)
                     / CAST((SELECT n FROM u) AS DOUBLE) END AS jaccard
    """,
)
def events_cohort_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-overlap profiling from KMV sketches — the SET-OPERATION
    sketch tier HLL cannot provide (HLL unions losslessly but cannot
    intersect; a KMV sketch estimates union, intersection, and Jaccard
    from two k-minimum-hash arrays, Beyer et al. SIGMOD'07). Cohorts:
    users with a high-value (>= 150) view vs a high-value purchase.
    One scan builds both sketches (cohort-labeled rows → one grouped
    build); every set operation afterwards is a Catalyst array
    expression over two k-long arrays — no re-scan, no join of the
    raw sets, the shape that compares hundred-billion-row cohorts at
    100 TB by shipping kilobytes.

    The plain COUNT(DISTINCT)/INTERSECT oracle is valid because the
    oracle scales sit in the sketch's exact regime (cohorts ≪ k=512
    distinct users, so each sketch IS its cohort's full hash set and
    every estimator degenerates to exact set arithmetic — same
    exactness pattern as the HLL coupon regime and the quantile
    sketch's sub-capacity regime). Beyond-regime error bounds are
    pinned in tests/test_approx.py with 60k-distinct synthetics."""
    from ..operators.sketches import build_kmv_sketches, kmv_overlap

    ev = load_table(spark, sf_dir, "events")
    labeled = ev.where(
        (F.col("value") >= 150)
        & F.col("event_type").isin("view", "purchase")
    ).select(F.col("event_type").alias("cohort"), "user_id")
    sk = build_kmv_sketches(labeled, "user_id", ["cohort"])
    # grand aggregate, not where+crossJoin: an EMPTY cohort (no rows
    # past the filter) would make a crossJoin of two one-row frames
    # vanish entirely, while the oracle's scalar subqueries still
    # return one all-zero row — a no-grouping agg always emits one
    # row, and a missing sketch coalesces to the empty array (every
    # estimator already degenerates to 0 there)
    empty = F.array().cast("array<long>")
    row = sk.groupBy().agg(
        F.coalesce(
            F.first(F.when(F.col("cohort") == "view", F.col("kmv")), True),
            empty,
        ).alias("a"),
        F.coalesce(
            F.first(F.when(F.col("cohort") == "purchase", F.col("kmv")), True),
            empty,
        ).alias("b"),
    )
    est = kmv_overlap(F.col("a"), F.col("b"))
    return row.select(
        est["n_a"].alias("n_view_hi"),
        est["n_b"].alias("n_purchase_hi"),
        est["n_union"].alias("n_union"),
        est["n_intersect"].alias("n_intersect"),
        est["jaccard"].alias("jaccard"),
    )


@register(
    "events_hourly_gap_interpolated",
    # r6: time-series imputation tier (surface at its 50 cap —
    # pytest-oracled; 2,700 of sf0.001's 3,568 calendar hours are
    # genuine gaps, so the interpolation path carries the query)
    driver=False,
    oracle=f"""
    WITH span AS (
        SELECT event_type, MIN(date_trunc('hour', ts)) AS lo,
               MAX(date_trunc('hour', ts)) AS hi
        FROM events GROUP BY event_type
    ),
    cal AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM span
    ),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n, {dec_sum_sql('value')} AS hv
        FROM events GROUP BY 1, 2
    ),
    dens AS (
        SELECT c.event_type, c.hour, h.n, h.hv
        FROM cal c LEFT JOIN hourly h
          ON h.event_type = c.event_type AND h.hour = c.hour
    ),
    w AS (
        SELECT *,
           last_value(hv IGNORE NULLS) OVER wp AS pv,
           last_value(CASE WHEN hv IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wp AS pt,
           first_value(hv IGNORE NULLS) OVER wn AS nv,
           first_value(CASE WHEN hv IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wn AS nt
        FROM dens
        WINDOW wp AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour, CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           (n IS NULL) AS is_gap,
           CASE WHEN hv IS NOT NULL THEN hv
                ELSE pv + (nv - pv) * ((epoch(hour) - epoch(pt))
                                       / (epoch(nt) - epoch(pt))) END
               AS value_filled
    FROM w
    """,
)
def events_hourly_gap_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series imputation: the hourly value series per event type,
    densified to the full calendar (events_calendar_densified's
    pattern at hour grain, where every test scale has real gaps) with
    silent hours LINEARLY INTERPOLATED between their nearest observed
    neighbors — forward fill carries (last observed value, its hour)
    down, backward fill carries the next pair up, and the gap row
    lerps on the epoch-seconds fraction. Both engines evaluate the
    identical expression tree ``pv + (nv - pv) * (Δt_prev / Δt_span)``
    on decimal-exact hourly sums, so the imputed doubles hash-match
    bit-for-bit. Endpoints are observed by construction (the calendar
    spans each type's min..max observed hour), so every gap has both
    neighbors. Scale shape: two window passes over the DENSIFIED
    ROLLUP (rows ∝ span-hours x types, never the raw scan), partitioned
    by event_type — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value").alias("hv")
    )
    cal = (
        ev.groupBy("event_type")
        .agg(
            F.min(F.date_trunc("hour", "ts")).alias("lo"),
            F.max(F.date_trunc("hour", "ts")).alias("hi"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    dens = cal.join(hourly, ["event_type", "hour"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("hv").isNotNull(), F.col("hour"))
    pv = F.last("hv", ignorenulls=True).over(wp)
    pt = F.last(obs_hour, ignorenulls=True).over(wp)
    nv = F.first("hv", ignorenulls=True).over(wn)
    nt = F.first(obs_hour, ignorenulls=True).over(wn)
    frac = (F.col("hour").cast("double") - pt.cast("double")) / (
        nt.cast("double") - pt.cast("double")
    )
    return dens.select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
        F.when(F.col("hv").isNotNull(), F.col("hv"))
        .otherwise(pv + (nv - pv) * frac)
        .alias("value_filled"),
    )


@register(
    "events_seasonal_decomposition",
    driver=False,  # surface capped at 50; pytest-oracled
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    tr AS (
        SELECT event_type, day, n_events,
               CASE WHEN CAST(COUNT(*) OVER w AS BIGINT) = 7
                    THEN CAST(SUM(n_events) OVER w AS BIGINT) END AS trend_x7,
               CAST(datediff('day', TIMESTAMP '1970-01-05', day) % 7
                    AS INTEGER) AS weekday
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
        SELECT event_type, weekday,
               CAST(ROUND(SUM(CAST((7 * n_events - trend_x7) AS DECIMAL(30,10))), 4) AS DOUBLE)
                   / COUNT(trend_x7) AS seasonal_dev_x7
        FROM tr WHERE trend_x7 IS NOT NULL
        GROUP BY event_type, weekday
    )
    SELECT t.event_type, t.day, t.n_events, t.trend_x7, t.weekday,
           s.seasonal_dev_x7,
           CASE WHEN t.trend_x7 IS NOT NULL
                THEN CAST((7 * t.n_events - t.trend_x7) AS DOUBLE)
                     - s.seasonal_dev_x7 END AS residual_x7
    FROM tr t JOIN seas s
      ON t.event_type = s.event_type AND t.weekday = s.weekday
    """,
)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive time-series decomposition of daily event volume:
    trend (centered 7-day moving window), day-of-week seasonality,
    residual — the pattern behind monitoring dashboards and
    anomaly-score baselines (complements events_daily_anomalies, which
    scores against a trailing window instead of decomposing).

    Engine-exact discipline: everything is scaled by 7 so the trend
    stays an INTEGER (the window SUM, not the fractional average;
    edges without a full 7-day window emit NULL trend rather than a
    partial-window estimate). The seasonal term is the one decimal-
    exact division (dec_avg convention) and the residual subtracts two
    deterministic doubles — so the whole decomposition hash-matches
    the DuckDB oracle despite being float-valued. Weekday is epoch-day
    arithmetic mod 7 (Monday=0): Spark's dayofweek() and DuckDB's
    dayofweek() disagree on numbering, date arithmetic does not.

    Scale shape: the window partitions by event_type over a
    DAY-cardinality rollup (tiny input — the heavy lifting is the
    map-side-combinable daily count); the seasonal join broadcasts a
    (type × 7)-row table."""
    from pyspark.sql.window import Window

    from .helpers import DEC, OUT

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "n_events",
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.sum("n_events").over(w)
        ).alias("trend_x7"),
        F.pmod(
            F.datediff(F.col("day"), F.lit("1970-01-05").cast("timestamp")), 7
        ).cast("int").alias("weekday"),
    )
    dev = (7 * F.col("n_events") - F.col("trend_x7")).alias("__dev")
    seas = (
        tr.where(F.col("trend_x7").isNotNull())
        .select("event_type", "weekday", dev)
        .groupBy("event_type", "weekday")
        .agg(
            (
                F.sum(F.col("__dev").cast(DEC)).cast(OUT).cast("double")
                / F.count("__dev")
            ).alias("seasonal_dev_x7")
        )
    )
    return tr.join(F.broadcast(seas), ["event_type", "weekday"]).select(
        "event_type",
        "day",
        "n_events",
        "trend_x7",
        "weekday",
        "seasonal_dev_x7",
        F.when(
            F.col("trend_x7").isNotNull(),
            (7 * F.col("n_events") - F.col("trend_x7")).cast("double")
            - F.col("seasonal_dev_x7"),
        ).alias("residual_x7"),
    )


# ---------------------------------------------------------------------------
# Point-in-time training-set assembly (the feature-store shape):
# leakage-safe features for a supervised model, computed STRICTLY
# before each prediction point.
# ---------------------------------------------------------------------------

_FEAT_7D_US = 7 * 24 * 3600 * 1_000_000  # feature window, microseconds


@register(
    "events_training_examples",
    # r6: ON the driver surface (slot from window_functions_showcase)
    # — the leakage-safe feature-store join is a flagship capability
    # for a training-data engine, not a showcase
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, ts, event_type, value,
               epoch_us(ts) AS ts_us
        FROM events
    ),
    feat AS (
        SELECT event_id, user_id, ts, event_type, value,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                    THEN 1 ELSE 0 END) OVER w7, 0) AS BIGINT) AS n_views_7d,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                    THEN 1 ELSE 0 END) OVER w7, 0) AS BIGINT) AS n_clicks_7d,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
                    THEN 1 ELSE 0 END) OVER w7, 0) AS BIGINT) AS n_errors_7d,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    OVER life AS BIGINT) AS n_prior_purchases,
               CAST(ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(30,10)) END) OVER life,
                    CAST(0 AS DECIMAL(30,10))), 4) AS DOUBLE) AS spend_before,
               (ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id)) // 1000000
                   AS secs_since_prev_event
        FROM e
        WINDOW w7 AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN {_FEAT_7D_US} PRECEDING
                            AND 1 PRECEDING),
               life AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS example_id, user_id, ts, n_views_7d, n_clicks_7d,
           n_errors_7d, n_prior_purchases, spend_before,
           secs_since_prev_event, value AS target_amount
    FROM feat WHERE event_type = 'purchase'
    """,
)
def events_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe point-in-time training-set assembly — the
    feature-store join every supervised pipeline needs: one example per
    purchase event, features computed STRICTLY BEFORE the prediction
    point (trailing-7d behaviour counts, lifetime prior purchases and
    spend, recency), target = the purchase amount.

    Leakage discipline: every feature frame ends at ``1 PRECEDING`` on
    the integer microsecond axis — the label event itself AND anything
    simultaneous with it are excluded, so a model trained on this frame
    never sees its own label (the classic feature-store bug this shape
    exists to prevent). RANGE frames (not ROWS) make tie handling
    deterministic cross-engine.

    Shape at scale: ONE shuffle on user_id; every window — three
    trailing-7d counts, two lifetime folds, the recency lag — shares
    that single sort (Spark plans one Window node per frame spec over
    the same exchange). Features for all event rows are computed before
    the purchase filter, but that is the streaming-friendly form: the
    alternative (join purchases back onto events) would shuffle the
    fact table twice. Decimal-cast lifetime spend keeps the running
    double sum order-independent (dec_sum discipline)."""
    from .helpers import DEC, OUT

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_FEAT_7D_US, -1)
    )
    life = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")

    def cnt7(t: str) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).over(w7),
            F.lit(0),
        ).cast("long")

    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        cnt7("view").alias("n_views_7d"),
        cnt7("click").alias("n_clicks_7d"),
        cnt7("error").alias("n_errors_7d"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(life)
        .cast("long")
        .alias("n_prior_purchases"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast(DEC),
                )
            ).over(life),
            F.lit(0).cast(DEC),
        )
        .cast(OUT)
        .cast("double")
        .alias("spend_before"),
        F.expr(
            "(ts_us - lag(ts_us) over (partition by user_id"
            " order by ts_us, event_id)) div 1000000"
        ).alias("secs_since_prev_event"),
    )
    return feat.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("example_id"),
        "user_id",
        "ts",
        "n_views_7d",
        "n_clicks_7d",
        "n_errors_7d",
        "n_prior_purchases",
        "spend_before",
        "secs_since_prev_event",
        F.col("value").alias("target_amount"),
    )


# ---------------------------------------------------------------------------
# Event transition matrix — the Markov-chain view of user behavior:
# for every ordered (event_type -> next event_type) pair within a
# user's stream, the transition count and its probability on an exact
# ppm grid. The "what do users do next" table product analytics and
# sequence-model feature pipelines both start from.
# ---------------------------------------------------------------------------


@register(
    "events_transition_matrix",
    # pytest-oracled (driver surface capped at 50)
    driver=False,
    oracle="""
    WITH nxt AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM nxt WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           CAST(1000000 * n // SUM(n) OVER (PARTITION BY event_type)
                AS BIGINT) AS prob_ppm
    FROM counts
    """,
)
def events_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order transition counts between consecutive events of the
    same user (ordered by timestamp with the event id as the
    deterministic tie-break), with per-source-type probabilities
    floored onto an exact ppm grid — integer end to end, so the
    matrix is bit-identical across engines.

    Scale shape: ONE window keyed by user (the sessionization
    shuffle), then a groupBy on (type, next_type) — at most
    |types|² rows out regardless of corpus size — and a second
    window over those rows for the row-normalization, which is
    |types|-partitioned and tiny. No joins; the per-user window never
    sees a hot key worse than the most active user, the same skew
    bound every per-user operator in this registry carries."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    counts = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.expr("1000000 * n").cast("long").alias("__num"),
        F.sum("n").over(wt).cast("long").alias("__den"),
    ).select(
        "event_type",
        "next_type",
        "n",
        F.expr("__num div __den").cast("long").alias("prob_ppm"),
    )


@register(
    "events_stream_upsert",
    # r14: the streaming-native family's first registry row (VERDICT
    # r13 #4) — a REAL StreamingQuery (readStream → foreachBatch →
    # transactional keyed MERGE) lands the table the hash checks. The
    # build session put it on the driver surface in docs_rm3_search's
    # slot; the optimization round froze the declared surface at
    # CORRECTNESS_r13's set, so it ships driver=False — still exactly
    # oracle-checked by the pytest harness.
    driver=False,
    oracle="""
    SELECT event_id, ts, user_id, event_type,
           value + 1000.0 AS value, props
    FROM events WHERE event_id % 8 = 0
    UNION ALL
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE event_id % 4 = 0 AND event_id % 8 <> 0
    UNION ALL
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE event_id % 4 = 1
    """,
)
def events_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming keyed upsert under the driver's hard
    hash signal: two waves of parquet files arrive in a watched
    directory; each wave is drained by a REAL Structured Streaming
    query (``streaming/ingest.ingest_stream_snapshot_merge`` —
    file source → ``foreachBatch`` → ``SnapshotTable.merge`` with
    per-batch txn ids), and the FINAL landed table must hash-match a
    static SQL replay over ``events``.

    The fixture is deterministic key predicates (the
    ``snapshot_time_travel`` precedent): wave 1 = ``event_id % 4 = 0``
    (split into two source files, ``maxFilesPerTrigger=1`` making the
    drain a genuinely multi-micro-batch StreamingQuery), wave 2 =
    fresh rows ``event_id % 4 = 1`` plus UPDATES of every
    ``event_id % 8 = 0`` row (value bumped by 1000). The hash then
    proves: checkpointed file-source progress (wave 2's run reads ONLY
    the new files), upsert semantics (updated keys carry the bumped
    value, not a duplicate row), and batch atomicity.

    Exactly-once is pinned in-flight, not just asserted: after the
    waves land, a poisoned batch is re-merged under wave 1's first txn
    id — the txn map must reject it silently (guards raise if the
    table moved) — and a third stream run over the caught-up source
    must not fire at all.

    Scale shape: each micro-batch's MERGE is the stats-pruned
    copy-on-write (cost ∝ key range touched, not table size); the
    checkpoint + txn-id pair is the standard at-least-once →
    exactly-once contract, so a crashed/replayed batch converges
    instead of double-applying (reference parallel: the 30 s
    idempotent micro-batch loop, script.py:117)."""
    from ..operators.snapshot import SnapshotTable
    from ..schemas import TESTDATA
    from ..streaming.ingest import ingest_stream_snapshot_merge
    from .helpers import scratch_dir

    root = scratch_dir("stream_upsert_")
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    ev = load_table(spark, sf_dir, "events")

    # wave 1: two source files => two micro-batches under
    # maxFilesPerTrigger=1
    ev.where(F.col("event_id") % 4 == 0).repartition(2).write.parquet(src)
    table = SnapshotTable(spark, os.path.join(root, "table"))
    run = lambda: ingest_stream_snapshot_merge(  # noqa: E731
        spark,
        src,
        TESTDATA["events"],
        table,
        keys=["event_id"],
        checkpoint_dir=ckpt,
        txn_prefix="stream",
        max_files_per_trigger=1,
    )
    run()
    v1 = table.current_version()
    if v1 is None or len(table.versions()) < 2:
        raise RuntimeError(
            f"wave 1 landed {table.versions()} — expected one version "
            "per micro-batch (maxFilesPerTrigger=1 over 2 files)"
        )

    # wave 2: fresh keys + updates of every %8==0 key
    fresh = ev.where(F.col("event_id") % 4 == 1)
    upd = ev.where(F.col("event_id") % 8 == 0).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    fresh.unionByName(upd).write.mode("append").parquet(src)
    run()
    v2 = table.current_version()
    if v2 == v1:
        raise RuntimeError("wave 2 committed nothing — checkpoint broken")

    # replay a poisoned batch under an already-committed txn id: the
    # txn map must make it a silent no-op
    poison = ev.where(F.col("event_id") % 8 == 0).withColumn(
        "value", F.lit(-1.0)
    )
    if (
        table.merge(poison, keys=["event_id"], txn="stream-0") is not None
        or table.current_version() != v2
    ):
        raise RuntimeError(
            "replayed txn stream-0 committed — exactly-once broken"
        )

    # caught-up third run: the file source has nothing new, so no
    # batch may fire (version must not move)
    run()
    if table.current_version() != v2:
        raise RuntimeError("caught-up stream run committed a batch")
    return table.read()
