"""Advanced engine surface: as-of join, SQL API, approximate
aggregates (pyspark guide: common OLAP patterns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..tables import load_table, register_views
from . import register
from .helpers import dec_sum_sql, dec_sum, scratch_dir


@register(
    "events_asof_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS asof_event_id, c.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (
        SELECT user_id, ts, MAX(event_id) AS event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase paired with the user's most
    recent prior click. Spark has no native ASOF; operators/asof.py
    implements it as one shuffle+sort (union + last(ignorenulls)),
    verified here against DuckDB's native ASOF JOIN.

    Clicks pre-dedup to one row per (user_id, ts) keeping the max
    event_id: asof_join's docstring requires a tiebreaker when right
    timestamps can tie, and DuckDB's ASOF picks ITS OWN arbitrary row
    among ties — without the dedup both engines would be
    nondeterministic and disagree on any corpus with a duplicate
    (user, ts) click. The oracle mirrors the same dedup."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_id").alias("asof_event_id"),
        F.col("asof_click_ts").alias("asof_ts"),
    )


@register(
    "events_asof_next_purchase",
    # r6: forward-direction + tolerance as-of (surface at its 50 cap —
    # pytest-oracled; events_asof_last_click holds the driver slot for
    # the as-of family). DuckDB's native ASOF JOIN is backward-only,
    # so the oracle replays the forward+window semantics with a
    # LATERAL top-1 subquery — quadratic per key but exact.
    driver=False,
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           n.event_id AS asof_event_id, n.ts AS asof_ts
    FROM (SELECT event_id, user_id, ts
          FROM events WHERE event_type = 'click') c,
    LATERAL (
        SELECT p.event_id, p.ts
        FROM (SELECT user_id, ts, MAX(event_id) AS event_id
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id, ts) p
        WHERE p.user_id = c.user_id AND p.ts >= c.ts
          AND epoch(p.ts) - epoch(c.ts) <= 7200
        ORDER BY p.ts LIMIT 1
    ) n
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with an attribution window: each click paired
    with the user's NEXT purchase within two hours — the
    click-to-conversion shape (pandas merge_asof direction='forward'
    + tolerance), which DuckDB's backward-only ASOF JOIN cannot
    express natively. Same one-shuffle union plan as the backward
    form, traversed in descending time; the tolerance test runs on
    the carried match timestamp, no second join. Purchases pre-dedup
    per (user_id, ts) exactly like events_asof_last_click's clicks —
    both engines would otherwise pick arbitrary tie rows."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("p_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_id", "p_ts"],
        how="inner",
        direction="forward",
        tolerance=7200.0,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_p_id").alias("asof_event_id"),
        F.col("asof_p_ts").alias("asof_ts"),
    )


@register(
    "sql_api_priority_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS total_revenue
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    driver=False,
)
def sql_api_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL API (temp views + spark.sql) —
    Catalyst produces the identical plan either way. ``driver=False``:
    by construction the plan is identical to the DataFrame twins on
    the driver surface, so its slot went to ``snapshot_time_travel``
    (r5); the pytest oracle harness still hash-checks it."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 4) AS DOUBLE)
                   AS total_revenue
        FROM orders
        WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# KMV sketch size and the deterministic-sample modulus for
# events_approx_stats — shared between the Spark plan and the oracle.
_KMV_K = 32
_SAMPLE_MOD = 4
_POW60 = 1152921504606846976  # 2^60, the md5-hash value space

# 60-bit md5 hash of an expression, DuckDB side (mirror of
# operators/text_dedup.md5_token_hash).
_H_SQL = "CAST(concat('0x', substr(md5(CAST({c} AS VARCHAR)), 1, 15)) AS BIGINT)"


def _kmv_partition_topk(batches):
    """Arrow kernel: prune one partition's (event_type, h) stream to
    the k smallest hashes per event_type. State is ≤ _KMV_K int64 per
    group regardless of partition size — the bounded-memory half of
    the KMV sketch (the merge in events_approx_stats is the other)."""
    import numpy as np
    import pandas as pd

    state: dict = {}
    for pdf in batches:
        for et, grp in pdf.groupby("event_type", sort=False):
            arr = grp["h"].to_numpy(dtype=np.int64)
            cur = state.get(et)
            if cur is not None:
                arr = np.concatenate([cur, arr])
            if len(arr) > _KMV_K:
                arr = np.partition(arr, _KMV_K - 1)[:_KMV_K]
            state[et] = arr
    if state:
        yield pd.DataFrame(
            {
                "event_type": np.repeat(
                    np.array(list(state), dtype=object),
                    [len(v) for v in state.values()],
                ),
                "h": np.concatenate(list(state.values())),
            }
        )


@register(
    "events_approx_stats",
    oracle=f"""
    WITH uh AS (
        SELECT DISTINCT event_type,
               {_H_SQL.format(c='user_id')} AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uh
    ),
    kmv AS (
        SELECT event_type,
               MAX(rn) AS n_seen,
               MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
        FROM ranked GROUP BY event_type
    ),
    base AS (
        SELECT event_type,
               COUNT(*) AS n_events,
               quantile_cont(CASE WHEN {_H_SQL.format(c='event_id')}
                                  % {_SAMPLE_MOD} = 0 THEN value END, 0.5) AS p50,
               quantile_cont(CASE WHEN {_H_SQL.format(c='event_id')}
                                  % {_SAMPLE_MOD} = 0 THEN value END, 0.9) AS p90,
               quantile_cont(CASE WHEN {_H_SQL.format(c='event_id')}
                                  % {_SAMPLE_MOD} = 0 THEN value END, 0.99) AS p99
        FROM events GROUP BY event_type
    )
    SELECT b.event_type,
           CASE WHEN k.kth IS NOT NULL
                THEN {_KMV_K - 1}.0 * {_POW60}.0 / CAST(k.kth + 1 AS DOUBLE)
                ELSE CAST(k.n_seen AS DOUBLE) END AS approx_users,
           b.p50, b.p90, b.p99, b.n_events
    FROM base b JOIN kmv k USING (event_type)
    """,
)
def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantiles per event type — the sketch
    tier for 100 TB profiling (exactness traded for one-pass, bounded
    state). Unlike HLL++/GK (whose sketch internals are
    engine-specific, so a DuckDB oracle could never replay them), both
    approximations here are deterministic integer-hash algorithms that
    BOTH engines compute bit-identically:

    - ``approx_users``: a KMV (k-minimum-values) distinct sketch —
      md5-hash each user id into [0, 2^60), keep the k smallest
      distinct hashes per group (k=_KMV_K), estimate (k-1)/normalized
      k-th minimum (exact count when fewer than k distinct values are
      seen). The Spark side computes the k-th minimum with BOUNDED
      state: an Arrow ``mapInPandas`` pass prunes each partition to
      its k smallest hashes per group (state ≤ k longs × groups per
      task), then a final merge over ≤ partitions × k survivors picks
      the global k-th. No per-group window anywhere — the reference
      SQL form (rank the deduped hashes, take row k) would funnel
      every distinct user hash into ~n_types window partitions, a
      skewed single-task sort at scale. The oracle keeps the window
      form (DuckDB replays it exactly); ``tests/test_approx.py``
      asserts the two forms agree and that this plan contains no
      Window over ``event_type``.
    - ``p50/p90/p99``: exact interpolated percentiles over a
      deterministic 1-in-_SAMPLE_MOD hash-sample of rows (md5 of the
      event id, not a seeded RNG, so any engine reproduces the same
      sample). Sample size — and therefore sort cost — scales with
      the sampled fraction, not the table.

    Accuracy vs the exact statistics is asserted in
    tests/test_approx.py; cross-engine equality is the driver oracle.
    """
    ev = load_table(spark, sf_dir, "events")

    def h(c: str):
        return F.conv(
            F.substring(F.md5(F.col(c).cast("string").cast("binary")), 1, 15),
            16,
            10,
        ).cast("long")

    uh = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", h("user_id").alias("h"))
        .distinct()
    )
    # bounded-state k-th minimum: prune every partition to its k
    # smallest hashes per group (the distinct above already co-located
    # and deduped (event_type, h), so survivors are globally distinct),
    # then merge the ≤ partitions × k survivors per group. collect_list
    # here is bounded by shuffle-partitions × k longs per group — a
    # configuration constant, not data-proportional.
    pruned = uh.mapInPandas(_kmv_partition_topk, "event_type string, h long")
    merged = pruned.groupBy("event_type").agg(
        F.array_sort(F.collect_list("h")).alias("hs")
    )
    kmv = merged.select(
        "event_type",
        F.size("hs").alias("n_seen"),
        F.when(
            F.size("hs") >= _KMV_K, F.element_at("hs", _KMV_K)
        ).alias("kth"),
    )
    # when kth is null every partition held < k distinct hashes, so
    # n_seen = size(hs) IS the exact distinct count, matching the
    # reference form's MAX(rn)
    approx_users = F.when(
        F.col("kth").isNotNull(),
        F.lit(float(_KMV_K - 1) * float(_POW60)) / (F.col("kth") + 1).cast("double"),
    ).otherwise(F.col("n_seen").cast("double"))

    sval = F.when(h("event_id") % _SAMPLE_MOD == 0, F.col("value"))
    base = ev.withColumn("sval", sval).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile(sval, 0.5)").alias("p50"),
        F.expr("percentile(sval, 0.9)").alias("p90"),
        F.expr("percentile(sval, 0.99)").alias("p99"),
    )
    return base.join(F.broadcast(kmv), "event_type").select(
        "event_type",
        approx_users.alias("approx_users"),
        "p50",
        "p90",
        "p99",
        "n_events",
    )


@register(
    "snapshot_time_travel",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS total_revenue
    FROM orders
    WHERE o_orderkey % 3 IN (0, 1)
    GROUP BY o_orderpriority
    """,
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional SnapshotTable under the driver's hard signal:
    commit three batches, replay one (idempotent txn), replace the
    table, then TIME-TRAVEL back and aggregate.

    The oracle is a static SQL string, so the commits are derived from
    deterministic key predicates: batch *i* holds the orders with
    ``o_orderkey % 3 = i``. Reading ``version=1`` therefore equals
    ``WHERE o_orderkey % 3 IN (0, 1)`` over the source table — which
    is exactly what DuckDB replays. The hash match then proves, end to
    end through ``SnapshotTable.read(version=...)``:

    - **exactly-once**: batch 1 is appended twice with the same txn id;
      the guards below fail the query if the replay committed (version
      arithmetic shifts), and a committed replay would also leave an
      extra data directory behind version 2's manifest.
    - **time travel + snapshot isolation**: after version 1 the table
      gains an append AND a full ``replace`` (current state = only
      high-value orders). The version-1 read must still see precisely
      batches 0-1 — any leakage from later commits breaks the hash.

    Each call builds a fresh table under a throwaway tmp dir (the
    driver and bench call queries repeatedly; commits must not
    accumulate across calls). Cost is one write of the source rows —
    same cost model as warehouse_merge_batch.
    """
    from ..operators.snapshot import SnapshotTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tab = SnapshotTable(spark, scratch_dir("snap_tt_"))
    tab.append(orders.filter(F.col("o_orderkey") % 3 == 0), txn="b0")
    v1 = tab.append(orders.filter(F.col("o_orderkey") % 3 == 1), txn="b1")
    if tab.append(orders.filter(F.col("o_orderkey") % 3 == 1), txn="b1") is not None:
        raise RuntimeError("replayed txn committed — exactly-once broken")
    if tab.append(orders.filter(F.col("o_orderkey") % 3 == 2), txn="b2") != 2:
        raise RuntimeError("version drift — a replay or racer committed")
    # later history the time-travel read must NOT see
    tab.replace(orders.filter(F.col("o_totalprice") > 200000.0))
    return (
        tab.read(version=v1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("total_revenue"),
        )
    )


@register(
    "ivm_maintained_view",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 4)
                AS DOUBLE) AS total_price
    FROM orders
    WHERE (o_orderkey % 3 = 2) OR (o_orderkey > 1000)
    GROUP BY o_orderpriority
    """,
)
def ivm_maintained_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under the driver's hard signal:
    a count/sum view over a transactional source is maintained through
    two appends, a subtractive DELETE, and a third append — four
    ticks, each folding only the delta — and the final view must
    hash-match the from-scratch SQL aggregate of the surviving rows.

    The static-oracle trick (the ``snapshot_time_travel`` pattern):
    every commit derives from a deterministic key predicate — batch
    *i* holds ``o_orderkey % 3 = i``, the delete removes
    ``o_orderkey <= 1000`` from the first two batches, and batch 2
    lands after it — so the view's final state equals
    ``WHERE o_orderkey % 3 = 2 OR o_orderkey > 1000`` over the source
    table, which is exactly what DuckDB replays. The hash match
    therefore proves, end to end: the signed change feed (the delete
    tick consumes −1 retractions), the envelope/bucket-pruned fold,
    the zero-count/upsert split merge, the durable cursor (the replay
    guard below), and the decimal-exact sum arithmetic.

    The summed column is cast to a wide decimal BEFORE it enters the
    source table, so every partial sum the IVM folds is exact and
    order-independent (the dec_sum convention — a plain double sum
    would be accumulation-order-dependent and could never hash-match).

    Fresh throwaway tables per call (driver and bench call queries
    repeatedly); cost is ~2x snapshot_time_travel: one write of the
    source rows plus four delta-sized view commits."""
    from ..operators.ivm import IncrementalAgg
    from ..operators.snapshot import SnapshotTable
    from .helpers import DEC, OUT

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    src = SnapshotTable(spark, scratch_dir("ivm_src_"))
    view = SnapshotTable(spark, scratch_dir("ivm_view_"))
    ivm = IncrementalAgg(
        spark,
        src,
        view,
        group_cols=["o_orderpriority"],
        sum_cols=["price"],
        n_buckets=8,
    )
    src.append(orders.filter(F.col("o_orderkey") % 3 == 0), txn="b0")
    if ivm.tick() is None:
        raise RuntimeError("bootstrap tick did not commit")
    src.append(orders.filter(F.col("o_orderkey") % 3 == 1), txn="b1")
    if ivm.tick() is None:
        raise RuntimeError("append tick did not commit")
    src.delete_where([("o_orderkey", "<=", 1000)])
    if ivm.tick() is None:
        raise RuntimeError("subtractive tick did not commit")
    src.append(orders.filter(F.col("o_orderkey") % 3 == 2), txn="b2")
    if ivm.tick() is None:
        raise RuntimeError("final tick did not commit")
    if ivm.tick() is not None:
        raise RuntimeError("replayed tick committed — cursor broken")
    return ivm.read_view().select(
        "o_orderpriority",
        "n_rows",
        F.col("sum_price").cast(OUT).cast("double").alias("total_price"),
    )


@register(
    "orders_price_band_range_join",
    oracle=f"""
    WITH bands AS (
        SELECT CAST(i AS BIGINT) AS band_id,
               CAST(i * 50000 AS DOUBLE) AS lo,
               CAST((i + 1) * 50000 AS DOUBLE) AS hi
        FROM range(0, 12) t(i)
    )
    SELECT band_id,
           COUNT(*) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS band_revenue
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
)
def orders_price_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join via bucket quantization
    (operators/range_join.py): equi-join on the bucket id instead of a
    nested-loop inequality join — the shape that survives two large
    sides. Verified against DuckDB's native inequality join."""
    from ..operators.range_join import bucketed_range_join

    orders = load_table(spark, sf_dir, "orders")
    bands = spark.range(0, 12).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    joined = bucketed_range_join(
        orders, bands, point_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50000.0,
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("band_revenue"),
    )


@register(
    "segments_intersect_except",
    oracle="""
    SELECT c_mktsegment, 'both' AS membership FROM (
        SELECT DISTINCT c_mktsegment FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE o_totalprice > 250000
        INTERSECT
        SELECT DISTINCT c_mktsegment FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT c_mktsegment, 'only_high_value' AS membership FROM (
        SELECT DISTINCT c_mktsegment FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE o_totalprice > 250000
        EXCEPT
        SELECT DISTINCT c_mktsegment FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    """,
)
def segments_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (completes the §2.6 set-op
    surface beyond union/distinct)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey)
    high_value = (
        joined.filter(F.col("o_totalprice") > 250000).select("c_mktsegment").distinct()
    )
    recent = (
        joined.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("c_mktsegment")
        .distinct()
    )
    both = high_value.intersect(recent).withColumn("membership", F.lit("both"))
    only_hv = high_value.exceptAll(recent).withColumn(
        "membership", F.lit("only_high_value")
    )
    return both.unionByName(only_hv)


def _pagerank_oracle(iterations: int) -> str:
    """Unrolled fixed-iteration PageRank in plain SQL — every round is
    one CTE, all arithmetic BIGINT (see operators/graph.pagerank), so
    the unrolled form is exactly the Spark loop with the iteration
    variable spelled out. Recursive CTEs are avoided on purpose:
    standard SQL forbids aggregation in the recursive term."""
    prev = "r0"
    sep = ",\n    "
    rounds = []
    for i in range(1, iterations + 1):
        rounds.append(
            f"""r{i} AS (
        SELECT n.node,
               CAST(150000000 + (85 * COALESCE(m.m, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT p.dst AS node, CAST(SUM(r.r // p.d) AS BIGINT) AS m
            FROM pre p JOIN {prev} r ON p.src = r.node GROUP BY p.dst
        ) m ON n.node = m.node
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH dir_edges AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
        SELECT src, dst FROM dir_edges
        UNION
        SELECT dst AS src, src AS dst FROM dir_edges
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM sym
    ),
    outdeg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src
    ),
    pre AS (SELECT s.src, s.dst, o.d FROM sym s JOIN outdeg o ON s.src = o.src),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
    {sep.join(rounds)}
    SELECT node, r AS rank_fp FROM {prev}
    """


@register(
    "supplier_customer_pagerank",
    # r7: promoted to the driver surface — integer fixed-point
    # PageRank under the exact-SQL hash check (slot from
    # revenue_rollup's overlap)
    oracle=_pagerank_oracle(iterations=5),
)
def supplier_customer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-analysis importance over the customer↔supplier trade graph
    (who transacts with well-connected counterparties): symmetric
    bipartite edges from orders⋈lineitem, 5 rounds of fixed-point
    integer PageRank (operators/graph.pagerank — bit-deterministic
    under any partitioning, hence the exact unrolled-SQL oracle).

    Scale shape: the edge list is DISTINCT (customer, supplier) — far
    smaller than lineitem — built from one scan; each round is a hash
    join + map-side-combinable integer sum. The symmetric explode
    scans the (cached-by-Spark-reuse) distinct pair list once, not a
    two-branch union recompute. The whole iteration runs on INTEGER
    node ids (customer k → 2k, supplier k → 2k+1 — disjoint by
    parity); the 'c…'/'s…' string labels are rendered only onto the
    node-cardinality result (string keys in the per-round shuffles
    measured ~40% slower at sf0.1)."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    pr = pagerank(sym, iterations=5)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint").cast("string"))
    )
    return pr.select(label.alias("node"), "rank_fp")


@register(
    "supplier_cosupply_triangles",
    driver=False,  # surface capped at 50; pytest-oracled
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    und AS (
        SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        FROM os x JOIN os y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY node
    ),
    ori AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON u.a = da.node
        JOIN deg db ON u.b = db.node
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM ori e1
            JOIN ori e2 ON e1.v = e2.u
            WHERE EXISTS (SELECT 1 FROM ori e3
                          WHERE e3.u = e1.u AND e3.v = e2.v)) AS n_triangles
    """,
)
def supplier_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-supply graph (suppliers are
    adjacent when they supply the same order — the market-basket
    projection; its triangle density is the standard clustering /
    community-structure diagnostic). Exact integers end to end, so the
    distributed count is SQL-oracle-checkable.

    Scale shape (operators/graph.count_triangles): the bipartite
    projection joins per-order supplier lists against themselves ON
    THE ORDER KEY — bounded by order size (≤7 items), never quadratic
    in suppliers; the triangle join uses DEGREE orientation, bounding
    wedge fan-out by O(√m) on any degree distribution (an id
    orientation melts down when a hub sorts low).

    Honest corpus caveat (the docs_prefix_filter_neardup pattern): the
    synthetic supplier pool is tiny relative to orders, so the
    co-supply projection SATURATES toward the complete graph as sf
    grows — at sf0.1 nearly every supplier pair co-occurs and the
    census costs Θ(n³) because the graph genuinely CONTAINS that many
    triangles, not through algorithmic waste. Verified at sf0.01; real
    co-occurrence graphs (authors, domains, SKUs) are sparse, which is
    what the O(m^1.5) orientation bound is for."""
    from ..operators.graph import count_triangles

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    und = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .select(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    return count_triangles(und)
