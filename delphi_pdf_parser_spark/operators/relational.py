"""Relational operator suite over the TPC-H-ish testdata tables.

These are the §2.B dataflow operators exercised standalone so the driver's
DuckDB oracle verifies each one: scan+filter+project, hash aggregation,
broadcast and shuffle joins, anti/semi joins, window functions, top-k with
deterministic tie-breaks, dedup-keep-first, set ops, sessionization.

Float aggregates are rounded (2-4 dp) on BOTH engines so value hashes
compare despite summation-order ulp differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter -> hash agg (partial+final)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x small dim with an explicit broadcast hint."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: region-nation-supplier-lineitem, grouped revenue."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("r_name", "n_name")
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a deterministic tie-break.

    The cut is `orderBy().limit()` so Catalyst plans
    TakeOrderedAndProject — every partition keeps its own top-10 and
    only those merge on one task. The rank column is then a row_number
    window over the 10 SURVIVING rows (a single-partition exchange of
    exactly k rows, scale-independent) — NOT a window over the full
    table, which would sort the entire orders table on one task (the
    classic global-window scale-killer this replaced)."""
    o = _t(spark, sf_dir, "orders")
    top = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        F.row_number().over(w).alias("rk"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (the checkpoint-resume operator shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_semi")
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey")
    )


def customer_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-customer running revenue ordered by date."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup as group-min (first-entry-wins, SURVEY §2.B)."""
    # epoch parity with the DuckDB oracle requires UTC wall-clock reads
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            # epoch seconds, not timestamp: engines stringify timestamps
            # differently, epoch longs hash identically
            F.min(F.col("ts").cast("timestamp").cast("long")).alias(
                "first_ts_epoch"
            ),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "event_type")
    )


def sessionize_events(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Session assignment via lag + cumulative sum of gap breaks."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = e.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(w)
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def event_type_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar fns + agg with rounding: per-type value stats."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON extraction (semi-structured props column) + agg."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the customer's latest order placed at
    or before the event time (custom operator, operators/asof.py)."""
    from .asof import as_of_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders")
    # dedupe right side to one row per (key, ts) so ties are deterministic
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    o1 = (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    joined = as_of_join(
        e,
        o1.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey").alias("last_orderkey"),
        F.round("asof_o_totalprice", 2).alias("last_total"),
    ).orderBy("event_id")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping sets) with NULL labels coalesced so
    both engines hash identically."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    joined = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
        )
        .orderBy("region", "nation")
    )


def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation: one column per event type."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    aggs = [
        F.round(
            F.sum(F.when(F.col("event_type") == t, F.col("value"))), 2
        ).alias(f"sum_{t}")
        for t in types
    ]
    return e.groupBy("user_id").agg(*aggs).orderBy("user_id")


def distinct_users_per_type(
    spark: SparkSession, sf_dir: str, exact: bool = True, rsd: float = 0.01
) -> DataFrame:
    """Distinct users per event type. exact=True (the oracle path) uses
    countDistinct — an extra shuffle to dedupe (type, user) pairs before
    counting. exact=False is the 100 TB path: approx_count_distinct's
    HyperLogLog++ sketch merges map-side in constant memory, one shuffle
    of tiny sketches instead of the full key set, with relative error
    `rsd`."""
    e = _t(spark, sf_dir, "events")
    agg = (
        F.countDistinct("user_id")
        if exact
        else F.approx_count_distinct("user_id", rsd)
    )
    return (
        e.groupBy("event_type")
        .agg(agg.alias("n_users"))
        .orderBy("event_type")
    )


def value_quantiles(
    spark: SparkSession, sf_dir: str, exact: bool = True, accuracy: int = 10000
) -> DataFrame:
    """Percentiles of value per event type. exact=True (the oracle path)
    uses interpolated F.percentile, which buffers each group's values.
    exact=False is the 100 TB path: percentile_approx's KLL/GK sketch is
    bounded-memory and map-side mergeable (error ~1/accuracy). Approx
    returns an exact data value nearest the quantile, not an
    interpolation, so results legitimately differ in the last decimals."""
    e = _t(spark, sf_dir, "events")
    if exact:
        aggs = [
            F.round(F.percentile("value", F.lit(q)), 4).alias(name)
            for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    else:
        aggs = [
            F.round(
                F.percentile_approx("value", F.lit(q), F.lit(accuracy)), 4
            ).alias(name)
            for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    return e.groupBy("event_type").agg(*aggs).orderBy("event_type")


def orders_lineitem_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join on a fact-fact key + aggregation (TPC-H Q3 shape)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(20)
    )


def users_intersect_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set op INTERSECT: users who both clicked AND purchased. Catalyst
    plans intersect as a left-semi join over distinct keys — one shuffle
    per side on a compact key, AQE-coalesced at scale."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys).orderBy("user_id")


def users_except_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT (distinct) at (user, day) grain: active days without
    a purchase — left-anti join over a composite key."""
    # to_date() must read UTC wall-clock to match DuckDB's naive ts::DATE
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _t(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", day)
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys).orderBy("user_id", "day")


def union_event_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op UNION ALL + dedup by key: click/view streams unioned, then
    per-user first timestamp across both (map-side combine, no join)."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit("c").alias("src")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit("v").alias("src")
    )
    # epoch parity with the DuckDB oracle requires UTC wall-clock reads
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    u = clicks.unionByName(views)
    return (
        u.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("timestamp").cast("long")).alias(
                "first_ts_epoch"
            ),
            F.count("*").alias("n_rows"),
            F.countDistinct("src").alias("n_sources"),
        )
        .orderBy("user_id")
    )


def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL surface: temp views over the scans,
    the query text handed to Catalyst verbatim. Plan-identical to the
    DataFrame variant (same joins/aggregates), included so the SQL API is
    exercised end-to-end by the oracle gate."""
    for t in ("lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM v_lineitem
        JOIN v_supplier ON l_suppkey = s_suppkey
        JOIN v_nation ON s_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
        """
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where the supplier must share the
    customer's nation. 100-TB plan: the r_name='ASIA' restriction is
    pushed all the way down (VERDICT r3 #6) -- region|><|nation (tiny,
    broadcast-broadcast) yields the ASIA nation-key set FIRST, and both
    `supplier` AND `customer` are pre-filtered on it via broadcast joins
    BEFORE any fact join. r8 (guide §3.2 "reduce the big side before
    shuffling it"): the broadcast ASIA-supplier join applies to
    lineitem BEFORE its o_orderkey shuffle, not after — inner joins
    commute, and the ~4/5 of lineitem rows from non-ASIA suppliers now
    drop map-side instead of riding the exchange (6M -> ~1.2M shuffled
    rows at sf1). Facts (orders, pre-pruned lineitem) shuffle on their
    join keys. The c_nationkey = s_nationkey predicate stays a
    post-join filter."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # ASIA nation keys: region (5 rows) |><| nation (25 rows)
    asia_n = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey", "n_name")
    # pre-filter BOTH dimension sides on the ASIA key set before the facts
    c = c.join(
        F.broadcast(asia_n.select(F.col("n_nationkey").alias("c_nk"))),
        c.c_nationkey == F.col("c_nk"),
    ).drop("c_nk")
    s = s.join(F.broadcast(asia_n), s.s_nationkey == F.col("n_nationkey"))
    l = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view -> click -> purchase: a user
    advances a stage only when the next event type occurs strictly
    AFTER the previous stage's first occurrence (event-sequence
    analytics; the pattern behind funnel reports and drop-off
    dashboards).

    100 TB shape: one hash-aggregate per user with conditional-min
    aggregates (map-side combined; no self-joins, no window sorts over
    the raw stream) — three conditional mins can't express the strict
    ordering alone, so the two later stages re-aggregate conditioned on
    the previous stage's timestamp via a broadcast-joined per-user
    stage table, keeping every pass a single shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("view_ts")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            # epoch longs: engines stringify timestamps differently,
            # epochs hash identically (same convention as dedup_first)
            F.col("view_ts").cast("timestamp").cast("long").alias(
                "view_epoch"
            ),
            F.col("click_ts").cast("timestamp").cast("long").alias(
                "click_epoch"
            ),
            F.col("purchase_ts").cast("timestamp").cast("long").alias(
                "purchase_epoch"
            ),
            (
                F.when(F.col("purchase_ts").isNotNull(), 3)
                .when(F.col("click_ts").isNotNull(), 2)
                .otherwise(1)
            ).alias("funnel_stage"),
        )
        .orderBy("user_id")
    )
