"""Advanced relational coverage: multi-hop star joins, selective scans,
window frames (lag/moving average — the month-over-month advocacy deltas
of README.md:2), cube, unpivot, distinct profiling, percentiles.

Everything here carries a DuckDB oracle except the approximate-sketch
variants (engine-specific estimators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from .registry import Query, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------- Q6-style selective scan


def _selective_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight range predicates + single aggregate — the
    query where predicate pushdown into the parquet scan is the entire
    plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


register(
    Query(
        name="selective_revenue",
        spark=_selective_revenue,
        oracle=f"""
            SELECT {sql_stable_sum('l_extendedprice * l_discount')} AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        tags=("P4", "aggregation", "tpch"),
    )
)

# ------------------------------------------- Q5-style multi-hop star join


def _regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through the dimension chain with the
    dimension filter applied before the fact shuffle; region/nation
    broadcast (they are 5/25 rows)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


register(
    Query(
        name="regional_revenue",
        spark=_regional_revenue,
        oracle=f"""
            SELECT n_name,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY 1
        """,
        tags=("J3", "join", "tpch"),
    )
)

# --------------------------------------- month-over-month delta (lag)


def _month_over_month_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The advocacy delta (README.md:2): per-dataset monthly mean and its
    change vs the previous month — ``lag`` over the month spine."""
    ev = _t(spark, sf_dir, "events")
    monthly = (
        ev.withColumn(
            "month", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM")
        )
        .groupBy("event_type", "month")
        .agg(stable_avg("value").alias("mean_value"))
    )
    w = Window.partitionBy("event_type").orderBy("month")
    return monthly.select(
        "event_type",
        "month",
        "mean_value",
        F.round(
            F.col("mean_value") - F.lag("mean_value").over(w), 6
        ).alias("delta_vs_prev"),
    )


register(
    Query(
        name="month_over_month_delta",
        spark=_month_over_month_delta,
        oracle=f"""
            WITH monthly AS (
                SELECT event_type,
                       strftime(date_trunc('month', ts), '%Y-%m') AS month,
                       {sql_stable_avg('value')} AS mean_value
                FROM events
                GROUP BY 1, 2
            )
            SELECT event_type, month, mean_value,
                   round(mean_value - lag(mean_value) OVER (
                       PARTITION BY event_type ORDER BY month), 6) AS delta_vs_prev
            FROM monthly
        """,
        tags=("window", "W1", "F1"),
    )
)

# ------------------------------------------------- moving average frame


def _moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rowsBetween frame: 7-day trailing average of daily order totals
    (rows-based so both engines agree on frame membership). The global
    frame runs through ``blocked_trailing_window`` — block partitioning
    with a carried tail — so no single-partition WindowExec appears even
    though the semantics are a total order."""
    from ..operators.windows import blocked_trailing_window

    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.withColumn(
            "day", F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd")
        )
        .groupBy("day")
        .agg(stable_sum("o_totalprice").alias("day_total"))
        .withColumn(
            "day_idx",
            F.datediff(
                F.to_date("day"), F.lit("1970-01-01").cast("date")
            ),
        )
        # blocked_trailing_window consumes its input in four places
        # (bucket counts, the ranked join, and both sides of the
        # carry-row union) — lazily each re-ran the orders scan+daily
        # aggregate (4 orders scans in the r10 before-plan).
        # Materialize the calendar-sized daily table once (guide §2.4).
        .localCheckpoint(eager=True)
    )
    u, w = blocked_trailing_window(daily, "day_idx", n_preceding=6)
    return (
        u.withColumn(
            "trailing_7d_avg", F.round(F.avg("day_total").over(w), 4)
        )
        .filter(~F.col("__carry"))
        .select("day", "day_total", "trailing_7d_avg")
    )


register(
    Query(
        name="moving_average",
        spark=_moving_average,
        oracle=f"""
            WITH daily AS (
                SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                       {sql_stable_sum('o_totalprice')} AS day_total
                FROM orders
                GROUP BY 1
            )
            SELECT day, day_total,
                   round(avg(day_total) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                       AS trailing_7d_avg
            FROM daily
        """,
        tags=("window",),
    )
)

def _range_frame_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween frame: trailing 7-DAY total per event type over an
    integer day index. Unlike the rows frame in moving_average, the
    range frame is defined by VALUE distance, so calendar gaps shrink
    the window — the semantics a late-arriving sparse feed needs. The
    window sum goes through decimal so frame-iteration order can't
    perturb the float result (hash-compared against DuckDB)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(stable_sum("value", scale=6).alias("day_total"))
        .withColumn(
            "day_idx", F.datediff("day", F.lit("1970-01-01").cast("date"))
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_total",
        F.round(
            F.sum(F.col("day_total").cast("decimal(30,6)")).over(w).cast(
                "double"
            ),
            6,
        ).alias("trailing_7d_total"),
    )


register(
    Query(
        name="range_frame_daily",
        spark=_range_frame_daily,
        oracle=f"""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       {sql_stable_sum('value', scale=6)} AS day_total
                FROM events
                GROUP BY 1, 2
            )
            SELECT event_type, strftime(day, '%Y-%m-%d') AS day, day_total,
                   round(CAST(sum(CAST(day_total AS DECIMAL(30,6))) OVER (
                       PARTITION BY event_type
                       ORDER BY (day - DATE '1970-01-01')
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE), 6) AS trailing_7d_total
            FROM daily
        """,
        tags=("window", "range-frame"),
    )
)

# ----------------------------------------------------------------- cube


def _cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass (the dataset x month x region reporting surface the viewers
    imply, SURVEY.md §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    # Unsplittable-input spread (guide §2.5): the Expand(×4 grouping
    # sets) + decimal partial aggregate otherwise run on ONE task.
    return spread_scan(li, spark, "l_orderkey").cube(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum("l_quantity").alias("sum_qty"),
    )


register(
    Query(
        name="cube_report",
        spark=_cube_report,
        oracle=f"""
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   {sql_stable_sum('l_quantity')} AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            -- engine contract: Spark's Expand+HashAggregate emits no
            -- grouping-set rows on EMPTY input (the standard grand-total
            -- row needs >=1 input row here); every real grouping-set row
            -- has n >= 1, so this is a no-op on non-empty data
            HAVING count(*) > 0
        """,
        tags=("aggregation", "cube"),
    )
)

# -------------------------------------------------------------- unpivot


def _unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — wide→long unpivot via stack(): the reference's meshgrid/ravel
    flattening (fix_transparency.py:65-78) as a relational operator."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
        "'discount', l_discount) AS (measure, val)",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        stable_sum("val", scale=4).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    Query(
        name="unpivot_measures",
        spark=_unpivot_measures,
        oracle=f"""
            WITH long AS (
                SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val
                FROM lineitem
                UNION ALL
                SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
                UNION ALL
                SELECT l_returnflag, 'discount', l_discount FROM lineitem
            )
            SELECT l_returnflag, measure,
                   {sql_stable_sum('val', 4)} AS total,
                   count(*) AS n
            FROM long
            GROUP BY 1, 2
        """,
        tags=("F7", "setop"),
    )
)

# ----------------------------------------------------- distinct profiling


def _distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-cardinality profile (the data-profiling surface;
    the sketch variant is ``approx_distinct_profile``)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


register(
    Query(
        name="distinct_profile",
        spark=_distinct_profile,
        oracle="""
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem
            GROUP BY 1
        """,
        tags=("aggregation",),
    )
)


def _approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch profile as an ACCURACY GATE: the raw
    estimates are engine-specific (never hashable against DuckDB), so
    the hashed output carries the exact cardinalities plus a boolean
    asserting the sketch landed within 5 % of exact (rsd pinned to 0.01
    — the default 0.05 realizes up to ~9 % error on these key counts).
    HLL++ is hash-deterministic, so the boolean is stable — if the
    sketch path breaks, the gate flips to false and hash-fails. At
    100 TB the sketch is the only affordable form (no distinct-shuffle;
    sketches merge associatively)."""
    li = _t(spark, sf_dir, "lineitem")

    def within(approx, exact):  # noqa: ANN001 - Column helpers
        return (F.abs(approx - exact) <= 0.05 * exact).alias

    # Keep the HLL sketches and the exact count-distincts in SEPARATE
    # aggregations, joined on the (3-row) group key. Mixing them in one
    # agg routes the non-distinct HLL buffers through the
    # distinct-rewrite Expand, where every input row drags the 16 KiB
    # rsd=0.01 register array through partial aggregation — measured
    # 81 s vs 1.7 s each when split, on identical results.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("__ap"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("__ao"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    agg = exact.join(F.broadcast(sketches), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "n_parts",
        "n_orders",
        within(F.col("__ap"), F.col("n_parts"))("parts_within_5pct"),
        within(F.col("__ao"), F.col("n_orders"))("orders_within_5pct"),
    )


register(
    Query(
        name="approx_distinct_profile",
        spark=_approx_distinct_profile,
        oracle="""
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_orderkey) AS n_orders,
                   true AS parts_within_5pct,
                   true AS orders_within_5pct
            FROM lineitem
            GROUP BY 1
        """,
        tags=("aggregation", "sketch"),
    )
)

# ------------------------------------------------------------ percentiles


def _value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per dataset (the profiling
    quartiles). Both engines implement the same linear interpolation on
    the sorted values; results rounded to 6."""
    ev = _t(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return ev.groupBy("event_type").agg(
        F.round(F.get(pct, 0), 6).alias("p25"),
        F.round(F.get(pct, 1), 6).alias("p50"),
        F.round(F.get(pct, 2), 6).alias("p75"),
    )


register(
    Query(
        name="value_percentiles",
        spark=_value_percentiles,
        oracle="""
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 6) AS p25,
                   round(quantile_cont(value, 0.50), 6) AS p50,
                   round(quantile_cont(value, 0.75), 6) AS p75
            FROM events
            GROUP BY 1
        """,
        tags=("aggregation",),
    )
)

def _approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of value_percentiles: approx_percentile
    (Greenwald-Khanna). At 100 TB the exact form needs a full sort per
    group; the sketch is one pass and mergeable. Oracle-checkable
    because GK with accuracy ≥ group size never compresses — it returns
    the exact lower-nearest-rank element, which is precisely DuckDB's
    quantile_disc convention (verified element-for-element at sf0.01)."""
    ev = _t(spark, sf_dir, "events")
    pct = F.percentile_approx(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(100000)
    )
    return ev.groupBy("event_type").agg(
        F.round(F.get(pct, 0), 6).alias("p25"),
        F.round(F.get(pct, 1), 6).alias("p50"),
        F.round(F.get(pct, 2), 6).alias("p75"),
    )


register(
    Query(
        name="approx_percentiles",
        spark=_approx_percentiles,
        oracle="""
            SELECT event_type,
                   round(quantile_disc(value, 0.25), 6) AS p25,
                   round(quantile_disc(value, 0.50), 6) AS p50,
                   round(quantile_disc(value, 0.75), 6) AS p75
            FROM events
            GROUP BY 1
        """,
        tags=("aggregation", "sketch"),
    )
)

# ----------------------------------------------------- outer join + fill


def _outer_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-fill semantics: every order keeps a row
    even with no recent shipments (the composite-over-sparse-dates shape:
    absent observations surface as NULL → coalesce to 0, F4)."""
    orders = _t(spark, sf_dir, "orders")
    recent = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    per_order = recent.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_recent")
    )
    joined = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.coalesce("n_recent", F.lit(0))).alias("recent_items"),
        F.sum(
            F.when(F.col("n_recent").isNull(), 1).otherwise(0)
        ).alias("orders_without_recent"),
    )


register(
    Query(
        name="outer_join_fill",
        spark=_outer_join_fill,
        oracle="""
            WITH per_order AS (
                SELECT l_orderkey, count(*) AS n_recent
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
                GROUP BY 1
            )
            SELECT o_orderstatus,
                   count(*) AS n_orders,
                   CAST(sum(coalesce(n_recent, 0)) AS BIGINT) AS recent_items,
                   CAST(sum(CASE WHEN n_recent IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS orders_without_recent
            FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
            GROUP BY 1
        """,
        tags=("join", "F4"),
    )
)

# --------------------------------------------------------- grouping sets


def _grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the middle ground between rollup and
    cube): per-flag, per-status, and grand-total rows in one pass —
    Spark plans a single Expand + hash aggregate, no re-scan per level."""
    # Unsplittable-input spread (guide §2.5): same Expand-stage shape
    # as cube_report.
    spread_scan(
        _t(spark, sf_dir, "lineitem"), spark, "l_orderkey"
    ).createOrReplaceTempView("gs_lineitem")
    # sql_stable_sum is plain ANSI — the same string runs in both engines.
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {sql_stable_sum('l_quantity')} AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


register(
    Query(
        name="grouping_sets_report",
        spark=_grouping_sets_report,
        oracle=f"""
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   {sql_stable_sum('l_quantity')} AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            HAVING count(*) > 0  -- engine contract: see cube_report
        """,
        tags=("aggregation", "cube"),
    )
)

# ------------------------------------------------- ntile / percent_rank


def _ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window surface beyond row_number: quartile bucketing
    (ntile) + distribution position (percent_rank) over customer
    balances per market segment, reduced to per-quartile stats.
    Tie-broken on c_custkey so bucket membership is deterministic in
    both engines."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return ranked.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
        F.round(F.max("pr"), 6).alias("max_pr"),
    )


register(
    Query(
        name="ntile_quartiles",
        spark=_ntile_quartiles,
        oracle="""
            WITH ranked AS (
                SELECT c_mktsegment, c_acctbal,
                       ntile(4) OVER w AS quartile,
                       percent_rank() OVER w AS pr
                FROM customer
                WINDOW w AS (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey)
            )
            SELECT c_mktsegment, quartile, count(*) AS n,
                   round(min(c_acctbal), 2) AS lo,
                   round(max(c_acctbal), 2) AS hi,
                   round(max(pr), 6) AS max_pr
            FROM ranked
            GROUP BY 1, 2
        """,
        tags=("window",),
    )
)

# ----------------------------------------------- conditional aggregation


def _conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 on the relational surface: CASE-gated aggregates — one scan
    producing per-month urgent/slow counts and the urgent revenue share
    (TPC-H Q12's shape; the reference's threshold-bucket counting,
    DataDownloader_V3.py:62-73, as sum(CASE))."""
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # (r10 measured: a pre-aggregate spread of the 150k-row orders scan
    # ran 0.28 -> 0.54 s interleaved - the per-row work here is too
    # light to pay for an exchange - reverted.)
    return (
        orders.withColumn(
            "month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
        )
        .groupBy("month")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("n_urgent"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("n_normal"),
            stable_sum(F.when(urgent, F.col("o_totalprice")).otherwise(F.lit(0.0))).alias(
                "urgent_revenue"
            ),
        )
    )


register(
    Query(
        name="conditional_agg",
        spark=_conditional_agg,
        oracle=f"""
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_normal,
                   {sql_stable_sum("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0.0 END")} AS urgent_revenue
            FROM orders
            GROUP BY 1
        """,
        tags=("F3", "aggregation"),
    )
)

# ------------------------------------------- correlated scalar subquery


def _above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape (TPC-H Q17/Q22 family):
    customers whose balance exceeds their nation's average. Spark plans
    the decorrelated form explicitly — per-nation aggregate, broadcast
    back onto the fact — which is exactly how Catalyst rewrites the
    correlated SQL. The comparison value goes through the decimal-stable
    average so the boundary set is identical in both engines."""
    cust = _t(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        stable_avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), on="c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            stable_sum("c_acctbal").alias("sum_above"),
        )
    )


register(
    Query(
        name="above_nation_avg",
        spark=_above_nation_avg,
        oracle=f"""
            WITH nation_avg AS (
                SELECT c_nationkey, {sql_stable_avg('c_acctbal')} AS nation_avg
                FROM customer GROUP BY 1
            )
            SELECT c.c_nationkey, count(*) AS n_above,
                   {sql_stable_sum('c.c_acctbal')} AS sum_above
            FROM customer c JOIN nation_avg na ON c.c_nationkey = na.c_nationkey
            WHERE c.c_acctbal > na.nation_avg
            GROUP BY 1
        """,
        tags=("join", "aggregation", "subquery"),
    )
)

# ------------------------------------------------- A4/O2 first per group


def _first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O2 — ``collection.first()`` (DataDownloader_V1.py:141) per
    dataset: the earliest event's attributes via a rank-1 window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", "value")
    )


register(
    Query(
        name="first_per_group",
        spark=_first_per_group,
        oracle="""
            SELECT event_type, event_id, value FROM (
                SELECT event_type, event_id, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        tags=("A4", "O2", "window"),
    )
)
