"""Relational operator queries over the star-schema driver tables.

These exercise the join/calendar/string surface of SURVEY.md §2.3/§2.8 on
``lineitem/orders/customer/supplier/part/nation`` — the shapes the engine
must plan well at 100 TB: broadcast the dimension side, shuffle the fact
side once, push every filter into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions.stable import (
    stable_round,
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from ..operators.joins import asof_join, interval_join, value_proximity_join
from .registry import QUERIES, Query, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------- TPC-H Q1 flagship agg


def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic pricing-summary report: scan-side filter + 8-way
    aggregate. The same shape as the reference's composite+stats pass
    (A1/A3/A5 in one group-by). Filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Unsplittable-input spread (guide §2.5): the 7-way decimal partial
    # aggregate — the whole query — otherwise runs on ONE task (single-
    # row-group parquet). Applied on the scan (Catalyst pushes the
    # shipdate filter below the repartition); 6 groups × 32 partitions
    # of partial rows still ride the final exchange. Measured r10
    # interleaved A/B: 1.79 → 1.05 s.
    li = spread_scan(li, spark, "l_orderkey")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity").alias("sum_qty"),
            stable_sum("l_extendedprice").alias("sum_base_price"),
            stable_sum(disc_price).alias("sum_disc_price"),
            stable_sum(charge).alias("sum_charge"),
            stable_avg("l_quantity").alias("avg_qty"),
            stable_avg("l_extendedprice").alias("avg_price"),
            stable_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register(
    Query(
        name="pricing_summary",
        spark=_pricing_summary,
        oracle=f"""
            SELECT l_returnflag, l_linestatus,
                   {sql_stable_sum('l_quantity')} AS sum_qty,
                   {sql_stable_sum('l_extendedprice')} AS sum_base_price,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
                   {sql_stable_avg('l_quantity')} AS avg_qty,
                   {sql_stable_avg('l_extendedprice')} AS avg_price,
                   {sql_stable_avg('l_discount')} AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
            GROUP BY 1, 2
        """,
        tags=("A1", "A3", "A5", "aggregation", "tpch"),
    )
)

# ------------------------------------------------------ J3 star join + O3


def _star_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 + O3 — three-way star join with a global top-k
    (TakeOrderedAndProject; no total sort at scale). The customer
    dimension filter is applied before the join so only BUILDING
    customers shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(stable_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


register(
    Query(
        name="star_join_topk",
        spark=_star_join_topk,
        oracle=f"""
            SELECT l_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
              AND l_shipdate  > TIMESTAMP '2000-01-01 00:00:00'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        tags=("J3", "O3", "join", "tpch"),
    )
)

# ------------------------------------------------- J2 value-proximity join


def _proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (1-D analog) — equi-prefiltered theta join: customer/supplier
    pairs in the same nation with account balances within ±5. The same
    plan shape as the spatial bbox-prefilter + haversine join: hash join
    on the coarse key, theta predicate as a residual filter, small side
    broadcast (the amenity tables are 12-5130 rows, SURVEY.md §0)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_custkey", "c_acctbal"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), "s_suppkey", "s_acctbal"
    )
    pairs = value_proximity_join(
        cust, supp, ["nationkey"], "c_acctbal", "s_acctbal", tolerance=5.0
    )
    return pairs.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_pairs"))


register(
    Query(
        name="proximity_pairs",
        spark=_proximity_pairs,
        oracle="""
            SELECT c_nationkey AS nationkey, count(*) AS n_pairs
            FROM customer JOIN supplier
              ON c_nationkey = s_nationkey
             AND abs(c_acctbal - s_acctbal) <= 5.0
            GROUP BY 1
        """,
        tags=("J2", "join"),
    )
)

# ---------------------------------------------------- J4 interval join


def _interval_join_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — attach facts to the calendar interval containing them (the
    monthly-composite loop, DataDownloader_V2.py:170-183, as a broadcast
    range join against a month spine)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_date", F.to_date("l_shipdate")
    )
    months = (
        li.select(
            F.date_trunc("month", "l_shipdate").cast("date").alias("month_start")
        )
        .distinct()
        .select(
            "month_start",
            F.last_day(F.col("month_start")).alias("month_end"),
            F.date_format("month_start", "yyyy-MM").alias("month_label"),
        )
    )
    joined = interval_join(li, months, "ship_date")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("month_label").agg(
        F.count(F.lit(1)).alias("n_items"),
        stable_sum(revenue).alias("revenue"),
    )


register(
    Query(
        name="interval_join_monthly",
        spark=_interval_join_monthly,
        oracle=f"""
            WITH months AS (
                SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start
                FROM lineitem
            ),
            spine AS (
                SELECT month_start, last_day(month_start) AS month_end,
                       strftime(month_start, '%Y-%m') AS month_label
                FROM months
            )
            SELECT month_label, count(*) AS n_items,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem JOIN spine
              ON CAST(l_shipdate AS DATE) BETWEEN month_start AND month_end
            GROUP BY 1
        """,
        tags=("J4", "F1", "join"),
    )
)


def _interval_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4, the SCALE PATH: when intervals align to a calendar unit the
    range predicate collapses to an equi-join on the bucket key
    (date_trunc month), so the plan is a BroadcastHashJoin — O(1) probe
    per fact row — instead of the generic broadcast nested-loop's
    O(|spine|) predicate evaluations per row. Identical semantics and
    oracle to ``interval_join_monthly``; at a 100 TB fact table the
    nested-loop form multiplies the scan cost by the spine length while
    this form adds one hash probe. This is the bucketize-first rewrite
    the ``interval_join`` docstring prescribes for non-tiny spines."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "month_start", F.date_trunc("month", "l_shipdate").cast("date")
    )
    months = (
        li.select("month_start")
        .distinct()
        .select(
            "month_start",
            F.date_format("month_start", "yyyy-MM").alias("month_label"),
        )
    )
    joined = li.join(F.broadcast(months), "month_start")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("month_label").agg(
        F.count(F.lit(1)).alias("n_items"),
        stable_sum(revenue).alias("revenue"),
    )


register(
    Query(
        name="interval_join_bucketized",
        spark=_interval_join_bucketized,
        # Same result as the generic range-join form — the oracle is
        # deliberately the BETWEEN formulation, so the gate proves the
        # bucket rewrite is semantics-preserving, not just self-equal.
        oracle=QUERIES["interval_join_monthly"].oracle,
        tags=("J4", "F1", "join", "scale-path"),
    )
)

# ------------------------------------------------------------- as-of join


def _asof_clicks_to_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True as-of join (J4's point-in-time variant): every click event
    picks up the latest error event of the same user at-or-before its
    timestamp — the "state as of" attachment the NRT fire feed implies
    (DataDownloader_SNPP_VIIRS_V1.py:138: join each detection to the
    most recent composite). Implemented via operators.joins.asof_join
    (single-shuffle union + running last, no pair explosion); the DuckDB
    oracle is its native ASOF LEFT JOIN. References are pre-deduplicated
    per (user, ts) so tie-breaking is deterministic in both engines."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("err_event_id"),
            F.max("value").alias("err_value"),
        )
    )
    joined = asof_join(
        clicks, errors, on=["user_id"], ts="ts",
        payload=["err_event_id", "err_value"], suffix="_ref",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", fmt).alias("click_ts"),
        "value",
        F.col("err_event_id_ref").alias("err_event_id"),
        F.col("err_value_ref").alias("err_value"),
        F.date_format("ts_ref", fmt).alias("err_ts"),
    )


register(
    Query(
        name="asof_clicks_to_errors",
        spark=_asof_clicks_to_errors,
        oracle="""
            WITH clicks AS (
                SELECT user_id, event_id, ts, value FROM events
                WHERE event_type = 'click'
            ),
            errs AS (
                SELECT user_id, ts,
                       max(event_id) AS err_event_id,
                       max(value) AS err_value
                FROM events WHERE event_type = 'error'
                GROUP BY 1, 2
            )
            SELECT c.user_id, c.event_id,
                   strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   c.value,
                   e.err_event_id, e.err_value,
                   strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts
            FROM clicks c ASOF LEFT JOIN errs e
              ON c.user_id = e.user_id AND c.ts >= e.ts
        """,
        tags=("J4", "join", "asof"),
    )
)

# --------------------------------------------------- Q18 big-order filter


def _big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact, then join the
    qualifying keys back to the dimensions. The HAVING aggregate runs
    BEFORE any join — at scale the filter collapses the fact table to a
    small key set that then broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        # Unsplittable-input spread (guide §2.5), keyed on the grouping
        # key so the spread exchange IS the aggregate's clustering —
        # same exchange count, parallel decimal aggregation.
        spread_scan(li, spark, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(stable_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


register(
    Query(
        name="big_orders",
        spark=_big_orders,
        oracle=f"""
            WITH big AS (
                SELECT l_orderkey, {sql_stable_sum('l_quantity')} AS total_qty
                FROM lineitem GROUP BY 1
                HAVING {sql_stable_sum('l_quantity')} > 150
            )
            SELECT c_name, o_orderkey,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
                   o_totalprice, total_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        tags=("O3", "join", "tpch", "having"),
    )
)

# ------------------------------------------------------ Q14 promo share


def _promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of two conditional aggregates over a
    fact-dimension join — promo revenue share per month. The part
    dimension broadcasts; one scan, no re-aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Unsplittable-input spread (guide §2.5): the broadcast probe + the
    # month partial aggregate otherwise run on ONE task.
    j = spread_scan(li, spark, "l_orderkey").join(
        F.broadcast(part), F.col("l_partkey") == part.p_partkey
    )
    monthly = j.withColumn(
        "month", F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM")
    ).groupBy("month")
    return monthly.agg(
        stable_sum(
            F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
        ).alias("promo_revenue"),
        stable_sum(revenue).alias("total_revenue"),
        F.round(
            F.sum(
                F.when(F.col("p_type") == "PROMO", revenue)
                .otherwise(F.lit(0.0))
                .cast("decimal(30,6)")
            ).cast("double")
            * 100.0
            / F.sum(revenue.cast("decimal(30,6)")).cast("double"),
            6,
        ).alias("promo_pct"),
    )


register(
    Query(
        name="promo_share",
        spark=_promo_share,
        oracle=f"""
            SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
                   {sql_stable_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
                   round(cast(sum(cast((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) as decimal(30,6))) as double)
                         * 100.0
                         / cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(30,6))) as double), 6) AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        tags=("F3", "join", "tpch"),
    )
)

# ------------------------------------------------------------ J5 anti join


def _parts_no_recent_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — anti-join gap detection on a dimension: parts with no
    shipment after 2001-06-01 (the "No … data available" check,
    DataDownloader_V1.py:100-129, as NOT EXISTS)."""
    part = _t(spark, sf_dir, "part")
    recent = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    missing = part.join(
        recent, part.p_partkey == recent.l_partkey, "left_anti"
    )
    return missing.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_parts"))


register(
    Query(
        name="parts_no_recent_ship",
        spark=_parts_no_recent_ship,
        oracle="""
            SELECT p_type, count(*) AS n_parts
            FROM part
            WHERE NOT EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_partkey = p_partkey
                  AND l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
            )
            GROUP BY 1
        """,
        tags=("J5", "join"),
    )
)

# ------------------------------------------------------------ J1 semi join


def _active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — semi-join pruning (clip semantics,
    DataDownloader_V1.py:145): customers with ≥1 order in 2001."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    active = cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_semi"
    )
    return active.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


register(
    Query(
        name="active_customers_semi",
        spark=_active_customers_semi,
        oracle="""
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
            )
            GROUP BY 1
        """,
        tags=("J1", "join"),
    )
)

# ---------------------------------------------------------- set operations


def _set_except_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — partition-diff via EXCEPT: months with shipments but no
    new orders (which months exported vs expected,
    DataDownloader_V2.py:189)."""
    li_months = (
        _t(spark, sf_dir, "lineitem")
        .select(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("month"))
        .distinct()
    )
    o_months = (
        _t(spark, sf_dir, "orders")
        .select(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"))
        .distinct()
    )
    return li_months.exceptAll(o_months)


register(
    Query(
        name="set_except_months",
        spark=_set_except_months,
        oracle="""
            SELECT DISTINCT strftime(CAST(date_trunc('month', l_shipdate) AS DATE), '%Y-%m-%d') AS month
            FROM lineitem
            EXCEPT
            SELECT DISTINCT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month
            FROM orders
        """,
        tags=("setop",),
    )
)

def _set_intersect_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — INTERSECT twin of set_except_months: months present in
    BOTH the shipment and order calendars (the layer x date matrix cell
    is populated only when both sides exported, index.html:135-147).
    Both inputs are distinct month spines, so the intersect shuffles a
    few thousand rows at most regardless of fact-table size."""
    li_months = (
        _t(spark, sf_dir, "lineitem")
        .select(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("month"))
        .distinct()
    )
    o_months = (
        _t(spark, sf_dir, "orders")
        .select(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"))
        .distinct()
    )
    return li_months.intersect(o_months)


register(
    Query(
        name="set_intersect_months",
        spark=_set_intersect_months,
        oracle="""
            SELECT DISTINCT strftime(CAST(date_trunc('month', l_shipdate) AS DATE), '%Y-%m-%d') AS month
            FROM lineitem
            INTERSECT
            SELECT DISTINCT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month
            FROM orders
        """,
        tags=("setop",),
    )
)

# ------------------------------------------------------------ F1 date math


def _month_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — the monthly driver's date arithmetic as columns: month
    bucket, clamped month end, next month, label
    (DataDownloader_V2.py:170-183; December wrap SNPP:229-232)."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.withColumn(
            "month_start", F.date_trunc("month", "o_orderdate").cast("date")
        )
        .groupBy("month_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum("o_totalprice").alias("total_price"),
        )
    )
    return monthly.select(
        F.date_format("month_start", "yyyy-MM-dd").alias("month_start_s"),
        F.date_format(F.last_day("month_start"), "yyyy-MM-dd").alias("month_end_s"),
        F.date_format(F.add_months("month_start", 1), "yyyy-MM-dd").alias("next_month_s"),
        F.date_format("month_start", "yyyy-MM").alias("month_label"),
        "n_orders",
        "total_price",
    )


register(
    Query(
        name="month_math",
        spark=_month_math,
        oracle=f"""
            SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start_s,
                   strftime(last_day(CAST(date_trunc('month', o_orderdate) AS DATE)), '%Y-%m-%d') AS month_end_s,
                   strftime(CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
                        + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS next_month_s,
                   strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m') AS month_label,
                   count(*) AS n_orders,
                   {sql_stable_sum('o_totalprice')} AS total_price
            FROM orders
            GROUP BY 1, 2, 3, 4
        """,
        tags=("F1", "scalar"),
    )
)

# ---------------------------------------------------------- F5 string funcs


def _string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — the filename-templating string surface: upper, concat_ws,
    prefix test, replace (DataDownloader_V2.py:49,77,87;
    fix_transparency.py:48)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_u"),
        F.concat_ws("_", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "part_tag"
        ),
        F.when(F.col("p_name").startswith("small"), 1).otherwise(0).alias(
            "is_small"
        ),
        F.regexp_replace("p_name", " ", "-").alias("slug"),
    )


register(
    Query(
        name="string_funcs",
        spark=_string_funcs,
        oracle="""
            SELECT p_partkey,
                   upper(p_type) AS type_u,
                   concat_ws('_', p_brand, CAST(p_size AS VARCHAR)) AS part_tag,
                   CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END AS is_small,
                   replace(p_name, ' ', '-') AS slug
            FROM part
        """,
        tags=("F5", "scalar"),
    )
)

# ------------------------------------------ Q2 shape: min-cost supplier


def _min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table in this schema, so "cost" is
    the best observed unit price in lineitem): for each STANDARD small
    part, the supplier with the minimum unit price, deterministic
    tie-break on suppkey.

    Scale shape: part filter broadcasts into the fact scan; the
    (part, supp) aggregate gets map-side combine; the per-part argmin is
    a second partial aggregate (max/min of struct — never a window over
    the fact table); dimensions broadcast at the end."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    li = _t(spark, sf_dir, "lineitem")
    unit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(
            F.min(
                stable_round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
            ).alias("unit_price")
        )
    )
    best = unit.groupBy("p_partkey", "p_name").agg(
        F.min(F.struct(F.col("unit_price"), F.col("l_suppkey"))).alias("b")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        best.select(
            "p_partkey",
            "p_name",
            F.col("b.unit_price").alias("min_unit_price"),
            F.col("b.l_suppkey").alias("s_suppkey"),
        )
        .join(F.broadcast(supp), "s_suppkey")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey", "p_name", "min_unit_price", "s_suppkey", "s_name",
            "n_name",
        )
    )


register(
    Query(
        name="min_cost_supplier",
        spark=_min_cost_supplier,
        oracle="""
            WITH unit AS (
                SELECT p_partkey, p_name, l_suppkey,
                       min(floor((l_extendedprice / l_quantity) * 1000000.0 + 0.5) / 1000000.0) AS unit_price
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_type = 'STANDARD' AND p_size < 10
                GROUP BY 1, 2, 3
            ),
            best AS (
                SELECT p_partkey, p_name,
                       min({'up': unit_price, 'sk': l_suppkey}) AS b
                FROM unit GROUP BY 1, 2
            )
            SELECT p_partkey, p_name,
                   b.up AS min_unit_price,
                   b.sk AS s_suppkey, s_name, n_name
            FROM best
            JOIN supplier ON b.sk = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
        """,
        tags=("tpch", "join", "argmin"),
    )
)

# ---------------------------------------- Q4 shape: EXISTS-per-priority


def _late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (one year) that have at least one lineitem
    shipped more than 90 days after the order date, counted per
    priority. The EXISTS is a left-semi join: equi on the order key plus
    a non-equi residual — the fact table is touched once, no row
    explosion for orders with many qualifying lines."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    qualifying = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        "left_semi",
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


register(
    Query(
        name="late_shipment_priority",
        spark=_late_shipment_priority,
        oracle="""
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              )
            GROUP BY 1
        """,
        tags=("tpch", "semi", "exists"),
    )
)

# ------------------------------------------- Q15 shape: top supplier(s)


def _top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, return the
    supplier(s) achieving the global maximum. The scalar max broadcasts
    back over the aggregate (no second scan of the fact table, no
    window over all suppliers)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        stable_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


register(
    Query(
        name="top_revenue_supplier",
        spark=_top_revenue_supplier,
        oracle=f"""
            WITH rev AS (
                SELECT l_suppkey,
                       {sql_stable_sum("l_extendedprice * (1 - l_discount)")}
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= '2000-01-01' AND l_shipdate < '2000-04-01'
                GROUP BY 1
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        tags=("tpch", "scalar-subquery"),
    )
)

# ----------------------------- Q21 shape: EXISTS + NOT EXISTS composite


def _late_unreturned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (order-level): orders from one year with a
    lineitem shipped >60 days late (EXISTS / left-semi) and no returned
    lineitem at all (NOT EXISTS / left-anti) — the semi and anti probes
    chain on the same fact table, each a single pass."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        late.join(
            returned, late.o_orderkey == returned.l_orderkey, "left_anti"
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "o_totalprice",
        )
    )


register(
    Query(
        name="late_unreturned_orders",
        spark=_late_unreturned_orders,
        oracle="""
            SELECT o_orderkey,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
                   o_orderpriority, o_totalprice
            FROM orders o
            WHERE o_orderdate >= '1999-01-01' AND o_orderdate < '2000-01-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              )
              AND NOT EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
              )
        """,
        tags=("tpch", "semi", "anti"),
    )
)

# -------------------------------------------------- CDC merge / upsert

MERGE_CUTOFF = "2000-01-01"


def _merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the warehouse upsert) expressed as a full
    outer join: the pre-cutoff per-customer aggregate is the target
    table, post-cutoff orders are the change set; each key is tagged
    insert/update/keep and totals are merged. At scale both sides
    shuffle once on the merge key — identical to how Delta/Iceberg
    implement MERGE's join phase — and the tag lets a writer route rows
    to copy-on-write vs append paths."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    target = (
        orders.filter(F.col("o_orderdate") < cutoff)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("t_orders"),
            stable_sum("o_totalprice").alias("t_total"),
        )
    )
    source = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("s_orders"),
            stable_sum("o_totalprice").alias("s_total"),
        )
    )
    t = target.select(
        F.col("o_custkey").alias("t_key"), "t_orders", "t_total"
    )
    s = source.select(
        F.col("o_custkey").alias("s_key"), "s_orders", "s_total"
    )
    merged = t.join(s, t.t_key == s.s_key, "full_outer")
    return merged.select(
        F.coalesce("t_key", "s_key").alias("custkey"),
        F.when(F.col("t_key").isNull(), "insert")
        .when(F.col("s_key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        (
            F.coalesce("t_orders", F.lit(0))
            + F.coalesce("s_orders", F.lit(0))
        ).alias("n_orders"),
        F.round(
            F.coalesce("t_total", F.lit(0.0))
            + F.coalesce("s_total", F.lit(0.0)),
            2,
        ).alias("lifetime_total"),
    )


register(
    Query(
        name="merge_upsert",
        spark=_merge_upsert,
        oracle=f"""
            WITH target AS (
                SELECT o_custkey, count(*) AS t_orders,
                       {sql_stable_sum('o_totalprice')} AS t_total
                FROM orders WHERE o_orderdate < '{MERGE_CUTOFF}'
                GROUP BY 1
            ),
            source AS (
                SELECT o_custkey, count(*) AS s_orders,
                       {sql_stable_sum('o_totalprice')} AS s_total
                FROM orders WHERE o_orderdate >= '{MERGE_CUTOFF}'
                GROUP BY 1
            )
            SELECT coalesce(t.o_custkey, s.o_custkey) AS custkey,
                   CASE WHEN t.o_custkey IS NULL THEN 'insert'
                        WHEN s.o_custkey IS NULL THEN 'keep'
                        ELSE 'update' END AS action,
                   CAST(coalesce(t_orders, 0) + coalesce(s_orders, 0)
                        AS BIGINT) AS n_orders,
                   round(coalesce(t_total, 0) + coalesce(s_total, 0), 2)
                       AS lifetime_total
            FROM target t FULL OUTER JOIN source s
              ON t.o_custkey = s.o_custkey
        """,
        tags=("merge", "cdc", "outer-join"),
    )
)


# --------------------------------------------- TPC-H Q11 shape (analog)

# The driver testdata has no partsupp table, so the Q11 "important
# stock" shape runs over a DERIVED partsupp analog: per (partkey,
# suppkey) shipped value aggregated from lineitem. Same plan skeleton as
# the real Q11: derive → broadcast-join the nation-filtered supplier
# dim → per-part value → HAVING against a global-scalar fraction.
STOCK_NATION = "NATION_7"
STOCK_FRACTION = 1e-3  # Q11 uses 0.0001/SF; sized to this data


def _supplier_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose stock value (held by suppliers of
    one nation) exceeds a fixed fraction of that nation's total.

    Scale shape: the nation filter is a broadcast SEMI-join applied to
    the fact BEFORE the heavy aggregate — filtering on a group key
    commutes with groupBy, so only the ~1/|nations| surviving rows pay
    the (partkey, suppkey) shuffle (the oracle filters after the
    aggregate; identical result, this order is the 100 TB plan). ONE
    fact shuffle builds the derived partsupp with map-side partials;
    the global total is a scalar broadcast-joined back (never a second
    fact scan — it reuses the per-part aggregate). Every accumulation
    is exact DECIMAL end-to-end; both engines cast the identical
    decimals to double for the threshold compare, so the boundary set
    cannot diverge."""
    dec = "decimal(30,6)"
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == STOCK_NATION
    )
    nat_sup = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    li_nat = li.join(
        F.broadcast(nat_sup),
        li.l_suppkey == nat_sup.s_suppkey,
        "left_semi",
    )
    partsupp = (
        li_nat.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast(dec)
            ).alias("ps_value")
        )
    )
    # part-count-sized; eager-checkpoint so the global-total branch
    # reuses it instead of re-scanning and re-aggregating the fact
    # (Catalyst's exchange reuse doesn't fire across the broadcast
    # boundary here) — the pagerank/ann_ivf pattern.
    per_part = partsupp.groupBy("l_partkey").agg(
        F.sum("ps_value").alias("part_value")
    ).localCheckpoint(eager=True)
    grand = per_part.agg(F.sum("part_value").alias("g"))
    return (
        per_part.crossJoin(F.broadcast(grand))
        .filter(
            F.col("part_value").cast("double")
            > F.col("g").cast("double") * F.lit(STOCK_FRACTION)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            stable_round(F.col("part_value").cast("double"), 2).alias(
                "stock_value"
            ),
        )
    )


register(
    Query(
        name="supplier_stock_value",
        spark=_supplier_stock_value,
        oracle=f"""
            WITH nat_sup AS (
                SELECT s_suppkey
                FROM supplier JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = '{STOCK_NATION}'
            ),
            partsupp AS (
                SELECT l_partkey, l_suppkey,
                       sum(CAST(l_extendedprice * (1 - l_discount)
                                AS DECIMAL(30,6))) AS ps_value
                FROM lineitem GROUP BY 1, 2
            ),
            per_part AS (
                SELECT l_partkey, sum(ps_value) AS part_value
                FROM partsupp JOIN nat_sup ON l_suppkey = s_suppkey
                GROUP BY 1
            ),
            grand AS (SELECT sum(part_value) AS g FROM per_part)
            SELECT l_partkey AS partkey,
                   {{stable_round_sql}} AS stock_value
            FROM per_part, grand
            WHERE CAST(part_value AS DOUBLE)
                  > CAST(g AS DOUBLE) * {STOCK_FRACTION!r}
        """.replace(
            "{stable_round_sql}",
            "floor(CAST(part_value AS DOUBLE) * 100.0 + 0.5) / 100.0",
        ),
        tags=("join", "aggregation", "subquery", "tpch-q11"),
    )
)


# ------------------------------------------ bucketed co-located join


def _bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment through BUCKETED orders ⋈ customer.

    The 100 TB point of this query is its physical plan, not its
    algebra: both tables are laid out in matching hash buckets on the
    customer key (``operators.bucketing``), so the SortMergeJoin reads
    bucket i against bucket i with NO Exchange on either input — the
    join-key shuffle is paid once at layout time and amortized over
    every later join (asserted in ``tests/test_bucketed_join.py``).
    Semantically identical to the plain join, which is exactly what the
    oracle checks.
    """
    from ..operators.bucketing import colocated_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = colocated_join(
        orders,
        customer,
        left_name="orders_by_cust",
        right_name="customer_by_cust",
        left_key="o_custkey",
        right_key="c_custkey",
        left_fp_cols=("o_orderkey", "o_totalprice"),
        right_fp_cols=("c_custkey", "c_acctbal"),
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum("o_totalprice").alias("segment_revenue"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            F.col("segment_revenue").cast("double").alias("segment_revenue"),
        )
    )


register(
    Query(
        name="bucketed_join_revenue",
        spark=_bucketed_join_revenue,
        oracle="""
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(30,6)))
                        AS DOUBLE) AS segment_revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        tags=("join", "bucketing", "J3-scale"),
        doc="shuffle-free co-located join via matching bucketBy layouts; "
        "layout cost amortized across joins (operators/bucketing.py)",
    )
)


# -------------------------------------------- Bloom-prefiltered join


def _bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue from BUILDING-segment customers, with the fact
    side pre-filtered through a broadcast Bloom bitmap of the segment's
    customer keys BEFORE the join (operators/joins.py: bloom_build /
    bloom_prefilter).

    The 100 TB point: when the dimension is too large to broadcast but
    still selective, the join must shuffle the whole fact — unless a
    KB-sized Bloom bitmap of the build keys drops non-matching fact
    rows map-side first. No false negatives, so the exact join that
    follows (which removes Bloom false positives) returns a result
    bit-identical to the plain join — exactly what the oracle checks.
    Mirrors Spark's own runtime-filter/DPP idea as an explicit plan
    step with deterministic md5 hashing."""
    from ..operators.joins import bloom_build, bloom_prefilter

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    bloom = bloom_build(seg, "c_custkey")
    pre = bloom_prefilter(orders, bloom, "o_custkey")
    exact = pre.join(
        F.broadcast(seg),
        pre["o_custkey"] == seg["c_custkey"],
        "left_semi",
    )
    return (
        exact.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_totalprice",
        )
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum("o_totalprice").cast("double").alias("revenue"),
        )
    )


register(
    Query(
        name="bloom_prefilter_revenue",
        spark=_bloom_prefilter_revenue,
        oracle="""
            SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6)))
                              AS DOUBLE), 2) AS revenue
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING'
            )
            GROUP BY 1
        """,
        tags=("join", "bloom-filter", "runtime-filter", "J3-scale"),
        doc="broadcast Bloom bitmap prefilters the fact map-side before "
        "the exact join; result identical to the plain semi-join",
    )
)
