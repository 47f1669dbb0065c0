"""Remaining TPC-H-shaped mart queries
(Q3/Q7/Q8/Q9/Q10/Q13/Q16/Q17/Q19/Q20/Q22).

Together with ``relational_queries`` (Q1/Q2/Q4/Q5/Q6/Q12/Q14/Q15/Q18/Q21)
this completes the classic decision-support shapes over the driver star
schema — the query surface a user of the reference's relational layer
would expect from a drop-in engine. The schema has no ``partsupp``
table, so Q2/Q9/Q16/Q20 shapes substitute lineitem-observed
supplier-part relationships (and Q11, which is ONLY about partsupp
availability, is the one genuinely out-of-schema shape); the plan
shapes (and what the optimizer must do with them) are unchanged.

Scale discipline, same as everywhere: dimensions broadcast, the fact
table is scanned once with every pushable filter pushed, aggregates are
partial (map-side combine), top-k is TakeOrderedAndProject — never a
global sort. Every double aggregate goes through ``functions.stable``
so results are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import sql_stable_sum, stable_sum
from .registry import Query, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


# ------------------------------------------- Q3: shipping priority top-k


def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top 10 for one market segment.
    customer (filtered, broadcast) ⋈ orders ⋈ lineitem, one shuffle on
    the order key, partial agg, then TakeOrderedAndProject — the global
    sort never materializes. Deterministic tie-break on the order key."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(stable_sum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
    )


register(
    Query(
        name="shipping_priority",
        spark=_shipping_priority,
        oracle=f"""
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   {sql_stable_sum(_SQL_REVENUE)} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-07-01'
              AND l_shipdate > TIMESTAMP '1998-07-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
            LIMIT 10
        """,
        tags=("tpch", "topk", "join"),
    )
)


# --------------------------------------- Q7: bi-nation shipping volumes


def _volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two nations, by direction
    and year. Both nation joins are broadcasts riding the single fact
    shuffle; the disjunctive nation-pair predicate is applied after the
    (tiny) dimension joins, never as a cross product."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
    ) | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(stable_sum(_revenue()).alias("revenue"))
    )


register(
    Query(
        name="volume_shipping",
        spark=_volume_shipping,
        oracle=f"""
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   {sql_stable_sum(_SQL_REVENUE)} AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1999-01-01'
              AND l_shipdate < TIMESTAMP '2001-01-01'
              AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
                OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        tags=("tpch", "join"),
    )
)


# ------------------------------------------- Q9: product-profit by year


def _product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp ⇒ supply cost proxied by half the
    part's retail price): profit per supplier nation per year for one
    part family. Part + supplier + nation broadcast into one fact scan;
    per-row profit arithmetic is IEEE-deterministic, the sum is
    decimal-stable. Rounded to 4 dp — the exact decimal sum has 4
    fractional digits (2-dp price × 2-dp discount factor), so every
    grid point is representable and no engine hits a rounding tie
    (rounding to 2 dp can land exactly on a half-cent, which Spark's
    string-based round and DuckDB's numeric round break differently)."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    profit = _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(stable_sum(profit, scale=4).alias("sum_profit"))
    )


register(
    Query(
        name="product_profit",
        spark=_product_profit,
        oracle=f"""
            SELECT n_name AS nation, year(l_shipdate) AS o_year,
                   {sql_stable_sum(
                       _SQL_REVENUE + ' - 0.5 * p_retailprice * l_quantity', 4
                   )} AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        tags=("tpch", "join"),
    )
)


# -------------------------------------- Q10: returned-item top customers


def _returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in
    one quarter. Orders filter pushes to scan; customer/nation broadcast
    onto the aggregated (not raw) fact rows."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(stable_sum(_revenue()).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey", "c_name", "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


register(
    Query(
        name="returned_items",
        spark=_returned_items,
        oracle=f"""
            WITH per_cust AS (
                SELECT o_custkey, {sql_stable_sum(_SQL_REVENUE)} AS revenue
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '2000-10-01'
                  AND o_orderdate < TIMESTAMP '2001-01-01'
                GROUP BY 1
            )
            SELECT c_custkey, c_name, revenue,
                   round(c_acctbal, 2) AS c_acctbal, n_name
            FROM per_cust
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        tags=("tpch", "topk", "join"),
    )
)


# ------------------------------- Q13: customer order-count distribution


def _customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts,
    including zero-order customers — a LEFT OUTER join with a filtered
    right side (the filter must stay in the join, not above it), then
    two cascaded aggregates. Both aggregates are partial-agg friendly;
    the second one's input is |customers| rows, not the fact table."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


register(
    Query(
        name="customer_distribution",
        spark=_customer_distribution,
        oracle="""
            WITH counts AS (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer
                LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY 1
            )
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM counts GROUP BY 1
        """,
        tags=("tpch", "outer-join"),
    )
)


# ------------------------------ Q16: supplier diversity per part bucket


def _part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp proxied by observed lineitem pairs):
    distinct supplier count per (brand, type, size) for selected sizes,
    excluding one brand, PROMO types, and suppliers in arrears (the
    NOT-IN subquery → broadcast anti-join). The distinct-agg is a
    two-phase hash aggregate on (brand,type,size,suppkey) — no
    count(distinct) over a shuffled window."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


register(
    Query(
        name="part_supplier_diversity",
        spark=_part_supplier_diversity,
        oracle="""
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#2'
              AND p_type NOT LIKE 'PROMO%'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY 1, 2, 3
        """,
        tags=("tpch", "distinct", "anti-join"),
    )
)


# ------------------------------------ Q17: small-quantity-order revenue


def _small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average weekly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not taken.
    The correlated AVG subquery decorrelates to a per-part aggregate
    joined back to the fact rows — the part filter broadcasts into both
    sides, and the per-part average is exact (integer-valued doubles),
    so the threshold comparison is engine-independent."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    narrowed = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    avg_qty = narrowed.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        narrowed.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                stable_sum(F.col("l_extendedprice"), scale=6) / 7.0, 2
            ).alias("avg_yearly")
        )
    )


register(
    Query(
        name="small_qty_revenue",
        spark=_small_qty_revenue,
        oracle=f"""
            WITH narrowed AS (
                SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
            ),
            avg_qty AS (
                SELECT l_partkey, avg(l_quantity) AS avg_qty
                FROM narrowed GROUP BY 1
            )
            SELECT round({sql_stable_sum('l_extendedprice', 6)} / 7.0, 2)
                       AS avg_yearly
            FROM narrowed JOIN avg_qty USING (l_partkey)
            WHERE l_quantity < 0.2 * avg_qty
        """,
        tags=("tpch", "decorrelated-subquery"),
    )
)


# -------------------------------------- Q19: disjunctive-predicate join


def _disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides. The equi-key (partkey) still drives the join — the
    disjunction is a residual filter, not a fallback to nested-loop —
    and each branch's part-only conjuncts could prune the broadcast
    side."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(stable_sum(_revenue()).alias("revenue"))
    )


register(
    Query(
        name="disjunctive_revenue",
        spark=_disjunctive_revenue,
        oracle=f"""
            SELECT {sql_stable_sum(_SQL_REVENUE)} AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        tags=("tpch", "disjunction"),
    )
)


# ----------------------------------- Q20: high-volume part suppliers


def _bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availability proxied by shipped
    volume): suppliers who moved > 300 units of 'small'-named parts in
    one year. Nested semi-join chain: part filter → fact agg → HAVING →
    semi-join into supplier, nation broadcast at the end."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(stable_sum(F.col("l_quantity"), scale=2).alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


register(
    Query(
        name="bulk_part_suppliers",
        spark=_bulk_part_suppliers,
        oracle=f"""
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'small%'
                  AND l_shipdate >= TIMESTAMP '2000-01-01'
                  AND l_shipdate < TIMESTAMP '2001-01-01'
                GROUP BY l_suppkey
                HAVING {sql_stable_sum('l_quantity')} > 300.0
            )
        """,
        tags=("tpch", "semi-join", "having"),
    )
)


# ----------------------------- Q22: dormant customers with high balance


def _dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average positive balance
    with no recent orders, summarized per nation. The scalar-subquery
    average is computed exactly in DECIMAL (2-dp money), so the
    threshold comparison cannot flake across engines; the NOT EXISTS is
    a left-anti join on the customer key."""
    cust = _t(spark, sf_dir, "customer")
    dec = "decimal(30,2)"
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(dec))
                / F.count(F.lit(1)).cast(dec)
            ).alias("avg_bal")
        )
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast(dec) > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


register(
    Query(
        name="dormant_rich_customers",
        spark=_dormant_rich_customers,
        oracle=f"""
            SELECT c_nationkey, count(*) AS numcust,
                   {sql_stable_sum('c_acctbal')} AS totacctbal
            FROM customer
            WHERE CAST(c_acctbal AS DECIMAL(30,2)) > (
                SELECT sum(CAST(c_acctbal AS DECIMAL(30,2)))
                       / CAST(count(*) AS DECIMAL(30,2))
                FROM customer WHERE c_acctbal > 0.0
            )
            AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01'
            )
            GROUP BY 1
        """,
        tags=("tpch", "anti-join", "scalar-subquery"),
    )
)


# ------------------------------------------ Q8: national market share


def _market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of STANDARD-part revenue sold to
    customers in NATION_0..NATION_4's region, per year. One fact scan
    with part/supplier/customer-chain dimensions broadcast; the share is
    a conditional ratio over decimal-stable sums in a single aggregate
    pass (the Q14 pattern with a nation predicate), quantized with
    stable_round so the division can't hit an engine rounding tie."""
    from ..functions.stable import stable_round

    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    region = _t(spark, sf_dir, "region")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_region = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_nationkey % 5 == region.r_regionkey,
                )
            ),
            F.col("c_nationkey") == nation.n_nationkey,
        )
        .filter(F.col("r_regionkey") == 0)
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    target_vol = F.when(
        F.col("supp_nation") == "NATION_3", vol
    ).otherwise(F.lit(0.0).cast("decimal(30,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust_region, orders.o_custkey == cust_region.c_custkey, "left_semi"
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            stable_round(F.sum(target_vol).cast("double"), 2).alias(
                "nation_volume"
            ),
            stable_round(F.sum(vol).cast("double"), 2).alias(
                "total_volume"
            ),
            stable_round(
                F.sum(target_vol).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


register(
    Query(
        name="market_share",
        spark=_market_share,
        oracle="""
            WITH cust_region AS (
                SELECT c_custkey
                FROM customer
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_nationkey % 5 = r_regionkey
                WHERE r_regionkey = 0
            )
            SELECT year(o_orderdate) AS o_year,
                   floor(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                  THEN CAST(l_extendedprice * (1 - l_discount)
                                            AS DECIMAL(30,6))
                                  ELSE CAST(0.0 AS DECIMAL(30,6)) END)
                              AS DOUBLE) * 100.0 + 0.5) / 100.0
                       AS nation_volume,
                   floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(30,6))) AS DOUBLE)
                         * 100.0 + 0.5) / 100.0
                       AS total_volume,
                   floor(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                  THEN CAST(l_extendedprice * (1 - l_discount)
                                            AS DECIMAL(30,6))
                                  ELSE CAST(0.0 AS DECIMAL(30,6)) END)
                              AS DOUBLE)
                         / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                         AS DECIMAL(30,6))) AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1999-01-01'
              AND o_orderdate < TIMESTAMP '2001-01-01'
              AND o_custkey IN (SELECT c_custkey FROM cust_region)
            GROUP BY 1
        """,
        tags=("tpch", "conditional-ratio"),
    )
)
