"""Hypothesis differential fuzz over the multi-table TPC-H join battery.

Generates a CONSISTENT random star schema (region → nation → customer /
supplier, part, orders → lineitem, all foreign keys valid) and runs the
join-family battery through Spark AND DuckDB under the gate protocol.
Forced revenue ties (duplicate 2-dp prices), empty join branches (a
customer with no orders, a part never shipped), and degenerate groups
are exactly what the fixed TPC-H-ish corpus never produces.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fuzz_common import run_battery

from gee_datapipeline_spark.plans.registry import _load_all

_load_all()

import os as _os

# soak knob: raise for a long exploratory run (examples are drawn
# deterministically, so a bigger budget extends the same sequence)
_FUZZ_EX = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))

BATTERY = [
    "big_orders",
    "shipping_priority",
    "returned_items",
    "volume_shipping",
    "customer_distribution",
    "regional_revenue",
    "star_join_topk",
    "promo_share",
    "top_revenue_supplier",
    "late_shipment_priority",
    "dormant_rich_customers",
    "supplier_stock_value",
    "above_nation_avg",
    "parts_no_recent_ship",
    "active_customers_semi",
    "small_qty_revenue",
    # window/stats family over orders/customer: trailing frames,
    # quartile assignment under ties, first-digit screen, Gini ranks
    "moving_average",
    "ntile_quartiles",
    "benford_screen",
    "gini_concentration",
    # graph family over the supplier→customer trade edges: random
    # bipartite graphs with isolated nodes, dangling sinks (customers
    # never supplying), parallel-edge collapse, forced weight ties
    "pagerank_trade_network",
    "label_propagation",
    "triangle_count",
    "bfs_reachability",
    "kcore_decomposition",
    "proximity_pairs",
    "fuzzy_name_pairs",
    # remaining relational families: co-purchase lift, snapshot diff,
    # disjunctive predicates, set ops on month keys, trend OLS, profit
    # and share rollups, argmin supplier, upsert, anti-join gaps
    "basket_lift_pairs",
    "distinct_profile",
    "snapshot_diff",
    "disjunctive_revenue",
    "conditional_agg",
    "string_funcs",
    "set_except_months",
    "set_intersect_months",
    "month_math",
    "revenue_trend_slope",
    "product_profit",
    "market_share",
    "min_cost_supplier",
    "bulk_part_suppliers",
    "part_supplier_diversity",
    "late_unreturned_orders",
    "outer_join_fill",
    "merge_upsert",
    "interval_join_bucketized",
    "k_anonymity_audit",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
BRANDS = ["Brand#1", "Brand#2", "Brand#3"]
PTYPES = ["PROMO", "STANDARD", "ECONOMY", "LARGE", "SMALL"]
BASE = dt.datetime(1995, 1, 2)


@st.composite
def star(draw):
    n_nat = draw(st.integers(3, 6))
    nations = [(i, f"NATION_{i}", draw(st.integers(0, 4)))
               for i in range(n_nat)]
    n_cust = draw(st.integers(4, 9))
    customers = [
        (
            i,
            f"Customer#{i}",
            draw(st.integers(0, n_nat - 1)),
            draw(st.integers(-99999, 999999)) / 100.0,
            draw(st.sampled_from(SEGMENTS)),
        )
        for i in range(n_cust)
    ]
    n_supp = draw(st.integers(3, 6))
    suppliers = [
        (
            i,
            f"Supplier#{i}",
            draw(st.integers(0, n_nat - 1)),
            draw(st.integers(-99999, 999999)) / 100.0,
        )
        for i in range(n_supp)
    ]
    n_part = draw(st.integers(4, 8))
    parts = [
        (
            i,
            f"part {i}",
            draw(st.sampled_from(BRANDS)),
            draw(st.sampled_from(PTYPES)),
            draw(st.integers(1, 50)),
            draw(st.integers(90000, 200000)) / 100.0,
        )
        for i in range(n_part)
    ]
    n_ord = draw(st.integers(8, 20))
    orders = [
        (
            i,
            draw(st.integers(0, n_cust - 1)),
            draw(st.sampled_from(STATUSES)),
            draw(st.integers(100000, 40000000)) / 100.0,
            BASE + dt.timedelta(days=draw(st.integers(0, 2450))),
            draw(st.sampled_from(PRIOS)),
        )
        for i in range(n_ord)
    ]
    # duplicate 2-dp prices from a SMALL pool → forced revenue ties
    price_pool = [
        draw(st.integers(91444, 10499818)) / 100.0 for _ in range(4)
    ]
    n_li = draw(st.integers(20, 50))
    lineitem = [
        (
            draw(st.integers(0, n_ord - 1)),
            draw(st.integers(0, n_part - 1)),
            draw(st.integers(0, n_supp - 1)),
            i,
            float(draw(st.integers(1, 50))),
            draw(st.sampled_from(price_pool)),
            draw(st.sampled_from([0, 1, 5, 10])) / 100.0,
            draw(st.sampled_from([0, 4, 8])) / 100.0,
            draw(st.sampled_from(["A", "N", "R"])),
            draw(st.sampled_from(["O", "F"])),
            BASE + dt.timedelta(days=draw(st.integers(0, 2450))),
        )
        for i in range(n_li)
    ]
    return nations, customers, suppliers, parts, orders, lineitem


def _compare(spark, tables, names):
    nations, customers, suppliers, parts, orders, lineitem = tables
    frames = {
        "region": pd.DataFrame(
            [(i, n) for i, n in enumerate(REGIONS)],
            columns=["r_regionkey", "r_name"],
        ).astype({"r_regionkey": "int32"}),
        "nation": pd.DataFrame(
            nations, columns=["n_nationkey", "n_name", "n_regionkey"]
        ).astype({"n_nationkey": "int32", "n_regionkey": "int32"}),
        "customer": pd.DataFrame(
            customers,
            columns=[
                "c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment",
            ],
        ).astype({"c_nationkey": "int32"}),
        "supplier": pd.DataFrame(
            suppliers,
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ).astype({"s_nationkey": "int32"}),
        "part": pd.DataFrame(
            parts,
            columns=[
                "p_partkey", "p_name", "p_brand", "p_type", "p_size",
                "p_retailprice",
            ],
        ).astype({"p_size": "int32"}),
        "orders": pd.DataFrame(
            orders,
            columns=[
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority",
            ],
        ),
        "lineitem": pd.DataFrame(
            lineitem,
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            ],
        ).astype({"l_linenumber": "int32"}),
    }
    for c in ("o_orderdate",):
        frames["orders"][c] = pd.to_datetime(frames["orders"][c]).astype(
            "datetime64[us]"
        )
    frames["lineitem"]["l_shipdate"] = pd.to_datetime(
        frames["lineitem"]["l_shipdate"]
    ).astype("datetime64[us]")
    run_battery(spark, frames, names)


@settings(
    max_examples=_FUZZ_EX or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(star())
def test_fuzz_star_battery(spark, tables):
    _compare(spark, tables, BATTERY)
