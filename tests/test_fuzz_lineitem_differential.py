"""Hypothesis differential fuzz over the lineitem-only relational battery.

Random fact tables with ADVERSARIAL decimals — 2-dp prices whose
products land on rounding midpoints, discount exactly 0 and exactly
0.10, single-row groups, empty filter ranges — run through Spark AND
DuckDB under the gate protocol. The decimal-accumulation contract
(`functions/stable.py`) claims bit-identical aggregates for ANY
partitioning and ANY data; this is the any-data half of that claim.
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
    "pricing_summary",
    "selective_revenue",
    "cube_report",
    "grouping_sets_report",
    "unpivot_measures",
    "linear_model_normal_eq",
    "key_skew_profile",
    "incremental_revenue",
    "interval_join_monthly",
    "contract_audit",
    "bootstrap_ci",
]

BASE_DATE = dt.datetime(1995, 1, 2)


@st.composite
def lineitems(draw):
    n = draw(st.integers(10, 60))
    rows = []
    for i in range(n):
        qty = float(draw(st.integers(1, 50)))
        # cents-resolution price: products with (1-disc) are the
        # midpoint-rounding stress the stable_round form exists for
        price = draw(st.integers(91444, 10499818)) / 100.0
        disc = draw(st.sampled_from([0, 1, 2, 5, 10])) / 100.0
        tax = draw(st.sampled_from([0, 4, 8])) / 100.0
        ship = BASE_DATE + dt.timedelta(
            days=draw(st.integers(0, 2450)),
        )
        rows.append(
            (
                draw(st.integers(1, 20)),  # orderkey: shared → groups
                draw(st.integers(1, 8)),
                draw(st.integers(1, 6)),
                i,
                qty,
                price,
                disc,
                tax,
                draw(st.sampled_from(["A", "N", "R"])),
                draw(st.sampled_from(["O", "F"])),
                ship,
            )
        )
    return rows


def _compare(spark, rows, names):
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    pdf["l_linenumber"] = pdf["l_linenumber"].astype("int32")
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype(
        "datetime64[us]"
    )
    run_battery(spark, {"lineitem": pdf}, names)


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lineitems())
def test_fuzz_lineitem_battery(spark, rows):
    _compare(spark, rows, BATTERY)


def test_fuzz_lineitem_boundary_rows(spark):
    """Deterministic worst cases: one row per group (degenerate stats),
    identical rows (zero variance), zero discount and max discount on
    the same price, and a price·(1−disc) product that is an exact
    decimal midpoint at 2 dp."""
    t = BASE_DATE
    rows = [
        (1, 1, 1, 0, 1.0, 1000.05, 0.10, 0.00, "A", "F", t),
        (1, 1, 1, 1, 1.0, 1000.05, 0.10, 0.00, "A", "F", t),
        (2, 2, 2, 2, 50.0, 91444.00 / 100, 0.00, 0.08, "N", "O",
         t + dt.timedelta(days=900)),
        (3, 3, 3, 3, 25.0, 12345.675, 0.05, 0.04, "R", "F",
         t + dt.timedelta(days=1800)),
    ]
    _compare(spark, rows, BATTERY)
