"""Hypothesis differential fuzz over the events-table behavior battery.

Same protocol as ``test_fuzz_differential``: random synthetic event
streams written in the catalog's parquet layout, run through Spark AND
DuckDB, value-hash compared. The generator deliberately forces
timestamp COLLISIONS (same user, same microsecond) — the fixed
testdata's µs resolution makes ties vanishingly rare, yet tie handling
is exactly where window orderings diverge between engines; every
ts-ordered window in the battery must therefore carry its (ts,
event_id) tiebreak or fail here under shrinkage.

Excluded by design: ``attribution_last_touch`` / ``attribution_position``
order touches by raw ts (ties between two same-µs touches of different
campaigns are genuinely ambiguous in the marketing semantics — both
engines get the same totals on real data, but a forced-tie fuzz would
flag the ambiguity, not a bug).
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
    "funnel_conversion",
    "weekly_active_users",
    "event_transitions",
    "time_to_convert",
    "concurrency_profile",
    "audience_overlap",
    "ab_test_zscores",
    "cumulative_unique_users",
    "top_paths",
    "session_windows",
    "retention_cohorts",
    "hopping_window_load",
    # window/stats family over events: frames, per-group firsts and
    # top-k, percentiles, robust outliers — all tie-sensitive
    "range_frame_daily",
    "month_over_month_delta",
    "first_per_group",
    "topk_per_group",
    "value_percentiles",
    "approx_percentiles",
    "mad_outliers",
    "rolling_zscore_anomaly",
    "cusum_drift",
    "holt_forecast",
    # remaining events-table families: as-of correlation under ties,
    # CDC collapse, seasonality, OHLC cascade, gap interpolation, date
    # spines, JSON access, pixel-model composites and classification
    "asof_clicks_to_errors",
    "scd2_user_state",
    "weekday_seasonality",
    "ohlc_rollup_cascade",
    "gapfill_interpolate",
    "date_spine_gaps",
    "json_props",
    "null_handling",
    "rollup_report",
    "pivot_matrix",
    "union_stack",
    "collection_size",
    "value_bounds",
    "max_composite",
    "mean_composite",
    "minmax_normalize",
    "threshold_classify",
    "layer_selection",
    "grid_resample",
]

ETYPES = ["signup", "click", "view", "purchase", "error"]
BASE = dt.datetime(2024, 1, 1)


@st.composite
def event_stream(draw):
    n_users = draw(st.integers(2, 6))
    n = draw(st.integers(15, 60))
    rows = []
    for i in range(n):
        # coarse time grid → frequent exact-µs collisions
        ts = BASE + dt.timedelta(
            days=draw(st.integers(0, 13)),
            hours=draw(st.integers(0, 3)),
            minutes=draw(st.sampled_from([0, 1, 30])),
            seconds=draw(st.sampled_from([0, 30])),
        )
        rows.append(
            (
                i,
                ts,
                draw(st.integers(0, n_users - 1)),
                draw(st.sampled_from(ETYPES)),
                draw(st.integers(1, 30000)) / 100.0,
                '{"k": %d}' % draw(st.integers(0, 99)),
            )
        )
    return rows


def _compare(spark, rows, names):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    run_battery(spark, {"events": pdf}, names)


@settings(
    max_examples=_FUZZ_EX or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_stream())
def test_fuzz_events_battery(spark, rows):
    _compare(spark, rows, BATTERY)


def test_fuzz_events_boundary_stream(spark):
    """Deterministic worst cases in one stream: every event of one user
    at the SAME microsecond (pure tiebreak ordering), a user with a
    purchase but no prior exposure (funnel/ab edge), and a single-event
    user (lag/lead NULL edges)."""
    t0 = BASE + dt.timedelta(hours=1)
    rows = [
        (0, t0, 0, "click", 10.0, '{"k": 1}'),
        (1, t0, 0, "view", 20.0, '{"k": 2}'),
        (2, t0, 0, "purchase", 30.0, '{"k": 3}'),
        (3, t0, 0, "error", 40.0, '{"k": 4}'),
        (4, t0 + dt.timedelta(days=1), 1, "purchase", 50.0, '{"k": 5}'),
        (5, t0 + dt.timedelta(days=2), 2, "signup", 60.0, '{"k": 6}'),
    ]
    _compare(spark, rows, BATTERY)
