"""Calendar spine + gap detection (SURVEY.md §2.8 F1, §2.3 J5).

The reference steps through calendar months with ``relativedelta`` date
math (DataDownloader_V2.py:170-183) and detects data gaps by per-dataset
emptiness checks (``size() <= 0``, DataDownloader_V1.py:100-129). In a
set-based engine the month loop dissolves into ``sequence()`` — a generated
spine relation — and the gap check becomes an anti-join of the spine
against observed partitions. Calendar months (variable length, December
wrap — SNPP:229-232) come from ``date_trunc``/``add_months``, never from
fixed-duration windows (watch-list #3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine_from(
    df: DataFrame, date_expr: Column, step: str = "interval 1 day", out: str = "date"
) -> DataFrame:
    """Dense calendar spine spanning the observed min..max of ``date_expr``.

    The bounds are computed *inside the plan* (a tiny scalar aggregate that
    Spark broadcasts into the sequence generator) — no driver round-trip,
    so the spine stays correct when the underlying table grows.
    """
    bounds = df.agg(
        F.min(date_expr).alias("lo"), F.max(date_expr).alias("hi")
    )
    return bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, {step})")).alias(out)
    )


def month_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """F1 — the monthly driver loop as a relation: one row per month with
    the same bounds the reference computes (month start, clamped month end
    = ``start + 1 month - 1 day``, DataDownloader_V2.py:176-178)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    ).select(
        "month_start",
        F.last_day("month_start").alias("month_end"),
        F.date_format("month_start", "yyyy-MM").alias("month_label"),
    )


def detect_gaps(
    spine: DataFrame, observed: DataFrame, on: str = "date"
) -> DataFrame:
    """J5 — spine rows with no observed partition: ``left_anti`` join.

    At scale ``observed`` should be the pre-aggregated distinct partition
    list (partition-pruned metadata-sized), so the anti-join broadcasts.
    """
    return spine.join(observed, on=on, how="left_anti")
