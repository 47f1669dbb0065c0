"""Pixel-semantics queries over the driver's ``events`` table.

``events(event_id, ts, user_id, event_type, value, props)`` plays the role
of the long pixel table (SURVEY.md §1.1): ``user_id`` ≈ pixel key,
``event_type`` ≈ dataset/band, ``ts`` ≈ observation time, ``value`` ≈
measurement. Each query here is one operator from SURVEY.md §2 expressed
on that analog so the DuckDB oracle can check it; the geo-specific forms
of the same operators live in ``operators/`` + ``functions/geo`` and are
unit-tested on synthetic rasters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_round,
    stable_sum,
)
from ..operators import composites, windows
from ..operators.calendar import date_spine_from
from ..operators.classify import classify_expr
from .registry import Query, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dates are carried as ISO strings in query outputs: a DATE surfaces
    # differently from Spark (datetime.date) vs DuckDB (datetime64) in
    # the differential harness, while ISO strings are unambiguous.
    return load_table(spark, sf_dir, "events").withColumn(
        "date", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )


# ---------------------------------------------------------------- A1 mean


def _mean_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-(pixel,dataset,day) mean composite
    (``collection.mean()``, DataDownloader_V1.py:145)."""
    return composites.mean_composite(
        _events(spark, sf_dir), ["user_id", "event_type", "date"]
    )


register(
    Query(
        name="mean_composite",
        spark=_mean_composite,
        oracle=f"""
            SELECT user_id, event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   {sql_stable_avg('value')} AS mean_value,
                   count(value) AS n_obs
            FROM events
            GROUP BY 1, 2, 3
        """,
        tags=("A1", "aggregation"),
    )
)

# ----------------------------------------------------------------- A2 max


def _max_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-pixel max composite (``frp_collection.max()``,
    DataDownloader_SNPP_VIIRS_V1.py:155)."""
    return composites.max_composite(
        _events(spark, sf_dir), ["user_id", "date"]
    )


register(
    Query(
        name="max_composite",
        spark=_max_composite,
        oracle="""
            SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   max(value) AS max_value
            FROM events
            GROUP BY 1, 2
        """,
        tags=("A2", "aggregation"),
    )
)

# --------------------------------------------------------------- A3 count


def _collection_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — ``collection.size()`` per dataset (DataDownloader_V1.py:100)."""
    return composites.collection_size(_events(spark, sf_dir), ["event_type"])


register(
    Query(
        name="collection_size",
        spark=_collection_size,
        oracle="SELECT event_type, count(*) AS n FROM events GROUP BY 1",
        tags=("A3", "aggregation"),
    )
)

# ----------------------------------------------------------- A5/A8 bounds


def _value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A8 — per-image global min/max, the normalization bounds
    (``np.nanmin/np.nanmax``, DataDownloader_V1.py:59-60)."""
    return composites.value_bounds(
        _events(spark, sf_dir), ["event_type", "date"]
    )


register(
    Query(
        name="value_bounds",
        spark=_value_bounds,
        oracle="""
            SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   min(value) AS min_value, max(value) AS max_value,
                   count(value) AS n_obs
            FROM events
            GROUP BY 1, 2
        """,
        tags=("A5", "A8", "aggregation"),
    )
)

# ------------------------------------------------------- W1 normalization


def _minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-image min-max normalize, ``(v-min)/(max-min+1e-6)``
    (DataDownloader_V1.py:62) as an unbounded window."""
    df = _events(spark, sf_dir).select(
        "event_id", "event_type", "date", "value"
    )
    return windows.minmax_normalize(df, ["event_type", "date"])


register(
    Query(
        name="minmax_normalize",
        spark=_minmax_normalize,
        oracle="""
            SELECT event_id, event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date, value,
                   round((value - min(value) OVER w)
                         / (max(value) OVER w - min(value) OVER w + 1e-6),
                         6) AS norm_value
            FROM events
            WINDOW w AS (PARTITION BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
        """,
        tags=("W1", "window"),
    )
)

# --------------------------------------------------------- A7 grid resample


def _grid_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — spatial resample as a grid-bucket aggregate
    (``scale=1000`` regrid, DataDownloader_V1.py:149)."""
    df = _events(spark, sf_dir)
    return composites.grid_resample(
        df.select("event_type", "user_id", "value"),
        {
            "event_type": F.col("event_type"),
            "cell": F.floor(F.col("user_id") / F.lit(10)),
        },
    )


register(
    Query(
        name="grid_resample",
        spark=_grid_resample,
        oracle=f"""
            SELECT event_type,
                   CAST(floor(user_id / 10) AS BIGINT) AS cell,
                   {sql_stable_avg('value')} AS cell_value,
                   count(value) AS n_obs
            FROM events
            GROUP BY 1, 2
        """,
        tags=("A7", "aggregation"),
    )
)

# ------------------------------------------------------ F3 classification


def _threshold_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — WHO-standard threshold buckets (DataDownloader_V3.py:62-73)
    with std=100 against the events value scale."""
    df = _events(spark, sf_dir)
    std = F.lit(100.0)
    return (
        df.withColumn("bucket", classify_expr(F.col("value"), std))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(
    Query(
        name="threshold_classify",
        spark=_threshold_classify,
        oracle="""
            SELECT event_type,
                   CASE WHEN value < 100.0 THEN 'below_standard'
                        WHEN value < 150.0 THEN 'elevated'
                        WHEN value < 200.0 THEN 'high'
                        ELSE 'severe' END AS bucket,
                   count(*) AS n
            FROM events
            GROUP BY 1, 2
        """,
        tags=("F3", "scalar"),
    )
)

# ------------------------------------------------------------- O3 top-k


def _topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — top-3 most intense observations per dataset
    (the "most intense fire" ranking, DataDownloader_SNPP_VIIRS_V1.py:154)."""
    df = _events(spark, sf_dir).select("event_type", "event_id", "value")
    return windows.topk_per_group(
        df,
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        k=3,
    )


register(
    Query(
        name="topk_per_group",
        spark=_topk_per_group,
        oracle="""
            SELECT event_type, event_id, value, rk FROM (
                SELECT event_type, event_id, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value DESC, event_id) AS rk
                FROM events
            ) WHERE rk <= 3
        """,
        tags=("O3", "window"),
    )
)

# ------------------------------------------------- J5 calendar gap detect


def _date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — data-gap detection: dense (dataset × day) spine anti-joined
    against observed partitions ("No … data available",
    DataDownloader_V1.py:100-129)."""
    ev = _events(spark, sf_dir)
    # ONE fact pass instead of three (guide §2.4): the spine bounds and
    # the type set both derive from the distinct (event_type, date)
    # table — min/max over the distinct dates equal min/max over the
    # raw rows (every event has a date), and the type set is its
    # projection. The r10 before-plan scanned events three times.
    observed = (
        ev.select("event_type", "date").distinct().localCheckpoint(
            eager=True
        )
    )
    spine = date_spine_from(observed, F.to_date("date")).select(
        F.date_format("date", "yyyy-MM-dd").alias("date")
    )
    types = observed.select("event_type").distinct()
    return spine.crossJoin(types).join(
        observed, on=["event_type", "date"], how="left_anti"
    )


register(
    Query(
        name="date_spine_gaps",
        spark=_date_spine_gaps,
        oracle="""
            WITH bounds AS (
                SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
                FROM events
            ),
            spine AS (
                SELECT strftime(CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                                   CAST(hi AS TIMESTAMP),
                                                   INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d') AS date
                FROM bounds
            ),
            types AS (SELECT DISTINCT event_type FROM events),
            obs AS (SELECT DISTINCT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date FROM events)
            SELECT t.event_type, s.date
            FROM spine s CROSS JOIN types t
            LEFT JOIN obs o ON o.event_type = t.event_type AND o.date = s.date
            WHERE o.event_type IS NULL
        """,
        tags=("J5", "F1", "join"),
    )
)

# ------------------------------------------------------- F6 json property


def _json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — property-bag access: JSON ``props`` lookup
    (``feature.properties[v]``, index.html:342)."""
    df = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return df.groupBy("event_type").agg(
        stable_avg("k").alias("avg_k"),
        F.count("k").alias("n"),
    )


register(
    Query(
        name="json_props",
        spark=_json_props,
        oracle=f"""
            SELECT event_type,
                   {sql_stable_avg("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS avg_k,
                   count(json_extract_string(props, '$.k')) AS n
            FROM events
            GROUP BY 1
        """,
        tags=("F6", "scalar"),
    )
)

# -------------------------------------------------------- F4 null handling


def _null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — nodata handling: NULL counting + zero-coercion
    (``np.where(np.isnan(img), 0, img)``, DataDownloader_SNPP_VIIRS_V1.py:197)."""
    df = _events(spark, sf_dir)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null"),
        stable_avg(F.coalesce(F.col("value"), F.lit(0.0))).alias("avg_zero_filled"),
    )


register(
    Query(
        name="null_handling",
        spark=_null_handling,
        oracle=f"""
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null,
                   {sql_stable_avg('coalesce(value, 0.0)')} AS avg_zero_filled
            FROM events
            GROUP BY 1
        """,
        tags=("F4", "scalar"),
    )
)

# -------------------------------------------------------- rollup reporting


def _rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 — dataset × day rollup (the layer × date matrix the viewers
    imply, index.html:135-147) with subtotals and a grand total."""
    # (r10 measured: a pre-Expand spread of the 100k-row events scan
    # ran 0.41 -> 0.72 s interleaved - reverted; contrast cube_report,
    # where the same spread over 600k lineitem rows WON 1.02 -> 0.57 s.)
    df = _events(spark, sf_dir)
    return df.rollup("event_type", "date").agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum("value").alias("total_value"),
    )


register(
    Query(
        name="rollup_report",
        spark=_rollup_report,
        oracle=f"""
            SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date, count(*) AS n,
                   {sql_stable_sum('value')} AS total_value
            FROM events
            GROUP BY ROLLUP (event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
            HAVING count(*) > 0  -- engine contract: see cube_report
        """,
        tags=("aggregation", "rollup"),
    )
)

# ---------------------------------------------------------- pivot matrix


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — the layer × date matrix as a pivot (index.html:135-147)."""
    df = _events(spark, sf_dir)
    pivoted = (
        df.groupBy("date")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


register(
    Query(
        name="pivot_matrix",
        spark=_pivot_matrix,
        oracle="""
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                   count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS view
            FROM events
            GROUP BY 1
        """,
        tags=("pivot", "aggregation"),
    )
)

# ----------------------------------------------------------- union stack


# -------------------------------------------------- P3/P8 layer selection


def _layer_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 + P8 — the parameterized layer filter: the viewers' query-string
    projection (``layers_to_show``, DataDownloader_V2.py:38-48) and the
    IN-list predicate (``ee.Filter.inList``, DataDownloader_V1.py:15-17)
    as one ``isin`` filter."""
    layers = ["purchase", "error"]  # the P8 runtime parameter
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type").isin(layers))
        .groupBy("event_type", "date")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(
    Query(
        name="layer_selection",
        spark=_layer_selection,
        oracle="""
            SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   count(*) AS n
            FROM events
            WHERE event_type IN ('purchase', 'error')
            GROUP BY 1, 2
        """,
        tags=("P3", "P8", "filter"),
    )
)

# -------------------------------------------------------- session windows


def _session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — incident sessionization in batch: contiguous activity per
    user with <30 min gaps forms one session (``session_window``; the
    "active and historic incidents" semantics of README.md:2). The
    DuckDB oracle is the classic gaps-and-islands rewrite."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sess")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


register(
    Query(
        name="session_windows",
        spark=_session_windows,
        oracle="""
            WITH o AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                FROM events
            ),
            marked AS (
                SELECT user_id, ts,
                       CASE WHEN prev IS NULL
                                 OR ts - prev > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            numbered AS (
                SELECT user_id,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            ),
            sessions AS (
                SELECT user_id, sid, count(*) AS n_events
                FROM numbered GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_sessions,
                   max(n_events) AS max_session_events,
                   CAST(sum(n_events) AS BIGINT) AS total_events
            FROM sessions
            GROUP BY 1
        """,
        tags=("streaming", "window", "session"),
    )
)

# ----------------------------------------------------------- union stack


def _union_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — UNION ALL stacking of homogeneous dataset slices
    (the four-pollutant loop, DataDownloader_V1.py:131-140)."""
    df = _events(spark, sf_dir)
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("slice"), "value"
    )
    high_value = df.filter(F.col("value") > 400.0).select(
        F.lit("high_value").alias("slice"), "value"
    )
    return purchases.unionByName(high_value).groupBy("slice").agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum("value").alias("total_value"),
    )


register(
    Query(
        name="union_stack",
        spark=_union_stack,
        oracle=f"""
            SELECT slice, count(*) AS n, {sql_stable_sum('value')} AS total_value
            FROM (
                SELECT 'purchase' AS slice, value FROM events
                WHERE event_type = 'purchase'
                UNION ALL
                SELECT 'high_value' AS slice, value FROM events
                WHERE value > 400.0
            )
            GROUP BY 1
        """,
        tags=("setop",),
    )
)


# ----------------------------------- time-series gap-fill interpolation


def _gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear gap-fill — the compositing repair step a
    satellite time-series pipeline runs after cloud masking: for every
    (pixel, band) ≈ (user_id, event_type) series, each day inside the
    series' own observed range with no observation gets the linear
    interpolation between its nearest previous and next observed daily
    means.

    Scale shape: the spine is PER-KEY (min..max day sequence exploded
    from one grouped row) — no global key × date cross join, so spine
    size is Σ per-key range, not |keys|·|days|. Neighbor lookup is two
    ignorenulls window passes over the same (key, day) sort — one
    shuffle total; no self-join, no range join. Interpolation is pure
    IEEE double arithmetic quantized by ``stable_round`` so both
    engines agree bit-for-bit."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    daily = (
        ev.groupBy("user_id", "event_type", day.alias("d"))
        .agg(stable_avg("value").alias("v_obs"))
        # Two consumers (the per-series range and the spine join)
        # lazily re-ran the fact scan + daily aggregate (2 events
        # scans in the r10 before-plan). One pass (guide §2.4).
        .localCheckpoint(eager=True)
    )
    rng = daily.groupBy("user_id", "event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = rng.select(
        "user_id",
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    full = spine.join(daily, ["user_id", "event_type", "d"], "left")
    base = Window.partitionBy("user_id", "event_type").orderBy("d")
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_d = F.when(F.col("v_obs").isNotNull(), F.col("d"))
    obs_v = F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
    nbr = full.select(
        "*",
        F.last(obs_d, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.last(obs_v, ignorenulls=True).over(w_prev).alias("prev_v"),
        F.first(obs_d, ignorenulls=True).over(w_next).alias("next_d"),
        F.first(obs_v, ignorenulls=True).over(w_next).alias("next_v"),
    )
    frac = (F.col("d") - F.col("prev_d")) / (
        F.col("next_d") - F.col("prev_d")
    ).cast("double")
    interp = stable_round(
        F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac, 6
    )
    return nbr.select(
        "user_id",
        "event_type",
        F.date_format(
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("d").cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("date"),
        "v_obs",
        F.coalesce("v_obs", interp).alias("v_filled"),
        F.col("v_obs").isNull().alias("filled"),
    )


register(
    Query(
        name="gapfill_interpolate",
        spark=_gapfill_interpolate,
        oracle=f"""
            WITH daily AS (
                SELECT user_id, event_type,
                       datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                           AS d,
                       {sql_stable_avg('value')} AS v_obs
                FROM events GROUP BY 1, 2, 3
            ),
            rng AS (
                SELECT user_id, event_type, min(d) AS d0, max(d) AS d1
                FROM daily GROUP BY 1, 2
            ),
            spine AS (
                SELECT user_id, event_type,
                       unnest(generate_series(d0, d1)) AS d
                FROM rng
            ),
            joined AS (
                SELECT s.user_id, s.event_type, s.d, dy.v_obs
                FROM spine s
                LEFT JOIN daily dy USING (user_id, event_type, d)
            ),
            nbr AS (
                SELECT *,
                    last_value(CASE WHEN v_obs IS NOT NULL THEN d END
                               IGNORE NULLS) OVER (
                        PARTITION BY user_id, event_type ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS prev_d,
                    last_value(CASE WHEN v_obs IS NOT NULL THEN v_obs END
                               IGNORE NULLS) OVER (
                        PARTITION BY user_id, event_type ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS prev_v,
                    first_value(CASE WHEN v_obs IS NOT NULL THEN d END
                                IGNORE NULLS) OVER (
                        PARTITION BY user_id, event_type ORDER BY d
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                    ) AS next_d,
                    first_value(CASE WHEN v_obs IS NOT NULL THEN v_obs END
                                IGNORE NULLS) OVER (
                        PARTITION BY user_id, event_type ORDER BY d
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                    ) AS next_v
                FROM joined
            )
            SELECT user_id, event_type,
                   strftime(DATE '1970-01-01' + CAST(d AS INTEGER),
                            '%Y-%m-%d') AS date,
                   v_obs,
                   coalesce(v_obs,
                       floor((prev_v + (next_v - prev_v)
                              * ((d - prev_d)
                                 / CAST(next_d - prev_d AS DOUBLE)))
                             * 1000000.0 + 0.5) / 1000000.0) AS v_filled,
                   (v_obs IS NULL) AS filled
            FROM nbr
        """,
        tags=("timeseries", "window", "gapfill"),
    )
)
