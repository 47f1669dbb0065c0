"""Behavioral / product-analytics queries over the ``events`` stream:
funnels, retention cohorts, active-user windows, transition matrices,
conversion-latency histograms.

These are the classic event-analytics shapes every warehouse engine is
judged on. They all reduce to hash-shuffles on ``user_id`` (the natural
partitioning key of behavioral data) plus calendar arithmetic — no
windows over the raw fact table wider than one user's history, and the
only timestamp ordering used is (ts, event_id), which is total, so every
result is engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import Query, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ------------------------------------------------- three-stage funnel


def _funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase funnel: users reaching each stage,
    where each stage must strictly follow the previous one in time.
    Three cascaded per-user aggregates; each stage's survivor set is
    user-keyed, so the joins co-partition with the aggregates (one
    shuffle key throughout — AQE merges the exchanges)."""
    e = _events(spark, sf_dir)
    # The funnel cascade consumes s1 three times (its own count, inside
    # s2, inside s2-inside-s3) and s2 twice — lazily that is SIX event
    # scans (r10 before-plan). Materialize the narrow 3-type projection
    # ONCE; the user-sized stage aggregates re-derive from it cheaply.
    # (r10 measured: checkpointing s1/s2 as well ran 0.41 → 0.51 s —
    # two more blocking jobs for no saved fact scan — so only the base
    # projection is materialized.)
    base = (
        e.filter(
            F.col("event_type").isin("signup", "click", "purchase")
        )
        .select("user_id", "event_type", "ts")
        .localCheckpoint(eager=True)
    )
    s1 = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        base.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        base.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = lambda n, df: df.agg(  # noqa: E731
        F.lit(n).alias("stage"), F.count(F.lit(1)).alias("users")
    )
    return (
        stage("1_signup", s1)
        .unionAll(stage("2_click", s2))
        .unionAll(stage("3_purchase", s3))
    )


register(
    Query(
        name="funnel_conversion",
        spark=_funnel_conversion,
        oracle="""
            WITH s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= s1.t1
                GROUP BY 1
            ),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
                GROUP BY 1
            )
            SELECT '1_signup' AS stage, count(*) AS users FROM s1
            UNION ALL
            SELECT '2_click', count(*) FROM s2
            UNION ALL
            SELECT '3_purchase', count(*) FROM s3
        """,
        tags=("events", "funnel"),
    )
)


# ---------------------------------------------- weekly retention grid


def _retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen week
    (cohort), counted distinct in each subsequent week offset. Two
    user-keyed aggregates plus one (cohort, offset) count — the
    distinct collapses to (user, week) BEFORE counting, so the heavy
    dedup is partial-aggregated map-side."""
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .withColumn(
            "week_offset",
            (
                F.datediff(F.to_date("act_week"), F.to_date("cohort_week"))
                / 7
            ).cast("long"),
        )
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


register(
    Query(
        name="retention_cohorts",
        spark=_retention_cohorts,
        oracle="""
            WITH first AS (
                SELECT user_id,
                       date_trunc('week', min(ts)) AS cohort_week
                FROM events GROUP BY 1
            ),
            activity AS (
                SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
                FROM events
            )
            SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', CAST(cohort_week AS DATE),
                                  CAST(act_week AS DATE)) // 7 AS BIGINT)
                       AS week_offset,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
            FROM activity JOIN first USING (user_id)
            GROUP BY 1, 2
        """,
        tags=("events", "retention"),
    )
)


# ------------------------------------------- rolling weekly actives


def _weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct actives per day, via the contribute-
    forward explode: each (user, day) pair contributes to the 7 window
    end-dates it is visible in, then one distinct count per end-date.
    This replaces an (unsupported, and at scale quadratic) DISTINCT
    range-window with a bounded 7× fan-out of the already-deduped
    (user, day) set — the standard scalable rewrite. Clamped to days
    with any direct activity so the tail beyond the data is not
    reported."""
    e = _events(spark, sf_dir)
    user_days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = user_days.select("day").distinct()
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("window_end"),
    )
    return (
        contrib.join(days, contrib.window_end == days.day, "left_semi")
        .groupBy(
            F.date_format("window_end", "yyyy-MM-dd").alias("window_end")
        )
        .agg(F.countDistinct("user_id").alias("wau"))
    )


register(
    Query(
        name="weekly_active_users",
        spark=_weekly_active_users,
        oracle="""
            WITH user_days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ),
            days AS (SELECT DISTINCT day FROM user_days),
            contrib AS (
                SELECT user_id,
                       CAST(unnest(generate_series(
                           day, day + INTERVAL 6 DAY, INTERVAL 1 DAY
                       )) AS DATE) AS window_end
                FROM user_days
            )
            SELECT strftime(window_end, '%Y-%m-%d') AS window_end,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib
            WHERE window_end IN (SELECT day FROM days)
            GROUP BY 1
        """,
        tags=("events", "window", "distinct"),
    )
)


# ------------------------------------------- behavior transition matrix


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix: counts of consecutive event-type
    pairs within each user's totally-ordered (ts, event_id) history.
    One user-partitioned lag window — each partition is a single user's
    events — then a tiny (from, to) aggregate."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )


register(
    Query(
        name="event_transitions",
        spark=_event_transitions,
        oracle="""
            WITH lagged AS (
                SELECT user_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS from_type,
                       event_type AS to_type
                FROM events
            )
            SELECT from_type, to_type, count(*) AS transitions
            FROM lagged WHERE from_type IS NOT NULL
            GROUP BY 1, 2
        """,
        tags=("events", "window"),
    )
)


# --------------------------------------- conversion-latency histogram


def _time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup → first-purchase latency, bucketed into operator-relevant
    bands. The latency is computed in whole minutes from the µs
    timestamps (integer arithmetic — no float on the bucketing path),
    so band membership is engine-exact."""
    e = _events(spark, sf_dir)
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    mins = (
        (
            F.unix_micros(F.col("t2").cast("timestamp"))
            - F.unix_micros(F.col("t1").cast("timestamp"))
        )
        / F.lit(60_000_000)
    ).cast("long")
    bucket = (
        F.when(mins < 10, "a_under_10m")
        .when(mins < 60, "b_under_1h")
        .when(mins < 360, "c_under_6h")
        .when(mins < 1440, "d_under_1d")
        .otherwise("e_1d_plus")
    )
    return (
        conv.select(bucket.alias("latency_band"))
        .groupBy("latency_band")
        .agg(F.count(F.lit(1)).alias("users"))
    )


register(
    Query(
        name="time_to_convert",
        spark=_time_to_convert,
        oracle="""
            WITH s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ),
            conv AS (
                SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
                GROUP BY 1
            ),
            banded AS (
                SELECT CASE
                    WHEN epoch_us(t2) - epoch_us(t1) < 600000000
                        THEN 'a_under_10m'
                    WHEN epoch_us(t2) - epoch_us(t1) < 3600000000
                        THEN 'b_under_1h'
                    WHEN epoch_us(t2) - epoch_us(t1) < 21600000000
                        THEN 'c_under_6h'
                    WHEN epoch_us(t2) - epoch_us(t1) < 86400000000
                        THEN 'd_under_1d'
                    ELSE 'e_1d_plus' END AS latency_band
                FROM conv
            )
            SELECT latency_band, count(*) AS users
            FROM banded GROUP BY 1
        """,
        tags=("events", "funnel", "histogram"),
    )
)


# ----------------------------------------- SCD2 dimension from CDC log


def _scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from a change log: each
    user's event stream is collapsed to state-change records (drop
    consecutive repeats), then every change gets a validity interval
    [valid_from, valid_to) via lead(), open-ended for the current
    state. Two windows over the same (user_id | ts, event_id) ordering
    — one shuffle, both windows ride the same sort."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("state"),
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .filter(
            F.col("prev_state").isNull()
            | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("valid_to_ts", F.lead("ts").over(w2))
        .select(
            "user_id",
            "state",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "valid_from"
            ),
            F.date_format(
                "valid_to_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("valid_to"),
            F.col("valid_to_ts").isNull().alias("is_current"),
        )
    )


register(
    Query(
        name="scd2_user_state",
        spark=_scd2_user_state,
        oracle="""
            WITH ordered AS (
                SELECT user_id, ts, event_id, event_type AS state,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_state
                FROM events
            ),
            changes AS (
                SELECT user_id, ts, event_id, state
                FROM ordered
                WHERE prev_state IS NULL OR state <> prev_state
            )
            SELECT user_id, state,
                   strftime(CAST(ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
                   strftime(CAST(lead(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) IS NULL AS is_current
            FROM changes
        """,
        tags=("events", "scd2", "window"),
    )
)


# ---------------------------------------- hopping-window aggregation


def _hopping_window_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) event-time windows in BATCH mode via the
    same ``F.window`` TVF the streaming jobs use — 2-hour windows
    sliding every hour, so each event lands in exactly two windows.
    Batch/stream parity of the window assignment itself is what's under
    test; the oracle derives the two containing window starts by floor
    arithmetic. The explode-by-window is a narrow 2× fan-out followed
    by one partial-aggregated groupBy — the scalable shape at any
    horizon."""
    e = _events(spark, sf_dir)
    win = F.window("ts", "2 hours", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,6)")).cast("double"),
                6,
            ).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


register(
    Query(
        name="hopping_window_load",
        spark=_hopping_window_load,
        oracle="""
            WITH hopped AS (
                SELECT event_type, value,
                       unnest([
                           to_timestamp(floor(epoch(ts) / 3600) * 3600),
                           to_timestamp(floor(epoch(ts) / 3600) * 3600
                                        - 3600)
                       ]) AS w_start
                FROM events
            )
            SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS w_start,
                   event_type, count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(30,6)))
                              AS DOUBLE), 6) AS sum_value
            FROM hopped
            GROUP BY 1, 2
        """,
        tags=("events", "window-tvf", "streaming-parity"),
    )
)


# -------------------------------------------- concurrency sweep line


def _concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the sweep-line pattern:
    sessionize (30-min gap), emit +1 at session start / -1 at session
    end, running-sum within the start day ordered by (ts, delta DESC)
    — starts before ends at the same instant, so touching sessions
    count as concurrent — and take the day's max.

    A session belongs to the day it starts (the operator's contract;
    midnight-spanning sessions are not split). Scale shape: the
    sessionization windows are per-user; the sweep window partitions by
    DAY — bounded partitions (one day's session endpoints), never a
    global sort. The day-level max is invariant to orderings within
    equal (ts, delta) blocks (prefix max of a monotone run sits at the
    block edge), so the result is engine-deterministic."""
    ev = _events(spark, sf_dir)
    # session_window's end is start-of-last-event + gap; use the last
    # event ts as the session end so both engines derive identical
    # endpoints from the data alone.
    s = (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sess")
        )
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        # Three consumers (start deltas, end deltas, the per-day session
        # count) lazily re-ran the sessionization aggregate — 3 event
        # scans in the r10 before-plan. One sessionization pass, three
        # reads of the session-sized table (guide §2.4).
        .localCheckpoint(eager=True)
    )
    deltas = s.select(
        F.to_date("start_ts").alias("day"),
        F.col("start_ts").alias("ts"),
        F.lit(1).alias("delta"),
    ).unionAll(
        s.select(
            F.to_date("start_ts").alias("day"),
            F.col("end_ts").alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    from pyspark.sql import Window as W

    run = F.sum("delta").over(
        W.partitionBy("day")
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = deltas.select("day", run.alias("running"))
    return (
        swept.groupBy("day")
        .agg(F.max("running").alias("max_concurrent"))
        .join(
            s.groupBy(F.to_date("start_ts").alias("day")).agg(
                F.count(F.lit(1)).alias("n_sessions")
            ),
            "day",
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "max_concurrent",
            "n_sessions",
        )
    )


register(
    Query(
        name="concurrency_profile",
        spark=_concurrency_profile,
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
                SELECT user_id, ts,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            ),
            sessions AS MATERIALIZED (
                SELECT user_id, sid,
                       min(ts) AS start_ts, max(ts) AS end_ts
                FROM numbered GROUP BY 1, 2
            ),
            deltas AS (
                SELECT CAST(start_ts AS DATE) AS day, start_ts AS ts,
                       1 AS delta
                FROM sessions
                UNION ALL
                SELECT CAST(start_ts AS DATE) AS day, end_ts AS ts,
                       -1 AS delta
                FROM sessions
            ),
            swept AS (
                SELECT day,
                       sum(delta) OVER (PARTITION BY day
                           ORDER BY ts ASC, delta DESC
                           ROWS UNBOUNDED PRECEDING) AS running
                FROM deltas
            ),
            daymax AS (
                SELECT day, CAST(max(running) AS BIGINT) AS max_concurrent
                FROM swept GROUP BY 1
            ),
            dayn AS (
                SELECT CAST(start_ts AS DATE) AS day,
                       count(*) AS n_sessions
                FROM sessions GROUP BY 1
            )
            SELECT CAST(d.day AS VARCHAR) AS day, d.max_concurrent,
                   n.n_sessions
            FROM daymax d JOIN dayn n ON d.day = n.day
        """,
        tags=("events", "window", "sweep-line"),
    )
)


# ------------------------------------- hierarchical OHLC rollup cascade


def _ohlc_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: hourly OHLC (open / high /
    low / close + volume) bars per event stream, then DAILY bars derived
    FROM the hourly table — never re-reading the raw facts. This is the
    continuous-aggregate cascade every time-series store maintains: the
    daily open is the open of the day's first hourly bar, the close is
    the close of its last, extrema and volumes fold associatively.

    Open/close are selected with row_number over the total order
    (ts, event_id) — engine-independent, unlike bare first()/last().
    Cost: one sort per (stream, hour) partition for the rank, one
    hash-agg per level; the daily level runs over the hour-sized
    rollup, which at 100 TB is ~5 orders of magnitude smaller than the
    fact — the whole point of cascading."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    w_asc = Window.partitionBy("event_type", "hour").orderBy(
        "ts", "event_id"
    )
    w_desc = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        e.withColumn("rna", F.row_number().over(w_asc))
        .withColumn("rnd", F.row_number().over(w_desc))
        .groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("rna") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias(
                "close"
            ),
            F.count(F.lit(1)).alias("volume"),
        )
    )
    wd_asc = Window.partitionBy("event_type", "day").orderBy("hour")
    wd_desc = Window.partitionBy("event_type", "day").orderBy(
        F.col("hour").desc()
    )
    return (
        hourly.withColumn("day", F.to_date("hour"))
        .withColumn("rna", F.row_number().over(wd_asc))
        .withColumn("rnd", F.row_number().over(wd_desc))
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rna") == 1, F.col("open"))).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max(F.when(F.col("rnd") == 1, F.col("close"))).alias(
                "close"
            ),
            F.sum("volume").alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


register(
    Query(
        name="ohlc_rollup_cascade",
        spark=_ohlc_rollup_cascade,
        oracle="""
            WITH ranked AS (
                SELECT event_type, date_trunc('hour', ts) AS hour, value,
                       row_number() OVER (
                           PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS rna,
                       row_number() OVER (
                           PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rnd
                FROM events
            ),
            hourly AS (
                SELECT event_type, hour,
                       max(CASE WHEN rna = 1 THEN value END) AS open,
                       max(value) AS high,
                       min(value) AS low,
                       max(CASE WHEN rnd = 1 THEN value END) AS close,
                       count(*) AS volume
                FROM ranked GROUP BY 1, 2
            ),
            dranked AS (
                SELECT *, CAST(hour AS DATE) AS day,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(hour AS DATE)
                           ORDER BY hour) AS rna,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(hour AS DATE)
                           ORDER BY hour DESC) AS rnd
                FROM hourly
            )
            SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
                   max(CASE WHEN rna = 1 THEN open END) AS open,
                   max(high) AS high,
                   min(low) AS low,
                   max(CASE WHEN rnd = 1 THEN close END) AS close,
                   CAST(sum(volume) AS BIGINT) AS volume
            FROM dranked GROUP BY event_type, day
        """,
        tags=("events", "timeseries", "rollup"),
        doc="two-level OHLC continuous aggregate; daily bars fold the "
        "hourly rollup, never the raw facts",
    )
)


# ------------------------------------- last-touch conversion attribution


def _attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase is credited to the user's
    most recent click campaign within a 7-day lookback, else counted
    unattributed — the classic last-touch model, built by REUSING the
    engine's as-of join operator (operators/joins.py: union + running
    last, one shuffle, no pair explosion) rather than a bespoke window.

    Campaigns are derived from the event's JSON props (k mod 5 — the
    synthetic stand-in for a campaign id). Touches are pre-deduplicated
    per (user, ts) with min() so the as-of tie-break is deterministic
    in both engines. The DuckDB oracle uses native ASOF LEFT JOIN.

    At 100 TB this is the asof_clicks_to_errors envelope plus one
    group-sized aggregate: linear in touches+conversions."""
    from ..operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    camp = F.concat(
        F.lit("camp_"),
        (F.get_json_object("props", "$.k").cast("long") % 5).cast("string"),
    )
    touches = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts", camp.alias("campaign"))
        .groupBy("user_id", "ts")
        .agg(F.min("campaign").alias("campaign"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = asof_join(
        purchases, touches, on=["user_id"], ts="ts",
        payload=["campaign"], suffix="_ref",
    )
    in_window = F.col("ts_ref") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    attributed = F.when(
        F.col("ts_ref").isNotNull() & in_window, F.col("campaign_ref")
    ).otherwise(F.lit("unattributed"))
    from ..functions.stable import stable_sum

    return (
        j.select(attributed.alias("campaign"), "value")
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            stable_sum("value", 2).alias("attributed_value"),
        )
    )


register(
    Query(
        name="attribution_last_touch",
        spark=_attribution_last_touch,
        oracle="""
            WITH touches AS (
                SELECT user_id, ts,
                       min('camp_' || CAST(
                           CAST(json_extract_string(props, '$.k') AS BIGINT)
                           % 5 AS VARCHAR)) AS campaign
                FROM events WHERE event_type = 'click'
                GROUP BY 1, 2
            ),
            purchases AS (
                SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ),
            j AS (
                SELECT p.value,
                       CASE WHEN t.ts IS NOT NULL
                                 AND t.ts >= p.ts - INTERVAL 7 DAY
                            THEN t.campaign ELSE 'unattributed'
                       END AS campaign
                FROM purchases p ASOF LEFT JOIN touches t
                  ON p.user_id = t.user_id AND p.ts >= t.ts
            )
            SELECT campaign, count(*) AS n_conversions,
                   round(CAST(sum(CAST(value AS DECIMAL(30,6)))
                              AS DOUBLE), 2) AS attributed_value
            FROM j GROUP BY 1
        """,
        tags=("events", "attribution", "asof"),
        doc="last-touch 7-day attribution through the reusable as-of "
        "operator; oracle is DuckDB native ASOF JOIN",
    )
)


# --------------------------------------------- weekday seasonality


def _weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event stream: mean value per
    weekday and its deviation from the stream's overall mean — the
    first-order seasonal decomposition a monitoring pipeline runs
    before alerting on 'low weekend traffic'.

    Two group-sized aggregates from ONE fact scan shape (the per-dow
    agg; the overall mean folds from it exactly — decimal sums and
    counts are associative, so no second scan and no drift between the
    two levels). dow is 0=Sunday..6 on both engines (Spark's dayofweek
    is 1-based; the oracle's is 0-based)."""
    from ..functions.stable import DECIMAL, stable_round

    e = load_table(spark, sf_dir, "events")
    dow = (F.dayofweek("ts") - 1).cast("int")
    per_dow = (
        e.select("event_type", dow.alias("dow"), "value")
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DECIMAL)).alias("s"),
        )
    )
    overall = per_dow.groupBy("event_type").agg(
        (F.sum("s").cast("double") / F.sum("n").cast("double")).alias(
            "mean_all"
        )
    )
    mean_dow = F.col("s").cast("double") / F.col("n").cast("double")
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            stable_round(mean_dow, 6).alias("mean_value"),
            stable_round(mean_dow - F.col("mean_all"), 6).alias(
                "seasonal_dev"
            ),
        )
    )


register(
    Query(
        name="weekday_seasonality",
        spark=_weekday_seasonality,
        oracle="""
            WITH per_dow AS (
                SELECT event_type, dayofweek(ts) AS dow,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(30,6))) AS s
                FROM events GROUP BY 1, 2
            ),
            overall AS (
                SELECT event_type,
                       CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
                           AS mean_all
                FROM per_dow GROUP BY 1
            )
            SELECT p.event_type, p.dow, p.n,
                   floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
                   floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - mean_all)
                         * 1000000.0 + 0.5) / 1000000.0 AS seasonal_dev
            FROM per_dow p JOIN overall o ON p.event_type = o.event_type
        """,
        tags=("events", "seasonality"),
        doc="per-stream weekday means + deviation, overall mean folded "
        "from the per-dow partials (one fact scan)",
    )
)


# --------------------------------- position-based multi-touch attribution


def _attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every click
    within the 7-day lookback of a purchase shares the credit — 40%
    first touch, 40% last touch, 20% split across the middle (100%
    single-touch, 50/50 two-touch). The industry-standard refinement
    of ``attribution_last_touch`` when journeys have many touches.

    Shape: ONE equi-join on user_id (the natural behavioral key), the
    7-day predicate applied inside the per-user match, then two
    purchase-partitioned window ranks over journey-sized partitions —
    never the raw fact. Fractional weights are exact IEEE doubles on
    both engines (0.4, 0.2/(k−2)); per-campaign sums ride
    DECIMAL(38,12) accumulators (the KL precedent)."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    camp = F.concat(
        F.lit("camp_"),
        (F.get_json_object("props", "$.k").cast("long") % 5).cast("string"),
    )
    touches = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("touch_ts"), camp.alias("campaign"))
        .groupBy("user_id", "touch_ts")
        .agg(F.min("campaign").alias("campaign"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    j = purchases.join(touches, "user_id").filter(
        (F.col("touch_ts") <= F.col("p_ts"))
        & (F.col("touch_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("purchase_id")
    wo = w.orderBy("touch_ts")
    ranked = j.select(
        "purchase_id",
        "campaign",
        "value",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when(F.col("i") == 1, F.lit(0.4))
        .when(F.col("i") == F.col("k"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2).cast("double"))
    )
    from ..functions.stable import stable_round

    dec = "decimal(38,12)"
    return (
        ranked.select(
            "campaign",
            weight.cast(dec).alias("w"),
            (weight * F.col("value")).cast(dec).alias("wv"),
        )
        .groupBy("campaign")
        .agg(
            stable_round(F.sum("w").cast("double"), 6).alias(
                "credited_conversions"
            ),
            stable_round(F.sum("wv").cast("double"), 2).alias(
                "credited_value"
            ),
        )
    )


register(
    Query(
        name="attribution_position",
        spark=_attribution_position,
        oracle="""
            WITH touches AS (
                SELECT user_id, ts AS touch_ts,
                       min('camp_' || CAST(
                           CAST(json_extract_string(props, '$.k') AS BIGINT)
                           % 5 AS VARCHAR)) AS campaign
                FROM events WHERE event_type = 'click'
                GROUP BY 1, 2
            ),
            purchases AS (
                SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
                FROM events WHERE event_type = 'purchase'
            ),
            ranked AS (
                SELECT purchase_id, campaign, value,
                       row_number() OVER (PARTITION BY purchase_id
                                          ORDER BY touch_ts) AS i,
                       count(*) OVER (PARTITION BY purchase_id) AS k
                FROM purchases p JOIN touches t USING (user_id)
                WHERE touch_ts <= p_ts
                  AND touch_ts >= p_ts - INTERVAL 7 DAY
            ),
            weighted AS (
                SELECT campaign, value,
                       CASE WHEN k = 1 THEN 1.0
                            WHEN k = 2 THEN 0.5
                            WHEN i = 1 THEN 0.4
                            WHEN i = k THEN 0.4
                            ELSE 0.2 / CAST(k - 2 AS DOUBLE)
                       END AS w
                FROM ranked
            )
            SELECT campaign,
                   floor(CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0
                       AS credited_conversions,
                   floor(CAST(sum(CAST(w * value AS DECIMAL(38,12)))
                              AS DOUBLE) * 100.0 + 0.5) / 100.0
                       AS credited_value
            FROM weighted GROUP BY 1
        """,
        tags=("events", "attribution", "window"),
        doc="U-shaped multi-touch credit (40/20/40) over journey-sized "
        "window partitions; decimal-accumulated fractional weights",
    )
)


# ------------------------------------------------- top session paths


_PATH_CAP = 8
_PATH_TOPK = 20


def _top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common navigation paths: per 30-minute user session (same
    gap convention as ``session_windows``), the ordered sequence of
    event types — capped at the first 8 events — joined into a path
    string, then the global top-20 paths by session count with a
    deterministic path tie-break.

    Shape: one user-keyed session agg (``session_window`` groups the
    shuffle Spark already does for sessionization), per-session arrays
    are journey-sized, and the final top-k is a count hash-agg into a
    k-bounded TakeOrderedAndProject — the corpus is never sorted."""
    e = _events(spark, sf_dir)
    per_session = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sess")
    ).agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    1,
                    _PATH_CAP,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(_PATH_TOPK)
    )


register(
    Query(
        name="top_paths",
        spark=_top_paths,
        oracle=f"""
            WITH o AS (
                SELECT user_id, ts, event_id, event_type,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           AS prev
                FROM events
            ),
            marked AS (
                SELECT *, CASE WHEN prev IS NULL
                                    OR ts - prev > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            numbered AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            ),
            positioned AS (
                SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                             ORDER BY ts, event_id) AS rn
                FROM numbered
            ),
            paths AS (
                SELECT user_id, sid,
                       string_agg(event_type, '>'
                                  ORDER BY ts, event_id) AS path
                FROM positioned WHERE rn <= {_PATH_CAP}
                GROUP BY 1, 2
            )
            SELECT path, count(*) AS n_sessions
            FROM paths GROUP BY 1
            ORDER BY n_sessions DESC, path
            LIMIT {_PATH_TOPK}
        """,
        tags=("events", "session", "path-analysis"),
        doc="top-20 session event-type paths (first 8 events, 30-min "
        "sessions); session agg + k-bounded TakeOrderedAndProject",
    )
)


# ------------------------------------------------ audience overlap


def _audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: for every type
    pair, how many users did both, each, and the Jaccard overlap — the
    segment-intersection report behind "do purchasers also view?".

    The scale trick: instead of 10 pairwise distinct-intersection
    joins over the fact (the oracle's naive formulation), fold each
    user into a k-bit engagement bitmask with ONE user-keyed bit_or
    aggregate, histogram the ≤2^k masks, and answer every pair from
    the mask histogram crossed with a pair-grid literal table. The
    fact is scanned once and shuffled once on user_id, regardless of
    how many pairs are asked. The type list is derived from the data
    (a group-sized distinct, same as the oracle's SELECT DISTINCT),
    so a new event type can never be silently dropped."""
    e = _events(spark, sf_dir)
    etypes = sorted(
        r[0]
        for r in e.select("event_type").distinct().collect()
        if r[0] is not None
    )
    if not etypes:
        # empty stream → no types → no pairs (the oracle's SELECT
        # DISTINCT yields the same zero rows; caught by the
        # empty-input sweep, which previously hit etypes[0] below)
        return spark.createDataFrame(
            [],
            "type_a string, type_b string, n_both long, n_a long, "
            "n_b long, jaccard double",
        )
    bit = F.when(F.col("event_type") == etypes[0], F.lit(1))
    for i, t in enumerate(etypes[1:], start=1):
        bit = bit.when(F.col("event_type") == t, F.lit(1 << i))
    masks = (
        e.select("user_id", bit.alias("b"))
        .groupBy("user_id")
        .agg(F.bit_or("b").alias("mask"))
    )
    hist = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n"))
    pairs = spark.createDataFrame(
        [
            (etypes[i], etypes[j], 1 << i, 1 << j)
            for i in range(len(etypes))
            for j in range(i + 1, len(etypes))
        ],
        "type_a string, type_b string, bit_a long, bit_b long",
    )
    crossed = hist.crossJoin(F.broadcast(pairs))
    agg = crossed.groupBy("type_a", "type_b").agg(
        F.sum(
            F.when(
                (F.col("mask").bitwiseAND(F.col("bit_a")) != 0)
                & (F.col("mask").bitwiseAND(F.col("bit_b")) != 0),
                F.col("n"),
            ).otherwise(F.lit(0))
        ).alias("n_both"),
        F.sum(
            F.when(
                F.col("mask").bitwiseAND(F.col("bit_a")) != 0, F.col("n")
            ).otherwise(F.lit(0))
        ).alias("n_a"),
        F.sum(
            F.when(
                F.col("mask").bitwiseAND(F.col("bit_b")) != 0, F.col("n")
            ).otherwise(F.lit(0))
        ).alias("n_b"),
    )
    jac = F.col("n_both").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_both")
    ).cast("double")
    # the oracle's pair join only materializes pairs that intersect;
    # mirror that (also guards the 0/0 Jaccard of an absent type)
    return agg.filter(F.col("n_both") > 0).select(
        "type_a",
        "type_b",
        "n_both",
        "n_a",
        "n_b",
        F.round(jac, 6).alias("jaccard"),
    )


register(
    Query(
        name="audience_overlap",
        spark=_audience_overlap,
        oracle="""
            WITH d AS (
                SELECT DISTINCT user_id, event_type FROM events
            ),
            marg AS (
                SELECT event_type, count(*) AS n FROM d GROUP BY 1
            ),
            pairs AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       count(*) AS n_both
                FROM d a JOIN d b ON a.user_id = b.user_id
                                  AND a.event_type < b.event_type
                GROUP BY 1, 2
            )
            SELECT type_a, type_b, n_both,
                   ma.n AS n_a, mb.n AS n_b,
                   round(CAST(n_both AS DOUBLE)
                         / CAST(ma.n + mb.n - n_both AS DOUBLE), 6)
                       AS jaccard
            FROM pairs
            JOIN marg ma ON type_a = ma.event_type
            JOIN marg mb ON type_b = mb.event_type
        """,
        tags=("events", "set-intersection", "bitmask"),
        doc="pairwise audience Jaccard from a per-user 5-bit engagement "
        "bitmask: one user-keyed agg answers all pairs; oracle is the "
        "naive distinct self-join",
    )
)


# ------------------------------------------------ A/B significance


def _ab_test_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout: pairwise two-proportion z-tests between
    campaign conversion rates. A user is exposed to a campaign at their
    first click carrying it and converts if they purchase any time
    after that exposure; per campaign pair the pooled-variance z
    statistic decides significance at the 5% two-sided level.

    Shape: two user-sized aggregates (first exposure per campaign-user,
    last purchase per user) joined on user_id — one co-partitioned
    shuffle — folded to a C-row rate table; the C·(C−1)/2 pair grid is
    a broadcast self-cross of that tiny table. Rates are integer-count
    ratios (identical doubles in both engines); z is closed-form."""
    e = _events(spark, sf_dir)
    camp = F.concat(
        F.lit("camp_"),
        (F.get_json_object("props", "$.k").cast("long") % 5).cast("string"),
    )
    exposure = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", camp.alias("campaign"), "ts")
        .groupBy("campaign", "user_id")
        .agg(F.min("ts").alias("exp_ts"))
    )
    last_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("lp_ts"))
    )
    per_user = exposure.join(last_purchase, "user_id", "left").select(
        "campaign",
        (F.col("lp_ts") > F.col("exp_ts")).cast("int").alias("conv"),
    )
    rates = (
        per_user.groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("conv", F.lit(0))).alias("x"),
        )
        # The C-row rate table is self-crossed (a × b) — lazily BOTH
        # sides re-ran the exposure⋈purchase pipeline (4 event scans in
        # the r10 before-plan). Materialize C rows, scan the fact once
        # (guide §2.4).
        .localCheckpoint(eager=True)
    )
    a = rates.select(
        F.col("campaign").alias("camp_a"),
        F.col("n").alias("n_a"),
        F.col("x").alias("x_a"),
    )
    b = rates.select(
        F.col("campaign").alias("camp_b"),
        F.col("n").alias("n_b"),
        F.col("x").alias("x_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("camp_a") < F.col("camp_b"))
    p_a = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    # pool ∈ {0,1} ⇒ both rates equal pool ⇒ no difference to test;
    # define z = 0 instead of 0/0 (DIVIDE_BY_ZERO under ANSI mode)
    z = F.when(se > 0, (p_a - p_b) / se).otherwise(F.lit(0.0))
    from ..functions.stable import stable_round

    return pairs.select(
        "camp_a",
        "camp_b",
        "n_a",
        "n_b",
        stable_round(p_a, 6).alias("rate_a"),
        stable_round(p_b, 6).alias("rate_b"),
        stable_round(z, 6).alias("zscore"),
        (F.abs(z) > F.lit(1.959963984540054)).alias("significant"),
    )


register(
    Query(
        name="ab_test_zscores",
        spark=_ab_test_zscores,
        oracle="""
            WITH exposure AS (
                SELECT 'camp_' || CAST(
                           CAST(json_extract_string(props, '$.k') AS BIGINT)
                           % 5 AS VARCHAR) AS campaign,
                       user_id, min(ts) AS exp_ts
                FROM events WHERE event_type = 'click'
                GROUP BY 1, 2
            ),
            lp AS (
                SELECT user_id, max(ts) AS lp_ts FROM events
                WHERE event_type = 'purchase' GROUP BY 1
            ),
            rates AS (
                SELECT campaign, count(*) AS n,
                       sum(CASE WHEN lp_ts > exp_ts THEN 1 ELSE 0 END)
                           AS x
                FROM exposure LEFT JOIN lp USING (user_id)
                GROUP BY 1
            )
            SELECT a.campaign AS camp_a, b.campaign AS camp_b,
                   a.n AS n_a, b.n AS n_b,
                   floor((CAST(a.x AS DOUBLE) / a.n) * 1000000.0 + 0.5)
                       / 1000000.0 AS rate_a,
                   floor((CAST(b.x AS DOUBLE) / b.n) * 1000000.0 + 0.5)
                       / 1000000.0 AS rate_b,
                   floor((CASE WHEN a.x + b.x = 0
                                    OR a.x + b.x = a.n + b.n THEN 0.0
                               ELSE (CAST(a.x AS DOUBLE) / a.n
                                     - CAST(b.x AS DOUBLE) / b.n)
                          / sqrt((CAST(a.x + b.x AS DOUBLE) / (a.n + b.n))
                                 * (1.0 - CAST(a.x + b.x AS DOUBLE)
                                          / (a.n + b.n))
                                 * (1.0 / a.n + 1.0 / b.n)) END)
                         * 1000000.0 + 0.5) / 1000000.0 AS zscore,
                   abs(CASE WHEN a.x + b.x = 0
                                 OR a.x + b.x = a.n + b.n THEN 0.0
                            ELSE (CAST(a.x AS DOUBLE) / a.n
                                  - CAST(b.x AS DOUBLE) / b.n)
                       / sqrt((CAST(a.x + b.x AS DOUBLE) / (a.n + b.n))
                              * (1.0 - CAST(a.x + b.x AS DOUBLE)
                                       / (a.n + b.n))
                              * (1.0 / a.n + 1.0 / b.n)) END)
                       > 1.959963984540054 AS significant
            FROM rates a JOIN rates b ON a.campaign < b.campaign
        """,
        tags=("events", "experimentation", "stats"),
        doc="pairwise two-proportion z-tests between campaign conversion "
        "rates; user-sized aggregates, tiny broadcast pair grid",
    )
)


# -------------------------------------------- cumulative unique users


def _cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per active day — the audience-growth
    curve. The naive form (COUNT(DISTINCT) over an expanding window)
    re-deduplicates the whole history at every step; the scale form
    keys each user to their FIRST day (one user-sized agg), counts
    first-appearances per day, and running-sums that day-sized series —
    the fact is shuffled once on user_id and the window runs over
    |days| rows, not |events|."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day")
    )
    per_day = firsts.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    joined = days.join(
        per_day, days["day"] == per_day["first_day"], "left"
    ).select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


register(
    Query(
        name="cumulative_unique_users",
        spark=_cumulative_unique_users,
        oracle="""
            WITH firsts AS (
                SELECT user_id, CAST(min(ts) AS DATE) AS first_day
                FROM events GROUP BY 1
            ),
            per_day AS (
                SELECT first_day, count(*) AS new_users
                FROM firsts GROUP BY 1
            ),
            days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   coalesce(new_users, 0) AS new_users,
                   CAST(sum(coalesce(new_users, 0)) OVER (
                       ORDER BY day ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cumulative_users
            FROM days LEFT JOIN per_day ON day = first_day
        """,
        tags=("events", "growth", "window"),
        doc="audience growth curve: first-day keying turns expanding "
        "COUNT(DISTINCT) into one user agg + a day-sized running sum",
    )
)
