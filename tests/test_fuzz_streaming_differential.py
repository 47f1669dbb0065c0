"""Hypothesis fuzz for the chunking-invariance of streaming jobs.

The streaming contract at 100 TB: HOW the input happens to be split
into micro-batches must never change the result — arrival batching is
an operational accident (file sizes, trigger intervals, backpressure),
not a semantic input. The fixed replay tests use one chunking; this
harness draws random event sets AND random chunk boundaries, streams
the chunks through the job, and compares against the one-shot batch
mirror computed from the same rows.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gee_datapipeline_spark.streaming.jobs import (
    EVENTS_STREAM_SCHEMA,
    incremental_max_state,
    run_to_memory,
    stream_from_dir,
    windowed_max_composite,
)

BASE = dt.datetime(2024, 1, 1)

import os as _os  # noqa: E402

# soak knob: raise for a long exploratory run (examples are drawn
# deterministically, so a bigger budget extends the same sequence)
_FUZZ_EX = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))


@st.composite
def chunked_events(draw, ordered: bool = False):
    """Random events + random micro-batch boundaries.

    ``ordered=True`` sorts arrival by event time before cutting chunks:
    the watermark contract only promises chunking-invariance for data
    that is not LATE across batches (an event older than a previous
    batch's max-ts minus the delay is dropped by design — the first
    run of this fuzz produced exactly that drop and "failed" with
    correct semantics). Watermark-free jobs keep fully random order.
    """
    n = draw(st.integers(5, 25))
    rows = [
        (
            BASE
            + dt.timedelta(
                minutes=draw(st.integers(0, 90)),
                seconds=draw(st.sampled_from([0, 30])),
            ),
            draw(st.integers(1, 3)),
            draw(st.integers(1, 2)),
            float(draw(st.integers(1, 100))),
        )
        for _ in range(n)
    ]
    if ordered:
        rows = sorted(rows, key=lambda r: r[0])
    # random chunk boundaries: 1..4 cuts at arbitrary positions
    n_cuts = draw(st.integers(0, 3))
    cuts = sorted(
        {draw(st.integers(1, n - 1)) for _ in range(n_cuts)} | {n}
    )
    chunks, lo = [], 0
    for hi in cuts:
        chunks.append(rows[lo:hi])
        lo = hi
    return rows, chunks


def _stream_chunks(spark, tmp, chunks, job, name, mode):
    src = tmp / f"src_{name}"
    src.mkdir()
    q = run_to_memory(
        job(stream_from_dir(spark, str(src) + "/*")),
        name,
        str(tmp / f"ckpt_{name}"),
        output_mode=mode,
    )
    try:
        for i, chunk in enumerate(chunks):
            if not chunk:
                continue
            spark.createDataFrame(
                chunk, EVENTS_STREAM_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{src}/chunk{i}"
            )
            q.processAllAvailable()
        # far-future row closes every event-time window
        spark.createDataFrame(
            [(BASE + dt.timedelta(days=2), 9, 9, 1.0)],
            EVENTS_STREAM_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/close")
        q.processAllAvailable()
        return spark.sql(
            f"SELECT * FROM {name} WHERE cell_x != 9"
        ).collect()
    finally:
        q.stop()


@settings(
    max_examples=_FUZZ_EX or 4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(chunked_events(ordered=True))
def test_windowed_composite_chunking_invariance(spark, tmp_path_factory, data):
    rows, chunks = data
    tmp = tmp_path_factory.mktemp("fuzzstream")
    got = {
        (str(r.window_start), r.cell_x, r.cell_y): (r.max_value, r.n_obs)
        for r in _stream_chunks(
            spark,
            tmp,
            chunks,
            lambda s: windowed_max_composite(s, "30 minutes", "1 minute"),
            f"fz_win_{tmp.name}",
            "append",
        )
    }
    batch = (
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
        .groupBy(
            F.window("ts", "30 minutes").alias("w"), "cell_x", "cell_y"
        )
        .agg(F.max("value").alias("mv"), F.count("value").alias("n"))
    )
    want = {
        (str(r["w"].start), r.cell_x, r.cell_y): (r.mv, r.n)
        for r in batch.collect()
    }
    assert got == want


@settings(
    max_examples=_FUZZ_EX or 4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(chunked_events())
def test_incremental_max_chunking_invariance(spark, tmp_path_factory, data):
    rows, chunks = data
    tmp = tmp_path_factory.mktemp("fuzzstream")
    out = _stream_chunks(
        spark,
        tmp,
        chunks,
        incremental_max_state,
        f"fz_max_{tmp.name}",
        "update",
    )
    # update mode re-emits per batch: the row with the highest n_obs
    # per cell is the final state
    final = {}
    for r in out:
        k = (r.cell_x, r.cell_y)
        if k not in final or r.n_obs > final[k][1]:
            final[k] = (r.max_value, r.n_obs)
    batch = (
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
        .groupBy("cell_x", "cell_y")
        .agg(F.max("value").alias("mv"), F.count("value").alias("n"))
    )
    want = {(r.cell_x, r.cell_y): (r.mv, r.n) for r in batch.collect()}
    assert final == want


@st.composite
def two_feeds(draw):
    """Random click/error feeds over a 90-min span + random per-side
    chunkings. The 2h watermark exceeds the span, so no row can be
    late-dropped and outer rows flush only at the sentinel — chunking
    must be a pure operational accident."""
    def side(tag):
        n = draw(st.integers(3, 12))
        rows = sorted(
            (
                BASE
                + dt.timedelta(
                    minutes=draw(st.integers(0, 90)),
                    seconds=draw(st.sampled_from([0, 30])),
                ),
                draw(st.integers(1, 3)),
                float(draw(st.integers(1, 100))),
            )
            for _ in range(n)
        )
        n_cuts = draw(st.integers(0, 2))
        cuts = sorted(
            {draw(st.integers(1, n - 1)) for _ in range(n_cuts)} | {n}
        )
        chunks, lo = [], 0
        for hi in cuts:
            chunks.append(rows[lo:hi])
            lo = hi
        return rows, chunks

    return side("l"), side("r")


@st.composite
def roads_and_detections(draw):
    """Random polylines + random detections + random chunking + ONE
    redelivered chunk. Coordinates live on a 0.05-degree lattice over
    [0, 2] (multiples of the 0.1-degree cell land exactly on cell
    boundaries — the halo corner) and polylines allow duplicate
    vertices (zero-length segments) and repeated segments."""
    coord = st.integers(0, 40).map(lambda k: k * 0.05)
    lines = [
        draw(st.lists(st.tuples(coord, coord), min_size=2, max_size=5))
        for _ in range(draw(st.integers(1, 3)))
    ]
    n = draw(st.integers(3, 15))
    rows = [
        (
            draw(st.sampled_from(["no2", "frp"])),
            draw(coord),
            draw(coord),
            float(draw(st.integers(1, 100))),
        )
        for _ in range(n)
    ]
    n_cuts = draw(st.integers(0, 2))
    cuts = sorted({draw(st.integers(1, n - 1)) for _ in range(n_cuts)} | {n})
    chunks, lo = [], 0
    for hi in cuts:
        chunks.append(rows[lo:hi])
        lo = hi
    redeliver = draw(st.integers(0, len(chunks) - 1))
    return lines, rows, chunks, redeliver


@settings(
    max_examples=_FUZZ_EX or 4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(roads_and_detections())
def test_road_enrich_redelivery_invariance(spark, tmp_path_factory, data):
    """At-least-once contract of ``enrich_stream_roads``: random
    detections through random micro-batch boundaries WITH one chunk
    redelivered verbatim must equal an EXACT pure-Python per-pair
    reference over the deduplicated feed — max/min idempotence is the
    whole safety argument, so it gets the same adversarial treatment
    as the watermark jobs (VERDICT r8 item 3 named this redelivery
    path).

    r10 (ADVICE r9): the batch mirror no longer re-derives expected
    results from the same ``line_proximity_pairs`` call as the job
    under test — the oracle is the geo battery's operation-for-
    operation Python mirror of ``point_to_segment_km`` (min over
    segments per feature, then the job's round-to-6dp radius test,
    legal because rounding is monotone so it commutes with min), so
    this differential now pins CORRECTNESS of the proximity join and
    the d6 rounding, not just chunking/redelivery invariance."""
    import math as _m
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    from gee_datapipeline_spark.functions.geo import KM_PER_DEG
    from gee_datapipeline_spark.streaming.jobs import (
        enrich_stream_roads,
        run_to_memory,
        stream_from_dir,
    )

    def _ref_seg_km(plon, plat, lon1, lat1, lon2, lat2):
        ky = KM_PER_DEG
        kx = ky * _m.cos(_m.radians((lat1 + lat2) / 2.0))
        ax = (lon1 - plon) * kx
        ay = (lat1 - plat) * ky
        bx = (lon2 - plon) * kx
        by = (lat2 - plat) * ky
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = (
            0.0
            if len2 == 0.0
            else max(0.0, min(1.0, -(ax * dx + ay * dy) / len2))
        )
        cx, cy = ax + t * dx, ay + t * dy
        return _m.sqrt(cx * cx + cy * cy)

    def _round6(d):
        # Spark's F.round is HALF_UP on the decimal string; mirror it
        # exactly (Python's round() is banker's).
        return float(
            Decimal(repr(d)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    lines, rows, chunks, redeliver = data
    radius = 11.132  # the 0.1-degree latitude cell, in km
    seg_rows = [
        (f"f{i}", a[0], a[1], b[0], b[1])
        for i, pts in enumerate(lines)
        for a, b in zip(pts, pts[1:])
    ]
    segs = spark.createDataFrame(
        seg_rows,
        "feature_id string, lon1 double, lat1 double, "
        "lon2 double, lat2 double",
    )
    schema = T._parse_datatype_string(
        "dataset string, lon double, lat double, value double"
    )
    tmp = tmp_path_factory.mktemp("fuzzroads")
    src = tmp / "src"
    src.mkdir()
    name = f"fz_roads_{tmp.name}"
    q = run_to_memory(
        enrich_stream_roads(
            stream_from_dir(spark, str(src) + "/*", schema), segs, radius
        ),
        name,
        str(tmp / "ckpt"),
        output_mode="complete",
    )
    try:
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{src}/chunk{i}")
            q.processAllAvailable()
            if i == redeliver:  # verbatim at-least-once redelivery
                spark.createDataFrame(
                    chunk, schema
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{src}/redelivered"
                )
                q.processAllAvailable()
        got = {
            (r.pt_feature_id, r.dataset): (
                r[f"max_value_{int(radius)}km"],
                r.min_distance_km,
            )
            for r in spark.table(name).collect()
        }
    finally:
        q.stop()
    # Exact reference: per (detection, feature) the min distance over
    # that feature's segments (same IEEE op order as the engine), the
    # job's round-to-6dp, then the radius test — equivalent to the
    # job's per-pair round→filter→agg because rounding is monotone.
    want: dict[tuple[str, str], tuple[float, float]] = {}
    for dataset, plon, plat, value in rows:
        for j, pts in enumerate(lines):
            d6 = _round6(
                min(
                    _ref_seg_km(plon, plat, a[0], a[1], b[0], b[1])
                    for a, b in zip(pts, pts[1:])
                )
            )
            if d6 > radius:
                continue
            key = (f"f{j}", dataset)
            mx, mn = want.get(key, (value, d6))
            want[key] = (max(mx, value), min(mn, d6))
    assert got == want


@settings(
    max_examples=_FUZZ_EX or 4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(two_feeds())
def test_correlate_outer_chunking_invariance(spark, tmp_path_factory, data):
    from pyspark.sql import types as T

    from gee_datapipeline_spark.streaming.jobs import correlate_streams

    (l_rows, l_chunks), (r_rows, r_chunks) = data
    schema = T._parse_datatype_string(
        "ts timestamp, user_id long, value double"
    )
    tmp = tmp_path_factory.mktemp("fuzzouter")
    srcs = {"l": tmp / "l", "r": tmp / "r"}
    for p in srcs.values():
        p.mkdir()
    q = run_to_memory(
        correlate_streams(
            stream_from_dir(spark, str(srcs["l"]) + "/*", schema),
            stream_from_dir(spark, str(srcs["r"]) + "/*", schema),
            key="user_id",
            how="leftOuter",
        ),
        f"fz_outer_{tmp.name}",
        str(tmp / "ckpt"),
        output_mode="append",
    )
    try:
        for side, chunks in (("l", l_chunks), ("r", r_chunks)):
            for i, chunk in enumerate(chunks):
                if not chunk:
                    continue
                spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{srcs[side]}/chunk{i}")
                q.processAllAvailable()
        # watermark-advancing sentinels flush the unmatched-left state
        sentinel = BASE + dt.timedelta(hours=8)
        for side, skey in (("l", -1), ("r", -2)):
            spark.createDataFrame(
                [(sentinel, skey, 0.0)], schema
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{srcs[side]}/sentinel"
            )
        q.processAllAvailable()
        got = sorted(
            (r.l_ts, r.l_key, r.l_value, r.r_ts, r.r_value)
            for r in spark.sql(
                f"SELECT * FROM fz_outer_{tmp.name} WHERE l_key >= 0"
            ).collect()
        )
    finally:
        q.stop()
    lb = spark.createDataFrame(l_rows, schema).select(
        F.col("ts").alias("l_ts"),
        F.col("user_id").alias("l_key"),
        F.col("value").alias("l_value"),
    )
    rb = spark.createDataFrame(r_rows, schema).select(
        F.col("ts").alias("r_ts"),
        F.col("user_id").alias("r_key"),
        F.col("value").alias("r_value"),
    )
    want = sorted(
        (r.l_ts, r.l_key, r.l_value, r.r_ts, r.r_value)
        for r in lb.join(
            rb,
            (F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("interval 10 minutes")),
            "left",
        ).collect()
    )
    assert got == want
