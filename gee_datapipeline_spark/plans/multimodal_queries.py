"""Multimodal + streaming gate entries.

Two tiers: plumbing entries synthesize media from the ``documents``
table (payload = utf-8 text bytes, fake codec) so the binary-column
path runs against driver data at every scale factor (rows-only); the
``*_decode_real`` entries decode ACTUAL PNG/BMP/WAV bytes from the
media fixture with the in-repo pure-Python codecs and carry FULL
DuckDB oracles against the generator's closed-form expectations.
The streaming entries drive real Structured Streaming queries (file
source → transform → memory sink) synchronously; ``streaming_dedup``
is oracle-checked (replayed day == batch DISTINCT).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import sql_stable_avg
from .registry import Query, register


def _media_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_id < 200, not limit(200): LIMIT over an unordered scan is
    # nondeterministic, and the frame-sample oracle value-hashes rows.
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def _multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media → decoded features via mapInPandas (deterministic
    fake codec; real codecs slot into the same plumbing). Aggregated so
    the output is stable and small.

    The fake codec's luma plane is the payload's sha256 digest tiled
    8×8, so every output column is mirrorable in DuckDB SQL (sha256 +
    hex-digit arithmetic) — this entry carries a FULL oracle, not the
    weaker rows-only check."""
    from ..functions.multimodal import image_features
    from ..functions.stable import stable_avg

    feats = image_features(_media_from_docs(spark, sf_dir), fake=True)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        stable_avg("mean_luma", 4).alias("avg_luma"),
        F.countDistinct("sha256").alias("n_distinct_payloads"),
    )


# DuckDB mirror of the digest-tiled fake codec: mean_luma of a payload
# is the mean of its sha256 digest's 32 bytes, recovered from the hex
# string with strpos('0123456789abcdef', ...) arithmetic. GROUP BY the
# constant kind so an empty documents table yields zero rows (matching
# Spark's groupBy), not one all-NULL aggregate row.
_IMAGE_FEATURES_ORACLE = f"""
    WITH luma AS (
        SELECT
            sha256(text) AS h,
            octet_length(encode(text)) AS n_bytes,
            list_sum([
                (strpos('0123456789abcdef', substr(sha256(text), i, 1)) - 1)
                * CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END
                FOR i IN range(1, 65)
            ]) / 32.0 AS mean_luma
        FROM documents
        WHERE doc_id < 200
    )
    SELECT
        'image' AS kind,
        count(*) AS n_media,
        CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        {sql_stable_avg('mean_luma', 4)} AS avg_luma,
        count(DISTINCT h) AS n_distinct_payloads
    FROM luma
    GROUP BY kind
"""


register(
    Query(
        name="multimodal_image_features",
        spark=_multimodal_image_features,
        oracle=_IMAGE_FEATURES_ORACLE,
        tags=("multimodal",),
        doc="digest-tiled fake codec through the real mapInPandas "
        "decode plumbing; FULL sha256-arithmetic DuckDB oracle",
    )
)


def _multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the UDTF-shaped mapInPandas path
    (one input row → many frame rows), aggregated per media item. The
    synthetic duration is derived from doc length so every scale factor
    exercises variable fan-out."""
    from ..functions.multimodal import sample_frames

    media = _media_from_docs(spark, sf_dir).select(
        "media_id",
        F.lit("video").alias("kind"),
        F.lit("video/fake").alias("mime"),
        "payload",
        "width",
        "height",
        (F.length("payload") * 10).cast("int").alias("duration_ms"),
        "meta",
    )
    frames = sample_frames(media, every_ms=1000, fake=True)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ms"),
        F.countDistinct("sha256").alias("n_distinct_frames"),
    )


register(
    Query(
        name="multimodal_frame_sample",
        spark=_multimodal_frame_sample,
        # Closed-form oracle: the fake frame extractor is deterministic —
        # duration = 10·octet_length(utf-8 text), frames at every 1000 ms
        # of [0, max(duration, 1)), and each frame hash is sha256(payload
        # ‖ ts) so all frames of a video are distinct. The decode itself
        # is covered by the *_decode_real differential entries.
        oracle="""
            WITH media AS (
                SELECT doc_id AS media_id,
                       greatest(octet_length(encode(text)) * 10, 1) AS dur
                FROM documents
                WHERE doc_id < 200 AND text IS NOT NULL
            ),
            f AS (
                SELECT media_id,
                       CAST((dur + 999) // 1000 AS BIGINT) AS n_frames
                FROM media
            )
            SELECT media_id,
                   n_frames,
                   CAST((n_frames - 1) * 1000 AS INTEGER) AS last_frame_ms,
                   n_frames AS n_distinct_frames
            FROM f
        """,
        tags=("multimodal",),
    )
)


def _media_fixture(spark: SparkSession) -> DataFrame:
    from ..sources.fixtures import load_fixture

    return load_fixture(spark, "media")


def _media_fixture_path() -> str:
    from ..sources.fixtures import ensure_geo_fixtures, fixture_path

    ensure_geo_fixtures()
    return fixture_path("media")


def _multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode differential: Spark decodes actual PNG/BMP
    payload bytes with the in-repo pure-Python codec
    (``functions.imagecodec``) inside ``mapInPandas``; the oracle reads
    the generator's closed-form expected features (constant-color images
    → exact Rec.601 luma). Undecodable payloads (WAV, binary blobs) must
    come back ``decode_ok=false`` — corrupt media is data, not an error."""
    from ..functions.multimodal import image_features

    media = _media_fixture(spark).select("media_id", "kind", "payload")
    feats = image_features(media, fake=False)
    return feats.select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        # luma rounded to 4dp on both sides; NULL when decode failed so
        # the oracle never has to model NaN
        F.round(F.when(F.col("decode_ok"), F.col("mean_luma")), 4).alias(
            "luma4"
        ),
        "decode_ok",
    )


register(
    Query(
        name="multimodal_decode_real",
        spark=_multimodal_decode_real,
        oracle=f"""
            SELECT media_id,
                   octet_length(payload) AS n_bytes,
                   exp_width AS width,
                   exp_height AS height,
                   round(exp_mean_luma, 4) AS luma4,
                   exp_img_ok AS decode_ok
            FROM read_parquet('{_media_fixture_path()}')
        """,
        tags=("multimodal", "codec"),
    )
)


def _multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize differential: decode actual PNG/BMP bytes, nearest-
    neighbor resize to 16×12, re-encode PNG, decode THAT back
    (roundtrip_ok) — the full decode→transform→encode loop on
    executors. Constant-color fixtures make the resized luma an exact
    closed form, so the oracle needs no codec. n_bytes_out is excluded
    from the hashed output (it depends on zlib's compressor, which the
    oracle can't model); the roundtrip invariant covers the encode."""
    from ..functions.multimodal import resize_images

    media = _media_fixture(spark).select("media_id", "kind", "payload")
    out = resize_images(media, out_w=16, out_h=12)
    return out.select(
        "media_id",
        "width",
        "height",
        F.round(F.when(F.col("decode_ok"), F.col("mean_luma")), 4).alias(
            "luma4"
        ),
        "roundtrip_ok",
        "decode_ok",
    )


register(
    Query(
        name="multimodal_resize_real",
        spark=_multimodal_resize_real,
        oracle=f"""
            SELECT media_id,
                   CASE WHEN exp_img_ok THEN 16 ELSE 0 END AS width,
                   CASE WHEN exp_img_ok THEN 12 ELSE 0 END AS height,
                   CASE WHEN exp_img_ok
                        THEN round(exp_mean_luma, 4) END AS luma4,
                   exp_img_ok AS roundtrip_ok,
                   exp_img_ok AS decode_ok
            FROM read_parquet('{_media_fixture_path()}')
        """,
        tags=("multimodal", "codec"),
    )
)


def _multimodal_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame extraction differential: Spark decodes actual
    Y4M (YUV4MPEG2) payload bytes with the in-repo pure-Python codec
    (``functions.videocodec`` — mono and 420 streams, same family as
    the PNG/WAV codecs) through the UDTF-shaped ``sample_frames`` path,
    sampling at the exact frame period (40 ms @ F25:1) so every frame
    is sampled once. The oracle reads the generator's closed-form
    expectations: per-frame-constant luma planes make each frame's mean
    luma its fill value. Truncated streams (exp_video_ok=false) must
    yield zero rows — corrupt media is data, not an error."""
    from ..functions.multimodal import sample_frames
    from ..functions.stable import stable_round

    media = _media_fixture(spark).select(
        "media_id",
        "kind",
        F.lit("video/x-yuv4mpeg").alias("mime"),
        "payload",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    frames = sample_frames(media, every_ms=40, fake=False)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("sha256").alias("n_distinct_frames"),
        F.max("frame_idx").alias("last_frame_idx"),
        stable_round(F.avg("mean_y"), 4).alias("mean_y4"),
    )


register(
    Query(
        name="multimodal_frames_real",
        spark=_multimodal_frames_real,
        oracle=f"""
            SELECT media_id,
                   exp_n_frames AS n_frames,
                   exp_n_frames AS n_distinct_frames,
                   CAST(exp_n_frames - 1 AS INTEGER) AS last_frame_idx,
                   floor(exp_frame_luma_sum / exp_n_frames * 10000.0
                         + 0.5) / 10000.0 AS mean_y4
            FROM read_parquet('{_media_fixture_path()}')
            WHERE kind = 'video' AND exp_video_ok
        """,
        tags=("multimodal", "codec", "video"),
    )
)


def _audio_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode differential: Spark parses actual RIFF/WAVE
    bytes (``functions.audiocodec``); the oracle reads closed-form
    expectations (square wave → RMS = amplitude, crossings = n-1).
    Image/binary payloads must fail cleanly (decode_ok=false, zeros)."""
    from ..functions.multimodal import audio_features

    media = _media_fixture(spark).select("media_id", "kind", "payload")
    return audio_features(media).select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
        "decode_ok",
    )


register(
    Query(
        name="audio_decode_real",
        spark=_audio_decode_real,
        oracle=f"""
            SELECT media_id,
                   exp_sample_rate AS sample_rate,
                   exp_n_samples AS n_samples,
                   round(exp_duration_ms, 6) AS duration_ms,
                   round(exp_rms, 6) AS rms,
                   exp_zero_crossings AS zero_crossings,
                   exp_audio_ok AS decode_ok
            FROM read_parquet('{_media_fixture_path()}')
        """,
        tags=("multimodal", "codec"),
    )
)


def _dhash_fixture_path() -> str:
    from ..sources.fixtures import ensure_geo_fixtures, fixture_path

    ensure_geo_fixtures()
    return fixture_path("dhash_media")


def _image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: 64-bit dHash per image (REAL PNG decode
    inside ``mapInPandas``), then a plain hash-groupBy on the
    fingerprint — image near-dup collapses to the exact-dedup shape,
    with no pairwise pixel comparison anywhere. The fixture images
    sharing a hash differ in resolution and contrast, so equal keys
    certify perceptual (not byte) identity; group count, distinct
    source dimensions, and min-id canonical are all checked against the
    generator's closed form (dHash = seed · 0x0101010101010101).

    Scale: the payload never leaves its input partition — only the
    8-byte hash rides the aggregation shuffle. A Hamming-tolerant
    near-dup variant is band-blocking over this same column, exactly as
    :func:`...functions.dedup.simhash_pairs` does for text."""
    from ..functions.multimodal import image_dhash
    from ..sources.fixtures import load_fixture

    media = load_fixture(spark, "dhash_media").select("media_id", "payload")
    hashed = image_dhash(media)
    return (
        hashed.filter(F.col("decode_ok"))
        .groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.count_distinct("width", "height").alias("n_dims"),
            F.min("media_id").alias("canonical_id"),
        )
    )


register(
    Query(
        name="image_dhash_dedup",
        spark=_image_dhash_dedup,
        # 72340172838076673 = 0x0101010101010101: each of the 8 rows of
        # the comparison grid repeats the seed's bit pattern (columns
        # are block-constant), so the packed hash is seed times the
        # 8-byte repunit. Seeds < 128 keep the product in BIGINT range.
        oracle=f"""
            SELECT exp_seed * 72340172838076673 AS dhash,
                   count(*) AS n_images,
                   count(DISTINCT exp_width * 65536 + exp_height)
                       AS n_dims,
                   min(media_id) AS canonical_id
            FROM read_parquet('{_dhash_fixture_path()}')
            WHERE exp_ok
            GROUP BY 1
        """,
        tags=("multimodal", "codec", "dedup"),
    )
)


def _streaming_session_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window incident detection as a real streaming run: the
    first observed day of events streams through session_window(gap=30m)
    with a watermark; a sentinel batch closes every session (the
    'active vs historic incidents' query, README.md:2)."""
    from ..streaming.jobs import (
        run_to_memory,
        session_incidents,
        stream_from_dir,
    )

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    slice_df = ev.filter(F.to_date("ts") == F.lit(first_day)).select(
        "ts",
        F.col("user_id").cast("int").alias("cell_x"),
        F.lit(0).cast("int").alias("cell_y"),
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_stream_sess_gate_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        slice_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b1")
        )
        sentinel = slice_df.limit(1).select(
            (F.col("ts") + F.expr("interval 30 days")).alias("ts"),
            F.lit(-1).cast("int").alias("cell_x"),
            F.col("cell_y"),
            F.lit(1.0).alias("value"),
        )
        name = f"gate_sess_{abs(hash(root)) % 10**9}"
        q = run_to_memory(
            session_incidents(
                stream_from_dir(spark, src + "/*"), gap="30 minutes",
                watermark="2 hours",
            ),
            name,
            os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
            sentinel.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, "b2")
            )
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .filter(F.col("cell_x") >= 0)
            .select(
                F.date_format("incident_start", "yyyy-MM-dd HH:mm").alias("s_start"),
                F.date_format("incident_end", "yyyy-MM-dd HH:mm").alias("s_end"),
                "cell_x",
                "peak_value",
                "n_detections",
            )
        )
    finally:
        # The memory sink holds the result rows driver-side; the
        # source batches + checkpoint are not needed once stopped.
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="streaming_session_incidents",
        spark=_streaming_session_incidents,
        # Batch-equivalence oracle: over a bounded replay whose sentinel
        # pushes the watermark past every session, Structured Streaming's
        # finalized append output MUST equal the batch session
        # computation. Spark merges sessions when the gap is < 30 min
        # (new session iff ts - prev >= gap); session end = last ts + gap.
        oracle="""
            WITH slice AS (
                SELECT ts, CAST(user_id AS INTEGER) AS cell_x, value
                FROM events
                WHERE CAST(ts AS DATE) =
                      (SELECT min(CAST(ts AS DATE)) FROM events)
                  AND value > 0
            ),
            o AS (
                SELECT cell_x, ts, value,
                       lag(ts) OVER (PARTITION BY cell_x ORDER BY ts) AS prev
                FROM slice
            ),
            marked AS (
                SELECT cell_x, ts, value,
                       CASE WHEN prev IS NULL
                                 OR ts - prev >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            numbered AS (
                SELECT cell_x, ts, value,
                       sum(new_s) OVER (PARTITION BY cell_x ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M') AS s_start,
                   strftime(max(ts) + INTERVAL 30 MINUTE,
                            '%Y-%m-%d %H:%M') AS s_end,
                   cell_x,
                   max(value) AS peak_value,
                   CAST(count(*) AS BIGINT) AS n_detections
            FROM numbered
            GROUP BY cell_x, sid
        """,
        tags=("streaming", "session"),
    )
)


def _streaming_windowed_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming run inside the gate: events (first
    observed day) stream through the tumbling-window max composite with
    a watermark; a sentinel batch closes all windows; the finalized
    append-mode output is returned as a batch DataFrame."""
    from ..streaming.jobs import (
        run_to_memory,
        stream_from_dir,
        windowed_max_composite,
    )

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    slice_df = ev.filter(F.to_date("ts") == F.lit(first_day)).select(
        "ts",
        F.col("user_id").cast("int").alias("cell_x"),
        F.lit(0).cast("int").alias("cell_y"),
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_stream_gate_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        slice_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b1")
        )
        # sentinel far past the watermark horizon → every window finalizes
        sentinel = slice_df.limit(1).select(
            (F.col("ts") + F.expr("interval 30 days")).alias("ts"),
            F.lit(-1).cast("int").alias("cell_x"),
            F.col("cell_y"),
            F.lit(0.0).alias("value"),
        )
        name = f"gate_stream_{abs(hash(root)) % 10**9}"
        q = run_to_memory(
            windowed_max_composite(
                stream_from_dir(spark, src + "/*"), "6 hours", "1 hour"
            ),
            name,
            os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
            sentinel.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, "b2")
            )
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .filter(F.col("cell_x") >= 0)
            .select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("w_start"),
                "cell_x",
                "max_value",
                "n_obs",
            )
        )
    finally:
        # The memory sink holds the result rows driver-side; the
        # source batches + checkpoint are not needed once stopped.
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="streaming_windowed_composite",
        spark=_streaming_windowed_composite,
        # Batch-equivalence oracle: the sentinel closes every 6-hour
        # tumbling window, so the finalized stream output must equal the
        # batch epoch-aligned 6 h bucket aggregate (pure interval
        # arithmetic — no to_timestamp, so the check is timezone-free).
        oracle="""
            WITH slice AS (
                SELECT ts, CAST(user_id AS INTEGER) AS cell_x, value
                FROM events
                WHERE CAST(ts AS DATE) =
                      (SELECT min(CAST(ts AS DATE)) FROM events)
            )
            SELECT strftime(
                       ts - to_microseconds(
                           CAST(epoch_us(ts) % 21600000000 AS BIGINT)),
                       '%Y-%m-%d %H:%M') AS w_start,
                   cell_x,
                   max(value) AS max_value,
                   CAST(count(value) AS BIGINT) AS n_obs
            FROM slice
            GROUP BY 1, 2
        """,
        tags=("streaming", "A2"),
    )
)


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with a FULL oracle: the first observed day of
    events is delivered TWICE (two identical micro-batches — an
    at-least-once replay), streamed through
    dropDuplicatesWithinWatermark, and the surviving rows must equal
    plain batch DISTINCT over that day — which IS SQL-expressible, so
    this is the one streaming entry the driver can value-hash against
    DuckDB."""
    from ..streaming.jobs import dedup_stream, run_to_memory, stream_from_dir

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    slice_df = ev.filter(F.to_date("ts") == F.lit(first_day)).select(
        "ts",
        F.col("user_id").alias("cell_x"),
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_stream_dedup_gate_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        for batch in ("b1", "b2"):  # identical payload = replayed delivery
            slice_df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, batch)
            )
        name = f"gate_dedup_{abs(hash(root)) % 10**9}"
        schema = "ts timestamp, cell_x long, value double"
        from pyspark.sql import types as T

        q = run_to_memory(
            dedup_stream(
                stream_from_dir(
                    spark, src + "/*", T._parse_datatype_string(schema)
                )
            ),
            name,
            os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
            "cell_x",
            "value",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="streaming_dedup",
        spark=_streaming_dedup,
        oracle="""
            SELECT DISTINCT
                   strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')
                       AS ts_s,
                   user_id AS cell_x,
                   value
            FROM events
            WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
        """,
        tags=("streaming", "dedup"),
    )
)


def _run_correlate_gate(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Shared replay harness for the stream-stream correlate gates:
    day-1 clicks and day-1 errors become two file-source feeds through
    ``correlate_streams``. For ``leftOuter`` a watermark-advancing
    sentinel micro-batch is appended to each side (event time far past
    day-1 + horizon + watermark; keys -1/-2 so sentinels can never
    join anything real) to force the unmatched-left rows out of the
    expiring state; sentinels are filtered from the result."""
    from pyspark.sql import types as T

    from ..streaming.jobs import (
        correlate_streams,
        run_to_memory,
        stream_from_dir,
    )

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    day = ev.filter(F.to_date("ts") == F.lit(first_day))

    def feed(event_type: str) -> DataFrame:
        return day.filter(F.col("event_type") == event_type).select(
            "ts", "user_id", "value"
        )

    outer = how == "leftOuter"
    if outer:
        # The NULL-tail flush depends on Spark running empty
        # micro-batches after the sentinel advances the watermark
        # (otherwise the unmatched-left state would never be emitted
        # and the gate would silently miss rows). Pin the precondition
        # instead of assuming the session default.
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
    # watermark(2h) + horizon(10min) + margin past the day's last event
    sentinel_ts = (
        day.agg((F.max("ts") + F.expr("interval 4 hours")).alias("t"))
        .first()["t"]
        if outer
        else None
    )

    root = tempfile.mkdtemp(prefix=f"gee_stream_corr_{how}_gate_")
    try:
        schema = T._parse_datatype_string(
            "ts timestamp, user_id long, value double"
        )
        sides = {}
        for side, etype, skey in (("l", "click", -1), ("r", "error", -2)):
            src = os.path.join(root, side)
            os.makedirs(src)
            feed(etype).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, "b1")
            )
            if outer:
                spark.createDataFrame(
                    [(sentinel_ts, skey, 0.0)], schema
                ).coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(src, "b2")
                )
                # the file source orders micro-batches by modification
                # time; the sentinel MUST arrive after the data batch
                # or its watermark would mark the real rows
                # late-and-dropped
                now = time.time()
                for sub, off in (("b1", 0.0), ("b2", 30.0)):
                    d = os.path.join(src, sub)
                    for f in os.listdir(d):
                        os.utime(
                            os.path.join(d, f), (now + off, now + off)
                        )
            sides[side] = stream_from_dir(spark, src + "/*", schema)
        name = f"gate_corr_{how}_{abs(hash(root)) % 10**9}"
        q = run_to_memory(
            correlate_streams(
                sides["l"], sides["r"], key="user_id", how=how
            ),
            name,
            os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.table(name)
        if outer:
            out = out.filter(F.col("l_key") >= 0)
        return out.select(
            F.col("l_key").alias("user_id"),
            F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "click_ts"
            ),
            F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "error_ts"
            ),
            F.round("l_value", 6).alias("click_value"),
            F.round("r_value", 6).alias("error_value"),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _streaming_correlate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join with a FULL oracle: day-1 clicks and day-1
    errors stream in as two independent feeds and are correlated per
    user within a 10-minute horizon (streaming.jobs.correlate_streams).
    An inner time-bounded join over a bounded replay must equal the
    batch join — SQL-expressible, so the driver value-hashes it."""
    return _run_correlate_gate(spark, sf_dir, "inner")


register(
    Query(
        name="streaming_correlate",
        spark=_streaming_correlate,
        oracle="""
            WITH day1 AS (
                SELECT * FROM events
                WHERE CAST(ts AS DATE) =
                      (SELECT min(CAST(ts AS DATE)) FROM events)
            )
            SELECT c.user_id,
                   strftime(CAST(c.ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   strftime(CAST(e.ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
                   round(c.value, 6) AS click_value,
                   round(e.value, 6) AS error_value
            FROM day1 c JOIN day1 e
              ON c.user_id = e.user_id
             AND e.ts >= c.ts
             AND e.ts <= c.ts + INTERVAL 10 MINUTE
            WHERE c.event_type = 'click' AND e.event_type = 'error'
        """,
        tags=("streaming", "join"),
    )
)


def _streaming_correlate_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join with a FULL oracle: same feeds as
    ``streaming_correlate``, but clicks with NO error inside the
    horizon must ALSO emit (NULL-filled) — which only happens once the
    watermark proves them unmatched (see ``_run_correlate_gate`` for
    the sentinel mechanics). The total output must equal the batch
    LEFT JOIN — SQL-expressible, so the driver value-hashes the whole
    semantics including the unmatched tail."""
    return _run_correlate_gate(spark, sf_dir, "leftOuter")


register(
    Query(
        name="streaming_correlate_outer",
        spark=_streaming_correlate_outer,
        oracle="""
            WITH day1 AS (
                SELECT * FROM events
                WHERE CAST(ts AS DATE) =
                      (SELECT min(CAST(ts AS DATE)) FROM events)
            )
            SELECT c.user_id,
                   strftime(CAST(c.ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   strftime(CAST(e.ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
                   round(c.value, 6) AS click_value,
                   round(e.value, 6) AS error_value
            FROM (SELECT * FROM day1 WHERE event_type = 'click') c
            LEFT JOIN (SELECT * FROM day1 WHERE event_type = 'error') e
              ON c.user_id = e.user_id
             AND e.ts >= c.ts
             AND e.ts <= c.ts + INTERVAL 10 MINUTE
        """,
        tags=("streaming", "join"),
    )
)


def _video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL decoded video: frames are pulled
    with the Y4M codec through ``sample_frames`` (the UDTF path), then
    a per-video lag window flags frame-to-frame mean-luma jumps above
    ``SCENE_CUT_THRESH`` — the shot-boundary primitive a multimodal
    curation pipeline uses to segment video before captioning /
    frame-sampling. The window is PARTITIONED per media_id (frames of
    one video co-located by the decode explode; no global sort), and
    the oracle reads the generator's closed-form cut counts: fills
    step +31 mod 256, so every delta is 31 (no cut) or 225 (a wrap =
    a cut), making max_jump itself closed-form. Truncated streams
    (exp_video_ok=false) must contribute nothing."""
    from pyspark.sql import Window

    from ..functions.multimodal import sample_frames
    from ..sources.fixtures import SCENE_CUT_THRESH

    media = _media_fixture(spark).filter(
        # Only video payloads enter the Python decode worker: shipping
        # image/audio/blob bytes through mapInPandas just for
        # sample_frames' kind-skip to drop them would be wasted Arrow
        # transfer at scale.
        F.col("kind") == "video"
    ).select(
        "media_id",
        "kind",
        F.lit("video/x-yuv4mpeg").alias("mime"),
        "payload",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    frames = sample_frames(media, every_ms=40, fake=False)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    deltas = frames.withColumn(
        "jump", F.abs(F.col("mean_y") - F.lag("mean_y").over(w))
    )
    return deltas.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(
            F.when(F.col("jump") > F.lit(SCENE_CUT_THRESH), 1).otherwise(0)
        ).alias("n_cuts"),
        F.max("jump").alias("max_jump"),
    )


register(
    Query(
        name="video_scene_cuts",
        spark=_video_scene_cuts,
        oracle=f"""
            SELECT media_id,
                   exp_n_frames AS n_frames,
                   exp_scene_cuts AS n_cuts,
                   CAST(CASE WHEN exp_scene_cuts > 0 THEN 225.0
                        ELSE 31.0 END AS DOUBLE) AS max_jump
            FROM read_parquet('{_media_fixture_path()}')
            WHERE kind = 'video' AND exp_video_ok
        """,
        tags=("multimodal", "codec", "video"),
        doc="shot-boundary detection: per-video lag window over REAL "
        "Y4M-decoded frame lumas vs the fixture's closed-form cut "
        "counts",
    )
)
