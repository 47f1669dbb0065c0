"""Multimodal column plumbing (BASELINE.json north star).

Media (image/audio/video) are opaque ``binary`` payloads + typed metadata
(``model.MEDIA_SCHEMA``). Image decode is REAL (``fake=False``): the
in-repo pure-Python PNG/BMP codec (``functions.imagecodec``) decodes
actual bytes on executors; audio decode is real via the WAV codec
(``functions.audiocodec``). ``fake=True`` remains for plumbing tests
whose payloads are not images. Only video frame *extraction* stays a
stub (an H.264 decoder is out of scope without ffmpeg); its UDTF
plumbing runs deterministically with ``fake=True``.

Scale notes: payloads never pass through a shuffle — decode/feature
steps are ``mapInPandas`` (narrow, per-partition); only the small derived
feature columns continue into joins/aggregations. Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` which callers should
lower for large payloads (the per-batch memory is payload_size × batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from struct import error as struct_error
from zlib import error as zlib_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, mean_luma double, decode_ok boolean"
)

DHASH_SCHEMA = (
    "media_id long, decode_ok boolean, dhash long, width int, height int"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms int, sha256 string, "
    "mean_y double"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_samples long, "
    "duration_ms double, rms double, zero_crossings long, decode_ok boolean"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image codec: the payload's sha256
    digest (32 bytes) tiled to an 8×8 luma plane. Same payload → same
    'pixels' on every executor, and — unlike an RNG-seeded plane — the
    plane's statistics are expressible in ANY engine with a sha256
    function (mean = mean of the 32 digest bytes), so the plumbing
    entries that use the fake codec can carry full SQL oracles."""
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest * 2, dtype=np.uint8).reshape(8, 8)


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    ``fake=False`` (the real path) decodes PNG/BMP payloads with the
    in-repo pure-Python codec (``functions.imagecodec`` — zlib + NumPy,
    no Pillow) and reports Rec.601 mean luma; undecodable payloads get
    ``decode_ok=false`` with zeroed dimensions rather than failing the
    job (corrupt media is data, not an error, in a 100 TB corpus).
    ``fake=True`` keeps the deterministic hash-seeded decoder for
    plumbing tests whose payloads are not real images."""
    from .imagecodec import decode_image, mean_luma

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: 0 if p is None else len(p)
                ),
                "sha256": pdf["payload"].map(
                    lambda p: "" if p is None else hashlib.sha256(p).hexdigest()
                ),
            }
            planes = []
            for p in pdf["payload"]:
                if p is None:
                    planes.append(None)
                    continue
                if fake:
                    planes.append(_fake_decode(bytes(p)))
                    continue
                try:
                    planes.append(decode_image(bytes(p)))
                except (ValueError, struct_error, zlib_error):
                    planes.append(None)
            out["width"] = [0 if pl is None else pl.shape[1] for pl in planes]
            out["height"] = [0 if pl is None else pl.shape[0] for pl in planes]
            out["mean_luma"] = [
                float("nan")
                if pl is None
                else round(mean_luma(pl) if not fake else float(pl.mean()), 6)
                for pl in planes
            ]
            out["decode_ok"] = [pl is not None for pl in planes]
            res = pd.DataFrame(out)
            res["width"] = res["width"].astype("int32")
            res["height"] = res["height"].astype("int32")
            yield res

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def image_dhash(media: DataFrame) -> DataFrame:
    """Per-image 64-bit perceptual fingerprint (dHash) via
    ``mapInPandas`` over the real pure-Python codec — the image
    analogue of the text pipeline's content digest: downstream image
    dedup is then an ordinary hash-groupBy on the ``dhash`` column
    (no pairwise comparison, no shuffle of pixel data; only the 8-byte
    key rides the aggregation). Near-dup banding (Hamming-adjacent
    buckets) composes on top exactly like SimHash's band blocking.
    Undecodable payloads yield ``decode_ok=false`` with a NULL hash —
    corrupt media is data, not an error, in a 100 TB corpus."""
    from .imagecodec import decode_image, dhash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks, hashes, ws, hs = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                img = None
                if p is not None:
                    try:
                        img = decode_image(bytes(p))
                    except (ValueError, struct_error, zlib_error):
                        img = None
                oks.append(img is not None)
                hashes.append(None if img is None else dhash64(img))
                ws.append(0 if img is None else img.shape[1])
                hs.append(0 if img is None else img.shape[0])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "decode_ok": oks,
                    "dhash": pd.Series(hashes, dtype="Int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return media.mapInPandas(run, DHASH_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, "
    "n_bytes_out long, roundtrip_ok boolean, decode_ok boolean"
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode PNG, per payload,
    via ``mapInPandas`` (narrow: no shuffle; payload bytes never leave
    the partition). Returns the resized dimensions, resized mean luma,
    the re-encoded size, and a ``roundtrip_ok`` invariant (the PNG we
    wrote decodes back to the identical pixel array) — so the gate can
    assert the full decode→transform→encode loop, not just the decode.
    Undecodable payloads come back decode_ok=false with zeroed fields
    (corrupt media is data, not an error)."""
    from .imagecodec import (
        decode_image,
        encode_png,
        mean_luma,
        resize_nearest,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                base = {
                    "media_id": mid,
                    "width": 0,
                    "height": 0,
                    "mean_luma": float("nan"),
                    "n_bytes_out": 0,
                    "roundtrip_ok": False,
                    "decode_ok": False,
                }
                if p is not None:
                    try:
                        img = decode_image(bytes(p))
                        small = resize_nearest(img, out_w, out_h)
                        png = encode_png(small)
                        back = decode_image(png)
                        base.update(
                            width=small.shape[1],
                            height=small.shape[0],
                            mean_luma=round(mean_luma(small), 6),
                            n_bytes_out=len(png),
                            roundtrip_ok=bool(
                                back.shape == small.shape
                                and (back == small).all()
                            ),
                            decode_ok=True,
                        )
                    except (ValueError, struct_error, zlib_error):
                        pass
                rows.append(base)
            res = pd.DataFrame(rows)
            res["width"] = res["width"].astype("int32")
            res["height"] = res["height"].astype("int32")
            yield res

    return media.mapInPandas(run, RESIZE_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Real audio decode via the in-repo WAV codec: duration, RMS,
    zero-crossing count per payload. Non-WAV / corrupt payloads get
    ``decode_ok=false`` and zeroed features (data, not an error)."""
    from .audiocodec import wav_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                base = {
                    "media_id": mid,
                    "n_bytes": 0 if p is None else len(p),
                    "sample_rate": 0,
                    "n_samples": 0,
                    "duration_ms": 0.0,
                    "rms": 0.0,
                    "zero_crossings": 0,
                    "decode_ok": False,
                }
                if p is not None:
                    try:
                        base.update(wav_features(bytes(p)))
                        base["decode_ok"] = True
                    except (ValueError, struct_error):
                        pass
                rows.append(base)
            res = pd.DataFrame(rows)
            res["sample_rate"] = res["sample_rate"].astype("int32")
            yield res

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (UDTF
    shape — mapInPandas yielding more rows than it consumes).

    ``fake=False`` decodes REAL Y4M (YUV4MPEG2) payloads with the
    in-repo pure-Python codec (``functions.videocodec`` — same family
    as the PNG/WAV codecs): sample timestamps walk [0, duration) in
    ``every_ms`` steps, each maps to the frame whose presentation
    interval contains it (``ts·fps_num // (1000·fps_den)``), and each
    sampled frame reports the sha256 of its luma plane plus its mean
    luma. Undecodable payloads yield zero rows — corrupt media is data,
    not an error. ``fake=True`` keeps the plumbing-only deterministic
    hash fan-out (payload‖ts) for synthetic media with no real bytes;
    its ``mean_y`` is NULL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .videocodec import decode_y4m, y4m_duration_ms

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["payload"] is None or r["kind"] != "video":
                    continue
                if fake:
                    duration = int(r["duration_ms"] or 0)
                    for i, ts in enumerate(
                        range(0, max(duration, 1), every_ms)
                    ):
                        h = hashlib.sha256(
                            bytes(r["payload"]) + ts.to_bytes(4, "big")
                        ).hexdigest()
                        rows.append((r["media_id"], i, ts, h, None))
                    continue
                try:
                    frames, fps = decode_y4m(bytes(r["payload"]))
                except ValueError:
                    continue
                nf = len(frames)
                duration = y4m_duration_ms(nf, fps)
                num, den = fps
                for ts in range(0, max(int(duration), 1), every_ms):
                    fi = min(nf - 1, ts * num // (1000 * den))
                    plane = frames[fi]
                    rows.append(
                        (
                            r["media_id"],
                            int(fi),
                            ts,
                            hashlib.sha256(plane.tobytes()).hexdigest(),
                            float(plane.mean()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "frame_ts_ms", "sha256",
                    "mean_y",
                ],
            ).astype(
                {"frame_idx": "int32", "frame_ts_ms": "int32"}
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
