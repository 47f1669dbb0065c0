"""Multimodal column plumbing (BASELINE.json north star).

Media (image/audio/video) are opaque ``binary`` payloads + typed metadata
(``model.MEDIA_SCHEMA``). The Spark-side architecture is real — schema,
Arrow batch shape, ``mapInPandas`` partition streaming, deterministic
fake decode for tests — while the actual codec calls are stubbed: the
image/audio libraries are not in this container, so decoders raise
``NotImplementedError`` unless ``fake=True`` (a deterministic
payload-hash-seeded decode used by the tests).

Scale notes: payloads never pass through a shuffle — decode/feature
steps are ``mapInPandas`` (narrow, per-partition); only the small derived
feature columns continue into joins/aggregations. Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` which callers should
lower for large payloads (the per-batch memory is payload_size × batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms int, sha256 string"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image codec: payload hash seeds a
    small luma plane. Same payload → same 'pixels' on every executor."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    Real pipeline would call Pillow/libvips here; with ``fake=True`` the
    deterministic fake decoder exercises the identical plumbing
    (binary in → Arrow batch → per-batch vectorized work → narrow out)."""

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
            if fake:
                planes = [
                    None if p is None else _fake_decode(bytes(p))
                    for p in pdf["payload"]
                ]
                out["width"] = [0 if pl is None else pl.shape[1] for pl in planes]
                out["height"] = [0 if pl is None else pl.shape[0] for pl in planes]
                out["mean_luma"] = [
                    float("nan") if pl is None else round(float(pl.mean()), 6)
                    for pl in planes
                ]
                out["decode_ok"] = [pl is not None for pl in planes]
            else:  # pragma: no cover - real codecs absent in this env
                raise NotImplementedError(
                    "real image decode requires Pillow/libvips (not in "
                    "this container); use fake=True for the plumbing path"
                )
            res = pd.DataFrame(out)
            res["width"] = res["width"].astype("int32")
            res["height"] = res["height"].astype("int32")
            yield res

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (UDTF
    shape — mapInPandas yielding more rows than it consumes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["payload"] is None or r["kind"] != "video":
                    continue
                duration = int(r["duration_ms"] or 0)
                if not fake:  # pragma: no cover
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg bindings"
                    )
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    h = hashlib.sha256(
                        bytes(r["payload"]) + ts.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append((r["media_id"], i, ts, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "sha256"]
            ).astype(
                {"frame_idx": "int32", "frame_ts_ms": "int32"}
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
