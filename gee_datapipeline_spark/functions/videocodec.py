"""Pure-Python Y4M (YUV4MPEG2) video codec — the video member of the
in-repo media codec family (PNG/BMP: ``imagecodec``, WAV: ``audiocodec``).

The container has no ffmpeg, and the reference's client stack (PIL /
rasterio) has no video path either — so, as with the other codecs, the
format is implemented directly from its public specification (the
YUV4MPEG2 format used by mjpegtools/ffmpeg ``-f yuv4mpegpipe``):

    YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C<colorspace>]\\n
    ( FRAME[ params]\\n <plane bytes> )*

Supported colorspaces: ``Cmono`` (Y plane only) and the ``C420`` family
(``C420``, ``C420jpeg``, ``C420mpeg2``, ``C420paldv`` — Y + quarter-size
U/V planes; chroma siting differences don't change the byte layout).
Decode returns the luma planes only — every downstream feature (frame
hash, mean luma) is luma-based, and chroma would triple the Arrow
transfer for nothing.

Corrupt input raises ``ValueError`` (undecodable media is data, not an
error — callers map it to ``decode_ok=false`` / zero rows).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"
_C420_FAMILY = {"420", "420jpeg", "420mpeg2", "420paldv"}


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """Encode ``(n_frames, h, w)`` uint8 luma planes as a Y4M stream.

    ``colorspace='420jpeg'`` (or any 420 variant) writes constant-gray
    chroma planes (128); ``'mono'`` writes Y only. 420 requires even
    dimensions (chroma planes are half-size in both axes)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"expected (n, h, w) luma frames, got {arr.shape}")
    n, h, w = arr.shape
    cs = colorspace.lstrip("C")
    if cs not in _C420_FAMILY and cs != "mono":
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    if cs in _C420_FAMILY and (w % 2 or h % 2):
        raise ValueError("C420 requires even width and height")
    num, den = fps
    out = [
        f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{cs}\n".encode()
    ]
    chroma = (
        np.full(((h // 2) * (w // 2),), 128, dtype=np.uint8).tobytes()
        if cs in _C420_FAMILY
        else b""
    )
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(arr[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a Y4M stream → ``((n, h, w) uint8 luma frames, (num, den))``.

    Chroma planes of 420 streams are skipped, not returned."""
    if not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("missing stream-header terminator")
    w = h = num = den = None
    cs = "420jpeg"  # spec default when C is absent
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        try:
            if key == "W":
                w = int(val)
            elif key == "H":
                h = int(val)
            elif key == "F":
                num, den = (int(x) for x in val.split(":"))
            elif key == "C":
                cs = val
        except ValueError as exc:
            raise ValueError(f"bad Y4M header token {tok!r}") from exc
    if not w or not h or not num or not den:
        raise ValueError("Y4M header missing W/H/F")
    if cs == "mono":
        frame_len = w * h
    elif cs in _C420_FAMILY:
        if w % 2 or h % 2:
            raise ValueError("C420 stream with odd dimensions")
        frame_len = w * h + 2 * (w // 2) * (h // 2)
    else:
        raise ValueError(f"unsupported colorspace C{cs}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        start = fnl + 1
        end = start + frame_len
        if end > len(data):
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(data[start : start + w * h], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
        pos = end
    if not frames:
        raise ValueError("Y4M stream with zero frames")
    return np.stack(frames), (num, den)


def y4m_duration_ms(n_frames: int, fps: tuple[int, int]) -> float:
    num, den = fps
    return n_frames * 1000.0 * den / num
