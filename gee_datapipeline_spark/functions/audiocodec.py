"""Pure-Python WAV (RIFF PCM) codec.

Audio payloads in a training corpus are bytes in a container format;
16-bit PCM WAV is the codec-free one, parseable with ``struct`` + NumPy
alone (public RIFF/WAVE spec). This backs the real (non-fake) audio
feature path in ``functions.multimodal`` the same way
``functions.imagecodec`` backs images.

Scale note: runs inside ``mapInPandas`` on executors, one payload per
call; the sample math is vectorized NumPy.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """int16 array (n,) mono or (n, ch) → RIFF/WAVE PCM bytes."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n, ch), sample_rate).

    16-bit PCM only; raises ValueError on anything else."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt} bits={bits}); "
                    "codec handles 16-bit PCM only"
                )
        elif tag == b"data":
            pcm = payload
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    n = samples.size // channels
    return samples[: n * channels].reshape(n, channels), sample_rate


def wav_features(data: bytes) -> dict:
    """Decode + summarize: duration, RMS (of channel mean), zero
    crossings — the standard cheap audio-quality signals."""
    samples, rate = decode_wav(data)
    mono = samples.astype(np.float64).mean(axis=1)
    n = mono.size
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    signs = np.sign(mono)
    nz = signs != 0
    compact = signs[nz]
    crossings = int((compact[1:] != compact[:-1]).sum()) if compact.size else 0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_ms": round(1000.0 * n / rate, 6) if rate else 0.0,
        "rms": round(rms, 6),
        "zero_crossings": crossings,
    }
