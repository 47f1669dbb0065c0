"""Pure-Python codec units: PNG/BMP/WAV round-trips, filter coverage,
and the real (non-fake) multimodal decode path end-to-end in Spark."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
    wav_features,
)
from gee_datapipeline_spark.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    mean_luma,
)


@pytest.mark.parametrize("shape", [(5, 7), (16, 16, 3), (9, 4, 4), (1, 1)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    b = decode_png(encode_png(a))
    assert b.shape == a.shape
    assert (b == a).all()


def _png_with_filter(arr: np.ndarray, filt: int) -> bytes:
    """Hand-assemble a PNG using a specific scanline filter, to prove the
    decoder handles filters our encoder never emits (other tools do)."""
    h, w, ch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines, prev = [], np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = arr[y].reshape(-1)
        line = np.zeros(w * ch, dtype=np.uint8)
        for x in range(w * ch):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[filt]
            line[x] = (int(cur[x]) - pred) % 256
        lines.append(bytes([filt]) + line.tobytes())
        prev = cur

    def chunk(tag, p):
        crc = zlib.crc32(tag + p) & 0xFFFFFFFF
        return struct.pack(">I", len(p)) + tag + p + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(filt):
    rng = np.random.default_rng(filt)
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert (decode_png(_png_with_filter(a, filt)) == a).all()


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    b = decode_bmp(encode_bmp(a))
    assert (b == a).all()


def test_decode_image_sniffs_magic():
    gray = np.full((2, 2), 9, dtype=np.uint8)
    assert (decode_image(encode_png(gray)) == gray).all()
    with pytest.raises(ValueError):
        decode_image(b"plain text, not an image")


def test_mean_luma_rec601():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[:, :] = (255, 0, 0)
    assert mean_luma(rgb) == pytest.approx(0.299 * 255)
    assert mean_luma(np.full((3, 3), 77, dtype=np.uint8)) == 77.0


def test_wav_roundtrip_and_features():
    sr = 8_000
    samples = np.array([100, -100] * 400, dtype=np.int16)
    payload = encode_wav(samples, sr)
    arr, rate = decode_wav(payload)
    assert rate == sr and arr.shape == (800, 1)
    assert (arr[:, 0] == samples).all()
    f = wav_features(payload)
    assert f["rms"] == 100.0
    assert f["zero_crossings"] == 799
    assert f["duration_ms"] == 100.0
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_image_features_real_path(spark):
    """fake=False decodes real bytes on executors; junk payloads come
    back decode_ok=false instead of failing the job."""
    from gee_datapipeline_spark.functions.multimodal import image_features

    gray = encode_png(np.full((3, 4), 10, dtype=np.uint8))
    rgb = np.zeros((2, 6, 3), dtype=np.uint8)
    rgb[:, :] = (10, 20, 30)
    rows = [
        (1, "image", bytearray(gray)),
        (2, "image", bytearray(encode_bmp(rgb))),
        (3, "image", bytearray(b"junk bytes")),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {
        r["media_id"]: r
        for r in image_features(media, fake=False).collect()
    }
    assert out[1]["decode_ok"] and out[1]["width"] == 4 and out[1]["mean_luma"] == 10.0
    assert out[2]["decode_ok"] and out[2]["height"] == 2
    assert out[2]["mean_luma"] == pytest.approx(
        0.299 * 10 + 0.587 * 20 + 0.114 * 30, abs=1e-6
    )
    assert not out[3]["decode_ok"] and out[3]["width"] == 0


def test_render_png_real_file(spark, tmp_path):
    """S7 end-to-end: RGBA rows → PNG bytes on disk → decode back."""
    from gee_datapipeline_spark.sinks.writers import render_png

    rows = [
        (x, y, (x * 40) % 256, (y * 90) % 256, 7, 255)
        for y in range(3)
        for x in range(4)
    ]
    df = spark.createDataFrame(
        rows, "x int, y int, r int, g int, b int, a int"
    )
    path = str(tmp_path / "out.png")
    render_png(df, path)
    img = decode_png(open(path, "rb").read())
    assert img.shape == (3, 4, 4)
    assert tuple(img[1, 2]) == (80, 90, 7, 255)


def test_geotiff_roundtrip():
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    rng = np.random.default_rng(3)
    vals = rng.uniform(-5, 5, size=(7, 11))
    vals[2, 3] = np.nan
    payload = encode_geotiff(vals, 77.0, 28.0, 0.25)
    out, min_lon, min_lat, cell, crs = decode_geotiff(payload)
    assert (min_lon, min_lat, cell) == (77.0, 28.0, 0.25)
    assert crs == "EPSG:4326"  # untagged file defaults to 4326
    assert out.shape == (7, 11)
    assert np.isnan(out[2, 3])
    m = ~np.isnan(vals)
    assert (out[m] == vals[m]).all()  # float64 bit-exact


def test_geotiff_numeric_nodata():
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    vals = np.array([[1.0, np.nan], [3.0, 4.0]])
    payload = encode_geotiff(vals, 0.0, 0.0, 1.0, nodata=-9999.0)
    assert b"-9999" in payload  # GDAL_NODATA ascii tag
    out, *_ = decode_geotiff(payload)
    assert np.isnan(out[0, 1]) and out[1, 1] == 4.0


def test_geotiff_f4_nodata_stays_f4():
    """An f4 strip payload must stay 4 bytes/sample after nodata
    substitution (NumPy value promotion must not widen it to f8 behind
    a 32-bit BitsPerSample tag), and an unrepresentable double sentinel
    must be rejected, not silently overflowed to inf."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    vals = np.array([[1.0, np.nan], [3.0, 4.0]])
    payload = encode_geotiff(vals, 0.0, 0.0, 1.0, dtype="f4", nodata=-9999.0)
    out, *_ = decode_geotiff(payload)
    assert out.shape == (2, 2) and np.isnan(out[0, 1]) and out[1, 1] == 4.0
    with pytest.raises(ValueError, match="not representable"):
        encode_geotiff(vals, 0.0, 0.0, 1.0, dtype="f4", nodata=-1e300)


def test_geotiff_deflate_and_tiled_roundtrip():
    """DEFLATE strips, uncompressed tiles, and deflate tiles all
    roundtrip bit-exactly, including NaN cells and non-tile-aligned
    edges (23×37 vs 16-px tiles)."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, size=(23, 37))
    vals[rng.random(vals.shape) < 0.1] = np.nan
    for kw in (
        {"compress": "deflate"},
        {"tile": 16},
        {"tile": 16, "compress": "deflate"},
        {"compress": "deflate", "nodata": -9999.0},
        {"tile": 32, "epsg": 32643},
    ):
        payload = encode_geotiff(vals, 70.0, 20.0, 0.5, **kw)
        out, min_lon, min_lat, cell, crs = decode_geotiff(payload)
        assert out.shape == vals.shape
        m = ~np.isnan(vals)
        assert (out[m] == vals[m]).all(), kw
        assert np.isnan(out[~m]).all(), kw
        assert (min_lon, min_lat, cell) == (70.0, 20.0, 0.5)
    # deflate actually compresses (round values are zlib-friendly)
    plain = len(encode_geotiff(np.round(vals), 0, 0, 1.0))
    packed = len(
        encode_geotiff(np.round(vals), 0, 0, 1.0, compress="deflate")
    )
    assert packed < plain / 2


_TIFF_TYPE = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}


def _build_tiff(seg: bytes, w: int, h: int, bits: int, fmt: int,
                comp: int, predictor: int, spp: int = 1,
                planar: int = 1) -> bytes:
    """Minimal hand-built single-strip little-endian TIFF — the decode
    targets my encoder never writes (predictors, odd sample formats,
    planar configs), so those tests can't go through encode_geotiff."""
    data_off = 8
    scale_off = data_off + len(seg)
    tie_off = scale_off + 24
    ifd_off = tie_off + 48
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bits),
        (259, 3, 1, comp), (262, 3, 1, 1),
        (273, 4, 1, data_off), (277, 3, 1, spp), (278, 4, 1, h),
        (279, 4, 1, len(seg)), (284, 3, 1, planar),
        (317, 3, 1, predictor), (339, 3, 1, fmt),
        (33550, 12, 3, scale_off), (33922, 12, 6, tie_off),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, ftype, count, value in sorted(entries):
        fmt_c, sz = _TIFF_TYPE[ftype]
        if sz * count <= 4:
            inline = (struct.pack("<" + fmt_c, value) + b"\0" * 4)[:4]
        else:
            inline = struct.pack("<I", value)
        ifd += struct.pack("<HHI", tag, ftype, count) + inline
    ifd += struct.pack("<I", 0)
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off) + seg
        + struct.pack("<3d", 1.0, 1.0, 0.0)
        + struct.pack("<6d", 0, 0, 0, 10.0, 20.0 + h * 1.0, 0.0)
        + ifd
    )


def test_geotiff_predictor2_int_decode():
    """Horizontal-differencing predictor on int32 samples (the layout
    GDAL writes with PREDICTOR=2) — modular diff encode by hand, exact
    decode through the public API."""
    from gee_datapipeline_spark.sources.tiffcodec import decode_geotiff

    rng = np.random.default_rng(0)
    vals = rng.integers(-1000, 1000, size=(5, 7)).astype("<i4")
    diff = vals.copy()
    diff[:, 1:] = (
        vals.view("<u4")[:, 1:] - vals.view("<u4")[:, :-1]
    ).view("<i4")
    tif = _build_tiff(zlib.compress(diff.tobytes()), 7, 5, 32, 2, 8, 2)
    out, min_lon, min_lat, cell, _ = decode_geotiff(tif)
    assert np.array_equal(out[::-1], vals.astype(np.float64))
    assert (min_lon, min_lat, cell) == (10.0, 20.0, 1.0)


def test_geotiff_predictor3_float_decode():
    """TechNote-3 floating-point predictor on float32 samples: byte
    planes (MSB first) + per-row byte differencing, undone exactly."""
    from gee_datapipeline_spark.sources.tiffcodec import decode_geotiff

    rng = np.random.default_rng(1)
    fvals = rng.uniform(-5, 5, size=(4, 6)).astype("<f4")
    h, w = fvals.shape
    rowbytes = np.frombuffer(
        fvals.astype(">f4").tobytes(), dtype=np.uint8
    ).reshape(h, w, 4)
    planes = rowbytes.transpose(0, 2, 1).reshape(h, w * 4)
    d = planes.astype(np.int16)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    seg = zlib.compress(d.astype(np.uint8).tobytes())
    out, *_ = decode_geotiff(_build_tiff(seg, w, h, 32, 3, 8, 3))
    assert np.allclose(out[::-1], fvals.astype(np.float64))


def test_read_rasters_deflate_tiled(spark, tmp_path):
    """S3 end-to-end over the compressed/tiled layouts: the Spark scan
    + decode UDTF handles all three without knowing which is which."""
    from gee_datapipeline_spark.sources.raster import read_rasters
    from gee_datapipeline_spark.sources.tiffcodec import encode_geotiff

    rng = np.random.default_rng(2)
    vals = rng.uniform(0, 50, size=(18, 21))
    vals[0, 0] = np.nan
    for name, kw in (
        ("d.tif", {"compress": "deflate"}),
        ("t.tif", {"tile": 16}),
        ("dt.tif", {"tile": 16, "compress": "deflate"}),
    ):
        (tmp_path / name).write_bytes(
            encode_geotiff(vals, 70.0, 20.0, 0.5, **kw)
        )
    df = read_rasters(spark, str(tmp_path / "*.tif"))
    assert df.count() == 3 * 18 * 21
    per_file = {
        r["f"]: (r["n"], r["s"])
        for r in df.groupBy(
            F.element_at(F.split("path", "/"), -1).alias("f")
        )
        .agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
        )
        .collect()
    }
    exp = (18 * 21 - 1, round(float(np.nansum(vals)), 6))
    assert per_file == {"d.tif": exp, "t.tif": exp, "dt.tif": exp}


def test_read_rasters_real_geotiff(spark, tmp_path):
    """S3 end-to-end with NO injected decoder: encode real .tif files,
    scan + decode + unpivot in Spark, check values and georeferencing."""
    from gee_datapipeline_spark.sources.raster import read_rasters
    from gee_datapipeline_spark.sources.tiffcodec import encode_geotiff

    vals = np.array([[10.0, np.nan], [30.0, 40.0]])
    (tmp_path / "a.tif").write_bytes(encode_geotiff(vals, 70.0, 20.0, 0.5))
    df = read_rasters(spark, str(tmp_path / "*.tif"))
    rows = {(r["x"], r["y"]): r for r in df.collect()}
    assert len(rows) == 4
    # row 0 = south: value 10 sits at y=0 → lat = 20 + 0.5*0.5
    assert rows[(0, 0)]["value"] == 10.0
    assert rows[(0, 0)]["lat"] == 20.25 and rows[(0, 0)]["lon"] == 70.25
    assert rows[(1, 0)]["value"] is None  # NaN nodata → NULL
    assert rows[(1, 1)]["value"] == 40.0


# ------------------------- property tests (hypothesis) -------------------

from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp


@settings(max_examples=25, deadline=None)
@given(
    arr=hnp.arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(1, 12), st.integers(1, 12), st.sampled_from([3, 4])
        ),
    )
)
def test_png_roundtrip_property(arr):
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    arr=hnp.arrays(
        dtype=np.uint8,
        shape=st.tuples(st.integers(1, 10), st.integers(1, 10)),
    )
)
def test_png_gray_roundtrip_property(arr):
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    arr=hnp.arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(1, 9), st.integers(1, 9), st.just(3)
        ),
    )
)
def test_bmp_roundtrip_property(arr):
    out = decode_bmp(encode_bmp(arr))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    samples=hnp.arrays(
        dtype=np.int16, shape=st.integers(1, 2000)
    ),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
)
def test_wav_roundtrip_property(samples, rate):
    arr, r = decode_wav(encode_wav(samples, rate))
    assert r == rate and (arr[:, 0] == samples).all()


@settings(max_examples=20, deadline=None)
@given(
    vals=hnp.arrays(
        dtype=np.float64,
        shape=st.tuples(st.integers(1, 8), st.integers(1, 8)),
        elements=st.floats(
            allow_nan=False, allow_infinity=False, width=64,
            min_value=-1e6, max_value=1e6,
        ),
    )
)
def test_geotiff_roundtrip_property(vals):
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    out, min_lon, min_lat, cell, _crs = decode_geotiff(
        encode_geotiff(vals, -10.0, 5.0, 0.125)
    )
    assert (min_lon, min_lat, cell) == (-10.0, 5.0, 0.125)
    assert (out == vals).all()


@settings(max_examples=25, deadline=None)
@given(
    arr=hnp.arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(1, 12), st.integers(1, 12), st.sampled_from([3])
        ),
    ),
    out=st.tuples(st.integers(1, 20), st.integers(1, 20)),
)
def test_resize_nearest_property(arr, out):
    from gee_datapipeline_spark.functions.imagecodec import resize_nearest

    out_w, out_h = out
    small = resize_nearest(arr, out_w, out_h)
    assert small.shape == (out_h, out_w, 3)
    # every output pixel is an actual input pixel (nearest-neighbor)
    flat_in = {tuple(px) for px in arr.reshape(-1, 3)}
    assert all(tuple(px) in flat_in for px in small.reshape(-1, 3))


def test_resize_nearest_constant_preserves_value():
    from gee_datapipeline_spark.functions.imagecodec import (
        mean_luma,
        resize_nearest,
    )

    img = np.full((7, 5), 133, dtype=np.uint8)
    small = resize_nearest(img, 16, 12)
    assert small.shape == (12, 16)
    assert mean_luma(small) == 133.0


def test_bpe_ish_tokens_basic(spark):
    from pyspark.sql import functions as F

    from gee_datapipeline_spark.functions.text import (
        bpe_ish_token_count,
        bpe_ish_tokens,
    )

    df = spark.createDataFrame(
        [("It's 42 degrees, really!",)], "text string"
    )
    row = df.select(
        bpe_ish_tokens(F.col("text")).alias("toks"),
        bpe_ish_token_count(F.col("text")).alias("n"),
    ).first()
    assert row["toks"] == [
        "It", "'s", " 42", " degrees", ",", " really", "!",
    ]
    assert row["n"] == 7


# ---------------------------------------------------------- Y4M (video)


def test_y4m_roundtrip_mono_and_420():
    import numpy as np

    from gee_datapipeline_spark.functions.videocodec import (
        decode_y4m,
        encode_y4m,
        y4m_duration_ms,
    )

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    for cs in ("mono", "420jpeg", "420mpeg2"):
        data = encode_y4m(frames, fps=(30, 1), colorspace=cs)
        got, fps = decode_y4m(data)
        assert fps == (30, 1)
        assert got.shape == frames.shape
        assert (got == frames).all()
    assert y4m_duration_ms(5, (25, 1)) == 200.0


def test_y4m_header_defaults_and_fractional_fps():
    import numpy as np

    from gee_datapipeline_spark.functions.videocodec import decode_y4m

    # hand-built stream: C token absent → 420jpeg default; NTSC fps
    w, h = 4, 2
    y = bytes(range(w * h))
    c = bytes((w // 2) * (h // 2))
    data = (
        b"YUV4MPEG2 W4 H2 F30000:1001 Ip A1:1\n"
        + b"FRAME\n" + y + c + c
    )
    frames, fps = decode_y4m(data)
    assert fps == (30000, 1001)
    assert frames.shape == (1, 2, 4)
    assert frames[0, 0, 1] == 1


def test_y4m_corrupt_raises():
    import numpy as np
    import pytest

    from gee_datapipeline_spark.functions.videocodec import (
        decode_y4m,
        encode_y4m,
    )

    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    data = encode_y4m(frames, colorspace="mono")
    with pytest.raises(ValueError):
        decode_y4m(data[: len(data) - 3])  # truncated frame
    with pytest.raises(ValueError):
        decode_y4m(b"JUNKSTREAM" + data)  # bad magic
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1\n")  # zero frames
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((1, 3, 5), dtype=np.uint8),
                   colorspace="420jpeg")  # odd dims
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cweird\nFRAME\n" + bytes(16))


def test_sample_frames_real_y4m(spark):
    """Frame sampling against a known Y4M payload: every frame sampled
    once at the frame period; constant frames → exact mean luma."""
    import numpy as np

    from gee_datapipeline_spark.functions.multimodal import sample_frames
    from gee_datapipeline_spark.functions.videocodec import encode_y4m

    fills = [10, 200, 77]
    frames = np.stack(
        [np.full((4, 6), v, dtype=np.uint8) for v in fills]
    )
    payload = encode_y4m(frames, fps=(25, 1), colorspace="420jpeg")
    media = spark.createDataFrame(
        [(1, "video", "video/x-yuv4mpeg", bytearray(payload), None, None,
          None, {})],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms int, meta map<string,string>",
    )
    rows = sorted(
        sample_frames(media, every_ms=40, fake=False).collect(),
        key=lambda r: r.frame_ts_ms,
    )
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert [r.frame_ts_ms for r in rows] == [0, 40, 80]
    assert [r.mean_y for r in rows] == [10.0, 200.0, 77.0]
    assert len({r.sha256 for r in rows}) == 3
    # corrupt payload → zero rows, no crash
    bad = spark.createDataFrame(
        [(2, "video", "video/x-yuv4mpeg", bytearray(payload[:-5]), None,
          None, None, {})],
        media.schema,
    )
    assert sample_frames(bad, every_ms=40, fake=False).count() == 0


# ------------------------------------------------------------- dHash


def test_dhash64_perceptual_invariance():
    """Same gradient structure at different resolution/contrast → same
    hash; flipping one comparison flips exactly one bit-block."""
    from gee_datapipeline_spark.functions.imagecodec import dhash64

    def seed_img(seed, kw, kh, step):
        vals = [128]
        for j in range(8):
            vals.append(vals[-1] - step if (seed >> j) & 1 else vals[-1] + step)
        col = np.repeat(np.array(vals, dtype=np.uint8), kw)
        return np.tile(col, (8 * kh, 1))

    for seed in (0, 5, 77, 127):
        want = seed * 0x0101010101010101
        got = {
            dhash64(seed_img(seed, kw, kh, step))
            for kw in (1, 2, 3)
            for kh in (1, 2)
            for step in (9, 15)
        }
        assert got == {want}
    assert dhash64(seed_img(1, 1, 1, 9)) != dhash64(seed_img(3, 1, 1, 9))


def test_dhash64_signed_range_and_color():
    """High-bit hashes wrap to negative int64 (BIGINT-safe); RGB goes
    through Rec.601 luma, constant images hash to 0."""
    from gee_datapipeline_spark.functions.imagecodec import dhash64

    # strictly decreasing ramp: every comparison true → all 64 bits set
    ramp = np.tile(np.arange(255, 120, -15, dtype=np.uint8), (8, 1))
    assert dhash64(ramp) == -1  # 0xFFFF... as signed
    rgb = np.zeros((8, 9, 3), dtype=np.uint8)
    rgb[:, :] = (10, 200, 30)
    assert dhash64(rgb) == 0


def test_image_dhash_sparkside(spark):
    """mapInPandas dhash: real PNG decode, corrupt payload → NULL hash."""
    from gee_datapipeline_spark.functions.imagecodec import encode_png
    from gee_datapipeline_spark.functions.multimodal import image_dhash

    img = np.tile(
        np.repeat(np.array([128, 137, 146, 155, 164, 173, 182, 191, 200],
                           dtype=np.uint8), 2),
        (8, 1),
    )  # seed 0 pattern (all ascending) → hash 0
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img))), (2, bytearray(b"not an image"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in image_dhash(media).collect()}
    assert rows[1].decode_ok and rows[1].dhash == 0
    assert rows[1].width == 18 and rows[1].height == 8
    assert not rows[2].decode_ok and rows[2].dhash is None


def test_geotiff_geokey_crs_tag_roundtrip():
    """The GeoKeyDirectory written by encode is read back by decode:
    projected EPSG as ProjectedCSTypeGeoKey, 4326 as a geographic key,
    untagged defaults to 4326."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    vals = np.array([[1.0, 2.0], [3.0, 4.0]])
    for epsg, expect in [
        (32643, "EPSG:32643"),
        (3978, "EPSG:3978"),
        (4326, "EPSG:4326"),
        (None, "EPSG:4326"),
    ]:
        out, _, _, _, crs = decode_geotiff(
            encode_geotiff(vals, 500000.0, 3160000.0, 1000.0, epsg=epsg)
        )
        assert crs == expect, (epsg, crs)
        assert (out == vals).all()  # GeoKeys must not disturb samples


def test_read_rasters_reprojects_utm_tagged_geotiff(spark, tmp_path):
    """A UTM-tagged GeoTIFF ingests to true lon/lat pixel rows — the
    reference's rasterio src.crs → EPSG:4326 warp (fix_transparency.py
    :71-74), now real in the ingest UDTF."""
    from gee_datapipeline_spark.functions.crs import utm_inverse_np
    from gee_datapipeline_spark.sources.raster import read_rasters
    from gee_datapipeline_spark.sources.tiffcodec import encode_geotiff

    vals = np.arange(12, dtype="f8").reshape(3, 4)
    min_e, min_n, cell = 500000.0, 3160000.0, 1000.0  # zone 43 CM, ~28.5N
    (tmp_path / "utm.tif").write_bytes(
        encode_geotiff(vals, min_e, min_n, cell, epsg=32643)
    )
    rows = read_rasters(spark, str(tmp_path / "utm.tif")).collect()
    assert len(rows) == 12
    for r in rows:
        e = min_e + (r.x + 0.5) * cell
        n = min_n + (r.y + 0.5) * cell
        lon, lat = utm_inverse_np(np.array([e]), np.array([n]), 43)
        assert r.lon == pytest.approx(lon[0], abs=1e-9)
        assert r.lat == pytest.approx(lat[0], abs=1e-9)
        # easting 500-504 km sits on zone 43's central meridian (75°E)
        assert 74.9 < r.lon < 75.2 and 28.4 < r.lat < 28.7
        assert r.value == vals[r.y, r.x]


def test_read_rasters_unknown_crs_identity_fallback(spark, tmp_path):
    """An unsupported projected CRS falls back to identity coordinates
    — exactly the reference's except-branch behavior ("use original
    coordinates", fix_transparency.py:73-74) — instead of failing the
    ingest job."""
    from gee_datapipeline_spark.sources.raster import read_rasters
    from gee_datapipeline_spark.sources.tiffcodec import encode_geotiff

    vals = np.array([[7.0, 8.0]])
    # EPSG:27700 (British National Grid) is not implemented
    (tmp_path / "bng.tif").write_bytes(
        encode_geotiff(vals, 400000.0, 100000.0, 1000.0, epsg=27700)
    )
    rows = read_rasters(spark, str(tmp_path / "bng.tif")).collect()
    assert {(r.lon, r.lat) for r in rows} == {
        (400500.0, 100500.0),
        (401500.0, 100500.0),
    }


def test_geotiff_roundtrip_fuzz():
    """Hypothesis sweep over the encode/decode matrix: random shapes
    (incl. 1-pixel edges and non-tile-aligned dims), NaN patches,
    nodata sentinels, strip/tile layouts, DEFLATE on/off, tagged and
    untagged CRS — every combination must roundtrip bit-exactly.
    Budget rides SPARK_GRAFT_FUZZ_EXAMPLES like the other harnesses."""
    import os

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gee_datapipeline_spark.sources.tiffcodec import (
        decode_geotiff,
        encode_geotiff,
    )

    budget = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0")) or 25

    @settings(max_examples=budget, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        nb=st.sampled_from([1, 2, 3, 5]),
        seed=st.integers(0, 2**31 - 1),
        nan_frac=st.sampled_from([0.0, 0.1, 0.9]),
        nodata=st.sampled_from([None, -9999.0]),
        tile=st.sampled_from([None, 16, 32]),
        compress=st.sampled_from([None, "deflate", "lzw", "packbits"]),
        dtype=st.sampled_from(["f8", "f4"]),
        epsg=st.sampled_from([None, 4326, 32643]),
    )
    def _case(h, w, nb, seed, nan_frac, nodata, tile, compress, epsg,
              dtype):
        rng = np.random.default_rng(seed)
        # nb=1 goes through the legacy 2-D path; nb>1 through the
        # SamplesPerPixel>1 chunky interleave (both encode and decode)
        shape = (h, w) if nb == 1 else (nb, h, w)
        vals = rng.uniform(-1e6, 1e6, size=shape)
        vals[rng.random(shape) < nan_frac] = np.nan
        blob = encode_geotiff(
            vals, 76.85, 28.2, 0.009,
            nodata=nodata, epsg=epsg, compress=compress, tile=tile,
            dtype=dtype,
        )
        got, min_x, min_y, cell, crs = decode_geotiff(blob)
        assert got.shape == shape
        if dtype == "f4":
            vals = vals.astype("<f4").astype(np.float64)
        # bit-exact incl. NaN placement
        assert np.array_equal(
            got.view("u8"), np.asarray(vals, "<f8").view("u8")
        ) or (
            # nodata substitution maps NaN -> nodata -> NaN: values
            # equal where finite, NaN where NaN
            np.array_equal(np.isnan(got), np.isnan(vals))
            and np.array_equal(got[~np.isnan(got)], vals[~np.isnan(vals)])
        )
        # the transform roundtrips through the top-edge tiepoint
        # (min_y + h*cell - h*cell), so min_y can wobble an ulp — the
        # same representation rasterio/GDAL use; values stay bit-exact
        assert (min_x, cell) == (76.85, 0.009)
        assert abs(min_y - 28.2) < 1e-9
        assert crs == f"EPSG:{epsg or 4326}"

    _case()


def test_lzw_hand_vector():
    """Decoder vs a hand-derived TIFF-LZW stream (MSB-first 9-bit
    codes, computed on paper for [7,7,7,8,8,7]):
    CLEAR,7,258,8,8,7,EOI -> 80 01 E0 40 80 40 1E 02. Catches
    bit-order / framing bugs a self-roundtrip cannot."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _lzw_decode,
        _lzw_encode,
    )

    blob = bytes([0x80, 0x01, 0xE0, 0x40, 0x80, 0x40, 0x1E, 0x02])
    assert _lzw_decode(blob) == bytes([7, 7, 7, 8, 8, 7])
    # the encoder reproduces the identical canonical stream
    assert _lzw_encode(bytes([7, 7, 7, 8, 8, 7])) == blob


def test_lzw_width_boundaries_exhaustive():
    """Roundtrip a dense sweep of input lengths that land the code
    table exactly on / around every early-change boundary (511, 1023,
    2047) and across the 4094-entry reset — the off-by-one minefield
    of TIFF's early-change rule, including the endgame case where the
    decoder catches up at the flush code."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _lzw_decode,
        _lzw_encode,
    )

    # all-distinct-pairs generator: one table add per byte
    def cyc(n, stride=1):
        return bytes((i * stride + (i * i % 251)) % 256 for i in range(n))

    lengths = (
        list(range(240, 280))      # around the 511 boundary (253 adds)
        + list(range(750, 790))    # around 1023
        + list(range(1780, 1820))  # around 2047
        + [5000, 20000, 100000]    # multiple resets
    )
    for n in lengths:
        for stride in (1, 7):
            raw = cyc(n, stride)
            assert _lzw_decode(_lzw_encode(raw)) == raw, (n, stride)
    # highly repetitive data (few adds, long matches) + random bytes
    import numpy as np

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 1000, 65536):
        rep = (b"\x07\x07\x08" * (n // 3 + 1))[:n]
        assert _lzw_decode(_lzw_encode(rep)) == rep
        rnd = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(rnd)) == rnd


def test_geotiff_lzw_predictor3_decode():
    """GDAL's default float layout for LZW/DEFLATE files: PREDICTOR=3
    + COMPRESS=LZW composed — byte-plane differencing under an LZW
    segment, the exact shape `gdal_translate -co COMPRESS=LZW -co
    PREDICTOR=3` writes. Exercises the lzw_decode → predictor-undo
    composition inside one strip."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _lzw_encode,
        decode_geotiff,
    )

    rng = np.random.default_rng(5)
    fvals = rng.uniform(-100, 100, size=(6, 9)).astype("<f4")
    h, w = fvals.shape
    rowbytes = np.frombuffer(
        fvals.astype(">f4").tobytes(), dtype=np.uint8
    ).reshape(h, w, 4)
    planes = rowbytes.transpose(0, 2, 1).reshape(h, w * 4)
    d = planes.astype(np.int16)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    seg = _lzw_encode(d.astype(np.uint8).tobytes())
    out, *_ = decode_geotiff(_build_tiff(seg, w, h, 32, 3, 5, 3))
    assert np.allclose(out[::-1], fvals.astype(np.float64))


def test_geotiff_lzw_predictor2_decode():
    """PREDICTOR=2 + COMPRESS=LZW on int16 samples — the integer twin
    of the float composition above."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _lzw_encode,
        decode_geotiff,
    )

    rng = np.random.default_rng(6)
    vals = rng.integers(-500, 500, size=(8, 5)).astype("<i2")
    diff = vals.copy()
    diff[:, 1:] = (
        vals.view("<u2")[:, 1:] - vals.view("<u2")[:, :-1]
    ).view("<i2")
    tif = _build_tiff(_lzw_encode(diff.tobytes()), 5, 8, 16, 2, 5, 2)
    out, *_ = decode_geotiff(tif)
    assert np.array_equal(out[::-1], vals.astype(np.float64))


def test_geotiff_predictor2_multiband_decode():
    """PREDICTOR=2 with SamplesPerPixel=2 — TIFF 6.0 §14 differencing
    strides by the sample count on chunky rows (sample[i] minus
    sample[i-spp], per channel), so an interleaved cumsum would corrupt
    every band. Hand-differenced encode, exact decode."""
    from gee_datapipeline_spark.sources.tiffcodec import decode_geotiff

    rng = np.random.default_rng(9)
    h, w, spp = 4, 6, 2
    cube = rng.integers(-900, 900, size=(spp, h, w)).astype("<i4")
    inter = (
        np.ascontiguousarray(cube.transpose(1, 2, 0)).reshape(h, w * spp)
    )
    diff = inter.copy()
    diff[:, spp:] = (
        inter.view("<u4")[:, spp:] - inter.view("<u4")[:, :-spp]
    ).view("<i4")
    tif = _build_tiff(
        zlib.compress(diff.tobytes()), w, h, 32, 2, 8, 2, spp=spp
    )
    out, *_ = decode_geotiff(tif)
    assert out.shape == (spp, h, w)
    assert np.array_equal(out[:, ::-1, :], cube.astype(np.float64))


def test_geotiff_planar_config_2_rejected():
    """PlanarConfiguration 2 (per-band planes) must fail loudly, not
    silently mis-interleave."""
    from gee_datapipeline_spark.sources.tiffcodec import decode_geotiff

    seg = np.zeros((2, 3 * 2), dtype="<f8").tobytes()
    tif = _build_tiff(seg, 3, 2, 64, 3, 1, 1, spp=2, planar=2)
    with pytest.raises(ValueError, match="PlanarConfiguration 2"):
        decode_geotiff(tif)


def test_packbits_tn1023_vector():
    """Decoder vs the canonical Apple TN1023 worked example; encoder
    reproduces a stream that decodes to the same bytes."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _packbits_decode,
        _packbits_encode_row,
    )

    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    assert len(want) == 24
    assert _packbits_decode(packed, 24) == want
    out = _packbits_encode_row(want)
    assert _packbits_decode(out, 24) == want


def test_packbits_row_roundtrip_edges():
    """Runs >128, 128-literal chunking, alternating bytes, empty and
    1-byte rows all roundtrip."""
    from gee_datapipeline_spark.sources.tiffcodec import (
        _packbits_decode,
        _packbits_encode_row,
    )

    cases = [
        b"",
        b"\x07",
        b"\xab" * 1000,
        bytes(range(256)) * 3,
        b"\x01\x02" * 300,
        b"\x00" * 2 + b"\x01" * 3 + b"\x02" * 2,
    ]
    import numpy as np

    rng = np.random.default_rng(11)
    cases += [rng.integers(0, 4, n, dtype=np.uint8).tobytes()
              for n in (13, 129, 257, 4096)]
    for raw in cases:
        enc = _packbits_encode_row(raw)
        assert _packbits_decode(enc, len(raw)) == raw, raw[:20]


def test_read_rasters_anisotropic_cells(spark, tmp_path):
    """sx != sy GeoTIFFs (GDAL exports aren't always square) surface as
    a (sx, sy) cell and the ingest centers use the per-axis scale."""
    from gee_datapipeline_spark.sources.raster import read_rasters
    from gee_datapipeline_spark.sources.tiffcodec import encode_geotiff

    vals = np.arange(12, dtype="float64").reshape(3, 4)
    (tmp_path / "a.tif").write_bytes(
        encode_geotiff(vals, 70.0, 20.0, (0.25, 0.5))
    )
    rows = read_rasters(spark, str(tmp_path / "*.tif")).collect()
    assert len(rows) == 12
    got = {(r.x, r.y): (r.lon, r.lat, r.value) for r in rows}
    for y in range(3):
        for x in range(4):
            lon, lat, v = got[(x, y)]
            assert lon == 70.0 + (x + 0.5) * 0.25
            assert lat == 20.0 + (y + 0.5) * 0.5
            assert v == vals[y, x]
