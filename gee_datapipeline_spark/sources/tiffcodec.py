"""Pure-Python GeoTIFF codec (uncompressed strips).

The reference reads materialized GeoTIFFs with rasterio
(``rasterio.open(path); src.read(1)`` — DataDownloader_V1.py:39,57) and
its own exports are plain uncompressed single-band rasters
(DataDownloader_V1.py:149). rasterio is absent in this container, but an
uncompressed TIFF is just a tag directory + raw sample strips (public
TIFF 6.0 + GeoTIFF specs), so the subset the reference actually produces
and consumes is implemented here with ``struct`` + NumPy — making the S3
ingest path real with no injected decoder.

Surface:
- decode: II/MM byte order; compression 1 (none); one sample per pixel;
  sample formats uint/int/float at 8/16/32/64 bits; multiple strips;
  ModelPixelScale (33550) + ModelTiepoint (33922) georeferencing;
  GDAL_NODATA (42113) → NaN.
- encode: little-endian, single-band float32/float64, one strip per
  row block, top-left tiepoint — the shape GDAL writes for the
  reference's exports.

Orientation contract (matches ``raster.read_rasters``): decoded arrays
have row 0 at the SOUTH edge — ``lat = min_lat + (y + 0.5) * cell`` —
so the decoder flips the TIFF's top-down rows and the encoder flips
them back.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF field types we touch: id → (struct fmt char, size)
_TYPE_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 12: "d"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GEO_KEYS = 34735  # GeoKeyDirectory (GeoTIFF 1.0 §4.1)
_TAG_GDAL_NODATA = 42113

_GEOKEY_GT_MODEL = 1024       # 1 = projected, 2 = geographic
_GEOKEY_GEOGRAPHIC_CS = 2048  # GeographicTypeGeoKey (EPSG geographic)
_GEOKEY_PROJECTED_CS = 3072   # ProjectedCSTypeGeoKey (EPSG projected)
_GEOKEY_USER_DEFINED = 32767


def _parse_geokeys(shorts: list) -> str:
    """GeoKeyDirectory SHORT array → ``EPSG:<code>`` (projected key
    wins over geographic, mirroring how rasterio reports ``src.crs``);
    absent/user-defined keys default to EPSG:4326 — the assumption the
    pre-GeoTIFF ingest made implicitly, now explicit."""
    proj = geog = None
    if len(shorts) >= 4:
        nkeys = int(shorts[3])
        for k in range(nkeys):
            base = 4 + 4 * k
            if base + 3 >= len(shorts):
                break
            kid, loc, _cnt, val = (int(v) for v in shorts[base:base + 4])
            if loc != 0:  # value stored in another tag — not EPSG ids
                continue
            if kid == _GEOKEY_PROJECTED_CS:
                proj = val
            elif kid == _GEOKEY_GEOGRAPHIC_CS:
                geog = val
    for code in (proj, geog):
        if code and code != _GEOKEY_USER_DEFINED:
            return f"EPSG:{code}"
    return "EPSG:4326"


def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, list]:
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(bo + "HHI", data, base)
        if ftype not in _TYPE_FMT:
            continue
        size = _TYPE_SIZE[ftype] * count
        if size <= 4:
            payload = data[base + 8 : base + 8 + size]
        else:
            (ptr,) = struct.unpack_from(bo + "I", data, base + 8)
            payload = data[ptr : ptr + size]
        if ftype == 2:  # ASCII, NUL-terminated
            tags[tag] = [payload.split(b"\x00")[0].decode("ascii", "replace")]
        else:
            tags[tag] = list(
                struct.unpack(bo + _TYPE_FMT[ftype] * count, payload)
            )
    return tags


def decode_geotiff(data: bytes):
    """GeoTIFF bytes → (values 2-D float64 [row 0 = south], min_x,
    min_y, cell, crs). NoData becomes NaN.

    ``crs`` comes from the GeoKeyDirectory (``EPSG:<code>``; defaults
    to EPSG:4326 when untagged) and the grid coordinates are in that
    CRS's units — degrees for geographic, meters for projected. The
    ingest layer (``sources.raster.read_rasters``) reprojects pixel
    centers to lon/lat, the same division of labor as the reference's
    rasterio read + ``rasterio.warp.transform`` pass
    (fix_transparency.py:54-74)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    tags = _read_ifd(data, bo, ifd_off)

    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise ValueError(
            f"unsupported TIFF compression {comp}; codec reads "
            "uncompressed strips only"
        )
    spp = tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    if spp != 1:
        raise ValueError("codec reads single-band rasters only")
    bits = tags.get(_TAG_BITS, [1])[0]
    fmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None or bits not in (8, 16, 32, 64) or (
        kind == "f" and bits < 32
    ):
        raise ValueError(f"unsupported sample format {fmt}/{bits}")
    dtype = np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")

    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_BYTES]
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    vals = (
        np.frombuffer(raw, dtype=dtype, count=h * w)
        .reshape(h, w)
        .astype(np.float64)
    )

    nodata = tags.get(_TAG_GDAL_NODATA)
    if nodata:
        try:
            nd = float(nodata[0])
        except ValueError:
            nd = None
        if nd is not None:
            vals = np.where(
                np.isnan(vals) if np.isnan(nd) else vals == nd, np.nan, vals
            )

    scale = tags.get(_TAG_MODEL_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(_TAG_MODEL_TIEPOINT, [0.0] * 6)
    sx, sy = float(scale[0]), float(scale[1])
    i, j, _, x, y, _ = (float(v) for v in tie[:6])
    # tiepoint maps raster (i, j) [usually 0,0 = top-left] to (x, y)
    min_lon = x - i * sx
    max_lat = y + j * sy
    min_lat = max_lat - h * sy
    if abs(sx - sy) > 1e-12:
        raise ValueError("anisotropic pixels not supported (sx != sy)")
    crs = _parse_geokeys(tags.get(_TAG_GEO_KEYS, []))
    # TIFF rows are top-down; our contract is row 0 = south
    return vals[::-1].copy(), min_lon, min_lat, sx, crs


def encode_geotiff(
    values: np.ndarray,
    min_lon: float,
    min_lat: float,
    cell_deg: float,
    nodata: float | None = None,
    epsg: int | None = None,
) -> bytes:
    """2-D array [row 0 = south] → little-endian uncompressed GeoTIFF.

    float64 samples; NaN cells are written as ``nodata`` (default NaN
    itself, recorded in GDAL_NODATA so decode restores NaN). ``epsg``
    writes a GeoKeyDirectory (4326 as a geographic key, anything else
    as a projected key, in which case min_lon/min_lat/cell are that
    CRS's meters); None leaves the file untagged (= 4326 on decode)."""
    vals = np.asarray(values, dtype="<f8")
    if vals.ndim != 2:
        raise ValueError("encode_geotiff wants a 2-D array")
    h, w = vals.shape
    top_down = vals[::-1]
    if nodata is not None:
        top_down = np.where(np.isnan(top_down), nodata, top_down)
    data = np.ascontiguousarray(top_down).tobytes()
    max_lat = min_lat + h * cell_deg

    # space-padded to ≥5 bytes so the ASCII tag always takes the
    # offset form (inline packing below handles numerics only)
    nodata_txt = "nan" if nodata is None else f"{nodata:g}"
    nodata_s = nodata_txt.ljust(4).encode("ascii") + b"\x00"
    geokeys: list[int] = []
    if epsg is not None:
        cs_key = (
            (_GEOKEY_GEOGRAPHIC_CS, 2)
            if epsg == 4326
            else (_GEOKEY_PROJECTED_CS, 1)
        )
        geokeys = [
            1, 1, 0, 2,                       # directory header, 2 keys
            _GEOKEY_GT_MODEL, 0, 1, cs_key[1],
            cs_key[0], 0, 1, epsg,
        ]
    geo_s = struct.pack(f"<{len(geokeys)}H", *geokeys)
    # layout: header(8) | pixel data | doubles block | nodata ascii |
    #         geokey shorts | IFD
    data_off = 8
    scale_off = data_off + len(data)
    tie_off = scale_off + 3 * 8
    nodata_off = tie_off + 6 * 8
    geo_off = nodata_off + len(nodata_s)
    ifd_off = geo_off + len(geo_s)

    entries = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (_TAG_BITS, 3, 1, 64),
        (_TAG_COMPRESSION, 3, 1, 1),
        (262, 3, 1, 1),  # photometric: BlackIsZero
        (_TAG_STRIP_OFFSETS, 4, 1, data_off),
        (_TAG_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_BYTES, 4, 1, len(data)),
        (_TAG_SAMPLE_FORMAT, 3, 1, 3),  # IEEE float
        (_TAG_MODEL_PIXEL_SCALE, 12, 3, scale_off),
        (_TAG_MODEL_TIEPOINT, 12, 6, tie_off),
        (_TAG_GDAL_NODATA, 2, len(nodata_s), nodata_off),
    ]
    if geokeys:
        entries.append((_TAG_GEO_KEYS, 3, len(geokeys), geo_off))
    ifd = struct.pack("<H", len(entries))
    for tag, ftype, count, value in sorted(entries):
        size = _TYPE_SIZE[ftype] * count
        if size <= 4:
            inline = (
                struct.pack("<" + _TYPE_FMT[ftype], value) + b"\x00" * 4
            )[:4]
        else:
            inline = struct.pack("<I", value)
        ifd += struct.pack("<HHI", tag, ftype, count) + inline
    ifd += struct.pack("<I", 0)  # no next IFD

    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + data
        + struct.pack("<3d", cell_deg, cell_deg, 0.0)
        + struct.pack("<6d", 0.0, 0.0, 0.0, min_lon, max_lat, 0.0)
        + nodata_s
        + geo_s
        + ifd
    )
