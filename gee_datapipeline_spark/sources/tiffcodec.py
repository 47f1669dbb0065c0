"""Pure-Python GeoTIFF codec (strips + tiles, none/LZW/DEFLATE/PackBits).

The reference reads materialized GeoTIFFs with rasterio
(``rasterio.open(path); src.read(1)`` — DataDownloader_V1.py:39,57;
fix_transparency.py:11-12 reads arbitrary rasterio-supported files) and
its own exports are plain uncompressed single-band rasters
(DataDownloader_V1.py:149) — but real-world GEE exports (e.g. typical
``geemap.ee_export_image`` output) are routinely DEFLATE-compressed and
often tiled. rasterio is absent in this container, but a TIFF is just a
tag directory + sample segments (public TIFF 6.0 + Technical Note 3 +
GeoTIFF specs) and DEFLATE is stdlib ``zlib``, so the subset real
exports use is implemented here with ``struct`` + ``zlib`` + NumPy —
making the S3 ingest path real with no injected decoder.

Surface:
- decode: II/MM byte order; compression 1 (none), 5 (LZW, TIFF 6.0
  §13 early-change variant), 8/32946 (zlib/AdobeDeflate), 32773
  (PackBits); predictor 1 (none), 2 (horizontal differencing,
  integer samples, spp-strided), 3 (floating-point byte-plane, TIFF
  TechNote 3); strip (273/278/279) AND tile (322/323/324/325)
  layouts; SamplesPerPixel >= 1 with chunky PlanarConfiguration
  (planar=2 rejected loudly) — multi-band files return a
  (bands, h, w) cube, single-band keeps the 2-D contract; sample
  formats uint/int/float at 8/16/32/64 bits; ModelPixelScale (33550,
  anisotropic sx != sy returned as a (sx, sy) cell tuple) +
  ModelTiepoint (33922) georeferencing; GDAL_NODATA (42113) → NaN.
- encode: little-endian float64/float32, 2-D single-band or 3-D
  (bands, h, w) chunky multi-band, square or (sx, sy) anisotropic
  cells, top-left tiepoint, with optional ``compress="deflate"`` /
  ``"lzw"`` / ``"packbits"`` and/or ``tile=<edge>`` layouts — the
  shapes GDAL writes for the reference's exports and for
  ``-co COMPRESS={DEFLATE,LZW,PACKBITS} -co TILED=YES`` ones.

Orientation contract (matches ``raster.read_rasters``): decoded arrays
have row 0 at the SOUTH edge — ``lat = min_lat + (y + 0.5) * cell`` —
so the decoder flips the TIFF's top-down rows and the encoder flips
them back.
"""

from __future__ import annotations

import struct
import zlib

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
_TAG_PLANAR_CONFIG = 284  # 1 = chunky (interleaved), 2 = planar
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTES = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GEO_KEYS = 34735  # GeoKeyDirectory (GeoTIFF 1.0 §4.1)
_TAG_GDAL_NODATA = 42113

_GEOKEY_GT_MODEL = 1024       # 1 = projected, 2 = geographic
_GEOKEY_GEOGRAPHIC_CS = 2048  # GeographicTypeGeoKey (EPSG geographic)
_GEOKEY_PROJECTED_CS = 3072   # ProjectedCSTypeGeoKey (EPSG projected)
_GEOKEY_USER_DEFINED = 32767


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW (MSB-first codes, ClearCode 256, EOI 257,
    early code-width change): the other compression GDAL routinely
    writes (``-co COMPRESS=LZW``). Pure Python; segments are
    strip/tile-sized so the per-call cost is bounded."""
    out = bytearray()
    table: list[bytes] = []
    prev = b""
    nbits = 9
    acc = bit = 0
    pos = 0
    n = len(data)
    while True:
        while bit < nbits:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate, like libtiff
            acc = (acc << 8) | data[pos]
            pos += 1
            bit += 8
        code = (acc >> (bit - nbits)) & ((1 << nbits) - 1)
        bit -= nbits
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream does not start with ClearCode")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev:
            table.append(prev + entry[:1])
        prev = entry
        # early change: width grows when the NEXT add fills 2^nbits - 1
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (the exact dual of ``_lzw_decode``:
    MSB-first, early change, table reset at 4094 entries)."""
    out = bytearray()
    acc = bit = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bit
        acc = (acc << width) | code
        bit += width
        while bit >= 8:
            out.append((acc >> (bit - 8)) & 0xFF)
            bit -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nbits = 9
    emit(_LZW_CLEAR, nbits)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], nbits)
        table[wc] = len(table) + 2  # +2 for CLEAR/EOI slots
        # The decoder's table is one entry BEHIND (it reconstructs this
        # add only while processing the NEXT code), so with the TIFF
        # early-change rule (decoder widens when ITS table hits
        # 2^nbits - 1) the encoder widens when its virtual table hits
        # 2^nbits. Reset at 4094 entries, where libtiff's writer does.
        vlen = len(table) + 2
        if vlen >= 4094:
            emit(_LZW_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            nbits = 9
        elif vlen >= (1 << nbits):
            nbits += 1
        w = bytes([byte])
    if w:
        emit(table[w], nbits)
    # the flush code adds no entry, so the decoder CATCHES UP to the
    # encoder's table size while processing it — if that size sits
    # exactly on 2^nbits - 1 the decoder widens before reading EOI and
    # the encoder must match (the endgame case of the early-change rule)
    if len(table) + 2 >= (1 << nbits) - 1 and nbits < 12:
        nbits += 1
    emit(_LZW_EOI, nbits)
    if bit:
        out.append((acc << (8 - bit)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (compression 32773, Apple TN1023 RLE): n < 128 →
    copy n+1 literals; n > 128 → repeat next byte 257-n times; 128 is
    a no-op. Rows are packed separately on encode, but the stream
    concatenation decodes linearly, so one pass per segment suffices —
    stop at the segment's expected byte count like libtiff does."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected and i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """One scanline → PackBits (runs of ≥3 become replicate packets;
    literals chunked at 128 bytes)."""
    out = bytearray()
    i = 0
    n = len(row)

    def runlen(at: int) -> int:
        r = 1
        while at + r < n and row[at + r] == row[at] and r < 128:
            r += 1
        return r

    while i < n:
        run = runlen(i)
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        start = i
        i += run
        while i < n and i - start < 128:
            run = runlen(i)
            if run >= 3:
                break
            i += run
        if i - start > 128:
            i = start + 128
        lit = row[start:i]
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


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


def _undo_predictor(
    seg: np.ndarray, predictor: int, dtype: np.dtype, spp: int = 1
):
    """Invert TIFF predictor on one decoded segment (rows × width,
    native-order samples). Predictor 2 is horizontal differencing on
    the integer sample ring (modular cumsum) — with SamplesPerPixel > 1
    the difference stride is ``spp`` (TIFF 6.0 §14: per-channel
    differencing on chunky rows), i.e. a per-channel cumsum; predictor
    3 (TechNote 3) is byte-level differencing over big-endian byte
    planes — undone by a uint8 cumsum, then de-interleaving the planes
    back into samples (the plane width is the full sample row, so it is
    spp-agnostic). Predictors apply per row, so whole segments
    vectorize in one shot."""
    if predictor == 2:
        if dtype.kind == "f":
            raise ValueError("predictor 2 is undefined for float samples")
        u = seg.view(np.dtype(f"u{dtype.itemsize}"))
        if spp > 1:
            ch = u.reshape(u.shape[0], -1, spp)
            return (
                np.cumsum(ch, axis=1, dtype=u.dtype)
                .reshape(u.shape)
                .view(seg.dtype)
            )
        return np.cumsum(u, axis=1, dtype=u.dtype).view(seg.dtype)
    # predictor 3: seg arrives as raw uint8 rows × (width·itemsize)
    b = np.cumsum(seg, axis=1, dtype=np.uint8)
    rows = b.shape[0]
    itemsize = dtype.itemsize
    width = b.shape[1] // itemsize
    planes = b.reshape(rows, itemsize, width)[:, ::-1, :]  # MSB-first → LSB
    le = np.ascontiguousarray(planes.transpose(0, 2, 1)).reshape(
        rows, width * itemsize
    )
    return le.view(np.dtype(f"<{dtype.kind}{itemsize}"))


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
    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(
            f"unsupported TIFF compression {comp}; codec reads "
            "uncompressed, LZW (5), DEFLATE (8/32946) or PackBits "
            "(32773) segments only"
        )
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    spp = tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    planar = tags.get(_TAG_PLANAR_CONFIG, [1])[0]
    if spp > 1 and planar != 1:
        raise ValueError(
            f"PlanarConfiguration {planar} (planar band storage) not "
            "supported; multi-band rasters must be chunky (1) — "
            "samples interleaved per pixel, the layout GDAL writes by "
            "default"
        )
    bits_all = tags.get(_TAG_BITS, [1])
    fmt_all = tags.get(_TAG_SAMPLE_FORMAT, [1])
    if len(set(bits_all)) != 1 or len(set(fmt_all)) != 1:
        raise ValueError(
            "mixed per-band sample types not supported "
            f"(bits={bits_all}, formats={fmt_all})"
        )
    bits = bits_all[0]
    fmt = fmt_all[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None or bits not in (8, 16, 32, 64) or (
        kind == "f" and bits < 32
    ):
        raise ValueError(f"unsupported sample format {fmt}/{bits}")
    dtype = np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")
    native = dtype.newbyteorder("=")
    itemsize = dtype.itemsize

    def segment(off: int, cnt: int, rows: int, width_px: int) -> np.ndarray:
        """One strip/tile → rows × (width_px·spp) native-order sample
        array (chunky layout: the samples of one pixel are adjacent)."""
        width = width_px * spp
        raw = data[off : off + cnt]
        if comp in (8, 32946):
            raw = zlib.decompress(raw)
        elif comp == 5:
            raw = _lzw_decode(raw)
        elif comp == 32773:
            raw = _packbits_decode(raw, rows * width * itemsize)
        raw = raw[: rows * width * itemsize]
        if predictor == 3:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(
                rows, width * itemsize
            )
            return _undo_predictor(b, 3, dtype).astype(native)
        a = (
            np.frombuffer(raw, dtype=dtype)
            .reshape(rows, width)
            .astype(native)
        )
        return _undo_predictor(a, 2, native, spp) if predictor == 2 else a

    if _TAG_TILE_OFFSETS in tags:
        tw = tags[_TAG_TILE_WIDTH][0]
        tl = tags[_TAG_TILE_LENGTH][0]
        across = -(-w // tw)
        offsets = tags[_TAG_TILE_OFFSETS]
        counts = tags[_TAG_TILE_BYTES]
        full = np.zeros((-(-h // tl) * tl, across * tw * spp), dtype=native)
        for idx, (o, c) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(idx, across)
            full[
                ty * tl : (ty + 1) * tl,
                tx * tw * spp : (tx + 1) * tw * spp,
            ] = segment(o, c, tl, tw)
        vals = full[:h, : w * spp].astype(np.float64)
    else:
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_BYTES]
        rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
        parts = [
            segment(o, c, min(rps, h - i * rps), w)
            for i, (o, c) in enumerate(zip(offsets, counts))
        ]
        vals = np.vstack(parts)[:h].astype(np.float64)

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
    # Anisotropic pixels (sx != sy — GDAL exports aren't always
    # square) surface as a (sx, sy) tuple in the cell slot; square
    # grids keep the historical scalar so existing decoders/callers
    # are untouched.
    cell = sx if abs(sx - sy) <= 1e-12 else (sx, sy)
    crs = _parse_geokeys(tags.get(_TAG_GEO_KEYS, []))
    # TIFF rows are top-down; our contract is row 0 = south
    if spp > 1:
        # chunky rows de-interleave to (bands, h, w); single-band keeps
        # the historical 2-D contract so existing decoders/callers are
        # untouched
        cube = np.ascontiguousarray(
            vals.reshape(h, w, spp)[::-1].transpose(2, 0, 1)
        )
        return cube, min_lon, min_lat, cell, crs
    return vals[::-1].copy(), min_lon, min_lat, cell, crs


def encode_geotiff(
    values: np.ndarray,
    min_lon: float,
    min_lat: float,
    cell_deg: float | tuple[float, float],
    nodata: float | None = None,
    epsg: int | None = None,
    compress: str | None = None,
    tile: int | None = None,
    dtype: str = "f8",
) -> bytes:
    """2-D array [row 0 = south] → little-endian GeoTIFF.

    float64 samples by default; ``dtype="f4"`` writes Float32 — the
    sample type real GEE exports use (half the bytes, values rounded
    to float32). NaN cells are written as ``nodata`` (default NaN
    itself, recorded in GDAL_NODATA so decode restores NaN). ``epsg``
    writes a GeoKeyDirectory (4326 as a geographic key, anything else
    as a projected key, in which case min_lon/min_lat/cell are that
    CRS's meters); None leaves the file untagged (= 4326 on decode).
    ``compress="deflate"`` zlib-compresses each segment (GDAL
    ``COMPRESS=DEFLATE``); ``tile=<edge>`` writes a tiled layout (GDAL
    ``TILED=YES``; edge must be a multiple of 16 per TIFF 6.0 §15) —
    edge tiles are padded with ``nodata`` (or NaN)."""
    if compress not in (None, "deflate", "lzw", "packbits"):
        raise ValueError(f"unsupported compress={compress!r}")
    if tile is not None and (tile <= 0 or tile % 16):
        raise ValueError("tile edge must be a positive multiple of 16")
    if dtype not in ("f4", "f8"):
        raise ValueError(f"unsupported dtype={dtype!r} (f4 or f8)")
    # anisotropic grids: (sx, sy) writes a non-square ModelPixelScale
    sx, sy = (
        (float(cell_deg[0]), float(cell_deg[1]))
        if isinstance(cell_deg, (tuple, list))
        else (float(cell_deg), float(cell_deg))
    )
    vals = np.asarray(values, dtype=f"<{dtype}")
    if vals.ndim == 2:
        spp = 1
        h, w = vals.shape
        top_down = vals[::-1]
    elif vals.ndim == 3:
        # (bands, h, w) → chunky interleave (PlanarConfiguration 1):
        # the multi-band shape geemap's file_per_band=False exports
        # take (DataDownloader_V1.py:149 option surface)
        spp, h, w = vals.shape
        top_down = np.ascontiguousarray(
            vals.transpose(1, 2, 0)[::-1].reshape(h, w * spp)
        )
    else:
        raise ValueError(
            "encode_geotiff wants a 2-D (h, w) or 3-D (bands, h, w) array"
        )
    if nodata is not None:
        # A nodata outside the target dtype's range (doubles like
        # -1e300 appear as GDAL sentinels) would silently promote the
        # strip payload to float64 under NumPy value-based promotion
        # while the BitsPerSample tag still says 32 — corrupt file.
        # Validate, then pin the dtype after substitution.
        with np.errstate(over="ignore"):
            cast_nd = np.asarray(nodata, dtype=f"<{dtype}")
        if not np.isfinite(cast_nd) and np.isfinite(nodata):
            raise ValueError(
                f"nodata={nodata!r} is not representable in {dtype}"
            )
        top_down = np.where(np.isnan(top_down), nodata, top_down).astype(
            vals.dtype, copy=False
        )
    top_down = np.ascontiguousarray(top_down)
    comp_id = {None: 1, "deflate": 8, "lzw": 5, "packbits": 32773}[
        compress
    ]

    def pack(seg: np.ndarray) -> bytes:
        raw = seg.tobytes()
        if compress == "deflate":
            return zlib.compress(raw)
        if compress == "lzw":
            return _lzw_encode(raw)
        if compress == "packbits":
            rb = seg.shape[1] * seg.dtype.itemsize
            return b"".join(
                _packbits_encode_row(raw[r * rb : (r + 1) * rb])
                for r in range(seg.shape[0])
            )
        return raw

    segments: list[bytes] = []
    if tile is not None:
        pad = np.float64("nan") if nodata is None else float(nodata)
        down, across = -(-h // tile), -(-w // tile)
        # tile columns are sliced in SAMPLE units (tile·spp) so chunky
        # multi-band pixels never split across tiles
        padded = np.full(
            (down * tile, across * tile * spp), pad, dtype=f"<{dtype}"
        )
        padded[:h, : w * spp] = top_down
        for ty in range(down):
            for tx in range(across):
                segments.append(
                    pack(
                        np.ascontiguousarray(
                            padded[
                                ty * tile : (ty + 1) * tile,
                                tx * tile * spp : (tx + 1) * tile * spp,
                            ]
                        )
                    )
                )
    else:
        segments.append(pack(top_down))
    data = b"".join(segments)
    max_lat = min_lat + h * sy

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
    # Per-band SHORT arrays (BitsPerSample / SampleFormat must carry
    # spp entries, TIFF 6.0 §6): 1–2 shorts pack inline in the 4-byte
    # value slot; 3+ go to an external block.
    bits_vals = [vals.dtype.itemsize * 8] * spp
    fmt_vals = [3] * spp  # IEEE float
    extra_s = b""
    if 2 * spp > 4:
        extra_s = struct.pack(f"<{spp}H", *bits_vals) + struct.pack(
            f"<{spp}H", *fmt_vals
        )
    # layout: header(8) | pixel data | doubles block | nodata ascii |
    #         geokey shorts | per-band shorts | segment offset/count
    #         arrays | IFD
    data_off = 8
    scale_off = data_off + len(data)
    tie_off = scale_off + 3 * 8
    nodata_off = tie_off + 6 * 8
    geo_off = nodata_off + len(nodata_s)
    extra_off = geo_off + len(geo_s)
    seg_arr_off = extra_off + len(extra_s)

    nseg = len(segments)
    seg_offsets: list[int] = []
    pos = data_off
    for s in segments:
        seg_offsets.append(pos)
        pos += len(s)
    seg_counts = [len(s) for s in segments]
    # LONG arrays: inline when a single segment fits the 4-byte slot,
    # else an external block right before the IFD.
    if nseg == 1:
        off_val, cnt_val = seg_offsets[0], seg_counts[0]
        seg_arrays = b""
        ifd_off = seg_arr_off
    else:
        off_val = seg_arr_off
        cnt_val = seg_arr_off + 4 * nseg
        seg_arrays = struct.pack(
            f"<{nseg}I", *seg_offsets
        ) + struct.pack(f"<{nseg}I", *seg_counts)
        ifd_off = seg_arr_off + len(seg_arrays)

    if 2 * spp > 4:
        bits_entry = (_TAG_BITS, 3, spp, extra_off)
        fmt_entry = (_TAG_SAMPLE_FORMAT, 3, spp, extra_off + 2 * spp)
    else:
        bits_entry = (_TAG_BITS, 3, spp, bits_vals)
        fmt_entry = (_TAG_SAMPLE_FORMAT, 3, spp, fmt_vals)
    entries = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        bits_entry,
        (_TAG_COMPRESSION, 3, 1, comp_id),
        (262, 3, 1, 1),  # photometric: BlackIsZero
        (_TAG_SAMPLES_PER_PIXEL, 3, 1, spp),
        fmt_entry,
        (_TAG_MODEL_PIXEL_SCALE, 12, 3, scale_off),
        (_TAG_MODEL_TIEPOINT, 12, 6, tie_off),
        (_TAG_GDAL_NODATA, 2, len(nodata_s), nodata_off),
    ]
    if spp > 1:
        entries.append((_TAG_PLANAR_CONFIG, 3, 1, 1))  # chunky
    if tile is not None:
        entries += [
            (_TAG_TILE_WIDTH, 4, 1, tile),
            (_TAG_TILE_LENGTH, 4, 1, tile),
            (_TAG_TILE_OFFSETS, 4, nseg, off_val),
            (_TAG_TILE_BYTES, 4, nseg, cnt_val),
        ]
    else:
        entries += [
            (_TAG_STRIP_OFFSETS, 4, nseg, off_val),
            (_TAG_ROWS_PER_STRIP, 4, 1, h),
            (_TAG_STRIP_BYTES, 4, nseg, cnt_val),
        ]
    if geokeys:
        entries.append((_TAG_GEO_KEYS, 3, len(geokeys), geo_off))
    ifd = struct.pack("<H", len(entries))
    for tag, ftype, count, value in sorted(entries):
        size = _TYPE_SIZE[ftype] * count
        if size <= 4:
            seq = value if isinstance(value, (list, tuple)) else [value]
            inline = (
                b"".join(
                    struct.pack("<" + _TYPE_FMT[ftype], v) for v in seq
                )
                + b"\x00" * 4
            )[:4]
        else:
            inline = struct.pack("<I", value)
        ifd += struct.pack("<HHI", tag, ftype, count) + inline
    ifd += struct.pack("<I", 0)  # no next IFD

    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + data
        + struct.pack("<3d", sx, sy, 0.0)
        + struct.pack("<6d", 0.0, 0.0, 0.0, min_lon, max_lat, 0.0)
        + nodata_s
        + geo_s
        + extra_s
        + seg_arrays
        + ifd
    )
