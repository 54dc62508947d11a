"""TIFF 6.0 container + EXIF — the scanned-document / camera-metadata
tier of the image family (VERDICT r11 "What's missing" #3). Charter
extension (SURVEY.md §2.10; reference analog: none).

Clean-room from the PUBLIC Adobe TIFF 6.0 specification (June 1992)
and the CIPA EXIF layout (which is literally the TIFF IFD structure
embedded in a JPEG APP1 segment after an ``Exif\\0\\0`` prologue):

- byte-order prologue ``II*\\0`` / ``MM\\0*`` (both endiannesses),
  the IFD chain (12-byte entries: tag, type, count, value-or-offset;
  values wider than 4 bytes stored out-of-line), multi-page files;
- baseline decode to (h, w, 3) uint8 RGB for 8-bit grayscale
  (PhotometricInterpretation 0/1, WhiteIsZero inverted), RGB (2) and
  palette (3, 16-bit ColorMap scaled to 8), in STRIP and TILE
  layouts, PlanarConfiguration 1 (chunky) and 2 (planar strips);
- Compression 1 (none), 32773 (PackBits — the spec's §9 run-length
  byte code) and 5 (TIFF-LZW — §13: MSB-first bit packing, 9→12-bit
  codes, Clear=256/EOI=257, EARLY code-width change one code before
  the table fills — the documented divergence from GIF's LZW) with
  Predictor 2 (horizontal differencing, §14);
- EXIF: :func:`parse_exif` finds the APP1 ``Exif\\0\\0`` segment in a
  JPEG and reads IFD0 (Make/Model/Orientation/DateTime), the Exif
  sub-IFD (ExposureTime/FNumber/ISO/DateTimeOriginal/FocalLength/
  pixel dims) and the GPS IFD (rational D-M-S lat/lon) with the SAME
  IFD machinery; :func:`exif_app1` builds such a segment so fixture
  JPEGs carry pinned camera metadata.

ADR-gated (documented, not guessed): CCITT G3/G4 (Compression 2/3/4)
and JBIG2 carry published FIXED CODE TABLES whose transcription
errors would self-confirm through this repo's own fixtures — the
same gate as H.264/AAC (operators/mp4.py:1231 precedent); JPEG-in-
TIFF (Compression 6/7) routes real corpora through the existing
:mod:`.jpeg` codec at the file level instead. Non-8-bit sample
depths beyond the 1-bit bilevel common in faxes are refused as S4.

Spark surface: :func:`tiff_meta` is the usual map-only Arrow kernel;
full-pixel decode rides the existing ``decode_image`` dispatch
(operators/multimodal.py) so TIFF lands on the driver-checked
``multimodal_image_decode`` golden row like every other codec.
"""

from __future__ import annotations

import struct

_MAX_IFDS = 64
_MAX_ENTRIES = 4096
_MAX_PIXELS = 1 << 26  # bomb cap ≈ 64 MP ≈ 192 MB RGB

# type code → (struct letter or None, byte size)
_TYPES = {
    1: ("B", 1), 2: (None, 1), 3: ("H", 2), 4: ("I", 4),
    5: (None, 8), 6: ("b", 1), 7: (None, 1), 8: ("h", 2),
    9: ("i", 4), 10: (None, 8), 11: ("f", 4), 12: ("d", 8),
}

# baseline tags this module reads (TIFF 6.0 §8 / EXIF 2.3 tables)
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = (
    273, 277, 278, 279
)
T_PLANAR, T_PREDICTOR, T_COLORMAP = 284, 317, 320
T_TILE_W, T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_MAKE, T_MODEL, T_ORIENTATION, T_DATETIME = 271, 272, 274, 306
T_EXIF_IFD, T_GPS_IFD = 34665, 34853
# Exif sub-IFD tags
E_EXPOSURE, E_FNUMBER, E_ISO, E_DT_ORIG = 33434, 33437, 34855, 36867
E_FOCAL, E_PIX_X, E_PIX_Y = 37386, 40962, 40963
# GPS tags
G_LAT_REF, G_LAT, G_LON_REF, G_LON = 1, 2, 3, 4


class _Broken(Exception):
    pass


# ── IFD read machinery ──────────────────────────────────────────


def _read_values(b: bytes, en: str, typ: int, count: int,
                 raw4: bytes, data_off: int):
    if typ not in _TYPES:
        return None  # unknown type: spec says readers skip the entry
    letter, size = _TYPES[typ]
    total = size * count
    if total <= 4:
        src, off = raw4, 0
    else:
        src, off = b, data_off
        if off + total > len(b):
            raise _Broken("ifd value beyond eof")
    if typ == 2:  # ASCII, NUL-terminated
        raw = bytes(src[off:off + total])
        return raw.split(b"\x00")[0].decode("latin-1", "replace")
    if typ == 7:  # UNDEFINED: raw bytes
        return bytes(src[off:off + total])
    if typ in (5, 10):  # (S)RATIONAL pairs
        letter = "I" if typ == 5 else "i"
        vals = struct.unpack_from(
            en + letter * (2 * count), src, off
        )
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]
    return list(struct.unpack_from(en + letter * count, src, off))


def _read_ifd(b: bytes, en: str, off: int):
    """One IFD at ``off`` → (dict tag→values, next-IFD offset)."""
    if off + 2 > len(b) or off % 2:
        raise _Broken("ifd offset")
    (n,) = struct.unpack_from(en + "H", b, off)
    if n > _MAX_ENTRIES:
        raise _Broken("entry cap")
    if off + 2 + 12 * n + 4 > len(b):
        raise _Broken("ifd beyond eof")
    out = {}
    for i in range(n):
        epos = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(en + "HHI", b, epos)
        raw4 = b[epos + 8:epos + 12]
        (data_off,) = struct.unpack_from(en + "I", raw4, 0)
        vals = _read_values(b, en, typ, count, raw4, data_off)
        if vals is not None:
            out[tag] = vals
    (nxt,) = struct.unpack_from(en + "I", b, off + 2 + 12 * n)
    return out, nxt


def _endian(b: bytes):
    if b[:4] == b"II*\x00":
        return "<"
    if b[:4] == b"MM\x00*":
        return ">"
    return None


def sniff_tiff(blob: bytes) -> bool:
    return _endian(bytes(blob or b"")[:4]) is not None


def _walk_ifds(b: bytes):
    """All IFDs in file order → list of (tag dict) with the shared
    caps. The ENTRY to every TIFF read path. LENIENT past the first
    page (review catch: the documented surface-the-prefix contract):
    a damaged IFD mid-chain stops the walk and returns what parsed —
    a multi-page scan truncated mid-file keeps its valid leading
    pages. A broken FIRST IFD (or a non-TIFF prologue) still raises,
    so structural garbage stays an S4 None at the callers."""
    en = _endian(b)
    if en is None or len(b) < 8:
        raise _Broken("not tiff")
    (off,) = struct.unpack_from(en + "I", b, 4)
    pages = []
    seen = set()
    while off and len(pages) < _MAX_IFDS:
        if off in seen:
            raise _Broken("ifd cycle")
        seen.add(off)
        try:
            ifd, off = _read_ifd(b, en, off)
        except (_Broken, struct.error):
            if not pages:
                raise
            break  # lenient: surface the prefix
        pages.append(ifd)
    return en, pages


# ── decompressors ───────────────────────────────────────────────


def unpackbits(data: bytes, expected: int) -> bytes:
    """TIFF §9 PackBits: n in [0,127] → copy n+1 literals; n in
    [-127,-1] → repeat next byte 1-n times; -128 → no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                break
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise _Broken("packbits short")
    return bytes(out[:expected])


_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF §13 LZW: MSB-first bit order, initial 9-bit codes,
    Clear=256 / EOI=257, table grows from 258, and the code width
    bumps EARLY — when the next code to be assigned is one short of
    the current width's capacity (TIFF's documented off-by-one vs
    GIF). Max width 12; writers emit Clear before overflow."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    table: list[bytes] = []
    prev = None
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise _Broken("lzw eof")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise _Broken("lzw first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise _Broken("lzw code gap")
        out += entry
        prev = entry
        # early change (§13: code length increases when the next code
        # to be ADDED by the writer equals 511/1023/2047). The reader
        # table lags the writer's by exactly one entry — the entry
        # completed by the not-yet-seen next code — so the reader's
        # own trigger sits one lower: len 510/1022/2046.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise _Broken("lzw short")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    """§13-conformant writer (fixture encoder + differential twin of
    the decoder): emits Clear at start and whenever the table would
    outgrow 12 bits, EOI at the end, with the same early width
    change."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                emit(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                nxt = 258
                width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


# ── pixel decode ────────────────────────────────────────────────


def _first(ifd, tag, default=None):
    v = ifd.get(tag)
    if v is None:
        return default
    if isinstance(v, (list, tuple)):
        return v[0] if v else default
    return v


def _segment(b: bytes, off: int, count: int, compression: int,
             expected: int) -> bytes:
    raw = b[off:off + count]
    if len(raw) < count:
        raise _Broken("segment beyond eof")
    if compression == 1:
        if len(raw) < expected:
            raise _Broken("segment short")
        return bytes(raw[:expected])
    if compression == 32773:
        return unpackbits(raw, expected)
    if compression == 5:
        return lzw_decode(raw, expected)
    raise _Broken("compression %d gated" % compression)


def decode_tiff(blob: bytes | None):
    """First page → (h, w, 3) uint8 RGB, or None (S4) for non-TIFF,
    gated compressions/depths, or structural damage — the
    ``decode_image`` dispatch contract."""
    import numpy as np

    b = bytes(blob or b"")
    try:
        _en, pages = _walk_ifds(b)
        if not pages:
            return None
        ifd = pages[0]
        w = _first(ifd, T_WIDTH)
        h = _first(ifd, T_HEIGHT)
        # attacker-controlled tags can carry ANY field type: demand
        # integral dims (a FLOAT-typed width reached shape/slice
        # arithmetic as a float — review catch)
        if not isinstance(w, int) or not isinstance(h, int):
            return None
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            return None
        spp = _first(ifd, T_SPP, 1)
        if not isinstance(spp, int) or not 1 <= spp <= 8:
            return None
        bits = ifd.get(T_BITS, [1])
        photo = _first(ifd, T_PHOTOMETRIC, 1)
        compression = _first(ifd, T_COMPRESSION, 1)
        predictor = _first(ifd, T_PREDICTOR, 1)
        planar = _first(ifd, T_PLANAR, 1)
        if any(x not in (1, 8) for x in bits) or (
            set(bits) == {1} and spp != 1
        ):
            return None  # non-8-bit color depths gated
        bilevel = bits == [1] or (spp == 1 and bits[0] == 1)

        def rowbytes(width, samples):
            if bilevel:
                return (width + 7) // 8
            return width * samples

        if T_TILE_OFFSETS in ifd:
            tw = _first(ifd, T_TILE_W)
            th = _first(ifd, T_TILE_H)
            offs = ifd[T_TILE_OFFSETS]
            cnts = ifd.get(T_TILE_COUNTS)
            if not tw or not th or tw % 16 or th % 16 or bilevel or (
                cnts is None
            ):
                return None
            plane = np.zeros((h, w * spp), dtype=np.uint8)
            tiles_x = (w + tw - 1) // tw
            tiles_y = (h + th - 1) // th
            if len(offs) < tiles_x * tiles_y:
                return None
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    i = ty * tiles_x + tx
                    exp = rowbytes(tw, spp) * th
                    seg = _segment(b, offs[i], cnts[i], compression, exp)
                    arr = np.frombuffer(seg, dtype=np.uint8).reshape(
                        th, rowbytes(tw, spp)
                    )
                    if predictor == 2 and not bilevel:
                        arr = (
                            np.cumsum(
                                arr.reshape(th, tw, spp).astype(np.int64),
                                axis=1,
                            ) & 0xFF
                        ).astype(np.uint8).reshape(th, tw * spp)
                    ys = min(th, h - ty * th)
                    xs = min(tw, w - tx * tw) * spp
                    plane[ty * th:ty * th + ys,
                          tx * tw * spp:tx * tw * spp + xs] = (
                        arr[:ys, :xs]
                    )
            raster = plane
        else:
            offs = ifd.get(T_STRIP_OFFSETS)
            cnts = ifd.get(T_STRIP_COUNTS)
            if offs is None or cnts is None or len(offs) != len(cnts):
                return None
            rps = _first(ifd, T_ROWS_PER_STRIP, h)
            # RowsPerStrip=0 (or a junk type) reached the strip-count
            # division — review catch; the spec default is "all rows"
            if not isinstance(rps, int) or rps <= 0:
                rps = h
            if planar == 2 and spp > 1:
                # planar strips: strips cycle channel-major
                strips_per_ch = (h + rps - 1) // rps
                if len(offs) < strips_per_ch * spp:
                    return None
                chans = []
                for c in range(spp):
                    rows = []
                    for s in range(strips_per_ch):
                        i = c * strips_per_ch + s
                        nrows = min(rps, h - s * rps)
                        exp = rowbytes(w, 1) * nrows
                        rows.append(np.frombuffer(
                            _segment(b, offs[i], cnts[i],
                                     compression, exp),
                            dtype=np.uint8,
                        ).reshape(nrows, -1))
                    chans.append(np.concatenate(rows, axis=0))
                raster = np.stack(chans, axis=-1)  # (h, w, spp)
                if predictor == 2 and not bilevel:
                    # per-channel horizontal differencing
                    raster = (
                        np.cumsum(raster.astype(np.int64), axis=1)
                        & 0xFF
                    ).astype(np.uint8)
                # normalize to the chunky (h, w*spp) shape used below
                raster = raster.reshape(h, w * spp)
            else:
                rows = []
                for i, (off, cnt) in enumerate(zip(offs, cnts)):
                    nrows = min(rps, h - i * rps)
                    if nrows <= 0:
                        break
                    exp = rowbytes(w, spp) * nrows
                    rows.append(np.frombuffer(
                        _segment(b, off, cnt, compression, exp),
                        dtype=np.uint8,
                    ).reshape(nrows, -1))
                raster = np.concatenate(rows, axis=0)
                if predictor == 2 and not bilevel:
                    raster = (
                        np.cumsum(
                            raster.reshape(h, w, spp).astype(np.int64),
                            axis=1,
                        ) & 0xFF
                    ).astype(np.uint8).reshape(h, w * spp)
        # raster → RGB
        if bilevel:
            unpacked = np.unpackbits(
                raster.reshape(h, -1), axis=1
            )[:, :w]
            g = (unpacked * 255).astype(np.uint8)
            if photo == 0:  # WhiteIsZero
                g = 255 - g
            return np.stack([g, g, g], axis=-1)
        if photo == 3:  # palette
            cmap = ifd.get(T_COLORMAP)
            if cmap is None or len(cmap) < 3 * 256 or spp != 1:
                return None
            pal = (np.array(cmap[:768], dtype=np.uint32)
                   .reshape(3, 256) // 257).astype(np.uint8)
            idx = raster.reshape(h, w)
            return np.stack(
                [pal[0][idx], pal[1][idx], pal[2][idx]], axis=-1
            )
        if spp == 1:
            g = raster.reshape(h, w)
            if photo == 0:
                g = 255 - g
            return np.stack([g, g, g], axis=-1)
        if spp == 2:
            # gray + alpha: channel 0 is the luminance (review
            # catch: the :3 slice leaked a 2-channel array through
            # the documented (h, w, 3) contract)
            g = raster.reshape(h, w, 2)[:, :, 0]
            if photo == 0:
                g = 255 - g
            return np.ascontiguousarray(np.stack([g, g, g], axis=-1))
        img = raster.reshape(h, w, spp)
        return np.ascontiguousarray(img[:, :, :3])
    except (_Broken, struct.error, ValueError, TypeError,
            ZeroDivisionError, IndexError, OverflowError,
            MemoryError):
        # the never-raises S4 contract holds against arbitrary tag
        # values, not just the exception classes we anticipated
        # (review catch: ZeroDivisionError/TypeError escaped)
        return None


# ── metadata walk (Spark kernel's core) ─────────────────────────


def _meta_int(v):
    """Hostile-retype guard: a tag the writer declared ASCII/FLOAT/
    RATIONAL where we expect an integer must become None, never a
    str/float/list that later dies at pandas→Arrow serialization in
    the LongType kernel schema (the one failure triage_blob's
    try/except cannot catch)."""
    if isinstance(v, bool) or not isinstance(v, int):
        return None
    return v


def _meta_str(v):
    return v if isinstance(v, str) else None


def parse_tiff_meta(blob: bytes | None):
    """One dict per page (list), or None for non-TIFF / broken-
    before-first-IFD input (S4). A damaged later IFD surfaces the
    prefix (lenient reader). Every emitted value is type-coerced
    (int-or-None / str-or-None) so retyped hostile tags cannot
    poison the Arrow schema downstream."""
    b = bytes(blob or b"")
    if _endian(b) is None:
        return None
    pages = []
    try:
        _en, ifds = _walk_ifds(b)
    except (_Broken, struct.error):
        return None
    for i, ifd in enumerate(ifds):
        try:
            exif_ptr = _first(ifd, T_EXIF_IFD)
            bits = ifd.get(T_BITS, [1])
            if not isinstance(bits, (list, tuple)):
                bits = [bits]
            bits = [x for x in (_meta_int(v) for v in bits)
                    if x is not None] or [1]
            pages.append({
                "page": i,
                "width": _meta_int(_first(ifd, T_WIDTH)),
                "height": _meta_int(_first(ifd, T_HEIGHT)),
                "bits": bits,
                "samples_per_pixel":
                    _meta_int(_first(ifd, T_SPP)) or 1,
                "compression":
                    _meta_int(_first(ifd, T_COMPRESSION)) or 1,
                "photometric":
                    _meta_int(_first(ifd, T_PHOTOMETRIC)),
                "predictor":
                    _meta_int(_first(ifd, T_PREDICTOR)) or 1,
                "tiled": T_TILE_OFFSETS in ifd,
                "n_segments": len(
                    ifd.get(T_TILE_OFFSETS, ifd.get(T_STRIP_OFFSETS, []))
                ),
                "make": _meta_str(ifd.get(T_MAKE)),
                "model": _meta_str(ifd.get(T_MODEL)),
                "datetime": _meta_str(ifd.get(T_DATETIME)),
                "orientation": _meta_int(_first(ifd, T_ORIENTATION)),
                "has_exif_ifd": exif_ptr is not None,
            })
        except (_Broken, struct.error):
            break
    return pages or None


# ── EXIF (IFD machinery inside JPEG APP1) ───────────────────────


def _rat(v):
    try:
        if not v:
            return None
        num, den = v[0]
        if not isinstance(num, (int, float)) or not isinstance(
            den, (int, float)
        ):
            return None
        return None if den == 0 else num / den
    except (TypeError, ValueError):
        # hostile retype: RATIONAL rewritten as SHORT/FLOAT/ASCII
        # makes v[0] a scalar/char — not camera data, not a crash
        return None


def parse_exif_tiff(b: bytes):
    """EXIF fields from a TIFF-structured buffer (the body of an
    APP1 after ``Exif\\0\\0``, or a plain TIFF file — cameras write
    the SAME tags in both)."""
    en, pages = _walk_ifds(b)
    if not pages:
        raise _Broken("no ifd0")
    ifd0 = pages[0]
    out = {
        "make": _meta_str(ifd0.get(T_MAKE)),
        "model": _meta_str(ifd0.get(T_MODEL)),
        "orientation": _meta_int(_first(ifd0, T_ORIENTATION)),
        "datetime": _meta_str(ifd0.get(T_DATETIME)),
        "exposure_s": None, "fnumber": None, "iso": None,
        "datetime_original": None, "focal_mm": None,
        "pixel_x": None, "pixel_y": None,
        "gps_lat": None, "gps_lon": None,
    }
    ptr = _meta_int(_first(ifd0, T_EXIF_IFD))
    if ptr:
        sub, _ = _read_ifd(b, en, ptr)
        out["exposure_s"] = _rat(sub.get(E_EXPOSURE))
        out["fnumber"] = _rat(sub.get(E_FNUMBER))
        out["iso"] = _meta_int(_first(sub, E_ISO))
        out["datetime_original"] = _meta_str(sub.get(E_DT_ORIG))
        out["focal_mm"] = _rat(sub.get(E_FOCAL))
        out["pixel_x"] = _meta_int(_first(sub, E_PIX_X))
        out["pixel_y"] = _meta_int(_first(sub, E_PIX_Y))
    gptr = _meta_int(_first(ifd0, T_GPS_IFD))
    if gptr:
        gps, _ = _read_ifd(b, en, gptr)

        def dms(vals, ref, neg):
            ref = _meta_str(ref)
            if not vals or not isinstance(vals, (list, tuple)) \
                    or len(vals) < 3 or not ref:
                return None
            d = 0.0
            for i, pair in enumerate(vals[:3]):
                if not isinstance(pair, (list, tuple)) \
                        or len(pair) != 2:
                    return None
                n, den = pair
                if not isinstance(n, (int, float)) \
                        or not isinstance(den, (int, float)):
                    return None
                d += (n / den if den else 0.0) / 60 ** i
            # first-letter compare: `'' in 'Ss'` is True (empty
            # string is a substring of everything), which silently
            # FLIPPED the hemisphere on an empty ref — review catch
            return -d if ref[:1].upper() == neg else d

        out["gps_lat"] = dms(gps.get(G_LAT), gps.get(G_LAT_REF), "S")
        out["gps_lon"] = dms(gps.get(G_LON), gps.get(G_LON_REF), "W")
    return out


def parse_exif(jpeg: bytes | None):
    """EXIF dict from a JPEG's APP1 segment, or None when the blob
    is not a JPEG / carries no Exif APP1 / the TIFF body is broken
    (S4 — never raises)."""
    try:
        body = _find_exif_app1(bytes(jpeg or b""))
        if body is None:
            return None
        return parse_exif_tiff(body)
    except (_Broken, struct.error, TypeError, ValueError,
            IndexError, OverflowError):
        return None


# ── writers (fixture encoder + EXIF APP1 builder) ───────────────


def _build_ifd_block(entries: list, en: str, base: int,
                     next_ifd: int = 0) -> bytes:
    """Serialize one IFD whose out-of-line values land immediately
    after the entry table. ``entries`` = [(tag, type, count,
    packed-bytes)]; ``base`` = absolute offset the block will sit at
    (TIFF offsets are file-absolute)."""
    entries = sorted(entries)
    head_len = 2 + 12 * len(entries) + 4
    table = struct.pack(en + "H", len(entries))
    heap = b""
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            val4 = payload.ljust(4, b"\x00")
        else:
            off = base + head_len + len(heap)
            if off % 2:
                heap += b"\x00"
                off += 1
            val4 = struct.pack(en + "I", off)
            heap += payload
        table += struct.pack(en + "HHI", tag, typ, count) + val4
    table += struct.pack(en + "I", next_ifd)
    return table + heap


def _e_short(en, *v):
    return struct.pack(en + "H" * len(v), *v)


def _e_long(en, *v):
    return struct.pack(en + "I" * len(v), *v)


def _e_ascii(s: str) -> bytes:
    return s.encode("latin-1") + b"\x00"


def _e_rat(en, *pairs):
    out = b""
    for n, d in pairs:
        out += struct.pack(en + "II", n, d)
    return out


#: EXIF thumbnail pointers (IFD1): JPEGInterchangeFormat / -Length
T_THUMB_OFF, T_THUMB_LEN = 513, 514


def _find_exif_app1(jpeg: bytes):
    """The TIFF-structured body of a JPEG's ``Exif\\0\\0`` APP1
    segment, or None — THE marker scan, shared by :func:`parse_exif`
    and :func:`exif_thumbnail` (review catch: two copies)."""
    b = jpeg
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # scan/EOI: no APP1 found
            return None
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        if marker == 0xE1 and b[pos + 4:pos + 10] == b"Exif\x00\x00":
            return b[pos + 10:pos + 2 + seglen]
        pos += 2 + seglen
    return None


def exif_thumbnail(jpeg: bytes | None):
    """The IFD1-embedded preview JPEG from a camera photo's APP1 —
    tags 513/514 point (APP1-TIFF-relative) at a complete small
    JPEG, the cheap preview a triage/catalog layer wants WITHOUT
    decoding the main image. Returns the thumbnail bytes or None
    (no APP1 / no IFD1 / no pointer / out of range — never
    raises)."""
    try:
        body = _find_exif_app1(bytes(jpeg or b""))
        if body is None:
            return None
        _en, pages = _walk_ifds(body)
        if len(pages) < 2:
            return None
        off = _first(pages[1], T_THUMB_OFF)
        ln = _first(pages[1], T_THUMB_LEN)
        if not isinstance(off, int) or not isinstance(ln, int):
            return None
        if off <= 0 or ln <= 0 or off + ln > len(body):
            return None
        thumb = bytes(body[off:off + ln])
        return thumb if thumb[:2] == b"\xff\xd8" else None
    except (_Broken, struct.error):
        return None


def exif_app1(make: str, model: str, dt: str,
              exposure=(1, 125), fnumber=(28, 10), iso: int = 200,
              focal=(50, 1), pix=(0, 0),
              gps=None, endian: str = "<",
              thumbnail: bytes | None = None) -> bytes:
    """A complete JPEG APP1 Exif segment (marker + length + payload)
    carrying IFD0 + Exif sub-IFD (+ GPS when given as (lat, lon)
    floats; + an IFD1 thumbnail when ``thumbnail`` carries JPEG
    bytes) — spliceable right after SOI by :func:`insert_app1`."""
    en = endian

    def tiff_body():
        # layout: header(8) IFD0 ... exif-ifd ... gps-ifd
        # build iteratively: sizes depend on offsets, so fix IFD0
        # entry count first
        exif_entries = [
            (E_EXPOSURE, 5, 1, _e_rat(en, exposure)),
            (E_FNUMBER, 5, 1, _e_rat(en, fnumber)),
            (E_ISO, 3, 1, _e_short(en, iso)),
            (E_DT_ORIG, 2, len(dt) + 1, _e_ascii(dt)),
            (E_FOCAL, 5, 1, _e_rat(en, focal)),
            (E_PIX_X, 4, 1, _e_long(en, pix[0])),
            (E_PIX_Y, 4, 1, _e_long(en, pix[1])),
        ]
        ifd0_tags = [
            (T_MAKE, 2, len(make) + 1, _e_ascii(make)),
            (T_MODEL, 2, len(model) + 1, _e_ascii(model)),
            (T_ORIENTATION, 3, 1, _e_short(en, 1)),
            (T_DATETIME, 2, len(dt) + 1, _e_ascii(dt)),
        ]
        n0 = len(ifd0_tags) + 1 + (1 if gps is not None else 0)
        ifd0_base = 8
        # IFD0 block size: entries + heap; compute via a dry run with
        # placeholder pointers (pointer values don't change sizes)
        dry = ifd0_tags + [(T_EXIF_IFD, 4, 1, _e_long(en, 0))]
        if gps is not None:
            dry.append((T_GPS_IFD, 4, 1, _e_long(en, 0)))
        ifd0_len = len(_build_ifd_block(dry, en, ifd0_base))
        exif_base = ifd0_base + ifd0_len
        exif_len = len(_build_ifd_block(exif_entries, en, exif_base))
        gps_base = exif_base + exif_len
        real = ifd0_tags + [(T_EXIF_IFD, 4, 1, _e_long(en, exif_base))]
        gps_block = b""
        if gps is not None:
            lat, lon = gps

            def to_dms(x):
                x = abs(x)
                d = int(x)
                m = int((x - d) * 60)
                s = round(((x - d) * 60 - m) * 60 * 100)
                return _e_rat(en, (d, 1), (m, 1), (s, 100))

            gps_entries = [
                (G_LAT_REF, 2, 2, _e_ascii("N" if lat >= 0 else "S")),
                (G_LAT, 5, 3, to_dms(lat)),
                (G_LON_REF, 2, 2, _e_ascii("E" if lon >= 0 else "W")),
                (G_LON, 5, 3, to_dms(lon)),
            ]
            gps_block = _build_ifd_block(gps_entries, en, gps_base)
            real.append((T_GPS_IFD, 4, 1, _e_long(en, gps_base)))
        # IFD1 (thumbnail): sits after the GPS block; its two LONG
        # pointer tags reference the raw JPEG bytes appended last
        ifd1_block = b""
        thumb_bytes = b""
        next_ifd = 0
        if thumbnail is not None:
            ifd1_base = gps_base + len(gps_block)
            dry1 = [
                (T_THUMB_OFF, 4, 1, _e_long(en, 0)),
                (T_THUMB_LEN, 4, 1, _e_long(en, len(thumbnail))),
            ]
            ifd1_len = len(_build_ifd_block(dry1, en, ifd1_base))
            thumb_off = ifd1_base + ifd1_len
            ifd1_block = _build_ifd_block(
                [
                    (T_THUMB_OFF, 4, 1, _e_long(en, thumb_off)),
                    (T_THUMB_LEN, 4, 1, _e_long(en, len(thumbnail))),
                ],
                en,
                ifd1_base,
            )
            thumb_bytes = bytes(thumbnail)
            next_ifd = ifd1_base
        ifd0 = _build_ifd_block(real, en, ifd0_base, next_ifd=next_ifd)
        assert len(ifd0) == ifd0_len and n0 == len(real)
        hdr = (b"II*\x00" if en == "<" else b"MM\x00*") + struct.pack(
            en + "I", 8
        )
        return hdr + ifd0 + _build_ifd_block(
            exif_entries, en, exif_base
        ) + gps_block + ifd1_block + thumb_bytes

    payload = b"Exif\x00\x00" + tiff_body()
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    return jpeg[:2] + app1 + jpeg[2:]


def encode_tiff(px, compression: str = "none", endian: str = "<",
                predictor: bool = False, rows_per_strip: int = 4,
                tiled: bool = False, photometric: str = "rgb",
                planar: bool = False, extra_pages: int = 0,
                make: str | None = None, model: str | None = None,
                dt: str | None = None) -> bytes:
    """Spec-shaped fixture encoder: (h, w, 3) uint8 → baseline TIFF
    exercising every wire feature the reader handles (both endians,
    strip/tile layouts, planar config, none/PackBits/LZW ±predictor,
    gray/palette derivation from the RGB input, IFD0 camera tags,
    multi-page chains)."""
    import numpy as np

    en = endian
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    if photometric == "gray":
        data = ((
            299 * px[:, :, 0].astype(np.uint32)
            + 587 * px[:, :, 1].astype(np.uint32)
            + 114 * px[:, :, 2].astype(np.uint32)
        ) // 1000).astype(np.uint8)
        spp, photo = 1, 1
    elif photometric == "palette":
        # derive a ≤256-color palette deterministically
        flat = px.reshape(-1, 3)
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(uniq) > 256:
            raise ValueError("palette fixture needs ≤256 colors")
        data = inv.astype(np.uint8).reshape(h, w)
        spp, photo = 1, 3
    else:
        data = px
        spp, photo = 3, 2

    def compress(seg: np.ndarray, seg_w: int, nsamp: int) -> bytes:
        arr = np.ascontiguousarray(seg)
        if predictor and compression != "none":
            a = arr.reshape(-1, seg_w, nsamp).astype(np.int16)
            # first column raw, then horizontal deltas (§14)
            d = np.diff(a, axis=1, prepend=np.zeros_like(a[:, :1, :]))
            arr = (d & 0xFF).astype(np.uint8)
        raw = arr.tobytes()
        if compression == "none":
            return raw
        if compression == "packbits":
            return packbits_encode(raw)
        if compression == "lzw":
            return lzw_encode(raw)
        raise ValueError(compression)

    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    def one_page(base: int, page_px, is_last: bool):
        ph, pw = page_px.shape[:2]
        entries = [
            (T_WIDTH, 4, 1, _e_long(en, pw)),
            (T_HEIGHT, 4, 1, _e_long(en, ph)),
            (T_BITS, 3, spp, _e_short(en, *([8] * spp))),
            (T_COMPRESSION, 3, 1, _e_short(en, comp_code)),
            (T_PHOTOMETRIC, 3, 1, _e_short(en, photo)),
            (T_SPP, 3, 1, _e_short(en, spp)),
        ]
        if predictor and compression != "none":
            entries.append((T_PREDICTOR, 3, 1, _e_short(en, 2)))
        if photo == 3:
            pal = np.zeros((3, 256), dtype=np.uint16)
            pal[:, :len(uniq)] = (uniq.T.astype(np.uint32) * 257)
            entries.append(
                (T_COLORMAP, 3, 768, _e_short(en, *pal.ravel()))
            )
        if make is not None:
            entries.append((T_MAKE, 2, len(make) + 1, _e_ascii(make)))
        if model is not None:
            entries.append(
                (T_MODEL, 2, len(model) + 1, _e_ascii(model))
            )
        if dt is not None:
            entries.append((T_DATETIME, 2, len(dt) + 1, _e_ascii(dt)))
        segs = []
        if tiled:
            tw = th = 16
            gh = (ph + th - 1) // th * th
            gw = (pw + tw - 1) // tw * tw
            if spp == 3:
                grid = np.zeros((gh, gw, 3), dtype=np.uint8)
                grid[:ph, :pw] = page_px
            else:
                grid = np.zeros((gh, gw), dtype=np.uint8)
                grid[:ph, :pw] = page_px
            for ty in range(0, gh, th):
                for tx in range(0, gw, tw):
                    tile = grid[ty:ty + th, tx:tx + tw]
                    segs.append(compress(tile, tw, spp))
            entries += [
                (T_TILE_W, 4, 1, _e_long(en, tw)),
                (T_TILE_H, 4, 1, _e_long(en, th)),
            ]
            off_tag, cnt_tag = T_TILE_OFFSETS, T_TILE_COUNTS
        elif planar and spp == 3:
            entries.append((T_PLANAR, 3, 1, _e_short(en, 2)))
            for c in range(3):
                for y0 in range(0, ph, rows_per_strip):
                    seg = page_px[y0:y0 + rows_per_strip, :, c]
                    segs.append(compress(seg, pw, 1))
            entries.append(
                (T_ROWS_PER_STRIP, 4, 1, _e_long(en, rows_per_strip))
            )
            off_tag, cnt_tag = T_STRIP_OFFSETS, T_STRIP_COUNTS
        else:
            for y0 in range(0, ph, rows_per_strip):
                seg = page_px[y0:y0 + rows_per_strip]
                segs.append(compress(seg, pw, spp))
            entries.append(
                (T_ROWS_PER_STRIP, 4, 1, _e_long(en, rows_per_strip))
            )
            off_tag, cnt_tag = T_STRIP_OFFSETS, T_STRIP_COUNTS
        # two passes: sizes first (offsets depend on ifd length)
        n = len(entries) + 2
        dry = entries + [
            (off_tag, 4, len(segs), _e_long(en, *([0] * len(segs)))),
            (cnt_tag, 4, len(segs),
             _e_long(en, *[len(s) for s in segs])),
        ]
        blk_len = len(_build_ifd_block(dry, en, base))
        data_start = base + blk_len
        offs = []
        pos = data_start
        for s in segs:
            offs.append(pos)
            pos += len(s) + (len(s) & 1)
        real = entries + [
            (off_tag, 4, len(segs), _e_long(en, *offs)),
            (cnt_tag, 4, len(segs),
             _e_long(en, *[len(s) for s in segs])),
        ]
        next_ptr = 0 if is_last else pos
        blk = _build_ifd_block(real, en, base, next_ifd=next_ptr)
        assert len(blk) == blk_len and n == len(real)
        body = b"".join(
            s + (b"\x00" if len(s) & 1 else b"") for s in segs
        )
        return blk + body, pos

    if spp == 1:
        page_data = data
    else:
        page_data = px
    out = (b"II*\x00" if en == "<" else b"MM\x00*") + struct.pack(
        en + "I", 8
    )
    base = 8
    for p in range(extra_pages + 1):
        blk, nxt = one_page(base, page_data, p == extra_pages)
        out += blk
        base = nxt
    return out


def packbits_encode(data: bytes) -> bytes:
    """§9 writer: greedy runs ≥3 become replicate codes, the rest
    literal spans ≤128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while (i + run < n and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while (i + run < n and run < 128
                   and data[i + run] == data[i]):
                run += 1
            if run >= 3:
                break
            i += run
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# ── Spark surface ───────────────────────────────────────────────


def tiff_meta(media):
    """Map-only Arrow kernel: one row per TIFF page — dimensions,
    compression, layout, camera tags. Non-TIFF and broken blobs
    emit nothing (S4). Expects (doc_id, blob)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("page", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("bits", StringType()),
            StructField("samples_per_pixel", LongType()),
            StructField("compression", LongType()),
            StructField("photometric", LongType()),
            StructField("predictor", LongType()),
            StructField("tiled", BooleanType()),
            StructField("n_segments", LongType()),
            StructField("make", StringType()),
            StructField("model", StringType()),
            StructField("datetime", StringType()),
            StructField("has_exif_ifd", BooleanType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def kernel(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for doc_id, blob in zip(batch["doc_id"], batch["blob"]):
                meta = parse_tiff_meta(
                    bytes(blob) if blob is not None else b""
                )
                if meta is None:
                    continue
                for m in meta:
                    m = dict(m)
                    m["bits"] = ",".join(str(x) for x in m["bits"])
                    rows.append(
                        {"doc_id": int(doc_id),
                         **{k: m.get(k) for k in cols
                            if k != "doc_id"}}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.filter(
        F.col("doc_id").isNotNull() & F.col("blob").isNotNull()
    ).mapInPandas(kernel, schema)


def apply_exif_orientation(arr, orientation: int | None):
    """Apply the EXIF/TIFF Orientation tag (274) to a decoded
    (h, w, c) array — the transform every camera-photo pipeline
    needs before features/thumbnails make sense. The 8 spec values
    (TIFF 6.0 p.36 / EXIF 2.3): 1 = as stored; 2 = mirrored
    horizontally; 3 = rotated 180°; 4 = mirrored vertically;
    5 = transposed (mirror + 90° CW); 6 = rotated 90° CW;
    7 = transverse (mirror + 270° CW); 8 = rotated 270° CW.
    Unknown/None orientations return the array unchanged (cameras
    that omit the tag mean 1). Pure numpy views + one copy."""
    import numpy as np

    if orientation in (None, 1):
        return arr
    if orientation == 2:
        return np.ascontiguousarray(arr[:, ::-1])
    if orientation == 3:
        return np.ascontiguousarray(arr[::-1, ::-1])
    if orientation == 4:
        return np.ascontiguousarray(arr[::-1, :])
    if orientation == 5:
        return np.ascontiguousarray(np.swapaxes(arr, 0, 1))
    if orientation == 6:
        # 90° clockwise: transpose then mirror horizontally
        return np.ascontiguousarray(np.swapaxes(arr, 0, 1)[:, ::-1])
    if orientation == 7:
        return np.ascontiguousarray(np.swapaxes(arr, 0, 1)[::-1, ::-1])
    if orientation == 8:
        return np.ascontiguousarray(np.swapaxes(arr, 0, 1)[::-1, :])
    return arr


def decode_oriented(blob: bytes | None):
    """decode + orientation in one call: the camera-correct pixels
    for a JPEG (APP1 Exif Orientation) or TIFF (IFD0 tag 274), the
    plain decode for everything else. None on S4 like
    ``decode_image``. The GOLDEN image path deliberately stays
    as-stored (decode_image_features) — orientation is a consumer
    choice, and applying it there would re-pin every committed
    value; this entry point is the consumer choice made callable."""
    from .multimodal import decode_image

    b = bytes(blob or b"")
    arr = decode_image(b, prefer_pil=False)
    if arr is None:
        return None
    orientation = None
    try:
        if b[:2] == b"\xff\xd8":
            ex = parse_exif(b)
            orientation = ex.get("orientation") if ex else None
        elif sniff_tiff(b):
            meta = parse_tiff_meta(b)
            orientation = meta[0].get("orientation") if meta else None
    except Exception:
        orientation = None
    return apply_exif_orientation(arr, orientation)
