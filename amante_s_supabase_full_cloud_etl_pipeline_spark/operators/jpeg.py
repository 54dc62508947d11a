"""Native baseline JPEG codec — pure numpy + stdlib, no image library.

Closes the last compressed-codec gate in the multimodal surface
(VERDICT r3 "What's missing" #1): a web-crawl multimodal corpus is
mostly JPEG, and a locked-down cluster may not carry Pillow. BMP/PPM
(r2) and PNG (r3) already decode natively; this adds ITU-T T.81
baseline sequential JPEG:

- decoder: SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/RSTn/EOI marker
  parse, canonical Huffman entropy decode with byte-unstuffing,
  dequant + inverse zigzag, 8×8 IDCT as two dense matmuls (numpy,
  vectorized across every block of a component at once), nearest
  chroma upsample (4:4:4, 4:2:2, 4:2:0), JFIF YCbCr→RGB. Grayscale
  (1 component) and RGB (3 component) frames; progressive (SOF2),
  arithmetic, and hierarchical frames return None (the PIL probe
  remains the fallback for those, as for WebP).
- encoder: quality-scaled Annex-K quantization tables, the Annex-K
  "typical" Huffman tables, level shift + FDCT (same matmul pair,
  transposed), zigzag, DC-difference/AC run-length entropy coding
  with byte stuffing; 4:4:4 (default) or 4:2:0 subsampling; grayscale
  when the input is 2-D. The encoder exists so round-trip tests and
  synthetic corpora work in environments with no image library at
  all — the same reason the WAV/BMP/PPM/PNG encoders exist.

Decode errors follow the engine's S4 semantics (reference
main.py:455-470 skip-and-continue): corrupt/unsupported streams
return None, never raise — the caller routes Nones to quarantine.

Like every multimodal kernel here, this runs inside Arrow-batched
``mapInPandas`` workers: per-image numpy work, no Python-per-pixel
loops on the hot path (the Huffman bit loop is per-coefficient by
nature; everything downstream of entropy decode is vectorized).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

#: zigzag order: index i of this array holds the raster position of
#: the i-th coefficient in scan order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 luminance / K.2 chrominance base quantization tables
#: (raster order).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables as (bits[1..16], huffval) pairs.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: 8×8 DCT-II basis matrix C with C[u,x] = a(u)·cos((2x+1)uπ/16):
#: block_dct = C @ block @ C.T ; block = C.T @ coeffs @ C.
_C = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) canonical Huffman assignment per
    T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: (bits, vals) → flat 16-bit-window LUT memo. JPEG codes are ≤16
#: bits, so a 65536-entry (symbol, length) table decodes any code in
#: ONE list index instead of a bit-at-a-time tree walk — the classic
#: libjpeg fast path. Keyed by the table bytes: real corpora reuse the
#: Annex-K tables across millions of images, so each worker builds the
#: LUT once per distinct table, not once per image.
_FAST_TABLE_CACHE: dict = {}


def _fast_tables(bits, vals):
    """(lut_symbol, lut_length) lists indexed by the next 16 bits of
    the stream; length 0 marks an invalid prefix."""
    key = (bytes(bits), bytes(vals))
    hit = _FAST_TABLE_CACHE.get(key)
    if hit is None:
        if len(_FAST_TABLE_CACHE) > 64:  # corrupt-stream table churn bound
            _FAST_TABLE_CACHE.clear()
        sym = [0] * 65536
        ln = [0] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                if lo + span > 65536:
                    raise ValueError("bad DHT: code space overflow")
                sym[lo : lo + span] = [vals[k]] * span
                ln[lo : lo + span] = [length] * span
                code += 1
                k += 1
            code <<= 1
        hit = (sym, ln)
        _FAST_TABLE_CACHE[key] = hit
    return hit


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (raster
    order), clamped to [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self.write_many(((code, length),))

    def write_many(self, pairs) -> None:
        """Append a batch of (code, length) fields in one call — the
        accumulator lives in locals across the whole batch, so the
        per-field cost is a few int ops instead of attribute traffic."""
        acc = self._acc
        nbits = self._nbits
        out = self.out
        for code, length in pairs:
            acc = (acc << length) | (code & ((1 << length) - 1))
            nbits += length
            while nbits >= 8:
                nbits -= 8
                byte = (acc >> nbits) & 0xFF
                out.append(byte)
                if byte == 0xFF:  # byte stuffing
                    out.append(0x00)
            acc &= (1 << nbits) - 1
        self._acc = acc
        self._nbits = nbits

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC difference / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _fdct_quant(plane: np.ndarray, qtable_raster: np.ndarray) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 64) quantized zigzag coefficients for
    a level-shifted component plane whose dims are multiples of 8 —
    every block transformed in one einsum pair."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    # batched matmul (BLAS) beats einsum's generic loop ~10x here
    coeffs = _C @ blocks @ _C.T
    q = qtable_raster.reshape(8, 8).astype(np.float64)
    quant = np.round(coeffs / q).astype(np.int64)
    return quant.reshape(quant.shape[0], quant.shape[1], 64)[:, :, ZIGZAG]


def _encode_blocks(writer, zz, pred, dc_codes, ac_codes) -> int:
    """Entropy-encode one 64-coefficient zigzag block; returns the new
    DC predictor. Visits only the NONZERO AC coefficients (runs come
    from index gaps) and emits all fields in one batched bit-write —
    quantized blocks are mostly zeros, so the work is proportional to
    the information, not to 64."""
    zl = zz.tolist()
    dc = zl[0]
    diff = dc - pred
    if diff:
        cat = (diff if diff > 0 else -diff).bit_length()
        pairs = [dc_codes[cat], (diff if diff > 0 else diff + (1 << cat) - 1, cat)]
    else:
        pairs = [dc_codes[0]]
    prev = 0
    for idx in np.nonzero(zz[1:])[0].tolist():
        k = idx + 1
        run = k - prev - 1
        while run > 15:
            pairs.append(ac_codes[0xF0])  # ZRL
            run -= 16
        v = zl[k]
        cat = (v if v > 0 else -v).bit_length()
        pairs.append(ac_codes[(run << 4) | cat])
        pairs.append((v if v > 0 else v + (1 << cat) - 1, cat))
        prev = k
    if prev != 63:
        pairs.append(ac_codes[0x00])  # EOB
    writer.write_many(pairs)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to (mh, mw) multiples."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    pixels, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JFIF JPEG.

    ``subsample=True`` writes 4:2:0 chroma (the web norm); default is
    4:4:4 for maximum round-trip fidelity. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (how
    web encoders bound error propagation — exercises the decoder's
    restart path). Annex-K Huffman tables, quality-scaled Annex-K
    quant tables."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    ql = scale_quant(QUANT_LUMA, quality)
    qc = scale_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]

    if gray:
        samp = [(1, 1)]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    comp_zz = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):
            # box-average downsample by (vmax//sv, hmax//sh)
            fy, fx = vmax // sv, hmax // sh
            p = _pad_to(plane, fy, fx)
            plane = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        # pad so the MCU grid tiles exactly
        plane = _pad_to(plane, 8 * sv, 8 * sh)
        qt = ql if ci == 0 else qc
        comp_zz.append(_fdct_quant(np.clip(plane, 0, 255), qt))

    # --- headers -----------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tid, table):
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in table[ZIGZAG]
        )

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)

    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tclass, tid, bits, vals):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # --- entropy-coded scan (interleaved MCUs) -----------------------------
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()
                rst_n = (mcu_n // restart_interval - 1) % 8
                writer.out += bytes([0xFF, 0xD0 + rst_n])
                preds = [0] * ncomp
            mcu_n += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_blocks(
                            writer, zz, preds[ci], dc_codes, ac_codes
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _bit_windows(segdata: bytes):
    """(u32, total_bits) for LUT entropy decode: ``u32[i]`` holds the
    big-endian 32-bit window starting at byte ``i``, built in one
    vectorized pass, so peeking 16 bits at ANY bit position p is two
    int ops: ``(u32[p >> 3] >> (16 - (p & 7))) & 0xFFFF``. The 8-byte
    zero pad lets the final symbols peek past the end; overrun is
    caught by the position check at each symbol start instead."""
    buf = segdata + b"\x00" * 8
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.uint32)
    u32 = ((a[:-3] << 24) | (a[1:-2] << 16) | (a[2:-1] << 8) | a[3:]).tolist()
    return u32, len(segdata) * 8


def decode_jpeg(blob: bytes):
    """Baseline sequential JPEG → (h, w, 3) uint8 RGB, or None on any
    unsupported/corrupt stream (progressive SOF2, arithmetic coding,
    12-bit precision, 4-component CMYK, truncated data)."""
    try:
        return _decode_jpeg_strict(bytes(blob))
    except Exception:
        return None


#: SOFn markers the native decoder handles (baseline + extended
#: sequential Huffman)
_SOF_SUPPORTED = {0xC0, 0xC1}
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _iter_segments(b: bytes):
    """Shared marker-stream walk (the ONE place that knows T.81's
    framing: SOI check, 0xFF fill-byte skip per B.1.1.2, standalone
    markers, segment lengths). Yields ``(marker, seg, next_pos)`` —
    ``seg`` is None for standalone markers; stops after EOI or SOS
    (entropy data follows SOS at ``next_pos``). Raises ValueError on
    malformed framing. Both :func:`jpeg_frame_info` and the decoder
    consume this, so a framing fix can never apply to one and not the
    other (that drift is exactly the gate-vs-S4 misclassification the
    probe exists to prevent)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them rather than misreading FF as a code
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(b):
            raise ValueError("truncated marker")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            yield marker, None, pos
            if marker == 0xD9:  # EOI
                return
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated segment length")
        (seglen,) = struct.unpack_from(">H", b, pos)
        if seglen < 2:
            raise ValueError("bad segment length")
        seg = b[pos + 2 : pos + seglen]
        pos += seglen
        yield marker, seg, pos
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return


def jpeg_frame_info(blob: bytes):
    """Marker-level probe (no entropy decode): the stream's SOF shape,
    or None when no well-formed SOF is found. Returns
    ``{"sof": marker, "precision": p, "n_components": n}``.

    This is how callers distinguish "legitimate JPEG flavor the native
    decoder declines" (progressive/arithmetic/12-bit/CMYK — route to
    the PIL gate, loudly) from "corrupt data" (S4 per-row skip) —
    substring-matching for ``FF C2`` would misfire on incidental bytes
    inside APPn segments or the entropy stream."""
    try:
        for marker, seg, _ in _iter_segments(bytes(blob)):
            if marker == 0xDA:
                return None  # reached the scan without any SOF
            if marker in _SOF_MARKERS:
                if seg is None or len(seg) < 6:
                    return None
                return {
                    "sof": marker,
                    "precision": seg[0],
                    "n_components": seg[5],
                }
    except (ValueError, struct.error, IndexError):
        return None
    return None


def native_decodable_frame(info) -> bool:
    """True when :func:`jpeg_frame_info`'s shape is one the native
    decoder supports (8-bit baseline/extended-sequential Huffman,
    1 or 3 components)."""
    return (
        info is not None
        and info["sof"] in _SOF_SUPPORTED
        and info["precision"] == 8
        and info["n_components"] in (1, 3)
    )


def legitimate_undecodable_frame(info) -> bool:
    """True when the frame is a VALID JPEG flavor the native decoder
    declines — progressive/arithmetic/hierarchical SOF, 12-bit
    precision, or 4-component (Adobe CMYK) — i.e. the cases a PIL
    fallback could genuinely decode and the batch kernel should gate
    on LOUDLY. An impossible shape (precision 9, zero components —
    bit-flipped corruption that still parses) is NOT legitimate: no
    decoder accepts it, so it must stay an S4 per-row skip."""
    return (
        info is not None
        and not native_decodable_frame(info)
        and info["sof"] in _SOF_MARKERS
        and info["precision"] in (8, 12)
        and info["n_components"] in (1, 3, 4)
    )


def _decode_jpeg_strict(b: bytes):
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    scan = None
    # marker framing is delegated to the shared _iter_segments walk
    # (same framing jpeg_frame_info sees — they cannot drift)
    for marker, seg, next_pos in _iter_segments(b):
        if marker == 0xD9:  # EOI
            break
        if seg is None:
            continue  # standalone
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq == 0:
                    tab = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp).astype(np.int64)
                    sp += 64
                else:
                    tab = np.frombuffer(seg, dtype=">u2", count=64, offset=sp).astype(np.int64)
                    sp += 128
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tab  # tables ship in zigzag order
                qtables[tq] = raster
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                bits = list(seg[sp : sp + 16])
                sp += 16
                n = sum(bits)
                vals = list(seg[sp : sp + n])
                sp += n
                htables[(tc, th)] = _fast_tables(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline-decodable
            prec = seg[0]
            if prec != 8:
                return None
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — first scan only; iterator stops
            if frame is None:
                return None
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            # entropy-coded data runs from next_pos to the next
            # non-stuffed, non-RST marker
            p = next_pos
            while p + 1 < len(b):
                if b[p] == 0xFF and b[p + 1] not in (0x00,) and not (
                    0xD0 <= b[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scan = (next_pos, p, sel)
        # APPn/COM and anything else: skipped
    if frame is None or scan is None:
        return None
    return _decode_scan(b, frame, scan, qtables, htables, restart_interval)


def _decode_scan(b, frame, scan, qtables, htables, restart_interval):
    start, end, sel = scan
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one
        # data unit per MCU on the component's own 8x8 grid; the SOF's
        # sampling factors are ignored (some encoders declare 2x2 for
        # grayscale, which would otherwise misalign the bit reader)
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split the scan into restart segments, unstuffing each
    raw = b[start:end]
    segments = []
    if restart_interval:
        cur = bytearray()
        i = 0
        while i < len(raw):
            if raw[i] == 0xFF and i + 1 < len(raw):
                nxt = raw[i + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
            cur.append(raw[i])
            i += 1
        segments.append(bytes(cur))
    else:
        segments = [raw.replace(b"\xff\x00", b"\xff")]

    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        planes.append(np.zeros((bh, bw, 64), dtype=np.int64))

    ncomp = len(comps)
    comp_tabs = []
    for c in comps:
        dc_t = htables.get((0, sel[c["id"]][0]))
        ac_t = htables.get((1, sel[c["id"]][1]))
        if dc_t is None or ac_t is None:
            return None
        comp_tabs.append((dc_t[0], dc_t[1], ac_t[0], ac_t[1]))

    n_mcus = mcux * mcuy
    per_seg = restart_interval or n_mcus
    # nonzero-coefficient triplets per component, scattered into the
    # planes in ONE fancy-index assignment at the end — no per-block
    # numpy allocation inside the entropy loop
    acc = [([], [], []) for _ in comps]
    mcu = 0
    seg_idx = 0
    while mcu < n_mcus:
        if seg_idx >= len(segments):
            return None
        u32, total_bits = _bit_windows(segments[seg_idx])
        seg_idx += 1
        preds = [0] * ncomp
        pos = 0
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            mcu += 1
            for ci in range(ncomp):
                c = comps[ci]
                dc_sym, dc_len, ac_sym, ac_len = comp_tabs[ci]
                blks, ks, vs = acc[ci]
                cv, ch = c["v"], c["h"]
                bw = mcux * ch
                pred = preds[ci]
                for by in range(cv):
                    row = my * cv + by
                    for bx in range(ch):
                        blk = row * bw + mx * ch + bx
                        if pos >= total_bits:
                            raise EOFError("truncated entropy data")
                        w16 = (u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
                        length = dc_len[w16]
                        if length == 0:
                            raise ValueError("bad Huffman code")
                        cat = dc_sym[w16]
                        pos += length
                        if cat:
                            v = ((u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (
                                16 - cat
                            )
                            pos += cat
                            if v < (1 << (cat - 1)):
                                v += (-1 << cat) + 1
                            pred += v
                        blks.append(blk)
                        ks.append(0)
                        vs.append(pred)
                        k = 1
                        while k < 64:
                            if pos >= total_bits:
                                raise EOFError("truncated entropy data")
                            w16 = (u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
                            length = ac_len[w16]
                            if length == 0:
                                raise ValueError("bad Huffman code")
                            rs = ac_sym[w16]
                            pos += length
                            s = rs & 0xF
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                return None
                            v = ((u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (
                                16 - s
                            )
                            pos += s
                            if v < (1 << (s - 1)):
                                v += (-1 << s) + 1
                            blks.append(blk)
                            ks.append(k)
                            vs.append(v)
                            k += 1
                preds[ci] = pred
    for ci in range(ncomp):
        blks, ks, vs = acc[ci]
        if blks:
            bh, bw2, _ = planes[ci].shape
            planes[ci].reshape(bh * bw2, 64)[blks, ks] = vs

    # dequant + inverse zigzag + IDCT, vectorized per component
    out_planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            return None
        bh, bw, _ = planes[ci].shape
        coeffs = np.zeros((bh, bw, 64), dtype=np.float64)
        coeffs[:, :, ZIGZAG] = planes[ci] * q[ZIGZAG]
        coeffs = coeffs.reshape(bh, bw, 8, 8)
        # IDCT: spatial[x,y] = Σ_u Σ_v C[u,x]·coeffs[u,v]·C[v,y]
        # as batched matmul (BLAS): C.T @ coeffs @ C per 8x8 block
        spatial = _C.T @ coeffs @ _C
        plane = (
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        )
        # nearest upsample to full MCU-grid resolution
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(comps) == 1:
        y = np.clip(out_planes[0][:h, :w], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y = out_planes[0][:h, :w]
    cb = out_planes[1][:h, :w] - 128.0
    cr = out_planes[2][:h, :w] - 128.0
    # identical float64 arithmetic to the reference formulation; the
    # preallocated target just avoids np.stack's extra copy
    rgb = np.empty((h, w, 3), dtype=np.float64)
    rgb[:, :, 0] = y + 1.402 * cr
    rgb[:, :, 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[:, :, 2] = y + 1.772 * cb
    np.round(rgb, out=rgb)
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.astype(np.uint8)
