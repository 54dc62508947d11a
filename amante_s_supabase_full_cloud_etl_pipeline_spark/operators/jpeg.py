"""Native baseline JPEG codec — pure numpy + stdlib, no image library.

Closes the last compressed-codec gate in the multimodal surface
(VERDICT r3 "What's missing" #1): a web-crawl multimodal corpus is
mostly JPEG, and a locked-down cluster may not carry Pillow. BMP/PPM
(r2) and PNG (r3) already decode natively; this adds ITU-T T.81
baseline sequential JPEG:

- decoder: SOI/APPn/COM/DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS/RSTn/EOI
  marker parse, canonical Huffman entropy decode via a 16-bit-window
  LUT with byte-unstuffing, dequant + inverse zigzag, 8×8 IDCT as
  batched matmuls (BLAS, every block of a component at once), nearest
  chroma upsample (4:4:4, 4:2:2, 4:2:0), JFIF YCbCr→RGB. Grayscale
  (1 component) and RGB (3 component) frames, sequential AND
  progressive (SOF2, T.81 Annex G: spectral selection + successive
  approximation with EOB runs and the correction-bit protocol —
  web crawls are ~10-20% progressive, so the no-dependency story
  needs it natively). Lossless/arithmetic/hierarchical frames return
  None (the PIL probe remains the fallback, as for WebP).
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

#: Progressive-mode AC Huffman table: the Annex-K "typical" tables
#: are sequential-only — they carry EOB0 (0x00) and ZRL (0xF0) but
#: none of the EOBn run symbols (0x10..0xE0) Annex G scans emit. This
#: flat table covers the FULL progressive AC alphabet — every
#: (run, size) with size 1..10, ZRL, and EOB0..EOB14 — as 8-bit codes
#: (176 symbols; Kraft sum 176/256 < 1, max canonical code 175 ≠ the
#: forbidden all-ones). Deliberately uniform: the encoder exists for
#: differential tests and corpora, not rate optimization, and a
#: uniform table keeps it trivially valid for any coefficient stats.
_PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}
    | {0xF0}
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_VALS)  # all codes 8 bits long

#: 12-bit-precision alphabets (T.81 F.1.2, 12-bit column): DC
#: difference categories run 0..15 and AC sizes 1..14, both past what
#: the 8-bit Annex-K tables carry. Same deliberately-uniform shape as
#: the progressive table above: 16 DC symbols as 5-bit codes (Kraft
#: 16/32, max code 15 != the forbidden all-ones 31) and 226 AC
#: symbols — every (run, size) with size 1..14, EOB, ZRL — as 8-bit
#: codes (226/256, max code 225 != 255).
_EXT_DC_VALS = list(range(16))
_EXT_DC_BITS = [0] * 16
_EXT_DC_BITS[4] = 16
_EXT_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 15)} | {0x00, 0xF0}
)
_EXT_AC_BITS = [0] * 16
_EXT_AC_BITS[7] = len(_EXT_AC_VALS)
#: 12-bit progressive AC: sizes 1..14 PLUS the EOBn run symbols
#: (240 symbols as 8-bit codes; Kraft 240/256, max code 239 != 255).
#: A separate table from the 8-bit progressive one so 8-bit streams
#: are byte-identical to what they were before 12-bit support.
_EXT_PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 15)}
    | {r << 4 for r in range(15)}
    | {0xF0}
)
_EXT_PROG_AC_BITS = [0] * 16
_EXT_PROG_AC_BITS[7] = len(_EXT_PROG_AC_VALS)

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


def _fdct_quant(
    plane: np.ndarray, qtable_raster: np.ndarray, level: float = 128.0
) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 64) quantized zigzag coefficients for
    a level-shifted component plane whose dims are multiples of 8 —
    every block transformed in one einsum pair. ``level`` is the T.81
    A.3.1 shift: 2^(P-1), i.e. 128 for 8-bit samples, 2048 for
    12-bit."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - level
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


# ---------------------------------------------------------------------------
# Progressive scan emission (T.81 Annex G encoder side)
# ---------------------------------------------------------------------------


def _enc_dc_first(writer, comp_zz, samp, al, mcux, mcuy, dc_code_sets):
    """Interleaved first DC scan: values arrive arithmetic-shifted by
    Al (the DC point transform), difference-coded per component."""
    preds = [0] * len(comp_zz)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(comp_zz)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(comp_zz[ci][my * sv + by, mx * sh + bx, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        cat, bits = _magnitude(diff)
                        code, ln = dc_code_sets[ci][cat]
                        writer.write(code, ln)
                        if cat:
                            writer.write(bits, cat)


def _enc_dc_refine(writer, comp_zz, samp, al, mcux, mcuy):
    """DC refinement scan: one raw bit per block — bit Al of each DC
    coefficient, no Huffman coding (G.1.2.1)."""
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(comp_zz)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(comp_zz[ci][my * sv + by, mx * sh + bx, 0])
                        writer.write((v >> al) & 1, 1)


def _flush_eobrun(writer, ac_codes, eobrun: int, pending) -> int:
    """Emit the pending EOBn symbol (+ run-length bits) followed by
    the correction bits buffered across the run's blocks."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        writer.write(code, ln)
        if r:
            writer.write(eobrun - (1 << r), r)
        for bit in pending:
            writer.write(bit, 1)
        pending.clear()
    return 0


def _enc_ac_first(writer, plane, ac_codes, ss, se, al, rows, cols):
    """First AC scan of band [ss, se] at approximation Al: run-length
    coding over the point-transformed magnitudes (truncate-toward-zero
    by Al per G.1.2.2), EOB runs accumulated across blocks."""
    eobrun = 0
    pending: list[int] = []  # unused in first scans; shared flush shape
    for row in range(rows):
        for col in range(cols):
            zz = plane[row, col]
            tvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            last = -1
            for i, t in enumerate(tvals):
                if t:
                    last = i
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
                continue
            eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
            r = 0
            for i in range(last + 1):
                t = tvals[i]
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.write(code, ln)
                    r -= 16
                cat = t.bit_length()
                v = t if int(zz[ss + i]) > 0 else -t
                bits = v if v > 0 else v + (1 << cat) - 1
                code, ln = ac_codes[(r << 4) | cat]
                writer.write(code, ln)
                writer.write(bits, cat)
                r = 0
            if last != se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
    _flush_eobrun(writer, ac_codes, eobrun, pending)


def _enc_ac_refine(writer, plane, ac_codes, ss, se, al, rows, cols):
    """AC refinement scan (G.1.2.3): newly-nonzero coefficients emit
    (run, 1) symbols + a sign bit; already-nonzero coefficients emit
    buffered correction bits (their bit Al), attached after the next
    emitted symbol or carried with the EOB run."""
    eobrun = 0
    pending: list[int] = []  # correction bits riding the EOB run
    for row in range(rows):
        for col in range(cols):
            zz = plane[row, col]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = -1  # band index of the last NEWLY-nonzero coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            br: list[int] = []  # this block's buffered correction bits
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.write(code, ln)
                    r -= 16
                    for bit in br:
                        writer.write(bit, 1)
                    br = []
                if t > 1:
                    # history-nonzero: correction bit only; does NOT
                    # break the zero-history run
                    br.append(t & 1)
                    continue
                # newly nonzero (point-transformed magnitude exactly 1)
                eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
                code, ln = ac_codes[(r << 4) | 1]
                writer.write(code, ln)
                writer.write(1 if int(zz[ss + i]) > 0 else 0, 1)
                for bit in br:
                    writer.write(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(writer, ac_codes, eobrun, pending)
    _flush_eobrun(writer, ac_codes, eobrun, pending)


def encode_jpeg(
    pixels,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
    cmyk_transform: str = "ycck",
    adobe_rgb: bool = False,
    scan_layout: str = "interleaved",
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JFIF JPEG.

    ``subsample=True`` writes 4:2:0 chroma (the web norm); default is
    4:4:4 for maximum round-trip fidelity. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (how
    web encoders bound error propagation — exercises the decoder's
    restart path). Annex-K Huffman tables, quality-scaled Annex-K
    quant tables.

    ``progressive=True`` writes an SOF2 stream (T.81 Annex G) with a
    libjpeg-style scan script: point-transformed DC first scan + DC
    refinement, per-component spectral-selection AC bands at two
    successive-approximation levels, then AC refinement scans — the
    web's progressive shape, exercising EOB runs, ZRL, and the
    correction-bit protocol. Quantized coefficients are IDENTICAL to
    the sequential mode's, so a progressive round-trip must decode to
    exactly the sequential round-trip's pixels (the differential the
    tests pin). Restart markers are not emitted in progressive mode
    (decode supports them; pass ``restart_interval=0``).

    ``precision=12`` writes 12-bit extended-sequential (SOF1) or
    progressive (SOF2) per T.81: samples 0..4095 (a uint8 input is
    shifted left 4; a wider dtype is taken as 12-bit values), level
    shift 2048, 16-bit (Pq=1) DQT entries, and full-range Huffman
    alphabets (DC categories to 15, AC sizes to 14 — past Annex K's
    8-bit tables). Quant entries are clamped to >= 2 in this mode so
    coefficient magnitudes stay inside those alphabets.

    An (h, w, 4) input is Adobe CMYK, in the INVERTED representation
    Adobe writers store (sample = max - ink, so an empty plate is
    max): ``cmyk_transform="ycck"`` (the Photoshop norm) runs the
    inverted CMY through the YCbCr transform with K passed through
    and writes APP14 transform=2; ``"cmyk"`` stores the four planes
    directly with APP14 transform=0. ``subsample`` applies to the
    Cb/Cr planes of YCCK only (K stays full-resolution, like Y).

    ``adobe_rgb=True`` stores a 3-channel input as R,G,B planes with
    NO color transform, declared via APP14 transform=0 (libjpeg's
    JCS_RGB shape — rare but real in Adobe pipelines). Incompatible
    with ``subsample`` (there are no chroma planes to subsample).

    ``scan_layout="per_component"`` emits sequential frames as ONE
    non-interleaved scan per component (T.81 A.2.2 — the multi-SOS
    sequential shape libjpeg can write, common for CMYK/12-bit) —
    identical quantized coefficients, so pixels must equal the
    interleaved round-trip exactly. Sequential only, no restart
    markers."""
    if progressive and restart_interval:
        raise ValueError(
            "restart markers are not emitted in progressive mode"
        )
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12:
        a = np.asarray(pixels)
        if a.size == 0:
            raise ValueError("empty image")
        if a.dtype == np.uint8:
            # bit replication, not <<4: maps 0..255 onto the FULL
            # 0..4095 range (255 -> 4095), so white round-trips to
            # white instead of 254 (plain <<4 tops out at 4080 and
            # the decode-side 255/4095 rescale would darken by ~0.4%)
            arr = (a.astype(np.int64) << 4) | (a.astype(np.int64) >> 4)
        else:
            arr = a.astype(np.int64)
            if arr.min() < 0 or arr.max() > 4095:
                raise ValueError("12-bit samples must be in 0..4095")
    else:
        arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    cmyk = arr.ndim == 3 and arr.shape[2] == 4
    if cmyk and cmyk_transform not in ("ycck", "cmyk"):
        raise ValueError(f"cmyk_transform must be 'ycck' or 'cmyk', got {cmyk_transform!r}")
    if cmyk and progressive:
        raise ValueError("progressive CMYK is not emitted (decode supports it)")
    if cmyk and subsample and cmyk_transform == "cmyk":
        raise ValueError("subsample requires the ycck transform (chroma planes)")
    if adobe_rgb and (gray or cmyk):
        raise ValueError("adobe_rgb requires a 3-channel input")
    if adobe_rgb and subsample:
        raise ValueError("adobe_rgb has no chroma planes to subsample")
    if scan_layout not in ("interleaved", "per_component"):
        raise ValueError(
            f"scan_layout must be 'interleaved' or 'per_component', got {scan_layout!r}"
        )
    if scan_layout == "per_component" and (progressive or restart_interval):
        raise ValueError(
            "per_component scans are sequential-only, without restart markers"
        )
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    maxv = 255.0 if precision == 8 else 4095.0
    mid = 128.0 if precision == 8 else 2048.0

    ql = scale_quant(QUANT_LUMA, quality)
    qc = scale_quant(QUANT_CHROMA, quality)
    if precision == 12:
        # keep quantized magnitudes inside the 12-bit alphabets (DC
        # diff category <= 15, AC size <= 14): with q >= 2 the worst
        # DC coefficient is 8*2048/2 = 8192 (diff category 15) and
        # the worst AC ~10.5*2048/2 (size 14)
        ql = np.maximum(ql, 2)
        qc = np.maximum(qc, 2)

    def to_ycc(r, g, b):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
        return [y, np.clip(cb, 0, maxv), np.clip(cr, 0, maxv)]

    if gray:
        planes = [arr.astype(np.float64)]
    elif cmyk and cmyk_transform == "cmyk":
        planes = [arr[:, :, i].astype(np.float64) for i in range(4)]
    elif cmyk:  # ycck: inverted CMY through the YCbCr transform
        f = arr.astype(np.float64)
        planes = to_ycc(f[:, :, 0], f[:, :, 1], f[:, :, 2]) + [f[:, :, 3]]
    elif adobe_rgb:  # R,G,B planes stored directly (no transform)
        planes = [arr[:, :, i].astype(np.float64) for i in range(3)]
    else:
        rgb = arr.astype(np.float64)
        planes = to_ycc(rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])

    ncomp = len(planes)
    if gray:
        samp = [(1, 1)]
        tqs = [0]
        chroma_like = [False]
    elif adobe_rgb:
        samp = [(1, 1)] * 3
        tqs = [0, 0, 0]
        chroma_like = [False] * 3
    elif cmyk:
        if subsample:  # ycck only (checked above)
            samp = [(2, 2), (1, 1), (1, 1), (2, 2)]
        else:
            samp = [(1, 1)] * 4
        chroma_like = (
            [False, True, True, False]
            if cmyk_transform == "ycck"
            else [False] * 4
        )
        tqs = [1 if c else 0 for c in chroma_like]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        tqs = [0, 1, 1]
        chroma_like = [False, True, True]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        tqs = [0, 1, 1]
        chroma_like = [False, True, True]
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
        qt = qc if chroma_like[ci] else ql
        comp_zz.append(_fdct_quant(np.clip(plane, 0, maxv), qt, level=mid))

    # --- headers -----------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    if cmyk or adobe_rgb:
        # Adobe APP14 declares the component transform (2 = YCCK,
        # 0 = plain CMYK, or untransformed RGB for 3 components)
        # and, for 4-component frames, the inverted-sample convention
        # Adobe writers use
        adobe = (
            b"Adobe"
            + struct.pack(">H", 100)  # DCTEncode version
            + b"\x00\x00\x00\x00"  # flags0, flags1
            + bytes([2 if (cmyk and cmyk_transform == "ycck") else 0])
        )
        out += b"\xff\xee" + struct.pack(">H", len(adobe) + 2) + adobe
    else:
        app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tid, table):
        if precision == 12:
            # Pq=1: 16-bit entries (and exercises that decode path)
            body = bytes([0x10 | tid]) + b"".join(
                struct.pack(">H", int(x)) for x in table[ZIGZAG]
            )
        else:
            body = bytes([tid]) + bytes(int(x) for x in table[ZIGZAG])
        return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body

    out += dqt(0, ql)
    if 1 in tqs:
        out += dqt(1, qc)

    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, tqs[ci]])
    if progressive:
        sof_marker = b"\xff\xc2"
    elif precision == 12:
        sof_marker = b"\xff\xc1"  # baseline (SOF0) is 8-bit only
    else:
        sof_marker = b"\xff\xc0"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof

    def dht(tclass, tid, bits, vals):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    if precision == 12:
        # full-range alphabets for every component (slot 0 only)
        out += dht(0, 0, _EXT_DC_BITS, _EXT_DC_VALS)
        out += dht(1, 0, _EXT_AC_BITS, _EXT_AC_VALS)
        dc_l = dc_c = _canonical_codes(_EXT_DC_BITS, _EXT_DC_VALS)
        ac_l = ac_c = _canonical_codes(_EXT_AC_BITS, _EXT_AC_VALS)
        ths = [0] * ncomp
    else:
        out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        ths = [1 if c else 0 for c in chroma_like]
        if 1 in ths:
            out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    if progressive:
        # Annex-K AC tables lack the EOBn symbols Annex G emits:
        # override both AC table slots with the full-alphabet
        # progressive table (DHT redefinition is legal mid-stream);
        # 12-bit uses the size<=14 variant
        pb, pv = (
            (_EXT_PROG_AC_BITS, _EXT_PROG_AC_VALS)
            if precision == 12
            else (_PROG_AC_BITS, _PROG_AC_VALS)
        )
        out += dht(1, 0, pb, pv)
        if 1 in ths:
            out += dht(1, 1, pb, pv)
        prog_ac = _canonical_codes(pb, pv)
        dc_code_sets = [dc_c if ths[ci] else dc_l for ci in range(ncomp)]
        ac_code_sets = [prog_ac for _ in range(ncomp)]
        # per-component OWN block grid for the non-interleaved AC
        # scans (ceil(ceil(dim·sampling/max)/8), T.81 A.2.2)
        sub = []
        for ci in range(ncomp):
            sh, sv = samp[ci]
            xi = -(-(w * sh) // hmax)
            yi = -(-(h * sv) // vmax)
            sub.append((-(-yi // 8), -(-xi // 8)))  # (rows, cols)

        def sos_header(scan_cis, ss, se, ah, al):
            sos = bytes([len(scan_cis)])
            for ci in scan_cis:
                td = ths[ci]
                sos += bytes([ci + 1, (td << 4) | td])
            sos += bytes([ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        def emit(scan_cis, ss, se, ah, al):
            nonlocal out
            out += sos_header(scan_cis, ss, se, ah, al)
            writer = _BitWriter()
            if ss == 0:
                if ah == 0:
                    _enc_dc_first(
                        writer, comp_zz, samp, al, mcux, mcuy, dc_code_sets
                    )
                else:
                    _enc_dc_refine(writer, comp_zz, samp, al, mcux, mcuy)
            else:
                (ci,) = scan_cis
                rows, cols = sub[ci]
                if ah == 0:
                    _enc_ac_first(
                        writer, comp_zz[ci], ac_code_sets[ci], ss, se, al,
                        rows, cols,
                    )
                else:
                    _enc_ac_refine(
                        writer, comp_zz[ci], ac_code_sets[ci], ss, se, al,
                        rows, cols,
                    )
            writer.flush()
            out += writer.out

        all_cis = list(range(ncomp))
        emit(all_cis, 0, 0, 0, 1)  # DC first, one bit held back
        # luma AC: split spectral bands, two approximation levels
        emit([0], 1, 5, 0, 2)
        emit([0], 6, 63, 0, 2)
        for ci in range(1, ncomp):  # chroma AC at Al=1
            emit([ci], 1, 63, 0, 1)
        emit(all_cis, 0, 0, 1, 0)  # DC refinement
        emit([0], 1, 5, 2, 1)  # luma AC refinement 2→1
        emit([0], 6, 63, 2, 1)
        emit([0], 1, 5, 1, 0)  # luma AC refinement 1→0
        emit([0], 6, 63, 1, 0)
        for ci in range(1, ncomp):  # chroma AC refinement 1→0
            emit([ci], 1, 63, 1, 0)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    if scan_layout == "per_component":
        # one non-interleaved scan per component, each traversing the
        # component's OWN block grid (T.81 A.2.2), predictors reset
        # at every SOS
        for ci in range(ncomp):
            sos = bytes([1, ci + 1, (ths[ci] << 4) | ths[ci], 0, 63, 0])
            out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
            sh, sv = samp[ci]
            xi = -(-(w * sh) // hmax)
            yi = -(-(h * sv) // vmax)
            cols = -(-xi // 8)
            rows = -(-yi // 8)
            dc_codes = dc_c if ths[ci] else dc_l
            ac_codes = ac_c if ths[ci] else ac_l
            writer = _BitWriter()
            pred = 0
            for row in range(rows):
                for col in range(cols):
                    pred = _encode_blocks(
                        writer, comp_zz[ci][row, col], pred, dc_codes, ac_codes
                    )
            writer.flush()
            out += writer.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (ths[ci] << 4) | ths[ci]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # --- entropy-coded scan (interleaved MCUs) -----------------------------
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
                dc_codes = dc_c if ths[ci] else dc_l
                ac_codes = ac_c if ths[ci] else ac_l
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


#: segments up to this size box their windows into a Python list
#: (fastest per-symbol indexing, ~30 bytes/byte); above it the int64
#: ndarray is kept (slower numpy-scalar ops but 8 bytes/byte) so one
#: multi-MB scan cannot balloon a worker's transient memory 30x
_WINDOW_LIST_MAX_BYTES = 2 * 1024 * 1024


def _bit_windows(segdata: bytes):
    """(u32, total_bits) for LUT entropy decode: ``u32[i]`` holds the
    big-endian 32-bit window starting at byte ``i``, built in one
    vectorized pass, so peeking 16 bits at ANY bit position p is two
    int ops: ``(u32[p >> 3] >> (16 - (p & 7))) & 0xFFFF``. The 8-byte
    zero pad lets the final symbols peek past the end; overrun is
    caught by the position checks (per-symbol at entry, per-segment
    at exit) instead. int64 (not uint32) so that downstream signed
    arithmetic on the peeked values never wraps."""
    buf = segdata + b"\x00" * 8
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    windows = (a[:-3] << 24) | (a[1:-2] << 16) | (a[2:-1] << 8) | a[3:]
    if len(segdata) <= _WINDOW_LIST_MAX_BYTES:
        return windows.tolist(), len(segdata) * 8
    return windows, len(segdata) * 8


def decode_jpeg(blob: bytes):
    """Huffman-coded JPEG → (h, w, 3) uint8 RGB, or None on any
    unsupported/corrupt stream (lossless, arithmetic coding,
    hierarchical, truncated data). Covers baseline/extended
    sequential AND progressive (SOF0/1/2), 8- and 12-bit precision
    (12-bit scales to the 8-bit output contract), and 1/3/4
    components — grayscale, YCbCr, and Adobe CMYK/YCCK via the APP14
    transform declaration."""
    try:
        return _decode_jpeg_strict(bytes(blob))
    except Exception:
        return None


#: SOFn markers the native decoder handles (baseline + extended
#: sequential + progressive Huffman)
_SOF_SUPPORTED = {0xC0, 0xC1, 0xC2}
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


#: synthetic marker yielded by _iter_segments(through_scans=True)
#: carrying one scan's entropy span as (start, end) — computed ONCE
#: during the walk so the decoder never re-scans the same bytes
_SCAN_DATA = -1


def _entropy_end(b: bytes, pos: int) -> int:
    """First byte index at/after ``pos`` holding a real marker (not a
    stuffed 0xFF00, not RSTn) — the end of an entropy-coded span."""
    p = pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00 and not (0xD0 <= b[p + 1] <= 0xD7):
            return p
        p += 1
    return len(b)


def _iter_segments(b: bytes, through_scans: bool = False):
    """Shared marker-stream walk (the ONE place that knows T.81's
    framing: SOI check, 0xFF fill-byte skip per B.1.1.2, standalone
    markers, segment lengths). Yields ``(marker, seg, next_pos)`` —
    ``seg`` is None for standalone markers; stops after EOI or — by
    default — after the first SOS (entropy data follows SOS at
    ``next_pos``). With ``through_scans=True`` it instead yields a
    synthetic ``(_SCAN_DATA, (start, end), end)`` entry for each
    scan's entropy span and keeps walking, which is how the
    progressive decoder visits every scan of an SOF2 stream without
    re-scanning the span bytes it already walked. Raises
    ValueError on malformed framing. Both :func:`jpeg_frame_info` and
    the decoder consume this, so a framing fix can never apply to one
    and not the other (that drift is exactly the gate-vs-S4
    misclassification the probe exists to prevent)."""
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
            if not through_scans:
                return
            end = _entropy_end(b, pos)
            yield _SCAN_DATA, (pos, end), end
            pos = end


def jpeg_frame_info(blob: bytes):
    """Marker-level probe (no entropy decode): the stream's SOF shape,
    or None when no well-formed SOF is found. Returns
    ``{"sof": marker, "precision": p, "n_components": n}``.

    This is how callers distinguish "legitimate JPEG flavor the native
    decoder declines" (lossless/arithmetic-coded/hierarchical — route
    to the PIL gate, loudly; progressive, 12-bit, and CMYK all decode
    natively) from "corrupt data" (S4 per-row skip) —
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
    decoder supports: Huffman baseline / extended-sequential /
    progressive, 8- or 12-bit (12-bit not on SOF0 — baseline is
    8-bit only per T.81), 1/3/4 components (grayscale, YCbCr, Adobe
    CMYK/YCCK)."""
    return (
        info is not None
        and info["sof"] in _SOF_SUPPORTED
        and info["precision"] in (8, 12)
        and not (info["precision"] == 12 and info["sof"] == 0xC0)
        and info["n_components"] in (1, 3, 4)
    )


def legitimate_undecodable_frame(info) -> bool:
    """True when the frame is a VALID JPEG flavor the native decoder
    declines — lossless / arithmetic-coded / hierarchical SOFs —
    i.e. the cases a PIL fallback could genuinely decode and the
    batch kernel should gate on LOUDLY. (12-bit and 4-component
    frames decode natively now, so only the exotic entropy/frame
    modes remain here.) An impossible shape (precision 9, zero
    components — bit-flipped corruption that still parses) is NOT
    legitimate: no decoder accepts it, so it must stay an S4 per-row
    skip. Lossless SOFs allow 2..16-bit sample precision (T.81
    B.2.2), hence the wider precision window for those."""
    if info is None or native_decodable_frame(info):
        return False
    if info["sof"] not in _SOF_MARKERS or info["n_components"] not in (1, 3, 4):
        return False
    if info["sof"] in (0xC3, 0xC7, 0xCB, 0xCF):  # lossless
        return 2 <= info["precision"] <= 16
    # 12-bit-on-SOF0 is malformed, not a legitimate flavor
    if info["sof"] in _SOF_SUPPORTED:
        return False
    return info["precision"] in (8, 12)


def _decode_jpeg_strict(b: bytes):
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    progressive = False
    restart_interval = 0
    seq_scans = []  # sequential (start, end, scan_comps, sel, dri)
    pending = None  # parsed SOS header awaiting its _SCAN_DATA span
    prog = None  # _ProgressiveState once the first SOF2 scan arrives
    adobe = None  # APP14 color transform (None = no Adobe marker)
    # marker framing is delegated to the shared _iter_segments walk
    # (same framing jpeg_frame_info sees — they cannot drift);
    # through_scans lets the walk continue past each scan's entropy
    # span, which is how every scan of a progressive stream is visited
    for marker, seg, next_pos in _iter_segments(b, through_scans=True):
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
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec = seg[0]
            # baseline (SOF0) is 8-bit only per T.81; 12-bit rides
            # extended sequential (SOF1) or progressive (SOF2)
            if prec not in (8, 12) or (prec == 12 and marker == 0xC0):
                return None
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3, 4):
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
            progressive = marker == 0xC2
        elif marker == 0xEE:  # APP14: Adobe color-transform declaration
            if len(seg) >= 12 and seg[:5] == b"Adobe":
                adobe = seg[11]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: header only; the span follows as
            # a synthetic _SCAN_DATA entry (computed once by the walk)
            if frame is None:
                return None
            ns = seg[0]
            scan_comps = []  # ORDERED (cid, dc_table, ac_table)
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
                sel[cs] = (tt >> 4, tt & 0xF)
            pending = (
                scan_comps,
                sel,
                seg[1 + 2 * ns],
                seg[2 + 2 * ns],
                seg[3 + 2 * ns],
            )
        elif marker == _SCAN_DATA:
            if pending is None:
                return None
            start, end = seg
            scan_comps, sel, ss, se, a = pending
            pending = None
            if not progressive:
                # sequential: collect every scan — T.81 allows the
                # frame's components to arrive across several
                # (non-)interleaved scans, not just one (DRI may also
                # change between scans, so capture it per scan)
                seq_scans.append((start, end, scan_comps, sel, restart_interval))
                continue
            if prog is None:
                prog = _ProgressiveState(frame)
            prog.apply_scan(
                b[start:end],
                scan_comps,
                ss,
                se,
                a >> 4,
                a & 0xF,
                htables,
                restart_interval,
            )
        # APPn/COM and anything else: skipped
    if progressive:
        if prog is None:
            return None
        return prog.reconstruct(qtables, adobe)
    if frame is None or not seq_scans:
        return None
    if len(seq_scans) == 1 and len(seq_scans[0][2]) == len(frame["comps"]):
        # the overwhelmingly common shape: ONE scan interleaving every
        # component — the specialized fast path, byte-identical to
        # what it always decoded
        start, end, _, sel, ri = seq_scans[0]
        return _decode_scan(b, frame, (start, end, sel), qtables, htables, ri, adobe)
    return _decode_sequential_multiscan(
        b, frame, seq_scans, qtables, htables, adobe
    )


def _decode_scan(b, frame, scan, qtables, htables, restart_interval, adobe=None):
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
    segments = _split_restart_segments(b[start:end], restart_interval)

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
        if pos > total_bits:
            # the final symbols' VALUE bits ran into the zero pad — a
            # stream truncated mid-coefficient must be a None (S4),
            # not silently-wrong pixels
            raise EOFError("truncated entropy data")
    for ci in range(ncomp):
        blks, ks, vs = acc[ci]
        if blks:
            bh, bw2, _ = planes[ci].shape
            planes[ci].reshape(bh * bw2, 64)[blks, ks] = vs

    return _reconstruct(
        planes, comps, qtables, h, w, hmax, vmax, mcux, mcuy,
        frame.get("prec", 8), adobe,
    )


def _split_restart_segments(raw: bytes, restart_interval: int) -> list[bytes]:
    """Unstuffed entropy bytes, one segment per restart interval (one
    segment total when restarts are off)."""
    if not restart_interval:
        return [raw.replace(b"\xff\x00", b"\xff")]
    segments = []
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
    return segments


def _decode_sequential_multiscan(b, frame, scans, qtables, htables, adobe):
    """Sequential decode across SEVERAL scans — T.81 lets a frame's
    components arrive in any partition of (non-)interleaved scans
    (libjpeg's one-SOS-per-component shape is real, especially for
    CMYK and 12-bit output). Each scan decodes into the shared
    per-component coefficient planes with its own DC predictors and
    restart interval; reconstruction is the shared path. The
    one-interleaved-scan case never reaches here — it keeps the
    specialized fast loop in :func:`_decode_scan`."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(comps) == 1:
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    planes = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    ]
    acc = [([], [], []) for _ in comps]
    coded: set[int] = set()

    for start, end, scan_comps, sel, ri in scans:
        cis = []
        for cid, _, _ in scan_comps:
            if cid not in by_id:
                return None
            cis.append(by_id[cid])
        tabs = []
        for ci in cis:
            c = comps[ci]
            dc_t = htables.get((0, sel[c["id"]][0]))
            ac_t = htables.get((1, sel[c["id"]][1]))
            if dc_t is None or ac_t is None:
                return None
            tabs.append((dc_t[0], dc_t[1], ac_t[0], ac_t[1]))
        interleaved = len(cis) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            # non-interleaved: the component's OWN grid (T.81 A.2.2)
            c = comps[cis[0]]
            xi = -(-(w * c["h"]) // hmax)  # ceil(w*h_i/hmax)
            yi = -(-(h * c["v"]) // vmax)
            cols = -(-xi // 8)
            rows = -(-yi // 8)
            n_units = rows * cols
        segments = _split_restart_segments(b[start:end], ri)
        per_seg = ri or n_units
        unit = 0
        seg_idx = 0
        while unit < n_units:
            if seg_idx >= len(segments):
                return None
            u32, total_bits = _bit_windows(segments[seg_idx])
            seg_idx += 1
            preds = [0] * len(cis)
            pos = 0
            for _ in range(min(per_seg, n_units - unit)):
                for si, ci in enumerate(cis):
                    c = comps[ci]
                    dc_sym, dc_len, ac_sym, ac_len = tabs[si]
                    blks, ks, vs = acc[ci]
                    bw = mcux * c["h"]
                    if interleaved:
                        my, mx = divmod(unit, mcux)
                        targets = [
                            (my * c["v"] + by) * bw + mx * c["h"] + bx
                            for by in range(c["v"])
                            for bx in range(c["h"])
                        ]
                    else:
                        row, col = divmod(unit, cols)
                        targets = [row * bw + col]
                    pred = preds[si]
                    for blk in targets:
                        if pos >= total_bits:
                            raise EOFError("truncated entropy data")
                        w16 = (u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
                        length = dc_len[w16]
                        if length == 0:
                            raise ValueError("bad Huffman code")
                        cat = dc_sym[w16]
                        pos += length
                        if cat:
                            v = (
                                (u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
                            ) >> (16 - cat)
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
                            v = (
                                (u32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
                            ) >> (16 - s)
                            pos += s
                            if v < (1 << (s - 1)):
                                v += (-1 << s) + 1
                            blks.append(blk)
                            ks.append(k)
                            vs.append(v)
                            k += 1
                    preds[si] = pred
                unit += 1
            if pos > total_bits:
                raise EOFError("truncated entropy data")
        coded.update(cis)

    if len(coded) != len(comps):
        # a stream cut BETWEEN scans leaves whole components uncoded —
        # that must be a None (S4, same truncation contract as
        # mid-scan cuts), never a partial-color best-effort image
        return None

    for ci in range(len(comps)):
        blks, ks, vs = acc[ci]
        if blks:
            bh, bw2, _ = planes[ci].shape
            planes[ci].reshape(bh * bw2, 64)[blks, ks] = vs

    return _reconstruct(
        planes, comps, qtables, h, w, hmax, vmax, mcux, mcuy,
        frame.get("prec", 8), adobe,
    )


def _reconstruct(
    planes, comps, qtables, h, w, hmax, vmax, mcux, mcuy, prec=8, adobe=None
):
    """Coefficient planes → pixels: dequant + inverse zigzag + IDCT
    (vectorized per component), chroma upsample, color transform.
    Shared by the sequential and progressive paths — the modes differ
    only in how the coefficient planes are entropy-decoded.

    ``prec`` sets the T.81 level shift (2^(P-1)) and sample range;
    12-bit decodes scale to the uint8 output contract at the end.
    ``adobe`` is the APP14 transform for 4-component frames: 2 =
    YCCK, anything else = plain CMYK; the marker's PRESENCE signals
    Adobe's inverted-sample convention (sample = max - ink), its
    absence plain ink values (the libjpeg convention)."""
    mid = 128.0 if prec == 8 else 2048.0
    maxv = 255.0 if prec == 8 else 4095.0
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
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + mid
        )
        # nearest upsample to full MCU-grid resolution
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    scale = 255.0 / maxv  # 12-bit → 8-bit output contract

    def to_u8(a):
        a = np.clip(a, 0, maxv)
        if prec != 8:
            a = a * scale
        return np.clip(np.round(a), 0, 255).astype(np.uint8)

    if len(comps) == 1:
        if prec == 8:
            # truncating astype, byte-for-byte what goldens pin
            y = np.clip(out_planes[0][:h, :w], 0, 255).astype(np.uint8)
        else:
            y = to_u8(out_planes[0][:h, :w])
        return np.stack([y, y, y], axis=2)

    if len(comps) == 4:
        p = [pl[:h, :w] for pl in out_planes]
        if adobe == 2:  # YCCK: inverted CMY rode the YCbCr transform
            y, cb, cr = p[0], p[1] - mid, p[2] - mid
            sc = y + 1.402 * cr
            sm = y - 0.344136 * cb - 0.714136 * cr
            sy_ = y + 1.772 * cb
            sk = p[3]
        elif adobe is not None:  # Adobe CMYK: stored inverted already
            sc, sm, sy_, sk = p
        else:  # no Adobe marker: plain ink values — invert to s-form
            sc, sm, sy_, sk = (maxv - v for v in p)
        sk = np.clip(sk, 0, maxv)
        rgb = np.empty((h, w, 3), dtype=np.float64)
        # s = max - ink; R = sC*sK/max (the standard multiplicative
        # CMYK composite on the inverted representation)
        for i, s in enumerate((sc, sm, sy_)):
            rgb[:, :, i] = np.clip(s, 0, maxv) * sk / maxv
        return to_u8(rgb)

    if adobe == 0:
        # Adobe RGB: APP14 transform=0 on a 3-component frame means
        # the samples ARE R,G,B — no YCbCr matrix (libjpeg JCS_RGB)
        rgb = np.stack([pl[:h, :w] for pl in out_planes], axis=2)
        return to_u8(rgb)
    y = out_planes[0][:h, :w]
    cb = out_planes[1][:h, :w] - mid
    cr = out_planes[2][:h, :w] - mid
    # identical float64 arithmetic to the reference formulation; the
    # preallocated target just avoids np.stack's extra copy
    rgb = np.empty((h, w, 3), dtype=np.float64)
    rgb[:, :, 0] = y + 1.402 * cr
    rgb[:, :, 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[:, :, 2] = y + 1.772 * cb
    if prec == 8:
        np.round(rgb, out=rgb)
        np.clip(rgb, 0, 255, out=rgb)
        return rgb.astype(np.uint8)
    return to_u8(rgb)


class _Cursor:
    """Bit cursor over one unstuffed entropy segment, sharing the
    16-bit-window LUT fast path with the sequential decoder."""

    __slots__ = ("u32", "total", "pos")

    def __init__(self, segdata: bytes):
        self.u32, self.total = _bit_windows(segdata)
        self.pos = 0

    def sym(self, table) -> int:
        if self.pos >= self.total:
            raise EOFError("truncated entropy data")
        w16 = (self.u32[self.pos >> 3] >> (16 - (self.pos & 7))) & 0xFFFF
        ln = table[1][w16]
        if ln == 0:
            raise ValueError("bad Huffman code")
        self.pos += ln
        return table[0][w16]

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos >= self.total:
            raise EOFError("truncated entropy data")
        v = ((self.u32[self.pos >> 3] >> (16 - (self.pos & 7))) & 0xFFFF) >> (
            16 - n
        )
        self.pos += n
        return v


class _ProgressiveState:
    """Coefficient accumulation across the scans of an SOF2 stream
    (ITU-T T.81 Annex G): spectral-selection bands arrive per
    component; successive-approximation scans deliver coefficients one
    bit at a time — first scans carry values shifted left by Al, and
    refinement scans OR in the next lower bit (plus the
    correction-bit protocol for already-nonzero coefficients).
    Blocks live as zigzag-ordered Python lists while scans apply
    (scattered scalar updates), converted to numpy planes once for
    the shared :func:`_reconstruct`.

    The control flow below (EOB-run accounting, the zero-history run
    walk in refinement) follows the spec's G.1.2 decode procedures —
    the same structure every conforming decoder implements."""

    def __init__(self, frame):
        h, w, comps = frame["h"], frame["w"], frame["comps"]
        if len(comps) == 1:
            # single-component frames are non-interleaved everywhere;
            # declared sampling factors are ignored (T.81 A.2.2)
            comps = [dict(comps[0], h=1, v=1)]
        self.h, self.w = h, w
        self.comps = comps
        self.prec = frame.get("prec", 8)
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if self.hmax < 1 or self.vmax < 1:
            raise ValueError("bad sampling factors")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.by_id: dict[int, int] = {}
        self.coef: list[list[list[int]]] = []
        self.dims: list[tuple[int, int]] = []
        self.sub: list[tuple[int, int]] = []
        for ci, c in enumerate(comps):
            bw = self.mcux * c["h"]
            bh = self.mcuy * c["v"]
            self.coef.append([[0] * 64 for _ in range(bh * bw)])
            self.dims.append((bh, bw))
            # non-interleaved scans traverse the component's OWN grid
            # ceil(ceil(dim·sampling/max)/8) — smaller than the padded
            # MCU grid for subsampled components (T.81 A.2.2)
            xi = -(-(w * c["h"]) // self.hmax)
            yi = -(-(h * c["v"]) // self.vmax)
            self.sub.append((-(-yi // 8), -(-xi // 8)))  # (rows, cols)
            self.by_id[c["id"]] = ci
        self.eobrun = 0

    # -- scan dispatch ------------------------------------------------------

    def apply_scan(
        self, raw, scan_comps, ss, se, ah, al, htables, restart_interval
    ) -> None:
        segments = _split_restart_segments(raw, restart_interval)
        for cid, _, _ in scan_comps:
            if cid not in self.by_id:
                raise ValueError("scan references unknown component")
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se == 0")
            self._dc_scan(segments, scan_comps, ah, al, htables, restart_interval)
        else:
            if len(scan_comps) != 1 or se > 63 or ss > se:
                raise ValueError("bad AC scan header")
            self._ac_scan(
                segments, scan_comps[0], ss, se, ah, al, htables, restart_interval
            )

    # -- DC scans -----------------------------------------------------------

    def _dc_scan(self, segments, scan_comps, ah, al, htables, restart_interval):
        interleaved = len(scan_comps) > 1
        if interleaved:
            n_units = self.mcux * self.mcuy  # MCUs
        else:
            rows, cols = self.sub[self.by_id[scan_comps[0][0]]]
            n_units = rows * cols  # blocks of the one component
        tables = {}
        if ah == 0:
            for cid, td, _ in scan_comps:
                t = htables.get((0, td))
                if t is None:
                    raise ValueError("missing DC table")
                tables[cid] = t
        per_seg = restart_interval or n_units
        unit = 0
        seg_idx = 0
        while unit < n_units:
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            cur = _Cursor(segments[seg_idx])
            seg_idx += 1
            preds = {cid: 0 for cid, _, _ in scan_comps}
            for _ in range(min(per_seg, n_units - unit)):
                if interleaved:
                    my, mx = divmod(unit, self.mcux)
                    for cid, _, _ in scan_comps:
                        ci = self.by_id[cid]
                        c = self.comps[ci]
                        _, bw = self.dims[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = (my * c["v"] + by) * bw + mx * c["h"] + bx
                                self._dc_unit(
                                    cur, self.coef[ci][blk], preds, cid,
                                    tables, ah, al,
                                )
                else:
                    cid = scan_comps[0][0]
                    ci = self.by_id[cid]
                    _, cols = self.sub[ci]
                    _, bw = self.dims[ci]
                    r, cc = divmod(unit, cols)
                    self._dc_unit(
                        cur, self.coef[ci][r * bw + cc], preds, cid,
                        tables, ah, al,
                    )
                unit += 1
            if cur.pos > cur.total:
                raise EOFError("truncated entropy data")

    @staticmethod
    def _dc_unit(cur, block, preds, cid, tables, ah, al):
        if ah == 0:  # first scan: value arrives point-transformed
            cat = cur.sym(tables[cid])
            v = cur.bits(cat)
            if cat:
                if v < (1 << (cat - 1)):
                    v += (-1 << cat) + 1
                preds[cid] += v
            block[0] = preds[cid] << al
        else:  # refinement: one raw bit, no Huffman
            if cur.bits(1):
                block[0] |= 1 << al

    # -- AC scans -----------------------------------------------------------

    def _ac_scan(self, segments, scomp, ss, se, ah, al, htables, restart_interval):
        _, _, ta = scomp
        table = htables.get((1, ta))
        if table is None:
            raise ValueError("missing AC table")
        ci = self.by_id[scomp[0]]
        rows, cols = self.sub[ci]
        _, bw = self.dims[ci]
        n_units = rows * cols
        per_seg = restart_interval or n_units
        unit = 0
        seg_idx = 0
        while unit < n_units:
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            cur = _Cursor(segments[seg_idx])
            seg_idx += 1
            self.eobrun = 0
            for _ in range(min(per_seg, n_units - unit)):
                r, cc = divmod(unit, cols)
                block = self.coef[ci][r * bw + cc]
                if ah == 0:
                    self._ac_first(cur, table, block, ss, se, al)
                else:
                    self._ac_refine(cur, table, block, ss, se, al)
                unit += 1
            if cur.pos > cur.total:
                raise EOFError("truncated entropy data")

    def _ac_first(self, cur, table, block, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = cur.sym(table)
            r, s = rs >> 4, rs & 0xF
            if s:
                k += r
                if k > se:
                    raise ValueError("AC run overruns spectral band")
                v = cur.bits(s)
                if v < (1 << (s - 1)):
                    v += (-1 << s) + 1
                block[k] = v << al
                k += 1
            else:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: this block ends now; (2^r - 1 + bits) more follow
                self.eobrun = (1 << r) - 1 + cur.bits(r)
                return

    def _ac_refine(self, cur, table, block, ss, se, al):
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = cur.sym(table)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("bad AC refinement symbol")
                    newval = p1 if cur.bits(1) else m1
                elif r != 15:
                    # EOBn covering this and (2^r - 1 + bits) more
                    # blocks; the remaining band positions still carry
                    # correction bits (handled below)
                    self.eobrun = (1 << r) + cur.bits(r)
                    break
                # advance over r zero-HISTORY coefficients, emitting a
                # correction bit for every nonzero-history one passed
                while k <= se:
                    c = block[k]
                    if c != 0:
                        if cur.bits(1) and not (c & p1):
                            block[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    block[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:
                c = block[k]
                if c != 0:
                    if cur.bits(1) and not (c & p1):
                        block[k] = c + (p1 if c >= 0 else m1)
                k += 1
            self.eobrun -= 1

    # -- output -------------------------------------------------------------

    def reconstruct(self, qtables, adobe=None):
        planes = [
            np.array(self.coef[ci], dtype=np.int64).reshape(
                self.dims[ci][0], self.dims[ci][1], 64
            )
            for ci in range(len(self.comps))
        ]
        return _reconstruct(
            planes, self.comps, qtables, self.h, self.w,
            self.hmax, self.vmax, self.mcux, self.mcuy,
            self.prec, adobe,
        )
