"""Clean-room FLAC decode — the lossless-audio tier of the media
intake path (charter extension, SURVEY.md §2.10; reference analog:
none — the reference ingests spreadsheet rows, `main.py:98`).

Why this is NOT ADR-gated like WebP/H.264/AAC (VERDICT r10 missing
#2): FLAC's bitstream (RFC 9639 / the published format spec) carries
NO fixed constant tables — every decode step is arithmetic derivable
from the spec text alone: Rice/unary residual codes, order-0..4
polynomial "fixed" predictors with binomial-coefficient weights, and
integer LPC whose quantized coefficients ride IN the stream. A
clean-room implementation can therefore be verified end-to-end
(CRC-8/CRC-16 framing checks, the STREAMINFO MD5 of the decoded PCM,
hand-built byte fixtures, encoder↔decoder differentials) without any
risk of a guessed-table codec self-confirming.

Wire structure implemented (RFC 9639):

- stream marker ``fLaC`` + metadata blocks (STREAMINFO parsed in
  full; VORBIS_COMMENT tags surfaced; others measured + skipped);
- frames: 14-bit sync, blocking strategy, coded block size / sample
  rate / sample size, channel assignment incl. the three stereo
  decorrelation modes (left/side, right/side, mid/side — side
  channel carries +1 bit), UTF-8-style coded frame/sample number
  (36-bit extension), CRC-8 header check, CRC-16 frame check;
- subframes: CONSTANT, VERBATIM, FIXED order 0-4, LPC order 1-32
  (stream-carried quantized coefficients, arithmetic right shift),
  wasted-bits unary prefix;
- residual: 4-bit and 5-bit Rice partitions (partition order 0-15),
  escape partitions (raw n-bit two's complement, n=0 meaning all
  zeros), zigzag unfold.

Everything is bounded (metadata length, block size, channel count,
total-sample bomb cap) and every structural violation returns None —
the per-row S4 skip contract every media kernel here shares. The
decoder is a worker-side Python kernel invoked under ``mapInPandas``
(same shape as the JPEG/GIF/MP4 decoders): map-only, no shuffle, no
driver involvement.
"""

from __future__ import annotations

import struct

_MAX_METADATA = 1 << 23       # one metadata block, 8 MiB (the spec
#                               field maxes at 16 MiB-1; the tighter
#                               bound keeps the guard LIVE — review
#                               catch: a cap equal to the field max
#                               can never fire)
_MAX_CHANNELS = 8
_MAX_BLOCKSIZE = 65_535
_MAX_TOTAL_SAMPLES = 1 << 26  # bomb cap: ~64M samples ≈ 25 min/48kHz
_MAX_VORBIS_TAGS = 256

_SAMPLE_RATES = {
    1: 88_200, 2: 176_400, 3: 192_000, 4: 8_000, 5: 16_000,
    6: 22_050, 7: 24_000, 8: 32_000, 9: 44_100, 10: 48_000,
    11: 96_000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: order-k fixed predictor weights on a[i-1..i-k] (pascal rows with
#: alternating signs — derivable: predictor = k-th forward-difference
#: extrapolation)
_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


class _Broken(Exception):
    """Structural damage → the caller returns None (S4)."""


# ── CRCs (spec polynomials, bit-derived — no table constants) ───


def _crc8_table():
    tab = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tab.append(c)
    return tab


def _crc16_table():
    tab = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (
                (c << 1) & 0xFFFF
            )
        tab.append(c)
    return tab


_CRC8 = _crc8_table()
_CRC16 = _crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


#: x^k mod p(x) weights for the vectorized CRC path, grown on demand
_CRC16_POW = None


def _crc16_pow(nbits: int):
    """uint16 array of x^k mod 0x18005 for k in [0, nbits) — the
    per-bit-position weights of the vectorized CRC (grown by
    doubling; a few hundred KB at the largest frame sizes)."""
    import numpy as np

    global _CRC16_POW
    if _CRC16_POW is None:
        _CRC16_POW = np.array([1], dtype=np.uint16)
    if _CRC16_POW.shape[0] < nbits:
        want = max(nbits, 2 * _CRC16_POW.shape[0], 4096)
        out = np.empty(want, dtype=np.uint16)
        out[: _CRC16_POW.shape[0]] = _CRC16_POW
        c = int(_CRC16_POW[-1])
        for k in range(_CRC16_POW.shape[0], want):
            c <<= 1
            if c & 0x10000:
                c ^= 0x18005
            out[k] = c
        _CRC16_POW = out
    return _CRC16_POW


def crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0, non-reflected (the FLAC frame
    CRC). For short inputs: the classic byte-table loop. For frame-
    sized inputs (r13, optimization round — this function was a
    third of whole-file decode): the GF(2)-linear form — the CRC of
    an n-bit message M is Σ_{i: m_i=1} x^(n-1-i+16) mod p, so one
    ``unpackbits`` + boolean-index + ``bitwise_xor.reduce`` over the
    precomputed weight table computes it vectorized, ~6-10× the
    table loop; bit-identical (differential-tested against the byte
    loop over every length class)."""
    n = len(data)
    if n >= 64:
        try:
            import numpy as np

            nbits = 8 * n
            w = _crc16_pow(nbits + 16)[16: 16 + nbits][::-1]
            bits = np.unpackbits(np.frombuffer(data, np.uint8))
            # zero out unset positions, then xor-reduce in 4-lane
            # uint64 chunks (xor is lane-wise; one final lane fold)
            masked = np.multiply(w, bits, dtype=np.uint16)
            pad = (-masked.shape[0]) % 4
            if pad:
                masked = np.concatenate(
                    [masked, np.zeros(pad, dtype=np.uint16)]
                )
            r = int(
                np.bitwise_xor.reduce(
                    np.ascontiguousarray(masked).view(np.uint64)
                )
            )
            r ^= r >> 32
            r ^= r >> 16
            return r & 0xFFFF
        except ImportError:
            pass
    c = 0
    for b in data:
        c = _CRC16[(c >> 8) ^ b] ^ ((c << 8) & 0xFFFF)
    return c


# ── bit reader (MSB-first, byte-addressable) ────────────────────


class _Bits:
    """MSB-first reader over bytes with a Python-int accumulator;
    refills 48 bytes at a time so short reads cost one shift."""

    __slots__ = ("data", "bytepos", "acc", "n")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bytepos = bytepos
        self.acc = 0
        self.n = 0

    def _fill(self):
        p = self.bytepos
        # 48-byte refills: the accumulator is a Python int either
        # way, and fewer refills cut the decoder's hottest call
        # count ~6x (measured)
        chunk = self.data[p:p + 48]
        if not chunk:
            raise _Broken("bitstream eof")
        self.bytepos = p + len(chunk)
        self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(
            chunk, "big"
        )
        self.n += 8 * len(chunk)

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        out = self.acc >> self.n
        self.acc &= (1 << self.n) - 1
        return out

    def sread(self, nbits: int) -> int:
        """Two's-complement signed read."""
        v = self.read(nbits)
        return v - (1 << nbits) if nbits and v >> (nbits - 1) else v

    def unary(self) -> int:
        """Count of 0 bits before the terminating 1 (consumed)."""
        q = 0
        while True:
            if self.n == 0:
                self._fill()
            if self.acc == 0:
                q += self.n
                self.n = 0
                continue
            msb = self.acc.bit_length()
            q += self.n - msb
            self.n = msb - 1
            self.acc &= (1 << self.n) - 1
            return q

    def align(self):
        drop = self.n % 8
        if drop:
            self.read(drop)

    def tell_bytes(self) -> int:
        """Byte offset of the NEXT unread bit (must be aligned)."""
        return self.bytepos - self.n // 8


# ── metadata ────────────────────────────────────────────────────


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise _Broken("streaminfo short")
    bits = _Bits(body)
    info = {
        "min_blocksize": bits.read(16),
        "max_blocksize": bits.read(16),
        "min_framesize": bits.read(24),
        "max_framesize": bits.read(24),
        "sample_rate": bits.read(20),
        "channels": bits.read(3) + 1,
        "bits_per_sample": bits.read(5) + 1,
        "total_samples": bits.read(36),
        "md5": body[18:34],
    }
    if info["sample_rate"] == 0:
        raise _Broken("zero sample rate")
    if info["channels"] > _MAX_CHANNELS:
        raise _Broken("channel cap")
    if info["total_samples"] > _MAX_TOTAL_SAMPLES:
        raise _Broken("total-sample cap")
    return info


def _parse_vorbis_comment(body: bytes) -> dict:
    """vendor + tag dict (lowercased keys, first value wins);
    lenient — a clipped comment block yields what parsed."""
    tags: dict = {}
    try:
        (vlen,) = struct.unpack_from("<I", body, 0)
        pos = 4 + vlen
        vendor = body[4:pos].decode("utf-8", "replace")
        (count,) = struct.unpack_from("<I", body, pos)
        pos += 4
        for _ in range(min(count, _MAX_VORBIS_TAGS)):
            (ln,) = struct.unpack_from("<I", body, pos)
            pos += 4
            entry = body[pos:pos + ln].decode("utf-8", "replace")
            pos += ln
            if pos > len(body):
                break
            k, sep, v = entry.partition("=")
            if sep and k:
                tags.setdefault(k.lower(), v)
        return {"vendor": vendor, "tags": tags}
    except (struct.error, IndexError):
        return {"vendor": None, "tags": tags}


def _walk_metadata(blob: bytes):
    """(streaminfo, vorbis, first_frame_offset) or _Broken."""
    if len(blob) < 42 or blob[:4] != b"fLaC":
        raise _Broken("no fLaC marker")
    pos = 4
    streaminfo = None
    vorbis = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(blob):
            raise _Broken("metadata eof")
        hdr = blob[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(blob[pos + 1:pos + 4], "big")
        if btype == 127 or length > _MAX_METADATA:
            raise _Broken("bad metadata block")
        body = blob[pos + 4:pos + 4 + length]
        if len(body) < length:
            raise _Broken("metadata clipped")
        if first:
            if btype != 0:
                raise _Broken("first block not STREAMINFO")
            streaminfo = _parse_streaminfo(body)
            first = False
        elif btype == 0:
            raise _Broken("duplicate STREAMINFO")
        elif btype == 4 and vorbis is None:
            vorbis = _parse_vorbis_comment(body)
        pos += 4 + length
    return streaminfo, vorbis, pos


# ── frame decoding ──────────────────────────────────────────────


def _coded_number(bits: _Bits) -> int:
    """UTF-8-style variable-length number, extended to 36 bits."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise _Broken("bad coded number")
    val = first & (0x3F >> n)
    for _ in range(n):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise _Broken("bad continuation byte")
        val = (val << 6) | (b & 0x3F)
    return val


def _residual(bits: _Bits, blocksize: int, order: int) -> list:
    method = bits.read(2)
    if method > 1:
        raise _Broken("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        # spec: the block size must divide evenly into partitions
        raise _Broken("partition order mismatch")
    out = []
    append = out.append
    # r13 (optimization round, guide §4.2 per-task work): the rice
    # loop below runs once per SAMPLE — it was the decoder's hottest
    # path as bits.unary()/read() method calls (each re-reading and
    # re-writing attribute state). The reader state (accumulator,
    # live bit count, byte position) is localized here and written
    # back on every exit path; the bit-level algorithm is unchanged
    # and the decoded values are pinned bit-exactly by the existing
    # PCM-crc32 differentials.
    data = bits.data
    acc, nb, pos = bits.acc, bits.n, bits.bytepos
    try:
        for p in range(nparts):
            count = (blocksize >> po) - (order if p == 0 else 0)
            if count < 0:
                raise _Broken("negative partition count")
            while nb < plen:  # param read
                chunk = data[pos:pos + 48]
                if not chunk:
                    raise _Broken("bitstream eof")
                pos += len(chunk)
                acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                nb += 8 * len(chunk)
            nb -= plen
            param = acc >> nb
            acc &= (1 << nb) - 1
            if param == escape:
                while nb < 5:
                    chunk = data[pos:pos + 48]
                    if not chunk:
                        raise _Broken("bitstream eof")
                    pos += len(chunk)
                    acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                    nb += 8 * len(chunk)
                nb -= 5
                raw = acc >> nb
                acc &= (1 << nb) - 1
                if raw == 0:
                    out.extend([0] * count)
                else:
                    sign = 1 << (raw - 1)
                    full = 1 << raw
                    for _ in range(count):
                        while nb < raw:
                            chunk = data[pos:pos + 48]
                            if not chunk:
                                raise _Broken("bitstream eof")
                            pos += len(chunk)
                            acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                            nb += 8 * len(chunk)
                        nb -= raw
                        v = acc >> nb
                        acc &= (1 << nb) - 1
                        append(v - full if v & sign else v)
                continue
            for _ in range(count):
                # unary: count 0 bits before the terminating 1
                q = 0
                while True:
                    if nb == 0:
                        chunk = data[pos:pos + 48]
                        if not chunk:
                            raise _Broken("bitstream eof")
                        pos += len(chunk)
                        acc = int.from_bytes(chunk, "big")
                        nb = 8 * len(chunk)
                    if acc == 0:
                        q += nb
                        nb = 0
                        continue
                    msb = acc.bit_length()
                    q += nb - msb
                    nb = msb - 1
                    acc &= (1 << nb) - 1
                    break
                if param:
                    while nb < param:
                        chunk = data[pos:pos + 48]
                        if not chunk:
                            raise _Broken("bitstream eof")
                        pos += len(chunk)
                        acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                        nb += 8 * len(chunk)
                    nb -= param
                    folded = (q << param) | (acc >> nb)
                    acc &= (1 << nb) - 1
                else:
                    folded = q
                append((folded >> 1) ^ -(folded & 1))
    finally:
        bits.acc, bits.n, bits.bytepos = acc, nb, pos
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list:
    if bits.read(1):
        raise _Broken("subframe pad bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise _Broken("wasted bits exceed sample size")
    if ftype == 0:
        val = bits.sread(eff)
        samples = [val] * blocksize
    elif ftype == 1:
        sread = bits.sread
        samples = [sread(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:
        order = ftype - 8
        if order > blocksize:
            raise _Broken("fixed order exceeds block")
        samples = [bits.sread(eff) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            base = order + i
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[base - 1 - j]
            samples.append(r + pred)
    elif ftype >= 32:
        order = ftype - 31
        if order > blocksize:
            raise _Broken("lpc order exceeds block")
        samples = [bits.sread(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise _Broken("invalid lpc precision")
        shift = bits.sread(5)
        if shift < 0:
            raise _Broken("negative lpc shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        for i, r in enumerate(res):
            base = order + i
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[base - 1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise _Broken("reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(blob: bytes, pos: int, info: dict):
    """One frame at byte offset ``pos`` → (channels-major sample
    lists, next_pos, header dict)."""
    if pos + 5 > len(blob):
        raise _Broken("frame eof")
    if blob[pos] != 0xFF or (blob[pos + 1] & 0xFC) != 0xF8:
        raise _Broken("bad sync")
    bits = _Bits(blob, pos)
    bits.read(14)                     # sync
    if bits.read(1):
        raise _Broken("reserved frame bit")
    variable = bits.read(1)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise _Broken("reserved frame bit 2")
    coded_num = _coded_number(bits)
    if bs_code == 0:
        raise _Broken("reserved block size")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code in _SAMPLE_RATES:
        rate = _SAMPLE_RATES[sr_code]
    elif sr_code == 12:
        rate = bits.read(8) * 1000
    elif sr_code == 13:
        rate = bits.read(16)
    elif sr_code == 14:
        rate = bits.read(16) * 10
    else:
        raise _Broken("invalid sample rate code")
    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code in _SAMPLE_SIZES:
        bps = _SAMPLE_SIZES[ss_code]
    else:
        raise _Broken("reserved sample size")
    if ch_code <= 7:
        nch = ch_code + 1
        mode = "independent"
    elif ch_code <= 10:
        nch = 2
        mode = ("left_side", "right_side", "mid_side")[ch_code - 8]
    else:
        raise _Broken("reserved channel assignment")
    if blocksize > _MAX_BLOCKSIZE:
        raise _Broken("blocksize cap")
    hdr_end = bits.tell_bytes()
    if crc8(blob[pos:hdr_end]) != bits.read(8):
        raise _Broken("header crc8 mismatch")
    chans = []
    for c in range(nch):
        ch_bps = bps
        if (mode in ("left_side", "mid_side") and c == 1) or (
            mode == "right_side" and c == 0
        ):
            ch_bps += 1  # the side channel carries one extra bit
        chans.append(_subframe(bits, blocksize, ch_bps))
    bits.align()
    frame_end = bits.tell_bytes()
    if frame_end + 2 > len(blob):
        raise _Broken("frame crc16 eof")
    want = int.from_bytes(blob[frame_end:frame_end + 2], "big")
    if crc16(blob[pos:frame_end]) != want:
        raise _Broken("frame crc16 mismatch")
    # a LOSSLESS codec's decoded samples always fit bps bits — an
    # out-of-range value means a damaged-but-CRC-plausible stream
    # whose predictor state is already poisoned (and whose ints
    # would grow without bound through later frames): refuse (S4)
    lo, hi = -(1 << (bps)), (1 << (bps))  # ±1 bit of side-channel slack
    for ch in chans:
        if ch and not (lo <= min(ch) and max(ch) <= hi):
            raise _Broken("decoded sample out of range")
    # undo stereo decorrelation
    if mode == "left_side":
        left, side = chans
        chans = [left, [x - s for x, s in zip(left, side)]]
    elif mode == "right_side":
        side, right = chans
        chans = [[s + r for s, r in zip(side, right)], right]
    elif mode == "mid_side":
        mid, side = chans
        left, right = [], []
        for m, s in zip(mid, side):
            m = (m << 1) | (s & 1)
            left.append((m + s) >> 1)
            right.append((m - s) >> 1)
        chans = [left, right]
    return chans, frame_end + 2, {
        "blocksize": blocksize, "rate": rate, "bps": bps,
        "channels": nch, "mode": mode, "variable": bool(variable),
        "number": coded_num,
    }


# ── public surface ──────────────────────────────────────────────


def _walk_frames(b: bytes, info: dict, keep_samples: bool = True):
    """Shared single-pass frame walk: (channel-major sample lists,
    last frame's rate, n_frames, total_samples_decoded).
    ``keep_samples=False`` decodes each frame (hopping REQUIRES it —
    FLAC frames carry no length field) but retains nothing, so a
    metadata-only caller's memory stays one block, not the whole
    multi-GB PCM of a cap-sized file (review catch)."""
    nch = info["channels"]
    out = [[] for _ in range(nch)]
    total = 0
    n_frames = 0
    rate = info["sample_rate"]
    pos = info["__first_frame"]
    while pos < len(b):
        chans, pos, hdr = _decode_frame(b, pos, info)
        if hdr["channels"] != nch:
            raise _Broken("channel count changed mid-stream")
        rate = hdr["rate"]
        total += hdr["blocksize"]
        n_frames += 1
        # Bomb cap. When samples are RETAINED the cap must bound the
        # total ints held across ALL channels (a Rice escape raw=0
        # partition encodes 65535 zero samples in a few bits, so a
        # tiny crafted file can otherwise grow total×nch toward
        # executor OOM — review catch); a metadata-only walk retains
        # nothing, so there the cap bounds CPU only.
        retained = total * nch if keep_samples else total
        if retained > _MAX_TOTAL_SAMPLES:
            raise _Broken("total-sample cap")
        if not keep_samples:
            continue
        for c in range(nch):
            out[c].extend(chans[c])
    if info["total_samples"] and total < info["total_samples"]:
        raise _Broken("stream clipped before total_samples")
    return out, rate, n_frames, total


def decode_flac_pcm(blob: bytes | None):
    """Full decode: (channel-major list of int sample lists, rate,
    bits_per_sample, md5_ok) or None for damaged/non-FLAC input (S4).
    ``md5_ok`` is None when STREAMINFO carries no MD5 (all zeros),
    else the integrity verdict of the decoded PCM."""
    b = bytes(blob or b"")
    try:
        info, _vorbis, pos = _walk_metadata(b)
        info["__first_frame"] = pos
        out, rate, _n_frames, _total = _walk_frames(b, info)
        md5_ok = None
        if info["md5"] != b"\x00" * 16:
            md5_ok = _pcm_md5(
                out, info["bits_per_sample"]
            ) == info["md5"]
        return out, rate, info["bits_per_sample"], md5_ok
    except (_Broken, OverflowError):
        return None


def interleaved_pcm(chans: list, bps: int) -> bytes:
    """The decoded samples as interleaved little-endian PCM, sample
    width rounded up to whole bytes — the exact byte stream the spec
    MD5 hashes. Vectorized (one numpy transpose + cast; the old
    per-sample ``int.to_bytes`` loop was half the kernel's wall)."""
    import numpy as np

    if not chans or not chans[0]:
        return b""
    width = (bps + 7) // 8
    arr = np.asarray(chans, dtype=np.int64).T
    if width == 1:
        return arr.astype("<i1").tobytes()
    if width == 2:
        return arr.astype("<i2").tobytes()
    if width == 4:
        return arr.astype("<i4").tobytes()
    # width 3: the low three bytes of the little-endian i4 form
    b4 = arr.astype("<i4").view(np.uint8).reshape(-1, 4)
    return np.ascontiguousarray(b4[:, :3]).tobytes()


def _pcm_md5(chans: list, bps: int) -> bytes:
    """MD5 of the interleaved PCM exactly as the spec hashes it."""
    import hashlib

    return hashlib.md5(interleaved_pcm(chans, bps)).digest()


def decode_flac(blob: bytes | None):
    """(mono float64 samples in [-1, 1], rate) — the
    :func:`..operators.multimodal.decode_wav` contract, so the audio
    fingerprint kernels treat WAV and FLAC interchangeably. Channels
    fold by mean; None on damage (S4)."""
    import numpy as np

    decoded = decode_flac_pcm(blob)
    if decoded is None:
        return None
    chans, rate, bps, _md5_ok = decoded
    if not chans or not chans[0] or rate <= 0:
        return None
    arr = np.asarray(chans, dtype=np.float64)
    mono = arr.mean(axis=0) if arr.shape[0] > 1 else arr[0]
    return mono / float(1 << (bps - 1)), rate


def parse_flac_meta(blob: bytes | None):
    """Container metadata WITHOUT full decode: STREAMINFO fields,
    vorbis tags, frame count from a header-hop walk (each frame's
    subframes are still parsed — FLAC has no frame-length field, so
    hopping requires decoding; the cost is the same, the point is
    the row shape). None on damage (S4)."""
    b = bytes(blob or b"")
    try:
        info, vorbis, pos = _walk_metadata(b)
        info["__first_frame"] = pos
        _out, _rate, n_frames, total = _walk_frames(
            b, info, keep_samples=False
        )
        tags = (vorbis or {}).get("tags", {})
        return {
            "sample_rate": info["sample_rate"],
            "channels": info["channels"],
            "bits_per_sample": info["bits_per_sample"],
            "total_samples": info["total_samples"],
            "n_frames": n_frames,
            "decoded_samples": total,
            "title": tags.get("title"),
            "artist": tags.get("artist"),
            "vendor": (vorbis or {}).get("vendor"),
        }
    except (_Broken, OverflowError):
        return None


def sniff_flac(blob: bytes) -> bool:
    return bytes(blob or b"")[:4] == b"fLaC"


# ── fixture encoder (tests + synthetic corpus) ──────────────────


class _BitWriter:
    """MSB-first writer. r13 (optimization round): whole bytes are
    flushed in BULK via ``int.to_bytes`` once ≥64 accumulate (the
    old per-byte ``append`` loop was the encoder's hottest function
    at 330k calls per 40 fixtures); output bytes are identical by
    construction (differential-asserted over the fixture corpus)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int):
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        n = self.n + nbits
        if n >= 64:
            whole = n >> 3
            n -= whole << 3
            self.buf += (self.acc >> n).to_bytes(whole, "big")
            self.acc &= (1 << n) - 1
        self.n = n

    def unary(self, q: int):
        self.write(1, q + 1)

    def align(self):
        if self.n % 8:
            self.write(0, 8 - self.n % 8)

    def bytes(self) -> bytes:
        if self.n >= 8:  # flush any whole bytes still accumulated
            whole = self.n >> 3
            self.n -= whole << 3
            self.buf += (self.acc >> self.n).to_bytes(whole, "big")
            self.acc &= (1 << self.n) - 1
        assert self.n == 0
        return bytes(self.buf)


def _write_coded_number(w: _BitWriter, val: int):
    if val < 0x80:
        w.write(val, 8)
        return
    payload = []
    nbytes = 1
    while True:
        nbytes += 1
        # nbytes-byte form carries 6*(nbytes-1) + (7-nbytes) bits
        if val < 1 << (6 * (nbytes - 1) + 7 - nbytes):
            break
        if nbytes == 7:
            break
    rest = val
    for _ in range(nbytes - 1):
        payload.append(0x80 | (rest & 0x3F))
        rest >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | rest
    w.write(lead, 8)
    for b in reversed(payload):
        w.write(b, 8)


def _write_rice(w: _BitWriter, residual: list, param: int,
                plen: int, po: int, order: int, blocksize: int,
                escape_raw: int | None = None):
    w.write(0 if plen == 4 else 1, 2)
    w.write(po, 4)
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if escape_raw is not None:
            w.write((1 << plen) - 1, plen)
            w.write(escape_raw, 5)
            lo = -(1 << (escape_raw - 1)) if escape_raw else 0
            hi = (1 << (escape_raw - 1)) - 1 if escape_raw else 0
            for _ in range(count):
                r = residual[idx]
                if not lo <= r <= hi:
                    # refuse, never wrap: a silently masked residual
                    # would emit a corrupt-but-CRC-valid stream the
                    # decoder faithfully mis-decodes (caught when a
                    # rolled fixture channel's discontinuity blew the
                    # 14-bit escape width)
                    raise ValueError(
                        "residual %d does not fit escape width %d"
                        % (r, escape_raw)
                    )
                if escape_raw:
                    w.write(r, escape_raw)
                idx += 1
            continue
        w.write(param, plen)
        # fused rice write (r13): q zeros + terminator + param low
        # bits as ONE write call — ((1 << param) | low) over
        # q+1+param bits emits exactly the unary(q) + write(low)
        # byte stream (differential-asserted over the fixture corpus)
        mask = (1 << param) - 1
        top = 1 << param
        for _ in range(count):
            r = residual[idx]
            idx += 1
            folded = (-r) * 2 - 1 if r < 0 else r * 2  # zigzag
            w.write(top | (folded & mask), (folded >> param) + 1 + param)


def _encode_subframe(w: _BitWriter, samples: list, bps: int,
                     kind: str, order: int = 2, rice_param: int = 4,
                     po: int = 0, wasted: int = 0,
                     lpc_coefs: list | None = None,
                     lpc_shift: int = 5, rice5: bool = False,
                     escape_raw: int | None = None):
    blocksize = len(samples)
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
    eff = bps - wasted
    if kind == "constant":
        w.write(0, 8)        # pad + type 000000 + no wasted flag
        if wasted:
            raise ValueError("constant+wasted not used by fixtures")
        w.write(samples[0], eff)
        return
    plen = 5 if rice5 else 4
    if kind == "verbatim":
        w.write(1, 7)  # pad 0 + type 000001
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        for s in samples:
            w.write(s, eff)
        return
    if kind == "fixed":
        w.write(8 + order, 7)  # pad0 + 001xxx
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        for s in samples[:order]:
            w.write(s, eff)
        coefs = _FIXED_COEFS[order]
        residual = []
        for i in range(order, blocksize):
            pred = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coefs)
            )
            residual.append(samples[i] - pred)
        _write_rice(w, residual, rice_param, plen, po, order,
                    blocksize, escape_raw)
        return
    if kind == "lpc":
        coefs = lpc_coefs or [3, -1]
        order = len(coefs)
        prec = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
        w.write(32 + order - 1, 7)  # pad0 + 1xxxxx
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        for s in samples[:order]:
            w.write(s, eff)
        w.write(prec - 1, 4)
        w.write(lpc_shift, 5)
        for c in coefs:
            w.write(c, prec)
        residual = []
        for i in range(order, blocksize):
            acc = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coefs)
            )
            residual.append(samples[i] - (acc >> lpc_shift))
        _write_rice(w, residual, rice_param, plen, po, order,
                    blocksize, escape_raw)
        return
    raise ValueError(kind)


def encode_flac(
    channels: list,
    rate: int = 16_000,
    bps: int = 16,
    blocksize: int = 4096,
    subframe: str = "fixed",
    order: int = 2,
    rice_param: int = 4,
    partition_order: int = 0,
    stereo_mode: str = "independent",
    wasted: int = 0,
    lpc_coefs: list | None = None,
    lpc_shift: int = 5,
    rice5: bool = False,
    escape_raw: int | None = None,
    tags: dict | None = None,
    variable_blocking: bool = False,
) -> bytes:
    """Spec-shaped fixture encoder (tests + synthetic corpus): every
    wire feature the decoder handles, selected explicitly — NOT a
    compressing encoder (no predictor search). ``channels`` is a
    channel-major list of int sample lists."""
    nch = len(channels)
    n = len(channels[0])
    assert all(len(c) == n for c in channels)
    out = bytearray(b"fLaC")
    # STREAMINFO
    si = _BitWriter()
    si.write(min(blocksize, n) if n else blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + _pcm_md5(channels, bps)
    vorbis = b""
    if tags is not None:
        vendor = b"spark-graft fixture encoder"
        entries = [
            ("%s=%s" % (k, v)).encode("utf-8")
            for k, v in sorted(tags.items())
        ]
        vorbis = struct.pack("<I", len(vendor)) + vendor
        vorbis += struct.pack("<I", len(entries))
        for e in entries:
            vorbis += struct.pack("<I", len(e)) + e
    out += bytes([0x80 if not vorbis else 0x00])
    out += len(body).to_bytes(3, "big") + body
    if vorbis:
        out += bytes([0x84]) + len(vorbis).to_bytes(3, "big") + vorbis
    # frames
    pos = 0
    frame_no = 0
    while pos < n or (n == 0 and frame_no == 0):
        bs = min(blocksize, n - pos)
        if bs <= 0:
            break
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(1 if variable_blocking else 0, 1)
        w.write(7, 4)       # 16-bit blocksize-1 field (always exact)
        w.write(0, 4)       # sample rate from STREAMINFO
        if stereo_mode == "independent":
            ch_code = nch - 1
        else:
            assert nch == 2
            ch_code = {"left_side": 8, "right_side": 9,
                       "mid_side": 10}[stereo_mode]
        w.write(ch_code, 4)
        w.write(0, 3)       # sample size from STREAMINFO
        w.write(0, 1)
        _write_coded_number(
            w, pos if variable_blocking else frame_no
        )
        w.write(bs - 1, 16)
        hdr = w  # crc8 over everything written so far
        w.align()
        hdr_bytes = w.bytes()
        w2 = _BitWriter()
        w2.buf = bytearray(hdr_bytes)
        w2.write(crc8(hdr_bytes), 8)
        # subframes with stereo transforms
        subs = []
        block = [c[pos:pos + bs] for c in channels]
        if stereo_mode == "independent":
            for c in range(nch):
                subs.append((block[c], bps))
        elif stereo_mode == "left_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(block[0], bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(side, bps + 1), (block[1], bps)]
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(block[0], block[1])]
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(mid, bps), (side, bps + 1)]
        for samples, sb in subs:
            _encode_subframe(
                w2, samples, sb, subframe, order=order,
                rice_param=rice_param, po=partition_order,
                wasted=wasted, lpc_coefs=lpc_coefs,
                lpc_shift=lpc_shift, rice5=rice5,
                escape_raw=escape_raw,
            )
        w2.align()
        frame = w2.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
        pos += bs
        frame_no += 1
    return bytes(out)


# ── Spark kernel + synthetic corpus ─────────────────────────────


def flac_meta(media):
    """Map-only Arrow kernel: one row per decodable FLAC blob —
    STREAMINFO fields, frame count, vorbis title/artist, the
    spec-mandated MD5 integrity verdict, and a CRC-32 of the decoded
    interleaved PCM (a FULL value pin of the decode output — any
    residual/predictor/stereo regression moves it). Non-FLAC and
    damaged blobs emit nothing (S4). Expects (doc_id, blob)."""
    import zlib

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sample_rate", LongType()),
            StructField("channels", LongType()),
            StructField("bits_per_sample", LongType()),
            StructField("total_samples", LongType()),
            StructField("n_frames", LongType()),
            StructField("title", StringType()),
            StructField("artist", StringType()),
            StructField("md5_state", LongType()),
            StructField("pcm_crc32", LongType()),
        ]
    )
    return media.filter(
        F.col("doc_id").isNotNull() & F.col("blob").isNotNull()
    ).mapInPandas(_meta_kernel, schema)


def _flac_meta_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sample_rate", LongType()),
            StructField("channels", LongType()),
            StructField("bits_per_sample", LongType()),
            StructField("total_samples", LongType()),
            StructField("n_frames", LongType()),
            StructField("title", StringType()),
            StructField("artist", StringType()),
            StructField("md5_state", LongType()),
            StructField("pcm_crc32", LongType()),
        ]
    )


def _meta_kernel(batches):
    """mapInPandas body of :func:`flac_meta` (module-level so the
    fused composition can reuse it; null blobs S4-skip in-kernel)."""
    import hashlib
    import zlib

    import pandas as pd

    cols = [f.name for f in _flac_meta_schema().fields]
    for batch in batches:
        rows = []
        for doc_id, blob in zip(batch["doc_id"], batch["blob"]):
            b = bytes(blob) if blob is not None else b""
            # ONE decode pass serves metadata, frame count, MD5
            # verdict AND the value-pin CRC (the first cut ran
            # parse_flac_meta + decode_flac_pcm back to back —
            # two full decodes — and packed PCM with a per-sample
            # loop; together 2.5x the kernel's wall)
            try:
                info, vorbis, pos = _walk_metadata(b)
                info["__first_frame"] = pos
                chans, _rate, n_frames, _tot = _walk_frames(
                    b, info
                )
            except (_Broken, OverflowError):
                continue
            pcm = interleaved_pcm(
                chans, info["bits_per_sample"]
            )
            md5_ok = None
            if info["md5"] != b"\x00" * 16:
                md5_ok = (
                    hashlib.md5(pcm).digest() == info["md5"]
                )
            tags = (vorbis or {}).get("tags", {})
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "sample_rate": info["sample_rate"],
                    "channels": info["channels"],
                    "bits_per_sample": info["bits_per_sample"],
                    "total_samples": info["total_samples"],
                    "n_frames": n_frames,
                    "title": tags.get("title"),
                    "artist": tags.get("artist"),
                    "md5_state": (
                        -1 if md5_ok is None else int(md5_ok)
                    ),
                    "pcm_crc32": zlib.crc32(pcm),
                }
            )
        yield pd.DataFrame(rows, columns=cols)


def flac_meta_from_docs(docs):
    """Corpus synthesis + full decode in ONE Python hop (guide §4.1
    via :mod:`.fuse`) — bit-identical rows to
    ``flac_meta(synthetic_flac_corpus(docs).select(...))``."""
    from pyspark.sql import functions as F

    from .fuse import fused_pandas

    return fused_pandas(
        docs.filter(F.col("doc_id").isNotNull()).select("doc_id"),
        (_flac_corpus_kernel, _meta_kernel),
        _flac_meta_schema(),
    )


def build_flac_fixture(d: int) -> bytes:
    """One deterministic FLAC file for doc_id ``d``, cycling every
    wire shape the decoder handles: subframe kind (d%5: constant /
    verbatim / fixed order d%5 / lpc), stereo mode (d%4), Rice
    partition order (d%3), 5-bit Rice params (d%6==1), escape
    partitions (d%7==2), wasted bits (d%8==3), vorbis tags
    (d%2==0), variable blocking (d%9==4). Pure function of the id —
    identical at any partitioning."""
    import numpy as np

    rate = 8_000
    n = rate // 4 + (d % 4) * rate // 8
    t = np.arange(n, dtype=np.float64) / rate
    f0 = 120.0 + (d % 30) * 11.0
    wave = 0.55 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(
        2 * np.pi * 2.5 * f0 * t + (d % 5)
    )
    left = (wave * 9_000).astype(np.int64)
    kind = ("fixed", "verbatim", "fixed", "lpc", "fixed")[d % 5]
    order = (d % 3) + (0 if kind != "fixed" else 1)
    stereo = (
        "independent", "left_side", "right_side", "mid_side"
    )[d % 4]
    wasted = 2 if d % 8 == 3 else 0
    if wasted:
        # the stereo transforms halve (mid) the sample values, so a
        # wasted-bits fixture stays on independent channels where
        # the shifted-multiple invariant survives encoding
        stereo = "independent"
        left = (left >> wasted) << wasted
    if d % 5 == 0:
        chans = [[int(left[0])] * len(left)]
        kind = "constant"
        stereo = "independent"
    elif stereo == "independent" and d % 2:
        chans = [left.tolist()]
    else:
        # CONTINUOUS second channel (a phase-shifted copy): a rolled
        # copy's wrap discontinuity produces residuals beyond the
        # escape partitions' raw width
        right = (wave * 7_000 + 50.0 * (d % 13)).astype(np.int64)
        if wasted:
            right = (right >> wasted) << wasted
        chans = [left.tolist(), right.tolist()]
    return encode_flac(
        chans,
        rate=rate,
        bps=16,
        blocksize=1024 if d % 2 else 2048,
        subframe=kind,
        order=max(order, 1) if kind == "lpc" else order,
        rice_param=3 + d % 3,
        partition_order=d % 3 if kind in ("fixed", "lpc") else 0,
        stereo_mode=stereo if len(chans) == 2 else "independent",
        wasted=wasted if kind in ("verbatim", "fixed", "lpc") else 0,
        lpc_coefs=[34, -12, 5] if kind == "lpc" else None,
        lpc_shift=5,
        rice5=d % 6 == 1,
        escape_raw=14 if d % 7 == 2 and kind != "constant" else None,
        tags=(
            {"title": "Track %d" % d, "artist": "Fixture %d" % (d % 9)}
            if d % 2 == 0 else None
        ),
        variable_blocking=d % 9 == 4,
    )


def synthetic_flac_corpus(docs):
    """Deterministic fixture FLAC corpus keyed on doc_id (see
    :func:`build_flac_fixture`); every 11th ≡ 7 is non-FLAC garbage
    (S4-skipped). Same (doc_id, blob, media_type) contract as the
    other corpora."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("blob", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(_flac_corpus_kernel, schema)


def _flac_corpus_kernel(batches):
    """mapInPandas body of :func:`synthetic_flac_corpus`."""
    import pandas as pd

    for batch in batches:
        blobs, types = [], []
        for doc_id in batch["doc_id"]:
            d = int(doc_id)
            if d % 11 == 7:
                blobs.append(b"\x00\x01 not a flac stream")
                types.append("application/octet-stream")
            else:
                blobs.append(build_flac_fixture(d))
                types.append("audio/flac")
        yield pd.DataFrame(
            {"doc_id": batch["doc_id"], "blob": blobs,
             "media_type": types}
        )
