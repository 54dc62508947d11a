"""Native GIF codec (GIF87a/GIF89a, CompuServe spec + W3C annex) —
pure numpy/stdlib, no image libraries.

Charter extension (SURVEY.md §2.10 multimodal family; reference
analog: none — the reference pipeline is spreadsheet-only). GIFs are
a real slice of any web crawl, and unlike WebP/arithmetic-JPEG
(ADR'd out — their fixed probability/dictionary tables are not
derivable offline) GIF is fully spec-constructible: LZW has NO fixed
tables, just the code-width state machine defined in the spec
itself, so a from-scratch codec can be trusted against its own
round-trip plus PIL cross-checks where available.

Scope (documented, loud):
- decode: 87a + 89a, global AND local color tables, interlaced and
  sequential images, extension blocks skipped via their own
  sub-block framing, FIRST image frame only (an animation's later
  frames are deltas against disposal state — a feature-extraction
  pipeline samples frame 1). A frame smaller than / offset within
  the logical screen composites onto a background-color canvas of
  screen size (renderer semantics — the output shape is the canvas,
  not the frame rect). Transparency index is ignored: the palette
  color is returned (feature stats need pixels, not alpha).
  Header-declared sizes are capped (``_MAX_PIXELS``) so a crafted
  small blob cannot act as an LZW decompression bomb.
- encode: 89a, single non/interlaced image, global table built from
  the image's unique colors — raises ``ValueError`` beyond 256
  (this encoder is a fixture/test tool, not a quantizer).
- any framing/LZW corruption → ``None`` (S4 per-row skip), never an
  exception out of the kernel.

GIF is LOSSLESS, so unlike JPEG (whose IDCT is not bit-mandated)
PIL and this decoder produce IDENTICAL pixels — golden tables that
include GIF rows are decoder-independent.

The LZW state machine (both directions, kept mirror-symmetric so
encode→decode is self-consistent AND spec-consistent):
- initial code width = min_code_size + 1; CLEAR = 1 << mcs,
  EOI = CLEAR + 1; first assignable code = EOI + 1;
- the width grows (cap 12 bits) only once code value ``1 << width``
  has itself been assigned — NOT when the next assignment would
  first need the wider code. Both off-by-one variants self-round-
  trip, so the choice is pinned against external streams: the
  published GIF89a walkthrough sample and javax.imageio;
- at 4096 entries the encoder emits CLEAR and resets; the decoder
  also tolerates streams that instead keep coding against the full
  table (deferred clear, allowed by the spec);
- codes pack LSB-first into 255-byte-max data sub-blocks.
"""

from __future__ import annotations

_MAX_CODE = 4096

#: decode size cap (pixels). A GIF header is 13 bytes but can declare
#: a 65535x65535 canvas whose LZW stream amplifies ~2500x — an
#: unbounded decode is a decompression bomb that OOMs the executor
#: instead of S4-skipping the row. 2^26 px (= 8k x 8k, 192 MiB RGB)
#: exceeds any legitimate crawl GIF; beyond it the row degrades to
#: None like any other undecodable blob.
_MAX_PIXELS = 1 << 26


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-LZW compress a byte sequence of palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def fresh_table():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # the width grows only after code value (1 << width)
            # ITSELF has been assigned — codes are emitted at the old
            # width until then (pinned by the published sample stream
            # in tests/test_gif.py: 3 data codes at width 3 before
            # the first width-4 code, not 2)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        if next_code == _MAX_CODE:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int):
    """Inverse of :func:`_lzw_encode` (also accepts deferred-clear
    streams). Returns a bytearray of palette indices, or None on a
    corrupt stream. Stops once ``n_expected`` indices are produced —
    trailing garbage after a valid image must not fail the row."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None

    bitbuf = 0
    bitcnt = 0
    pos = 0
    n_data = len(data)
    while len(out) < n_expected:
        while bitcnt < width:
            if pos >= n_data:
                return None  # ran out mid-stream
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # impossible code: corrupt stream
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
        # interop width timing (the classic GIF off-by-one): the
        # decoder's table runs one entry behind the encoder's at read
        # time, and real-world encoders switch width only after
        # assigning code value (1 << width) itself — so the decoder
        # grows exactly when its table length reaches (1 << width).
        # Pinned externally by the published sample stream AND the
        # javax.imageio cross-codec tests in tests/test_gif.py.
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    # EOI (or clean exit) before the pixel count is met = truncation
    return out if len(out) >= n_expected else None


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Row output order of an interlaced image (4 passes)."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → single-image GIF89a with a global color
    table of the image's unique colors (ValueError beyond 256)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"GIF encoder: {n_colors} colors > 256 (no quantizer)")
    # table size field: 2^(f+1) entries; also floors the LZW root width
    f = 0
    while (2 << f) < max(n_colors, 2):
        f += 1
    table_len = 2 << f
    mcs = max(2, f + 1)

    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h), :]

    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (0x7 << 4) | f, 0, 0])  # GCT flag, 8-bit res
    out += palette.tobytes() + b"\x00" * (3 * (table_len - n_colors))
    # image descriptor (no local table; interlace flag bit 6)
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([mcs])
    comp = _lzw_encode(indices.reshape(-1).tobytes(), mcs)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def _read_subblocks(blob: bytes, pos: int):
    """Concatenated data sub-blocks at ``pos`` → (bytes, next_pos),
    or (None, pos) on truncation."""
    chunks = []
    n = len(blob)
    while True:
        if pos >= n:
            return None, pos
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            return None, pos
        chunks.append(blob[pos : pos + size])
        pos += size


def first_frame_covers_canvas(blob: bytes):
    """True iff the FIRST image frame exactly covers the logical
    screen ((left, top) == (0, 0), frame size == screen size) — the
    case where every decoder's output is identical for a lossless
    GIF. False means uncovered canvas exists, where fill color is
    renderer-defined (we use the spec background color, PIL uses
    palette index 0) — dispatch must pin ONE decoder there or the
    same blob decodes differently across environments (ADVICE r7).
    None when the header/framing is unreadable (let the full decoder
    produce the S4 None). Header walk only — no LZW work."""
    try:
        if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
            return None
        screen_w = int.from_bytes(blob[6:8], "little")
        screen_h = int.from_bytes(blob[8:10], "little")
        packed = blob[10]
        pos = 13
        if packed & 0x80:
            pos += 3 * (2 << (packed & 0x07))
        while True:
            if pos >= len(blob):
                return None
            block = blob[pos]
            pos += 1
            if block == 0x3B:
                return None  # trailer before any image
            if block == 0x21:  # extension
                pos += 1
                data, pos = _read_subblocks(blob, pos)
                if data is None:
                    return None
                continue
            if block != 0x2C or pos + 9 > len(blob):
                return None
            left = int.from_bytes(blob[pos : pos + 2], "little")
            top = int.from_bytes(blob[pos + 2 : pos + 4], "little")
            w = int.from_bytes(blob[pos + 4 : pos + 6], "little")
            h = int.from_bytes(blob[pos + 6 : pos + 8], "little")
            return (left, top) == (0, 0) and (w, h) == (screen_w, screen_h)
    except Exception:
        return None


def decode_gif(blob: bytes):
    """GIF bytes → (h, w, 3) uint8 RGB of the FIRST image frame, or
    None when the data is corrupt (see module doc for scope)."""
    import numpy as np

    try:
        if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
            return None
        pos = 6
        # logical screen descriptor: canvas size + background index
        # (frames smaller than the canvas composite onto it, like any
        # renderer — returning bare frame rects would make the output
        # shape depend on frame placement)
        screen_w = int.from_bytes(blob[pos : pos + 2], "little")
        screen_h = int.from_bytes(blob[pos + 2 : pos + 4], "little")
        packed = blob[pos + 4]
        bg_index = blob[pos + 5]
        pos += 7
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
            if len(gct) != 3 * n:
                return None
            gct = gct.reshape(n, 3)
            pos += 3 * n

        while True:
            if pos >= len(blob):
                return None
            block = blob[pos]
            pos += 1
            if block == 0x3B:  # trailer before any image
                return None
            if block == 0x21:  # extension: label + framed sub-blocks
                pos += 1
                data, pos = _read_subblocks(blob, pos)
                if data is None:
                    return None
                continue
            if block != 0x2C:
                return None  # unknown block type: corrupt
            # image descriptor
            if pos + 9 > len(blob):
                return None
            left = int.from_bytes(blob[pos : pos + 2], "little")
            top = int.from_bytes(blob[pos + 2 : pos + 4], "little")
            w = int.from_bytes(blob[pos + 4 : pos + 6], "little")
            h = int.from_bytes(blob[pos + 6 : pos + 8], "little")
            ipacked = blob[pos + 8]
            pos += 9
            if w == 0 or h == 0:
                return None
            if w * h > _MAX_PIXELS or screen_w * screen_h > _MAX_PIXELS:
                return None  # decompression-bomb guard (module doc)
            table = gct
            if ipacked & 0x80:  # local color table overrides
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
                if len(table) != 3 * n:
                    return None
                table = table.reshape(n, 3)
                pos += 3 * n
            if table is None:
                return None  # no palette anywhere: undecodable
            if pos >= len(blob):
                return None
            mcs = blob[pos]
            pos += 1
            data, pos = _read_subblocks(blob, pos)
            if data is None:
                return None
            idx = _lzw_decode(data, mcs, w * h)
            if idx is None or len(idx) < w * h:
                return None
            arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
            if int(arr.max()) >= len(table):
                return None  # index beyond the palette: corrupt
            rows = table[arr].reshape(h, w, 3)
            if ipacked & 0x40:  # interlaced: undo the 4-pass order
                order = _interlace_order(h)
                out = np.empty_like(rows)
                out[order, :] = rows
                rows = out
            # composite onto the logical screen when the frame does
            # not exactly cover it (uncovered area = the background
            # color per the spec; a frame past the canvas edge clips;
            # a zero-size canvas degrades to the bare frame)
            if (left, top) == (0, 0) and (w, h) == (screen_w, screen_h):
                return rows.copy()
            if screen_w == 0 or screen_h == 0:
                return rows.copy()
            # background color indexes the GLOBAL table (the local
            # table scopes only its own frame's pixels)
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, np.uint8)
            )
            canvas = np.broadcast_to(
                bg, (screen_h, screen_w, 3)
            ).astype(np.uint8).copy()
            ch = min(h, max(screen_h - top, 0))
            cw = min(w, max(screen_w - left, 0))
            canvas[top : top + ch, left : left + cw] = rows[:ch, :cw]
            return canvas
    except Exception:
        return None
