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
- decode (:func:`decode_gif`): 87a + 89a, global AND local color
  tables, interlaced and sequential images, extension blocks skipped
  via their own sub-block framing, FIRST image frame only. A frame
  smaller than / offset within the logical screen composites onto a
  background-color canvas of screen size (renderer semantics — the
  output shape is the canvas, not the frame rect). Transparency
  index is ignored: the palette color is returned (feature stats
  need pixels, not alpha). Header-declared sizes are capped
  (``_MAX_PIXELS``) so a crafted small blob cannot act as an LZW
  decompression bomb.
- animation (:func:`decode_gif_frames`, VERDICT r7 #5): every-k
  frame sampling with FULL disposal-method compositing — each
  emitted frame is the rendered logical-screen canvas after drawing
  frame i (GCE transparency honored: transparent pixels leave the
  canvas untouched), with disposal 2 restoring the frame rect to the
  background color and disposal 3 restoring it to the pre-draw
  canvas before the next frame draws. Uncovered/disposed canvas is
  the spec background color (browsers render transparent there;
  feature stats need pixels). NOTE the deliberate frame-1 divergence
  from :func:`decode_gif`: the single-image path ignores
  transparency, the animation path honors it.
- encode: 89a, single non/interlaced image
  (:func:`encode_gif`) or multi-frame animation with per-frame
  GCE disposal/transparency/delay (:func:`encode_gif_animation`);
  global table built from the images' unique colors — raises
  ``ValueError`` beyond 256 (fixture/test tools, not quantizers).
- any framing/LZW corruption → ``None`` (S4 per-row skip), never an
  exception out of the kernel; an animation corrupt at frame j
  degrades the whole row (no partial salvage — test-pinned).

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


def _global_palette(frame_pixels, bg_rgb):
    """Union palette over all frame arrays (+ background color) as a
    (palette array, packed-key array) pair; per-frame index lookup
    goes through the sorted packed keys (vectorized, no per-pixel
    dict)."""
    import numpy as np

    flat = np.concatenate(
        [np.asarray(p, dtype=np.uint8).reshape(-1, 3) for p in frame_pixels]
        + [np.asarray(bg_rgb, dtype=np.uint8).reshape(1, 3)]
    )
    palette = np.unique(flat, axis=0)
    if len(palette) > 256:
        raise ValueError(
            f"GIF encoder: {len(palette)} colors > 256 (no quantizer)"
        )
    keys = (
        palette[:, 0].astype(np.uint32) << 16
        | palette[:, 1].astype(np.uint32) << 8
        | palette[:, 2].astype(np.uint32)
    )  # np.unique output is lex-sorted, so keys are sorted ascending
    return palette, keys


def _indices_of(px, keys):
    import numpy as np

    flat = np.asarray(px, dtype=np.uint8).reshape(-1, 3)
    k = (
        flat[:, 0].astype(np.uint32) << 16
        | flat[:, 1].astype(np.uint32) << 8
        | flat[:, 2].astype(np.uint32)
    )
    return np.searchsorted(keys, k).astype(np.uint8)


def encode_gif_animation(
    frames,
    screen: tuple[int, int] | None = None,
    bg_rgb=(0, 0, 0),
    loop: int = 0,
) -> bytes:
    """Multi-frame GIF89a fixture encoder. ``frames`` is a sequence
    of dicts: ``pixels`` ((h, w, 3) uint8, required) plus optional
    ``left``/``top`` (default 0), ``disposal`` (0-3, default 1 = do
    not dispose), ``transparent_rgb`` (pixels of exactly this color
    are marked transparent via the GCE index — they leave the
    underlying canvas untouched when composited), ``delay_cs``
    (default 4). One GLOBAL color table is built from the union of
    all frames' colors + ``bg_rgb`` (ValueError beyond 256);
    ``screen`` defaults to the tightest canvas covering every frame
    rect. A NETSCAPE loop extension is written (``loop`` = 0 means
    forever), matching real animated crawl GIFs."""
    import numpy as np

    norm = []
    for f in frames:
        px = np.asarray(f["pixels"], dtype=np.uint8)
        norm.append(
            (
                px,
                int(f.get("left", 0)),
                int(f.get("top", 0)),
                int(f.get("disposal", 1)),
                f.get("transparent_rgb"),
                int(f.get("delay_cs", 4)),
                bool(f.get("interlace", False)),
            )
        )
    if not norm:
        raise ValueError("GIF encoder: need at least one frame")
    # transparent colors join the palette union even when no frame
    # pixel carries them — searchsorted below assumes membership, and
    # an absent color would silently resolve to a NEIGHBORING index
    # (marking the wrong pixels transparent)
    sources = [n[0] for n in norm] + [
        np.asarray(n[4], np.uint8).reshape(1, 1, 3)
        for n in norm
        if n[4] is not None
    ]
    palette, keys = _global_palette(sources, bg_rgb)
    n_colors = len(palette)
    f_bits = 0
    while (2 << f_bits) < max(n_colors, 2):
        f_bits += 1
    table_len = 2 << f_bits
    mcs = max(2, f_bits + 1)
    bg_index = int(_indices_of(np.asarray(bg_rgb, np.uint8).reshape(1, 1, 3), keys)[0])

    if screen is None:
        screen = (
            max(left + px.shape[1] for px, left, *_ in norm),
            max(top + px.shape[0] for px, _, top, *_ in norm),
        )
    screen_w, screen_h = screen

    out = bytearray()
    out += b"GIF89a"
    out += screen_w.to_bytes(2, "little") + screen_h.to_bytes(2, "little")
    out += bytes([0x80 | (0x7 << 4) | f_bits, bg_index, 0])
    out += palette.tobytes() + b"\x00" * (3 * (table_len - n_colors))
    out += (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        + int(loop).to_bytes(2, "little")
        + b"\x00"
    )
    for px, left, top, disposal, t_rgb, delay, interlace in norm:
        h, w = px.shape[:2]
        t_idx = 0
        t_flag = 0
        if t_rgb is not None:
            t_idx = int(
                _indices_of(np.asarray(t_rgb, np.uint8).reshape(1, 1, 3), keys)[0]
            )
            t_flag = 1
        out += b"\x21\xf9\x04"
        out += bytes([((disposal & 0x7) << 2) | t_flag])
        out += delay.to_bytes(2, "little") + bytes([t_idx, 0])
        out += b"\x2c"
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])  # no local table
        out += bytes([mcs])
        indices = _indices_of(px, keys).reshape(h, w)
        if interlace:
            indices = indices[_interlace_order(h), :]
        comp = _lzw_encode(indices.reshape(-1).tobytes(), mcs)
        for i in range(0, len(comp), 255):
            block = comp[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
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


class _Corrupt(Exception):
    """Internal: any framing violation — consumers catch it and
    return the S4 None."""


def _parse_screen(blob: bytes):
    """Signature + logical screen descriptor + global color table →
    (screen_w, screen_h, bg_index, gct, pos). Raises :class:`_Corrupt`."""
    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
        raise _Corrupt
    screen_w = int.from_bytes(blob[6:8], "little")
    screen_h = int.from_bytes(blob[8:10], "little")
    packed = blob[10]
    bg_index = blob[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise _Corrupt
        gct = gct.reshape(n, 3)
        pos += 3 * n
    return screen_w, screen_h, bg_index, gct, pos


def _walk_blocks(blob: bytes, pos: int):
    """The ONE framing walker behind :func:`decode_gif`,
    :func:`count_gif_frames` and :func:`decode_gif_frames` (review r8:
    three copies of this loop had already grown). Yields
    ``("ext", label, data)`` and ``("img", left, top, w, h, ipacked,
    local_table, mcs, lzw_bytes)`` events until the trailer; raises
    :class:`_Corrupt` on any framing violation. ``local_table`` is
    None when the frame scopes no local color table (callers fall
    back to the global one). :func:`first_frame_covers_canvas` stays
    a separate pre-LZW peek on purpose: it must answer from the first
    image DESCRIPTOR alone, before the data sub-blocks whose
    truncation this walker treats as corrupt."""
    import numpy as np

    while True:
        if pos >= len(blob):
            raise _Corrupt
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + framed sub-blocks
            if pos >= len(blob):
                raise _Corrupt
            label = blob[pos]
            pos += 1
            data, pos = _read_subblocks(blob, pos)
            if data is None:
                raise _Corrupt
            yield ("ext", label, data)
            continue
        if block != 0x2C or pos + 9 > len(blob):
            raise _Corrupt  # unknown block type / truncated descriptor
        left = int.from_bytes(blob[pos : pos + 2], "little")
        top = int.from_bytes(blob[pos + 2 : pos + 4], "little")
        w = int.from_bytes(blob[pos + 4 : pos + 6], "little")
        h = int.from_bytes(blob[pos + 6 : pos + 8], "little")
        ipacked = blob[pos + 8]
        pos += 9
        table = None
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
            if len(table) != 3 * n:
                raise _Corrupt
            table = table.reshape(n, 3)
            pos += 3 * n
        if pos >= len(blob):
            raise _Corrupt
        mcs = blob[pos]
        pos += 1
        data, pos = _read_subblocks(blob, pos)
        if data is None:
            raise _Corrupt
        yield ("img", left, top, w, h, ipacked, table, mcs, data)


def _decode_frame_indices(data, mcs, w, h, ipacked, table):
    """LZW bytes → de-interlaced (h, w) palette-index array under
    ``table``, or None when the stream/indices are corrupt."""
    import numpy as np

    idx = _lzw_decode(data, mcs, w * h)
    if idx is None or len(idx) < w * h:
        return None
    arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
    if int(arr.max()) >= len(table):
        return None  # index beyond the palette: corrupt
    arr = arr.reshape(h, w)
    if ipacked & 0x40:  # interlaced: undo the 4-pass order
        order = _interlace_order(h)
        out = np.empty_like(arr)
        out[order, :] = arr
        arr = out
    return arr


def _bg_color(gct, bg_index):
    import numpy as np

    return (
        gct[bg_index]
        if gct is not None and bg_index < len(gct)
        else np.zeros(3, np.uint8)
    )


def decode_gif(blob: bytes):
    """GIF bytes → (h, w, 3) uint8 RGB of the FIRST image frame, or
    None when the data is corrupt (see module doc for scope). A frame
    smaller than / offset within the logical screen composites onto a
    background-color canvas of screen size (renderer semantics);
    transparency is IGNORED on this single-image path (palette color
    returned — feature stats need pixels)."""
    import numpy as np

    try:
        screen_w, screen_h, bg_index, gct, pos = _parse_screen(blob)
        for ev in _walk_blocks(blob, pos):
            if ev[0] != "img":
                continue
            _, left, top, w, h, ipacked, ltable, mcs, data = ev
            if w == 0 or h == 0:
                return None
            if w * h > _MAX_PIXELS or screen_w * screen_h > _MAX_PIXELS:
                return None  # decompression-bomb guard (module doc)
            table = ltable if ltable is not None else gct
            if table is None:
                return None  # no palette anywhere: undecodable
            arr = _decode_frame_indices(data, mcs, w, h, ipacked, table)
            if arr is None:
                return None
            rows = table[arr.reshape(-1)].reshape(h, w, 3)
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
            bg = _bg_color(gct, bg_index)
            # astype always returns a fresh writable array — no .copy()
            canvas = np.broadcast_to(bg, (screen_h, screen_w, 3)).astype(
                np.uint8
            )
            ch = min(h, max(screen_h - top, 0))
            cw = min(w, max(screen_w - left, 0))
            canvas[top : top + ch, left : left + cw] = rows[:ch, :cw]
            return canvas
        return None  # trailer before any image
    except Exception:
        return None


def count_gif_frames(blob: bytes):
    """Number of image frames in the GIF, via the framing walk only —
    sub-block lengths skip the LZW payload untouched, so this is
    cheap enough to report the TRUE frame count next to a capped
    :func:`decode_gif_frames` sample (no silent cap). None when the
    framing is corrupt or truncated."""
    try:
        _, _, _, _, pos = _parse_screen(blob)
        return sum(1 for ev in _walk_blocks(blob, pos) if ev[0] == "img")
    except Exception:
        return None


def decode_gif_frames(
    blob: bytes,
    every: int = 1,
    max_frames: int = 256,
    max_total_pixels: int = _MAX_PIXELS,
):
    """GIF bytes → list of (screen_h, screen_w, 3) uint8 canvases:
    the rendered logical screen after drawing every ``every``-th
    frame (frame 0 always kept), with full GIF89a disposal-method
    compositing between frames — or None on ANY corruption (the S4
    whole-row contract: no partial salvage of a truncated animation).

    Renderer semantics per frame i: (a) if frame i-1's disposal was
    2, its rect was restored to the background color; if 3, to the
    canvas as it stood before frame i-1 drew; (b) frame i's pixels
    draw at its (left, top) rect, clipped to the canvas, SKIPPING its
    GCE transparent index (the canvas shows through). Uncovered and
    disposed area is the spec background color — the one deviation
    from browsers (which render transparency there; feature stats
    need concrete pixels). Every frame is DECODED (deltas chain), so
    sampling saves memory/emit cost, not LZW work.

    Bomb guards, each None (never OOM/CPU-burn): the canvas —
    including the lazy one a 0-size screen adopts from frame 1's
    (top + h, left + w) extent, whose offsets a crafted blob controls
    — is capped at ``_MAX_PIXELS``; at most ``max_frames`` frames are
    processed; and the CUMULATIVE decoded pixels across frames PLUS
    the pixels of every emitted canvas copy are capped together at
    ``max_total_pixels`` (default ``_MAX_PIXELS`` — the same total
    LZW exposure as the single-image path, where max_frames alone
    would multiply it 256×; emitted canvases are counted because the
    returned ``frames`` list is what is actually retained in memory —
    a max-size screen plus many 1-pixel frames passes the other two
    guards while accumulating frames × canvas bytes). Compare
    :func:`count_gif_frames` to detect the frame cap; nothing is
    silent."""
    import numpy as np

    if every < 1:
        raise ValueError("every must be >= 1")
    try:
        screen_w, screen_h, bg_index, gct, pos = _parse_screen(blob)
        if screen_w * screen_h > _MAX_PIXELS:
            return None
        bg = _bg_color(gct, bg_index)

        canvas = None  # lazy: a 0-size screen adopts frame 1's rect
        if screen_w and screen_h:
            canvas = np.broadcast_to(bg, (screen_h, screen_w, 3)).astype(
                np.uint8
            )
        frames: list = []
        n_seen = 0
        total_px = 0
        # pending GCE state for the NEXT image (one GCE scopes one
        # image; it resets after the image consumes it)
        disposal = 0
        t_idx = None
        for ev in _walk_blocks(blob, pos):
            if ev[0] == "ext":
                _, label, data = ev
                if label == 0xF9 and len(data) >= 4:
                    gpacked = data[0]
                    disposal = (gpacked >> 2) & 0x7
                    t_idx = data[3] if gpacked & 0x1 else None
                continue
            _, left, top, w, h, ipacked, ltable, mcs, data = ev
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                return None
            table = ltable if ltable is not None else gct
            if table is None:
                return None
            if n_seen >= max_frames:
                # cap reached: the remaining framing was still walked
                # for the corruption contract, but nothing more decodes
                disposal, t_idx = 0, None
                continue
            total_px += w * h
            if total_px > max_total_pixels:
                return None  # aggregate decompression-bomb guard
            idx2 = _decode_frame_indices(data, mcs, w, h, ipacked, table)
            if idx2 is None:
                return None
            if canvas is None:  # 0-size screen: adopt frame 1's rect
                if (top + h) * (left + w) > _MAX_PIXELS:
                    return None  # offset-inflated lazy canvas = bomb
                canvas = np.broadcast_to(
                    bg, (top + h, left + w, 3)
                ).astype(np.uint8)
            ch = min(h, max(canvas.shape[0] - top, 0))
            cw = min(w, max(canvas.shape[1] - left, 0))
            saved = (
                canvas[top : top + ch, left : left + cw].copy()
                if disposal == 3
                else None
            )
            region = canvas[top : top + ch, left : left + cw]
            sub = idx2[:ch, :cw]
            if t_idx is not None:
                mask = sub != t_idx
                region[mask] = table[sub[mask]]
            else:
                region[...] = table[sub]
            if n_seen % every == 0:
                # emitted canvas copies count against the same budget:
                # a tiny blob with a max-size screen and many 1-pixel
                # frames would otherwise accumulate frames × canvas
                # bytes (e.g. 256 × 192 MB) while passing both the
                # per-canvas and decoded-pixel guards
                total_px += canvas.shape[0] * canvas.shape[1]
                if total_px > max_total_pixels:
                    return None
                frames.append(canvas.copy())
            # apply disposal AFTER the frame was shown
            if disposal == 2:
                canvas[top : top + ch, left : left + cw] = bg
            elif disposal == 3 and saved is not None:
                canvas[top : top + ch, left : left + cw] = saved
            n_seen += 1
            disposal, t_idx = 0, None
        return frames if frames else None
    except Exception:
        return None
