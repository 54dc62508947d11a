"""Bounded Parquet footer reader — row count / column count / row-group
count straight from the file's own metadata, WITHOUT a reader library
in the triage hot path.

Why: a real LLM landing prefix is dominated by ``.parquet`` /
``.jsonl`` / ``.csv`` blobs (VERDICT r12 "What's missing" #2), and the
one-pass triage kernel needs "this is a parquet file of N rows × M
columns" at magic-sniff cost. The format is public (Apache Parquet
spec): ``PAR1`` magic at both ends; the last 8 bytes are
``footer_len (4, LE) + "PAR1"``; the footer is a Thrift
**compact-protocol** ``FileMetaData`` struct (parquet.thrift):

    1: i32  version
    2: list<SchemaElement> schema   (depth-first; field 5 of each
                                     element = num_children, absent/0
                                     on leaf columns)
    3: i64  num_rows
    4: list<RowGroup> row_groups
    6: binary created_by

We walk the compact protocol generically (varint/zigzag, field-delta
headers, size-prefixed lists) with the repo's bounded-walk discipline:
hard caps on footer size, list sizes, recursion depth and total ops —
a hostile footer yields ``None``, never a spin or a task death. Only
the fields above are interpreted; everything else is skipped by type.

Thrift compact type codes: 1/2 bool, 3 byte, 4 i16, 5 i32, 6 i64,
7 double, 8 binary, 9 list, 10 set, 11 map, 12 struct.
"""

from __future__ import annotations

import struct

MAGIC = b"PAR1"

#: hostile-input caps (bounded-walk discipline, same spirit as the
#: media parsers' bomb caps)
_MAX_FOOTER = 8 << 20
_MAX_LIST = 100_000
_MAX_DEPTH = 14
_MAX_OPS = 2_000_000


class _Broken(Exception):
    pass


class _Walk:
    __slots__ = ("b", "pos", "ops")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.ops = 0

    def tick(self):
        self.ops += 1
        if self.ops > _MAX_OPS:
            raise _Broken("op cap")

    def byte(self) -> int:
        if self.pos >= len(self.b):
            raise _Broken("eof")
        v = self.b[self.pos]
        self.pos += 1
        return v

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            self.tick()
            c = self.byte()
            out |= (c & 0x7F) << shift
            if not c & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise _Broken("varint")

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def skip_bytes(self, n: int):
        if n < 0 or self.pos + n > len(self.b):
            raise _Broken("eof")
        self.pos += n


def _skip(w: _Walk, typ: int, depth: int):
    w.tick()
    if depth > _MAX_DEPTH:
        raise _Broken("depth")
    if typ in (1, 2):          # bool packed in the type nibble
        return
    if typ == 3:               # byte
        w.skip_bytes(1)
    elif typ in (4, 5, 6):     # i16/i32/i64: zigzag varint
        w.zigzag()
    elif typ == 7:             # double
        w.skip_bytes(8)
    elif typ == 8:             # binary
        w.skip_bytes(w.varint())
    elif typ in (9, 10):       # list/set
        n, etype = _list_header(w)
        for _ in range(n):
            _skip(w, etype, depth + 1)
    elif typ == 11:            # map
        n = w.varint()
        if n > _MAX_LIST:
            raise _Broken("map cap")
        if n:
            kv = w.byte()
            for _ in range(n):
                _skip(w, kv >> 4, depth + 1)
                _skip(w, kv & 0xF, depth + 1)
    elif typ == 12:            # struct
        _walk_struct(w, depth + 1, None)
    else:
        raise _Broken("type %d" % typ)


def _list_header(w: _Walk):
    h = w.byte()
    n = h >> 4
    if n == 15:
        n = w.varint()
    if n > _MAX_LIST:
        raise _Broken("list cap")
    return n, h & 0xF


def _walk_struct(w: _Walk, depth: int, want):
    """Walk one struct; when ``want`` is a dict, scalar fields whose
    ids are in it are captured (i16/i32/i64 only)."""
    if depth > _MAX_DEPTH:
        raise _Broken("depth")
    fid = 0
    while True:
        w.tick()
        fh = w.byte()
        if fh == 0:
            return
        delta = fh >> 4
        typ = fh & 0xF
        fid = fid + delta if delta else w.zigzag()
        if want is not None and fid in want and typ in (4, 5, 6):
            want[fid] = w.zigzag()
        else:
            _skip(w, typ, depth)


def parse_footer(footer: bytes):
    """(version, num_rows, n_leaf_columns, n_row_groups, created_by)
    from the raw footer bytes, or None if it is not a well-formed
    compact FileMetaData within the caps."""
    w = _Walk(footer)
    version = num_rows = None
    n_leaves = n_groups = None
    created_by = None
    try:
        fid = 0
        while True:
            w.tick()
            fh = w.byte()
            if fh == 0:
                break
            delta = fh >> 4
            typ = fh & 0xF
            fid = fid + delta if delta else w.zigzag()
            if fid == 1 and typ in (4, 5, 6):
                version = w.zigzag()
            elif fid == 2 and typ == 9:      # schema list
                n, etype = _list_header(w)
                if etype != 12:
                    raise _Broken("schema etype")
                n_leaves = 0
                for _ in range(n):
                    el = {5: None}           # num_children
                    _walk_struct(w, 1, el)
                    if not el[5]:            # absent or 0 → leaf
                        n_leaves += 1
            elif fid == 3 and typ in (5, 6):
                num_rows = w.zigzag()
            elif fid == 4 and typ == 9:      # row_groups list
                n_groups, etype = _list_header(w)
                for _ in range(n_groups):
                    _skip(w, etype, 1)
            elif fid == 6 and typ == 8:
                ln = w.varint()
                if ln > 4096:
                    raise _Broken("created_by cap")
                created_by = bytes(
                    w.b[w.pos:w.pos + ln]
                ).decode("utf-8", "replace")
                w.skip_bytes(ln)
            else:
                _skip(w, typ, 1)
    except (_Broken, struct.error):
        return None
    if num_rows is None or num_rows < 0:
        return None
    return version, num_rows, n_leaves, n_groups, created_by


def parquet_meta(blob: bytes | None):
    """{version, num_rows, n_columns, n_row_groups, created_by} for a
    complete parquet blob, or None for non-parquet / truncated-footer
    input (the S4 contract: never raises)."""
    b = bytes(blob or b"")
    if len(b) < 12 or b[:4] != MAGIC or b[-4:] != MAGIC:
        return None
    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    if flen == 0 or flen > _MAX_FOOTER or flen + 8 > len(b):
        return None
    footer = b[len(b) - 8 - flen:len(b) - 8]
    parsed = parse_footer(footer)
    if parsed is None:
        return None
    version, num_rows, n_leaves, n_groups, created_by = parsed
    return {
        "version": version,
        "num_rows": num_rows,
        "n_columns": n_leaves,
        "n_row_groups": n_groups,
        "created_by": created_by,
    }
