"""PDF standard security handler (ISO 32000-1 §7.6) — the
EMPTY-USER-PASSWORD case, which is what a crawl actually meets:
most "encrypted" PDFs are permissions-only (owner password set,
user password empty), and a conforming reader opens them without
any secret. Everything here is the published algorithm run on
stdlib primitives (hashlib MD5/SHA, a 20-line RC4, and a clean-room
FIPS-197 AES-128 pinned against the spec's own Appendix C vector in
tests/test_pdf_crypt.py) — no guessed tables, so it stays inside
the exact-or-None rule that gates the codec work.

Scope:

- Revisions R2/R3/R4 (§7.6.3.4): file-key derivation (Algorithm 2),
  owner-entry generation (Algorithm 3, for the fixture encoder),
  user-entry generation + authentication (Algorithms 4/5), per-object
  keys (Algorithm 1), RC4 (V1/V2) and V4 crypt filters with
  /V2 (RC4) and /AESV2 (AES-128-CBC, random-IV prefix, RFC 2898
  padding) stream/string filters, /Identity passthrough.
- R5/R6 (AES-256, PDF 2.0 §7.6.4.3.3) REFUSES loudly via
  ``_Unsupported`` — the SHA-2 key-derivation loop is public and
  could land later, but a partial implementation that silently
  mis-decrypts is worse than a refusal; the caller (pdf.py) maps the
  refusal to the documented "structure yes, text no" behavior.
- Non-empty user passwords: authentication fails → same refusal.
  This module never guesses passwords.
"""

from __future__ import annotations

import hashlib
import struct


class _Unsupported(Exception):
    """Encryption flavor outside the supported envelope (R5/R6,
    non-standard handler, wrong password) — caller degrades to
    structure-only parsing."""


#: §7.6.3.3 padding string (Algorithm 2 step a) — published constant
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric): KSA + PRGA."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ── AES-128 (FIPS-197) ──────────────────────────────────────────
# Clean-room from the published spec: the S-box is generated from
# its mathematical definition (multiplicative inverse in GF(2^8)
# followed by the affine transform) rather than typed in, so a
# transcription error is impossible; the whole cipher is pinned
# against the FIPS-197 Appendix C known-answer vector in tests.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _build_sbox():
    # multiplicative inverses via brute force (256*256 once at import)
    inv = [0] * 256
    for a in range(1, 256):
        for b in range(1, 256):
            if _gf_mul(a, b) == 1:
                inv[a] = b
                break
    sbox = [0] * 256
    for a in range(256):
        x = inv[a]
        y = x
        for _ in range(4):
            y = ((y << 1) | (y >> 7)) & 0xFF
            x ^= y
        sbox[a] = x ^ 0x63
    return sbox


_SBOX = _build_sbox()
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01]
for _ in range(9):
    _RCON.append(_gf_mul(_RCON[-1], 2))


def _round_keys(key: bytes) -> list:
    words = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [b"".join(bytes(words[4 * r + c]) for c in range(4))
            for r in range(11)]


def _add_round_key(state: bytearray, rk: bytes):
    for i in range(16):
        state[i] ^= rk[i]


def _sub_bytes(state: bytearray, box):
    for i in range(16):
        state[i] = box[state[i]]


def _shift_rows(state: bytearray, inverse: bool = False):
    # state is column-major (FIPS-197 §3.4): byte index = 4*col + row
    out = bytearray(16)
    for r in range(4):
        for c in range(4):
            src_c = (c + r) % 4 if not inverse else (c - r) % 4
            out[4 * c + r] = state[4 * src_c + r]
    state[:] = out


def _mix_columns(state: bytearray, inverse: bool = False):
    m = (
        (0x0E, 0x0B, 0x0D, 0x09) if inverse else (0x02, 0x03, 0x01, 0x01)
    )
    for c in range(4):
        col = state[4 * c:4 * c + 4]
        new = bytearray(4)
        for r in range(4):
            new[r] = (
                _gf_mul(col[0], m[(0 - r) % 4])
                ^ _gf_mul(col[1], m[(1 - r) % 4])
                ^ _gf_mul(col[2], m[(2 - r) % 4])
                ^ _gf_mul(col[3], m[(3 - r) % 4])
            )
        state[4 * c:4 * c + 4] = new
    return state


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _round_keys(key)
    state = bytearray(block)
    _add_round_key(state, rks[0])
    for rnd in range(1, 10):
        _sub_bytes(state, _SBOX)
        _shift_rows(state)
        _mix_columns(state)
        _add_round_key(state, rks[rnd])
    _sub_bytes(state, _SBOX)
    _shift_rows(state)
    _add_round_key(state, rks[10])
    return bytes(state)


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _round_keys(key)
    state = bytearray(block)
    _add_round_key(state, rks[10])
    for rnd in range(9, 0, -1):
        _shift_rows(state, inverse=True)
        _sub_bytes(state, _INV_SBOX)
        _add_round_key(state, rks[rnd])
        _mix_columns(state, inverse=True)
    _shift_rows(state, inverse=True)
    _sub_bytes(state, _INV_SBOX)
    _add_round_key(state, rks[0])
    return bytes(state)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 payload: 16-byte IV prefix + CBC blocks with
    RFC 2898 padding (§7.6.2). Malformed payloads raise ValueError
    (the caller treats it as stream damage)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("aes payload size")
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        block = data[i:i + 16]
        plain = aes128_decrypt_block(key, block)
        out.extend(x ^ y for x, y in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or len(out) < pad:
        raise ValueError("aes padding")
    return bytes(out[:-pad])


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Fixture-encoder side: pad + CBC + IV prefix. ``iv`` is
    caller-supplied so fixtures stay deterministic."""
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = aes128_encrypt_block(key, block)
        out.extend(prev)
    return bytes(out)


# ── §7.6.3 standard security handler ────────────────────────────


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def file_key(
    user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
    r: int, key_len: int, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def owner_entry(owner_pw: bytes, user_pw: bytes, r: int,
                key_len: int) -> bytes:
    """Algorithm 3: the /O value (fixture-encoder side)."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_len]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def user_entry(fkey: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R≥3): the /U value."""
    if r == 2:
        return rc4(fkey, PAD)
    u = rc4(fkey, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    return u + b"\x00" * 16


def authenticate_empty_user(
    o_entry: bytes, u_entry: bytes, p: int, id0: bytes,
    r: int, key_len: int, encrypt_metadata: bool = True,
) -> bytes | None:
    """Empty-user-password authentication (§7.6.3.4 Algorithm 6):
    derive the key with the empty password, recompute /U, compare
    (all 32 bytes for R2, first 16 for R≥3). Returns the file key
    on success, None on mismatch — never guesses further."""
    fkey = file_key(b"", o_entry, p, id0, r, key_len, encrypt_metadata)
    expect = user_entry(fkey, id0, r)
    got = u_entry[:32] if r == 2 else u_entry[:16]
    want = expect[:32] if r == 2 else expect[:16]
    return fkey if got == want else None


def object_key(fkey: bytes, num: int, gen: int,
               aes: bool = False) -> bytes:
    """Algorithm 1: per-object key."""
    h = hashlib.md5()
    h.update(fkey)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(fkey) + 5, 16)]


class Decryptor:
    """Resolved decryption state for one document: knows how to
    decrypt a string or stream belonging to indirect object
    (num, gen). Built by :func:`build_decryptor`; ``method`` is
    'rc4' or 'aes' (both string and stream filters — PDF allows
    them to differ, but the standard filter set ties them via
    /StrF and /StmF which we honor)."""

    __slots__ = ("fkey", "str_method", "stm_method")

    def __init__(self, fkey: bytes, str_method: str, stm_method: str):
        self.fkey = fkey
        self.str_method = str_method
        self.stm_method = stm_method

    def _apply(self, method: str, data: bytes, num: int,
               gen: int) -> bytes:
        if method == "identity":
            return data
        key = object_key(self.fkey, num, gen, aes=method == "aes")
        if method == "rc4":
            return rc4(key, data)
        return aes_cbc_decrypt(key, data)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_method, data, num, gen)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen)


def _cf_method(enc: dict, which: str) -> str:
    """Resolve a V4 crypt-filter name (/StmF or /StrF) through /CF."""
    name = str(enc.get(which, "Identity"))
    if name == "Identity":
        return "identity"
    cf = enc.get("CF")
    cf = cf if isinstance(cf, dict) else {}
    entry = cf.get(name)
    entry = entry if isinstance(entry, dict) else {}
    cfm = str(entry.get("CFM", ""))
    if cfm == "V2":
        return "rc4"
    if cfm == "AESV2":
        return "aes"
    raise _Unsupported("crypt filter %s/%s" % (name, cfm or "?"))


def build_decryptor(enc: dict, id0: bytes) -> Decryptor:
    """From a resolved /Encrypt dictionary (+ first /ID element) to
    a Decryptor, or raise _Unsupported (wrong handler, R5/R6,
    non-empty user password)."""
    if str(enc.get("Filter", "")) != "Standard":
        raise _Unsupported("security handler %r" % enc.get("Filter"))
    v = int(enc.get("V", 0) or 0)
    r = int(enc.get("R", 0) or 0)
    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise _Unsupported("V=%d R=%d" % (v, r))
    o = enc.get("O")
    u = enc.get("U")
    p = enc.get("P")
    if not isinstance(o, bytes) or not isinstance(u, bytes) or not (
        isinstance(p, int)
    ):
        raise _Unsupported("malformed encrypt dict")
    key_len = 5 if v == 1 else max(5, min(16, int(
        enc.get("Length", 40) or 40
    ) // 8))
    em = enc.get("EncryptMetadata")
    em = True if em is None else bool(em)
    fkey = authenticate_empty_user(o, u, p, id0, r, key_len, em)
    if fkey is None:
        raise _Unsupported("user password required")
    if v in (1, 2):
        return Decryptor(fkey, "rc4", "rc4")
    return Decryptor(
        fkey, _cf_method(enc, "StrF"), _cf_method(enc, "StmF")
    )
