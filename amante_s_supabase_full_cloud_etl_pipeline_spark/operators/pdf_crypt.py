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
- R5/R6 (AES-256, PDF 2.0 §7.6.4): the SHA-2 iterated KDF
  (Algorithm 2.B for R6, plain SHA-256 for R5), /U validation +
  /UE key release, AESV3 crypt filters (the file key used directly
  per §7.6.4 — no per-object derivation). The composition is
  additionally gated on the /Perms self-check ('adb' echo + P
  round-trip under the derived key), so a wrong derivation FAILS
  CLOSED into the structure-only refusal — it can never decrypt
  into silent garbage. AES here is the T-table FIPS-197 cipher
  below, pinned to Appendix C.1 AND C.3 vectors and differentially
  pinned fast==spec-literal.
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
for _ in range(13):
    _RCON.append(_gf_mul(_RCON[-1], 2))


def _build_ttables():
    """The classic 32-bit T-table formulation (FIPS-197 §5.1 rounds
    folded into four lookups+XORs per output word) — derived here
    from the generated S-box, so the fast path carries no typed-in
    constants either. T0e[x] packs MixColumns(SubBytes(x)) for byte
    position 0; rotations give T1-T3. Same for the inverse cipher
    with InvMixColumns over InvSubBytes."""
    t0e, t0d = [], []
    for x in range(256):
        s = _SBOX[x]
        t0e.append(
            (_gf_mul(s, 2) << 24) | (s << 16) | (s << 8)
            | _gf_mul(s, 3)
        )
        si = _INV_SBOX[x]
        t0d.append(
            (_gf_mul(si, 14) << 24) | (_gf_mul(si, 9) << 16)
            | (_gf_mul(si, 13) << 8) | _gf_mul(si, 11)
        )

    def rots(t0):
        t1 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t0]
        t2 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t1]
        t3 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t2]
        return t0, t1, t2, t3

    return rots(t0e), rots(t0d)


(_TE, _TD) = _build_ttables()


def _round_keys(key: bytes) -> list:
    """FIPS-197 §5.2 key expansion for Nk=4 (AES-128, 10 rounds)
    and Nk=8 (AES-256, 14 rounds — the extra SubWord on i≡4 mod Nk
    per the spec). Both pinned against Appendix C vectors."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("aes key size %d" % (nk * 4))
    nr = {4: 10, 8: 14}[nk]
    words = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [b"".join(bytes(words[4 * r + c]) for c in range(4))
            for r in range(nr + 1)]


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


def _aes_encrypt_block_slow(key: bytes, block: bytes) -> bytes:
    """Spec-literal round structure — the reference the fast
    T-table path is differentially pinned against in tests."""
    rks = _round_keys(key)
    nr = len(rks) - 1
    state = bytearray(block)
    _add_round_key(state, rks[0])
    for rnd in range(1, nr):
        _sub_bytes(state, _SBOX)
        _shift_rows(state)
        _mix_columns(state)
        _add_round_key(state, rks[rnd])
    _sub_bytes(state, _SBOX)
    _shift_rows(state)
    _add_round_key(state, rks[nr])
    return bytes(state)


def _aes_decrypt_block_slow(key: bytes, block: bytes) -> bytes:
    rks = _round_keys(key)
    nr = len(rks) - 1
    state = bytearray(block)
    _add_round_key(state, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        _shift_rows(state, inverse=True)
        _sub_bytes(state, _INV_SBOX)
        _add_round_key(state, rks[rnd])
        _mix_columns(state, inverse=True)
    _shift_rows(state, inverse=True)
    _sub_bytes(state, _INV_SBOX)
    _add_round_key(state, rks[0])
    return bytes(state)


# fast path: cached word schedules + T-table rounds. The R6 KDF
# (Algorithm 2.B) runs thousands of CBC blocks per document — the
# spec-literal path is ~30× too slow for that; the lru_cache also
# collapses the per-string schedule cost when one file key decrypts
# every object of a document (V5).
import functools


def _subword(t: int) -> int:
    return (
        (_SBOX[(t >> 24) & 0xFF] << 24) | (_SBOX[(t >> 16) & 0xFF] << 16)
        | (_SBOX[(t >> 8) & 0xFF] << 8) | _SBOX[t & 0xFF]
    )


@functools.lru_cache(maxsize=256)
def _enc_schedule(key: bytes):
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("aes key size %d" % (nk * 4))
    nr = {4: 10, 8: 14}[nk]
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = _subword(t) ^ (_RCON[i // nk - 1] << 24)
        elif nk > 6 and i % nk == 4:
            t = _subword(t)
        w.append(w[i - nk] ^ t)
    return tuple(w), nr


def _imc(x: int) -> int:
    a = [(x >> 24) & 0xFF, (x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF]
    m = (14, 11, 13, 9)
    out = 0
    for r in range(4):
        b = (
            _gf_mul(a[0], m[(0 - r) % 4])
            ^ _gf_mul(a[1], m[(1 - r) % 4])
            ^ _gf_mul(a[2], m[(2 - r) % 4])
            ^ _gf_mul(a[3], m[(3 - r) % 4])
        )
        out = (out << 8) | b
    return out


@functools.lru_cache(maxsize=256)
def _dec_schedule(key: bytes):
    w, nr = _enc_schedule(key)
    # equivalent inverse cipher (§5.3.5): middle round keys pass
    # through InvMixColumns
    dw = list(w)
    for rnd in range(1, nr):
        for c in range(4):
            dw[4 * rnd + c] = _imc(w[4 * rnd + c])
    return tuple(dw), nr


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    w, nr = _enc_schedule(key)
    t0, t1, t2, t3 = _TE
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        u0 = (t0[s0 >> 24] ^ t1[(s1 >> 16) & 0xFF]
              ^ t2[(s2 >> 8) & 0xFF] ^ t3[s3 & 0xFF] ^ w[k])
        u1 = (t0[s1 >> 24] ^ t1[(s2 >> 16) & 0xFF]
              ^ t2[(s3 >> 8) & 0xFF] ^ t3[s0 & 0xFF] ^ w[k + 1])
        u2 = (t0[s2 >> 24] ^ t1[(s3 >> 16) & 0xFF]
              ^ t2[(s0 >> 8) & 0xFF] ^ t3[s1 & 0xFF] ^ w[k + 2])
        u3 = (t0[s3 >> 24] ^ t1[(s0 >> 16) & 0xFF]
              ^ t2[(s1 >> 8) & 0xFF] ^ t3[s2 & 0xFF] ^ w[k + 3])
        s0, s1, s2, s3 = u0, u1, u2, u3
    k = 4 * nr
    sb = _SBOX
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
          | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ w[k]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
          | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ w[k + 1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
          | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ w[k + 2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
          | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ w[k + 3]
    return b"".join(x.to_bytes(4, "big") for x in (o0, o1, o2, o3))


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    dw, nr = _dec_schedule(key)
    d0, d1, d2, d3 = _TD
    k = 4 * nr
    s0 = int.from_bytes(block[0:4], "big") ^ dw[k]
    s1 = int.from_bytes(block[4:8], "big") ^ dw[k + 1]
    s2 = int.from_bytes(block[8:12], "big") ^ dw[k + 2]
    s3 = int.from_bytes(block[12:16], "big") ^ dw[k + 3]
    for rnd in range(nr - 1, 0, -1):
        k = 4 * rnd
        u0 = (d0[s0 >> 24] ^ d1[(s3 >> 16) & 0xFF]
              ^ d2[(s2 >> 8) & 0xFF] ^ d3[s1 & 0xFF] ^ dw[k])
        u1 = (d0[s1 >> 24] ^ d1[(s0 >> 16) & 0xFF]
              ^ d2[(s3 >> 8) & 0xFF] ^ d3[s2 & 0xFF] ^ dw[k + 1])
        u2 = (d0[s2 >> 24] ^ d1[(s1 >> 16) & 0xFF]
              ^ d2[(s0 >> 8) & 0xFF] ^ d3[s3 & 0xFF] ^ dw[k + 2])
        u3 = (d0[s3 >> 24] ^ d1[(s2 >> 16) & 0xFF]
              ^ d2[(s1 >> 8) & 0xFF] ^ d3[s0 & 0xFF] ^ dw[k + 3])
        s0, s1, s2, s3 = u0, u1, u2, u3
    isb = _INV_SBOX
    o0 = ((isb[s0 >> 24] << 24) | (isb[(s3 >> 16) & 0xFF] << 16)
          | (isb[(s2 >> 8) & 0xFF] << 8) | isb[s1 & 0xFF]) ^ dw[0]
    o1 = ((isb[s1 >> 24] << 24) | (isb[(s0 >> 16) & 0xFF] << 16)
          | (isb[(s3 >> 8) & 0xFF] << 8) | isb[s2 & 0xFF]) ^ dw[1]
    o2 = ((isb[s2 >> 24] << 24) | (isb[(s1 >> 16) & 0xFF] << 16)
          | (isb[(s0 >> 8) & 0xFF] << 8) | isb[s3 & 0xFF]) ^ dw[2]
    o3 = ((isb[s3 >> 24] << 24) | (isb[(s2 >> 16) & 0xFF] << 16)
          | (isb[(s1 >> 8) & 0xFF] << 8) | isb[s0 & 0xFF]) ^ dw[3]
    return b"".join(x.to_bytes(4, "big") for x in (o0, o1, o2, o3))


#: 128-bit aliases kept for the call sites/tests that predate the
#: generalized schedule
aes128_encrypt_block = aes_encrypt_block
aes128_decrypt_block = aes_decrypt_block


def aes_cbc_decrypt_nopad(key: bytes, data: bytes,
                          iv: bytes = b"\x00" * 16) -> bytes:
    """CBC without padding (the R6 KDF and /UE / /OE shapes)."""
    if len(data) % 16:
        raise ValueError("nopad size")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        plain = aes_decrypt_block(key, block)
        out.extend(x ^ y for x, y in zip(plain, prev))
        prev = block
    return bytes(out)


def aes_cbc_encrypt_nopad(key: bytes, data: bytes,
                          iv: bytes = b"\x00" * 16) -> bytes:
    if len(data) % 16:
        raise ValueError("nopad size")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = aes_encrypt_block(key, block)
        out.extend(prev)
    return bytes(out)


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
    # §7.6.3.3: low-order 32 bits of P; writers emit both the
    # signed and unsigned renderings of the same bit pattern
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
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


# ── §7.6.4 (ISO 32000-2) AES-256 revisions R5/R6 ────────────────
#
# The SHA-2 primitives and AES come from hashlib / the vector-pinned
# cipher above; the Algorithm 2.B composition is implemented from
# the published spec and proven by encoder↔parser round trip. A
# mis-remembered composition FAILS CLOSED: user-entry validation
# would reject the empty password (structure-only refusal, today's
# behavior) and the derived file key is additionally gated on the
# /Perms self-check below — wrong keys refuse, they never decrypt
# into silent garbage.
#
# ADR (review finding): unlike AES/RC4, Algorithm 2.B has no
# published known-answer vector available offline, so encoder and
# parser could in principle co-confirm a compositional slip — the
# failure mode would be REFUSING real-world R6 documents (never
# mis-decrypting them, thanks to the double gate above). Until a
# known-good real-file /U//UE//Perms triple can be pinned, the KDF
# output is frozen in tests (test_hash_r6_frozen_pin) so any
# accidental change to the composition is at least loud.


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (R6) — the iterated SHA-256/384/512 + AES-128-
    CBC KDF. R5 uses plain SHA-256(pw+salt+udata) (see hash_r5)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k1, iv=k[16:32])
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def hash_r5(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    return hashlib.sha256(password + salt + udata).digest()


def authenticate_empty_user_r56(
    u48: bytes, ue: bytes, r: int
) -> bytes | None:
    """Empty-user-password authentication for R5/R6: /U is
    hash(32) ‖ validation-salt(8) ‖ key-salt(8); a match releases
    the file key by AES-256-CBC-NoPad-decrypting /UE with the
    intermediate key. Returns the 32-byte file key or None."""
    if len(u48) < 48 or len(ue) < 32:
        return None
    h = hash_r6 if r == 6 else hash_r5
    if h(b"", u48[32:40]) != u48[:32]:
        return None
    ikey = h(b"", u48[40:48])
    return aes_cbc_decrypt_nopad(ikey, ue[:32])


def perms_check(fkey: bytes, perms: bytes, p: int) -> bool:
    """§7.6.4.4.12: /Perms decrypts (AES-256-ECB) to P (4 bytes LE),
    0xFF×4, 'T'/'F', 'adb', 4 random bytes. The 'adb' tag + P echo
    is the built-in proof the derived file key is the real one —
    required here so a wrong KDF can never 'succeed'."""
    if len(perms) < 16 or len(fkey) != 32:
        return False
    dec = aes_decrypt_block(fkey, perms[:16])
    return dec[9:12] == b"adb" and dec[0:4] == struct.pack(
        "<I", p & 0xFFFFFFFF
    )


def make_r6_entries(
    fkey: bytes, user_pw: bytes, owner_pw: bytes, p: int,
    salts: bytes, encrypt_metadata: bool = True,
) -> dict:
    """Fixture-encoder side: the full R6 entry set for a chosen
    32-byte file key. ``salts`` supplies 32 deterministic bytes
    (4×8: user validation/key, owner validation/key)."""
    uvs, uks, ovs, oks = (salts[0:8], salts[8:16], salts[16:24],
                          salts[24:32])
    u = hash_r6(user_pw, uvs) + uvs + uks
    ue = aes_cbc_encrypt_nopad(hash_r6(user_pw, uks), fkey)
    o = hash_r6(owner_pw, ovs, u) + ovs + oks
    oe = aes_cbc_encrypt_nopad(hash_r6(owner_pw, oks, u), fkey)
    perms_plain = (
        struct.pack("<I", p & 0xFFFFFFFF) + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F") + b"adb" + b"fix!"
    )
    perms = aes_encrypt_block(fkey, perms_plain)
    return {"U": u, "UE": ue, "O": o, "OE": oe, "Perms": perms}


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
        if method == "aes256":
            # V5: the file key is used directly for every object
            # (no per-object MD5 derivation), per-payload random IV
            return aes_cbc_decrypt(self.fkey, data)
        key = object_key(self.fkey, num, gen, aes=method == "aes")
        if method == "rc4":
            return rc4(key, data)
        return aes_cbc_decrypt(key, data)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_method, data, num, gen)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen)


def _cf_method(enc: dict, which: str, v: int = 4) -> str:
    """Resolve a V4 crypt-filter name (/StmF or /StrF) through /CF."""
    name = str(enc.get(which, "Identity"))
    if name == "Identity":
        return "identity"
    cf = enc.get("CF")
    cf = cf if isinstance(cf, dict) else {}
    entry = cf.get(name)
    entry = entry if isinstance(entry, dict) else {}
    cfm = str(entry.get("CFM", ""))
    # a CFM/V mismatch (AESV3 under a 16-byte V4 key, AESV2 under
    # V5) would "work" mechanically but decrypt with the wrong
    # cipher shape — exactly the silent-garbage case this module
    # refuses (review catch: the V4+AESV3 shape previously
    # mis-decrypted instead of refusing)
    if cfm == "V2" and v < 5:
        return "rc4"
    if cfm == "AESV2" and v < 5:
        return "aes"
    if cfm == "AESV3" and v == 5:
        return "aes256"
    raise _Unsupported("crypt filter %s/%s/V%d" % (name, cfm or "?", v))


def build_decryptor(enc: dict, id0: bytes) -> Decryptor:
    """From a resolved /Encrypt dictionary (+ first /ID element) to
    a Decryptor, or raise _Unsupported (wrong handler, R5/R6,
    non-empty user password)."""
    if str(enc.get("Filter", "")) != "Standard":
        raise _Unsupported("security handler %r" % enc.get("Filter"))
    v = int(enc.get("V", 0) or 0)
    r = int(enc.get("R", 0) or 0)
    if v == 5 and r in (5, 6):
        u = enc.get("U")
        ue = enc.get("UE")
        perms = enc.get("Perms")
        p = enc.get("P")
        if not (isinstance(u, bytes) and isinstance(ue, bytes)
                and isinstance(p, int)):
            raise _Unsupported("malformed R%d dict" % r)
        fkey = authenticate_empty_user_r56(u, ue, r)
        if fkey is None:
            raise _Unsupported("user password required")
        if not (isinstance(perms, bytes)
                and perms_check(fkey, perms, p)):
            # the 'adb' echo is the proof the KDF produced the real
            # key — without it, refuse rather than risk garbage
            raise _Unsupported("Perms self-check failed")
        return Decryptor(
            fkey,
            _cf_method(enc, "StrF", v=5),
            _cf_method(enc, "StmF", v=5),
        )
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
