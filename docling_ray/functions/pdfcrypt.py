"""PDF standard-security-handler crypto primitives (shared writer/reader).

Everything here is a direct transcription of PUBLIC specifications and is
pinned by known-answer tests from those specs (tests/test_pdfcrypt.py):

  * RC4 — the well-known stream cipher (original 1994 posting /
    RFC 6229 test vectors).
  * AES-128/192/256 — FIPS-197, implemented numpy-vectorized over blocks
    (table-lookup SubBytes, index-permutation ShiftRows, GF(2^8)
    table MixColumns). CBC decryption is block-parallel
    (P_i = D(C_i) xor C_{i-1}); CBC encryption is the serial definition
    (writer-side only, never on the extraction hot path).
  * PDF standard security handler key derivation — PDF 32000-1:2008
    §7.6.3 Algorithms 1-5 (RC4 / AES-128, revisions 2-4) and
    ISO 32000-2 §7.6.4 Algorithms 2.A/2.B (AES-256, revision 6).

Like ``normalize.py``/``refs.py``, this module is the ONLY crypto code
shared between the synthetic generator (which encrypts) and the
extractor (which decrypts) — the shared surface is the published
algorithm itself, pinned by literal spec vectors, so the round trip
still exercises two independent protocol implementations on top of it.

Reference parity anchor: the reference opens encrypted PDFs through
pdfium (docling/backend/pypdfium2_backend.py:409), which implements the
same standard handler natively.

Scale note: pure-Python RC4 and numpy AES decrypt at ~1-50 MB/s per
core — fine for document-sized streams; a 100 TB deployment with a
high encrypted fraction would swap these for a C crypto provider
behind the same function signatures.
"""

from __future__ import annotations

import functools
import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (KSA + PRGA). Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = ch ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197), numpy-vectorized over blocks
# ---------------------------------------------------------------------------

_SBOX = np.frombuffer(bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76"
    "ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d83115"
    "04c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f84"
    "53d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa8"
    "51a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d1973"
    "60814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479"
    "e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a"
    "703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df"
    "8ca1890dbfe6426841992d0fb054bb16"), dtype=np.uint8)
_INV_SBOX = np.zeros(256, np.uint8)
_INV_SBOX[_SBOX] = np.arange(256, dtype=np.uint8)


def _gmul_table(c: int) -> np.ndarray:
    t = np.zeros(256, np.uint8)
    for x in range(256):
        a, b, p = x, c, 0
        for _ in range(8):
            if b & 1:
                p ^= a
            hi = a & 0x80
            a = (a << 1) & 0xFF
            if hi:
                a ^= 0x1B
            b >>= 1
        t[x] = p
    return t


_T2, _T3 = _gmul_table(2), _gmul_table(3)
_T9, _T11, _T13, _T14 = (_gmul_table(c) for c in (9, 11, 13, 14))

# flat state index i = r + 4c (FIPS-197 column-major fill order)
_SHIFT = np.array([(i % 4) + 4 * (((i // 4) + (i % 4)) % 4)
                   for i in range(16)])
_INV_SHIFT = np.array([(i % 4) + 4 * (((i // 4) - (i % 4)) % 4)
                       for i in range(16)])


@functools.lru_cache(maxsize=256)
def _expand_key(key: bytes) -> np.ndarray:
    """Key schedule → (Nr+1, 16) uint8 round keys (cached — the AESV3
    path reuses one file key for every object)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8) or len(key) % 4:
        raise ValueError(f"bad AES key length {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return np.array(w, np.uint8).reshape(nr + 1, 16)


def _mix(s: np.ndarray) -> np.ndarray:
    a = s.reshape(-1, 4, 4)  # [block, column, row]
    a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    return np.stack([
        _T2[a0] ^ _T3[a1] ^ a2 ^ a3,
        a0 ^ _T2[a1] ^ _T3[a2] ^ a3,
        a0 ^ a1 ^ _T2[a2] ^ _T3[a3],
        _T3[a0] ^ a1 ^ a2 ^ _T2[a3],
    ], axis=2).reshape(-1, 16)


def _inv_mix(s: np.ndarray) -> np.ndarray:
    a = s.reshape(-1, 4, 4)
    a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    return np.stack([
        _T14[a0] ^ _T11[a1] ^ _T13[a2] ^ _T9[a3],
        _T9[a0] ^ _T14[a1] ^ _T11[a2] ^ _T13[a3],
        _T13[a0] ^ _T9[a1] ^ _T14[a2] ^ _T11[a3],
        _T11[a0] ^ _T13[a1] ^ _T9[a2] ^ _T14[a3],
    ], axis=2).reshape(-1, 16)


def _encrypt_with_rk(rk: np.ndarray, data: bytes) -> bytes:
    nr = len(rk) - 1
    s = np.frombuffer(data, np.uint8).reshape(-1, 16) ^ rk[0]
    for rnd in range(1, nr):
        s = _mix(_SBOX[s][:, _SHIFT]) ^ rk[rnd]
    s = _SBOX[s][:, _SHIFT] ^ rk[nr]
    return s.astype(np.uint8).tobytes()


def aes_encrypt_blocks(key: bytes, data: bytes) -> bytes:
    """ECB over ``len(data)//16`` blocks (vectorized across blocks)."""
    return _encrypt_with_rk(_expand_key(key), data)


def aes_decrypt_blocks(key: bytes, data: bytes) -> bytes:
    """ECB inverse cipher (vectorized across blocks)."""
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = np.frombuffer(data, np.uint8).reshape(-1, 16) ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _inv_mix(_INV_SBOX[s[:, _INV_SHIFT]] ^ rk[rnd])
    s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[0]
    return s.astype(np.uint8).tobytes()


# T-tables for the serial (CBC-encrypt) path: the classic four-table
# Rijndael round — per-block Python-int ops beat tiny-array numpy by ~10×
# and the revision-6 key derivation (Algorithm 2.B) encrypts thousands
# of blocks serially.
_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
for _x in range(256):
    _s = int(_SBOX[_x])
    _s2, _s3 = int(_T2[_s]), int(_T3[_s])
    _TE0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _TE1[_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _TE2[_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _TE3[_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2
_SBOX_INT = [int(b) for b in _SBOX]


def _expand_key_words(key: bytes) -> list[int]:
    rk = _expand_key(key)
    flat = rk.tobytes()
    return [int.from_bytes(flat[i: i + 4], "big")
            for i in range(0, len(flat), 4)]


def _encrypt_block_int(w: list[int], nr: int,
                       s0: int, s1: int, s2: int, s3: int
                       ) -> tuple[int, int, int, int]:
    s0 ^= w[0]
    s1 ^= w[1]
    s2 ^= w[2]
    s3 ^= w[3]
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for r in range(1, nr):
        k = 4 * r
        t0 = (te0[(s0 >> 24) & 0xFF] ^ te1[(s1 >> 16) & 0xFF]
              ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ w[k])
        t1 = (te0[(s1 >> 24) & 0xFF] ^ te1[(s2 >> 16) & 0xFF]
              ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ w[k + 1])
        t2 = (te0[(s2 >> 24) & 0xFF] ^ te1[(s3 >> 16) & 0xFF]
              ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ w[k + 2])
        t3 = (te0[(s3 >> 24) & 0xFF] ^ te1[(s0 >> 16) & 0xFF]
              ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ w[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    sb = _SBOX_INT
    k = 4 * nr
    return (
        ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
         | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ w[k],
        ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
         | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ w[k + 1],
        ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
         | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ w[k + 2],
        ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
         | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ w[k + 3],
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, no padding (len(data) % 16 == 0). Serial by definition —
    writer-side and key-derivation only, never on the extraction path."""
    w = _expand_key_words(key)
    nr = len(w) // 4 - 1
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    out = bytearray()
    for i in range(0, len(data), 16):
        p0, p1, p2, p3 = _encrypt_block_int(
            w, nr,
            p0 ^ int.from_bytes(data[i: i + 4], "big"),
            p1 ^ int.from_bytes(data[i + 4: i + 8], "big"),
            p2 ^ int.from_bytes(data[i + 8: i + 12], "big"),
            p3 ^ int.from_bytes(data[i + 12: i + 16], "big"))
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big") \
            + p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


# inverse T-tables (equivalent inverse cipher): the per-block integer
# path beats tiny-array numpy below ~64 blocks — PDF strings and most
# content streams are exactly that size class
_TD0 = [0] * 256
_TD1 = [0] * 256
_TD2 = [0] * 256
_TD3 = [0] * 256
for _x in range(256):
    _is = int(_INV_SBOX[_x])
    _i9, _i11 = int(_T9[_is]), int(_T11[_is])
    _i13, _i14 = int(_T13[_is]), int(_T14[_is])
    _TD0[_x] = (_i14 << 24) | (_i9 << 16) | (_i13 << 8) | _i11
    _TD1[_x] = (_i11 << 24) | (_i14 << 16) | (_i9 << 8) | _i13
    _TD2[_x] = (_i13 << 24) | (_i11 << 16) | (_i14 << 8) | _i9
    _TD3[_x] = (_i9 << 24) | (_i13 << 16) | (_i11 << 8) | _i14
_INV_SBOX_INT = [int(b) for b in _INV_SBOX]


@functools.lru_cache(maxsize=256)
def _inv_key_words(key: bytes) -> tuple[list[int], list[int], int]:
    """(forward words, InvMixColumns-transformed middle-round words, Nr)
    for the equivalent inverse cipher. Uses the classic table identity
    InvMixColumns(w) = TD0[SB[b0]] ^ TD1[SB[b1]] ^ TD2[SB[b2]] ^
    TD3[SB[b3]] (the forward S-box cancels TD's built-in inverse box) —
    pure int ops, ~50µs/key, cheap enough for AESV2's per-object keys."""
    w = _expand_key_words(key)
    nr = len(w) // 4 - 1
    ik = list(w)
    sb = _SBOX_INT
    for i in range(4, 4 * nr):
        v = w[i]
        ik[i] = (_TD0[sb[(v >> 24) & 0xFF]] ^ _TD1[sb[(v >> 16) & 0xFF]]
                 ^ _TD2[sb[(v >> 8) & 0xFF]] ^ _TD3[sb[v & 0xFF]])
    return w, ik, nr


def _decrypt_block_int(w: list[int], ik: list[int], nr: int,
                       s0: int, s1: int, s2: int, s3: int
                       ) -> tuple[int, int, int, int]:
    k = 4 * nr
    s0 ^= w[k]
    s1 ^= w[k + 1]
    s2 ^= w[k + 2]
    s3 ^= w[k + 3]
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    for r in range(nr - 1, 0, -1):
        k = 4 * r
        t0 = (td0[(s0 >> 24) & 0xFF] ^ td1[(s3 >> 16) & 0xFF]
              ^ td2[(s2 >> 8) & 0xFF] ^ td3[s1 & 0xFF] ^ ik[k])
        t1 = (td0[(s1 >> 24) & 0xFF] ^ td1[(s0 >> 16) & 0xFF]
              ^ td2[(s3 >> 8) & 0xFF] ^ td3[s2 & 0xFF] ^ ik[k + 1])
        t2 = (td0[(s2 >> 24) & 0xFF] ^ td1[(s1 >> 16) & 0xFF]
              ^ td2[(s0 >> 8) & 0xFF] ^ td3[s3 & 0xFF] ^ ik[k + 2])
        t3 = (td0[(s3 >> 24) & 0xFF] ^ td1[(s2 >> 16) & 0xFF]
              ^ td2[(s1 >> 8) & 0xFF] ^ td3[s0 & 0xFF] ^ ik[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    sb = _INV_SBOX_INT
    return (
        ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
         | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ w[0],
        ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
         | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ w[1],
        ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
         | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ w[2],
        ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
         | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ w[3],
    )


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, no padding — block-parallel for big payloads
    (P_i = D(C_i) xor C_{i-1} via the vectorized inverse cipher),
    per-block integer path below 16 blocks where numpy setup dominates
    (measured crossover ≈ 13 blocks)."""
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC data not block-aligned")
    if len(data) < 16 * 16:
        w, ik, nr = _inv_key_words(key)
        out = bytearray()
        prev = iv
        for i in range(0, len(data), 16):
            blk = data[i: i + 16]
            p = _decrypt_block_int(
                w, ik, nr,
                int.from_bytes(blk[0:4], "big"),
                int.from_bytes(blk[4:8], "big"),
                int.from_bytes(blk[8:12], "big"),
                int.from_bytes(blk[12:16], "big"))
            for j in range(4):
                out += (p[j]
                        ^ int.from_bytes(prev[4 * j: 4 * j + 4], "big")
                        ).to_bytes(4, "big")
            prev = blk
        return bytes(out)
    plain = aes_decrypt_blocks(key, data)
    shifted = iv + data[:-16]
    return bytes(
        (np.frombuffer(plain, np.uint8)
         ^ np.frombuffer(shifted, np.uint8)).tobytes())


# ---------------------------------------------------------------------------
# PDF standard security handler (PDF 32000-1 §7.6.3, ISO 32000-2 §7.6.4)
# ---------------------------------------------------------------------------

# the 32-byte padding string of Algorithm 2 (PDF 32000-1 Table ...)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def std_file_key(password: bytes, o_entry: bytes, p: int, id0: bytes,
                 rev: int, key_len: int,
                 encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the RC4/AES-128 file encryption key (revisions 2-4)."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if rev >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key for revisions <= 4. (AES-256 /
    revision 6 uses the file key directly — Algorithm 1.A.)"""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def compute_o(owner_pw: bytes, user_pw: bytes, rev: int,
              key_len: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_len if rev >= 3 else 5]
    o = rc4(key, _pad_password(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(file_key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (rev 2) / Algorithm 5 (rev 3-4): the /U entry."""
    if rev == 2:
        return rc4(file_key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + u[:16]  # 16 significant + 16 arbitrary bytes


def r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the iterated SHA-2/AES hash used by
    revision 6 (AES-256). ``udata`` is the 48-byte /U entry when hashing
    owner-password material, empty for user-password material."""
    k = hashlib.sha256(password + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = int.from_bytes(e[:16], "big") % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


@functools.lru_cache(maxsize=64)
def r6_file_key_from_user(password: bytes, u_entry: bytes,
                          ue_entry: bytes) -> bytes | None:
    """Algorithm 2.A (user-password path): validate ``password`` against
    the 48-byte /U entry and unwrap the 32-byte file key from /UE.
    Returns None when the password does not validate."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        return None
    if r6_hash(password, u_entry[32:40]) != u_entry[:32]:
        return None
    ik = r6_hash(password, u_entry[40:48])
    return aes_cbc_decrypt(ik, b"\x00" * 16, ue_entry[:32])


def user_key_from_owner(owner_pw: bytes, o_entry: bytes, rev: int,
                        key_len: int) -> bytes:
    """Algorithm 7 (owner-password path, revisions 2-4): decrypt the /O
    entry with the owner-password RC4 key, recovering the PADDED user
    password that Algorithm 2 accepts verbatim (padding a 32-byte padded
    password is the identity)."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_len if rev >= 3 else 5]
    data = o_entry[:32]
    if rev >= 3:
        for i in range(19, 0, -1):
            data = rc4(bytes(b ^ i for b in key), data)
    return rc4(key, data)


@functools.lru_cache(maxsize=64)
def r6_file_key_from_owner(password: bytes, u_entry: bytes,
                           o_entry: bytes, oe_entry: bytes) -> bytes | None:
    """Algorithm 2.A (owner-password path): validate ``password`` against
    the 48-byte /O entry (hashed over the full /U as extra data) and
    unwrap the 32-byte file key from /OE. Returns None when the password
    does not validate."""
    if len(u_entry) < 48 or len(o_entry) < 48 or len(oe_entry) < 32:
        return None
    u48 = u_entry[:48]
    if r6_hash(password, o_entry[32:40], u48) != o_entry[:32]:
        return None
    ik = r6_hash(password, o_entry[40:48], u48)
    return aes_cbc_decrypt(ik, b"\x00" * 16, oe_entry[:32])


@functools.lru_cache(maxsize=64)
def r6_make_entries(file_key: bytes, user_pw: bytes = b"",
                    owner_pw: bytes = b"",
                    salts: bytes = b"\x00" * 32) -> tuple[bytes, bytes,
                                                          bytes, bytes]:
    """Writer-side revision-6 entries: (U, UE, O, OE). ``salts`` supplies
    the 4×8 random salt bytes (deterministic in the synthetic writer)."""
    uvs, uks, ovs, oks = (salts[0:8], salts[8:16], salts[16:24],
                          salts[24:32])
    u = r6_hash(user_pw, uvs) + uvs + uks
    ue = aes_cbc_encrypt(r6_hash(user_pw, uks), b"\x00" * 16, file_key)
    o = r6_hash(owner_pw, ovs, u) + ovs + oks
    oe = aes_cbc_encrypt(r6_hash(owner_pw, oks, u), b"\x00" * 16, file_key)
    return u, ue, o, oe
