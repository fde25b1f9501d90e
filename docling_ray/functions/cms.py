"""Minimal DER / PKCS#7 (CMS) EnvelopedData + RSA primitives for the PDF
public-key security handler (/Filter /Adobe.PubSec).

Everything here is a direct transcription of PUBLIC specifications,
pinned by literal tests (tests/test_pdfcrypt.py):

  * DER TLV encoding (X.690) — only the handful of types CMS needs.
  * RSA with PKCS#1 v1.5 block type 2 padding (RFC 8017 §7.2) — pure
    ``pow(m, e, n)`` integer arithmetic; key sizes here are document
    streams' bottleneck, not modexp.
  * CMS EnvelopedData (RFC 5652 §6) restricted to the shape PDF's
    public-key handler uses (PDF 32000-1 §7.6.5): one-pass
    KeyTransRecipientInfo records wrapping an AES-128/256-CBC content
    key, content = 20-byte seed + 4-byte permissions.

Like ``pdfcrypt.py``, this module is the ONLY code shared between the
synthetic writer (which envelopes) and the extractor (which opens) —
the shared surface is the published encodings themselves, so the PDF
round trip still exercises two independent protocol implementations.

Reference parity anchor: the reference opens certificate-encrypted PDFs
through pdfium's PubSec handler (pypdfium2_backend.py:409).

Security note: this implements the DECODE path for data processing and
a deterministic test writer; it is not a hardened crypto library (no
blinding, no constant-time guarantees) and must not be used to protect
real data.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# DER (X.690) — encoders
# ---------------------------------------------------------------------------


def der_tlv(tag: int, payload: bytes) -> bytes:
    n = len(payload)
    if n < 0x80:
        return bytes([tag, n]) + payload
    lb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(lb)]) + lb + payload


def der_int(value: int) -> bytes:
    if value == 0:
        return der_tlv(0x02, b"\x00")
    b = value.to_bytes((value.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:  # keep it non-negative
        b = b"\x00" + b
    return der_tlv(0x02, b)


def der_oid(dotted: str) -> bytes:
    parts = [int(x) for x in dotted.split(".")]
    body = bytearray()
    # the first two arcs combine into one subidentifier; every
    # subidentifier (including that one) is base-128, high-bit-continued
    for p in [40 * parts[0] + parts[1], *parts[2:]]:
        chunk = bytearray([p & 0x7F])
        p >>= 7
        while p:
            chunk.append(0x80 | (p & 0x7F))
            p >>= 7
        body += bytes(reversed(chunk))
    return der_tlv(0x06, bytes(body))


def der_seq(*parts: bytes) -> bytes:
    return der_tlv(0x30, b"".join(parts))


def der_set(*parts: bytes) -> bytes:
    return der_tlv(0x31, b"".join(parts))


def der_octets(b: bytes) -> bytes:
    return der_tlv(0x04, b)


# ---------------------------------------------------------------------------
# DER — a tiny pull parser
# ---------------------------------------------------------------------------


class DerError(ValueError):
    pass


class DerReader:
    """Sequential TLV reader over one DER-encoded region."""

    def __init__(self, data: bytes, pos: int = 0, end: int | None = None):
        self.data = data
        self.pos = pos
        self.end = len(data) if end is None else end

    def eof(self) -> bool:
        return self.pos >= self.end

    def read_tlv(self) -> tuple[int, "DerReader"]:
        """Read one TLV; returns (tag, reader-over-the-value). Advances
        past the element."""
        d, i = self.data, self.pos
        if i + 2 > self.end:
            raise DerError("DER: truncated TLV header")
        tag = d[i]
        ln = d[i + 1]
        i += 2
        if ln & 0x80:
            nb = ln & 0x7F
            if nb == 0 or i + nb > self.end:
                raise DerError("DER: bad long-form length")
            ln = int.from_bytes(d[i: i + nb], "big")
            i += nb
        if i + ln > self.end:
            raise DerError("DER: value overruns container")
        val = DerReader(d, i, i + ln)
        self.pos = i + ln
        return tag, val

    def expect(self, want_tag: int) -> "DerReader":
        tag, val = self.read_tlv()
        if tag != want_tag:
            raise DerError(f"DER: expected tag {want_tag:#x}, got {tag:#x}")
        return val

    def bytes(self) -> bytes:
        return self.data[self.pos: self.end]


def parse_oid(r: "DerReader") -> str:
    body = r.expect(0x06).bytes()
    if not body:
        raise DerError("DER: empty OID")
    subids = []
    acc = 0
    for b in body:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            subids.append(acc)
            acc = 0
    first = subids[0]
    arc0 = 2 if first >= 80 else first // 40
    out = [str(arc0), str(first - 40 * arc0)]
    out += [str(s) for s in subids[1:]]
    return ".".join(out)


# ---------------------------------------------------------------------------
# RSA + PKCS#1 v1.5 (RFC 8017 §7.2)
# ---------------------------------------------------------------------------


def pkcs1_v15_encrypt(data: bytes, n: int, e: int, ps: bytes) -> bytes:
    """EME-PKCS1-v1_5 encrypt: 00 02 <PS nonzero> 00 <data>. ``ps``
    supplies the padding bytes (deterministic in the synthetic writer;
    zero bytes in it are remapped to 0x01 as the spec requires
    nonzero PS)."""
    k = (n.bit_length() + 7) // 8
    need = k - 3 - len(data)
    if need < 8:
        raise ValueError("pkcs1: message too long for modulus")
    pad = bytes((b or 1) for b in (ps * (need // max(len(ps), 1) + 1))[:need])
    em = b"\x00\x02" + pad + b"\x00" + data
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def pkcs1_v15_decrypt(ct: bytes, n: int, d: int) -> bytes | None:
    """EME-PKCS1-v1_5 decrypt; None on any padding mismatch (the caller
    treats it as 'not for this key' — data processing, not an oracle
    surface)."""
    k = (n.bit_length() + 7) // 8
    if len(ct) != k:
        return None
    em = pow(int.from_bytes(ct, "big"), d, n).to_bytes(k, "big")
    if em[:2] != b"\x00\x02":
        return None
    sep = em.find(b"\x00", 2)
    if sep < 10:  # at least 8 padding bytes
        return None
    return em[sep + 1:]


# ---------------------------------------------------------------------------
# CMS EnvelopedData (RFC 5652 §6), PDF PubSec profile
# ---------------------------------------------------------------------------

OID_ENVELOPED = "1.2.840.113549.1.7.3"
OID_DATA = "1.2.840.113549.1.7.1"
OID_RSA = "1.2.840.113549.1.1.1"
OID_AES128_CBC = "2.16.840.1.101.3.4.1.2"
OID_AES256_CBC = "2.16.840.1.101.3.4.1.42"
OID_CN = "2.5.4.3"

_AES_OIDS = {OID_AES128_CBC: 16, OID_AES256_CBC: 32}


def build_enveloped_data(cek: bytes, content: bytes, iv: bytes,
                         rsa_n: int, rsa_e: int, serial: int,
                         ps: bytes, issuer_cn: str = "synth") -> bytes:
    """One-recipient EnvelopedData ContentInfo: ``cek`` RSA-wrapped for
    (rsa_n, rsa_e), ``content`` AES-CBC-encrypted under ``cek`` with
    PKCS#7 padding. Writer side (the synthetic corpus generator)."""
    from docling_ray.functions.pdfcrypt import aes_cbc_encrypt

    cea_oid = {16: OID_AES128_CBC, 32: OID_AES256_CBC}[len(cek)]
    padn = 16 - len(content) % 16
    enc_content = aes_cbc_encrypt(cek, iv, content + bytes([padn]) * padn)
    issuer = der_seq(der_set(der_seq(
        der_oid(OID_CN), der_tlv(0x13, issuer_cn.encode("ascii")))))
    rid = der_seq(issuer, der_int(serial))
    ktri = der_seq(
        der_int(0), rid,
        der_seq(der_oid(OID_RSA), der_tlv(0x05, b"")),  # NULL params
        der_octets(pkcs1_v15_encrypt(cek, rsa_n, rsa_e, ps)))
    eci = der_seq(
        der_oid(OID_DATA),
        der_seq(der_oid(cea_oid), der_octets(iv)),
        der_tlv(0x80, enc_content))  # [0] IMPLICIT OCTET STRING
    env = der_seq(der_int(0), der_set(ktri), eci)
    return der_seq(der_oid(OID_ENVELOPED), der_tlv(0xA0, env))


def open_enveloped_data(blob: bytes,
                        keys: list[tuple[int, int]]) -> bytes | None:
    """Reader side: parse one EnvelopedData ContentInfo and try each
    (n, d) private key against each KeyTransRecipientInfo; on a CEK
    match, AES-CBC-decrypt the content and strip the PKCS#7 padding.
    Returns the plaintext content, or None when no key opens it.
    Raises :class:`DerError` on malformed DER (the PDF layer converts
    that to a failure row)."""
    from docling_ray.functions.pdfcrypt import aes_cbc_decrypt

    top = DerReader(blob).expect(0x30)
    if parse_oid(top) != OID_ENVELOPED:
        raise DerError("CMS: not EnvelopedData")
    env = top.expect(0xA0).expect(0x30)
    env.read_tlv()  # version
    rinfos = env.expect(0x31)
    enc_keys: list[bytes] = []
    while not rinfos.eof():
        ktri = rinfos.expect(0x30)
        ktri.read_tlv()  # version
        ktri.read_tlv()  # rid (issuerAndSerialNumber)
        kea = ktri.expect(0x30)
        if parse_oid(kea) != OID_RSA:
            continue
        enc_keys.append(ktri.expect(0x04).bytes())
    eci = env.expect(0x30)
    if parse_oid(eci) != OID_DATA:
        raise DerError("CMS: unexpected inner content type")
    cea = eci.expect(0x30)
    cea_oid = parse_oid(cea)
    klen = _AES_OIDS.get(cea_oid)
    if klen is None:
        raise DerError(f"CMS: unsupported content cipher {cea_oid}")
    iv = cea.expect(0x04).bytes()
    tag, ec = eci.read_tlv()
    if tag not in (0x80, 0xA0, 0x04):
        raise DerError("CMS: missing encryptedContent")
    enc_content = ec.expect(0x04).bytes() if tag == 0xA0 else ec.bytes()
    if len(iv) != 16 or not enc_content or len(enc_content) % 16:
        raise DerError("CMS: bad cipher geometry")
    for n, d in keys:
        for ek in enc_keys:
            cek = pkcs1_v15_decrypt(ek, n, d)
            if cek is None or len(cek) != klen:
                continue
            plain = aes_cbc_decrypt(cek, iv, enc_content)
            padn = plain[-1]
            if not 1 <= padn <= 16:
                continue
            return plain[:-padn]
    return None


def pubsec_file_key(seed: bytes, recipients: list[bytes], key_len: int,
                    encrypt_metadata: bool = True,
                    sha256: bool = False) -> bytes:
    """PDF 32000-1 §7.6.5.3: the PubSec file encryption key — a digest
    over the 20-byte seed, every /Recipients blob in array order, and
    4 bytes of 0xFF when metadata is left in the clear. SHA-1 for
    RC4/AES-128 crypt filters, SHA-256 for AESV3."""
    h = hashlib.sha256() if sha256 else hashlib.sha1()
    h.update(seed[:20])
    for r in recipients:
        h.update(r)
    if not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    return h.digest()[:key_len]
