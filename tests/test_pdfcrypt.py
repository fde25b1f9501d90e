"""Known-answer tests for the shared PDF crypto primitives — every vector
below is a hand-written literal from the public specification it names,
pinning the module so writer and reader cannot co-drift (the same
contract as tests/test_normalize.py for the other shared functions)."""

import hashlib
import struct

from docling_ray.functions.pdfcrypt import (
    PAD,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_decrypt_blocks,
    aes_encrypt_blocks,
    compute_o,
    compute_u,
    object_key,
    r6_file_key_from_user,
    r6_make_entries,
    rc4,
    std_file_key,
)


def test_rc4_published_short_key_vectors():
    # the two widely-published example vectors (Wikipedia RC4 article)
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert rc4(b"Secret", b"Attack at dawn").hex().upper() == \
        "45A01F645FC35B383552544B9BF5"


def test_rc4_rfc6229_128bit_vector():
    key = bytes.fromhex("0102030405060708090a0b0c0d0e0f10")
    ks = rc4(key, b"\x00" * 16)
    assert ks.hex() == "9ac7cc9a609d1ef7b2932899cde41b97"


def test_rc4_classic_key_plaintext_vector():
    # the widely-published original sci.crypt vector
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_rc4_roundtrip():
    assert rc4(b"k2", rc4(b"k2", b"some payload")) == b"some payload"


def test_aes128_fips197_appendix_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes_encrypt_blocks(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes_decrypt_blocks(key, ct) == pt


def test_aes192_fips197_appendix_c2():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes_encrypt_blocks(key, pt)
    assert ct.hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert aes_decrypt_blocks(key, ct) == pt


def test_aes256_fips197_appendix_c3():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes_encrypt_blocks(key, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert aes_decrypt_blocks(key, ct) == pt


def test_aes128_cbc_nist_sp800_38a_f2_1():
    # NIST SP 800-38A F.2.1 CBC-AES128.Encrypt, first two blocks
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                       "ae2d8a571e03ac9c9eb76fac45af8e51")
    ct = aes_cbc_encrypt(key, iv, pt)
    assert ct.hex() == ("7649abac8119b246cee98e9b12e9197d"
                        "5086cb9b507219ee95db113a917678b2")
    assert aes_cbc_decrypt(key, iv, ct) == pt


def test_aes_multiblock_ecb_vectorization():
    # many blocks at once must equal block-at-a-time (exercises the
    # numpy batch path)
    key = bytes(range(16))
    pt = bytes((i * 7 + 3) & 0xFF for i in range(16 * 9))
    whole = aes_encrypt_blocks(key, pt)
    parts = b"".join(aes_encrypt_blocks(key, pt[i: i + 16])
                     for i in range(0, len(pt), 16))
    assert whole == parts
    assert aes_decrypt_blocks(key, whole) == pt


def test_std_file_key_matches_hand_computed_md5_chain():
    # Algorithm 2 recomputed inline, step by step, with hashlib only —
    # an independent transcription of PDF 32000-1 §7.6.3.3
    o = bytes(range(32))
    p = -44
    id0 = b"0123456789abcdef"
    got = std_file_key(b"", o, p, id0, rev=3, key_len=16)
    h = hashlib.md5()
    h.update(PAD)          # empty password pads to the full pad string
    h.update(o)
    h.update(struct.pack("<i", p))
    h.update(id0)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()
    assert got == key[:16]


def test_object_key_matches_hand_computed():
    fk = bytes(range(16))
    got = object_key(fk, num=7, gen=0, aes=True)
    exp = hashlib.md5(fk + b"\x07\x00\x00" + b"\x00\x00" + b"sAlT").digest()
    assert got == exp[:16]
    # 40-bit key: object key truncates to keylen+5 = 10 bytes
    assert len(object_key(fk[:5], 1, 0, aes=False)) == 10


def test_compute_o_and_u_consistency_rev3():
    # empty owner/user passwords: derive the key from /O, regenerate /U,
    # and check both directions of Algorithm 5's truncated comparison
    id0 = b"\xaa" * 16
    o = compute_o(b"", b"", rev=3, key_len=16)
    key = std_file_key(b"", o, -44, id0, rev=3, key_len=16)
    u = compute_u(key, id0, rev=3)
    assert len(o) == 32 and len(u) == 32
    # a second derivation with the same inputs is bit-identical
    assert compute_u(std_file_key(b"", o, -44, id0, 3, 16), id0, 3) == u
    # and a different file ID changes /U (the id is mixed into the hash)
    assert compute_u(key, b"\xbb" * 16, rev=3) != u


def test_r6_entries_roundtrip_and_reject():
    fk = bytes((i * 13 + 5) & 0xFF for i in range(32))
    salts = bytes(range(32))
    u, ue, o, oe = r6_make_entries(fk, salts=salts)
    assert len(u) == 48 and len(ue) == 32 and len(o) == 48
    assert r6_file_key_from_user(b"", u, ue) == fk
    # wrong password fails validation (returns None, no exception)
    assert r6_file_key_from_user(b"wrong", u, ue) is None


def test_cbc_decrypt_int_and_numpy_paths_agree():
    import random as _r

    from docling_ray.functions.pdfcrypt import aes_cbc_decrypt, \
        aes_cbc_encrypt

    rng = _r.Random(3)
    for klen in (16, 32):
        key = bytes(rng.randrange(256) for _ in range(klen))
        iv = bytes(rng.randrange(256) for _ in range(16))
        for nblocks in (1, 63, 64, 200):  # straddle the path switch
            pt = bytes(rng.randrange(256) for _ in range(16 * nblocks))
            ct = aes_cbc_encrypt(key, iv, pt)
            assert aes_cbc_decrypt(key, iv, ct) == pt, (klen, nblocks)


# ----------------------------------------------------------------------
# CMS / RSA / DER primitives (functions/cms.py) for the PubSec handler
# ----------------------------------------------------------------------

def test_der_oid_roundtrip_rfc_vector():
    from docling_ray.functions.cms import DerReader, der_oid, parse_oid

    # the X.690 example: 2.100.3 encodes as 06 03 81 34 03
    assert der_oid("2.100.3") == bytes.fromhex("0603813403")
    for dotted in ("1.2.840.113549.1.7.3", "2.16.840.1.101.3.4.1.2",
                   "2.5.4.3"):
        assert parse_oid(DerReader(der_oid(dotted))) == dotted


def test_der_long_form_length():
    from docling_ray.functions.cms import DerReader, der_octets

    blob = der_octets(b"x" * 300)
    assert blob[1] == 0x82 and blob[2:4] == (300).to_bytes(2, "big")
    r = DerReader(blob).expect(0x04)
    assert r.bytes() == b"x" * 300


def test_rsa_pkcs1_roundtrip_and_reject():
    from docling_ray.functions.cms import (pkcs1_v15_decrypt,
                                           pkcs1_v15_encrypt)
    from docling_ray.synth import (PUBSEC_RSA_D, PUBSEC_RSA_E,
                                   PUBSEC_RSA_N)

    msg = bytes(range(16))
    ct = pkcs1_v15_encrypt(msg, PUBSEC_RSA_N, PUBSEC_RSA_E, ps=b"\x07\x3a")
    assert len(ct) == 128
    assert pkcs1_v15_decrypt(ct, PUBSEC_RSA_N, PUBSEC_RSA_D) == msg
    # tampered ciphertext or the wrong key must NOT round-trip to msg
    bad = bytes([ct[0] ^ 1]) + ct[1:]
    assert pkcs1_v15_decrypt(bad, PUBSEC_RSA_N, PUBSEC_RSA_D) != msg
    assert pkcs1_v15_decrypt(ct, PUBSEC_RSA_N, PUBSEC_RSA_D + 2) != msg
    # padding structure: 00 02 <nonzero PS >= 8> 00 <msg>
    em = pow(int.from_bytes(ct, "big"), PUBSEC_RSA_D,
             PUBSEC_RSA_N).to_bytes(128, "big")
    assert em[:2] == b"\x00\x02" and 0 not in em[2:-(len(msg) + 1)]
    assert em[-(len(msg) + 1)] == 0


def test_enveloped_data_roundtrip_and_wrong_key():
    from docling_ray.functions.cms import (build_enveloped_data,
                                           open_enveloped_data)
    from docling_ray.synth import (PUBSEC_RSA_D, PUBSEC_RSA_E,
                                   PUBSEC_RSA_N)

    content = hashlib.sha256(b"seed").digest()[:20] + b"\xff\xff\xff\xfc"
    blob = build_enveloped_data(
        cek=b"K" * 16, content=content, iv=b"I" * 16,
        rsa_n=PUBSEC_RSA_N, rsa_e=PUBSEC_RSA_E, serial=7, ps=b"\x55")
    assert open_enveloped_data(
        blob, [(PUBSEC_RSA_N, PUBSEC_RSA_D)]) == content
    # a non-matching key yields None (not an exception)
    assert open_enveloped_data(blob, [(PUBSEC_RSA_N, 3)]) is None
    assert open_enveloped_data(blob, []) is None
    # 32-byte CEK variant (aes256-CBC OID)
    blob2 = build_enveloped_data(
        cek=b"L" * 32, content=content, iv=b"J" * 16,
        rsa_n=PUBSEC_RSA_N, rsa_e=PUBSEC_RSA_E, serial=9, ps=b"\x01\x02")
    assert open_enveloped_data(
        blob2, [(PUBSEC_RSA_N, PUBSEC_RSA_D)]) == content


def test_pubsec_file_key_is_the_spec_digest():
    from docling_ray.functions.cms import pubsec_file_key

    seed = bytes(range(20))
    r1, r2 = b"recipient-one", b"recipient-two"
    assert pubsec_file_key(seed, [r1, r2], 16) == \
        hashlib.sha1(seed + r1 + r2).digest()[:16]
    assert pubsec_file_key(seed, [r1], 16, encrypt_metadata=False) == \
        hashlib.sha1(seed + r1 + b"\xff\xff\xff\xff").digest()[:16]
    assert pubsec_file_key(seed, [r1], 32, sha256=True) == \
        hashlib.sha256(seed + r1).digest()
