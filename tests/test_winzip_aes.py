"""WinZip-AES protected-zip codec (ProtectedZipHandler analog,
filesystem/.../encryption/ProtectedZipHandler.java).

The AES core is pinned two independent ways: the FIPS-197 Appendix C
known-answer vectors (public spec constants) and a cross-validation
against the JVM's javax.crypto AES — a completely separate
implementation reached through py4j. The container format is pinned by
roundtripping through the REAL archive scanner (read_archive_members on
Spark), wrong-password and tampered-bytes routing included.
"""

from __future__ import annotations

import io
import os
import zipfile

import pytest

from cdc_core_spark.sources import winzip_aes as wz
from cdc_core_spark.sources.archive import read_archive_members


# FIPS-197 Appendix C: same plaintext, 128/192/256-bit keys
_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS = [(16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
         (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
         (32, "8ea2b7ca516745bfeafc49904b496089")]


@pytest.mark.parametrize("klen,want", _FIPS)
def test_fips197_known_answers(klen, want):
    assert wz.aes_encrypt_block(bytes(range(klen)), _FIPS_PT).hex() == want


def test_aes_core_matches_jvm(spark):
    """Random keys/blocks vs javax.crypto AES/ECB — two implementations,
    one answer. Covers all three key sizes and multi-block batching."""
    import random

    rng = random.Random(20260819)
    jvm = spark.sparkContext._jvm
    for klen in (16, 24, 32):
        key = bytes(rng.randrange(256) for _ in range(klen))
        data = bytes(rng.randrange(256) for _ in range(16 * 37))
        cipher = jvm.javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        cipher.init(1, jvm.javax.crypto.spec.SecretKeySpec(
            bytearray(key), "AES"))
        want = bytes(cipher.doFinal(bytearray(data)))
        got = b"".join(wz.aes_encrypt_block(key, data[i:i + 16])
                       for i in range(0, len(data), 16))
        assert got == want, f"AES-{klen * 8} diverges from javax.crypto"


@pytest.mark.parametrize("strength", [1, 2, 3])
def test_member_roundtrip_all_strengths(strength):
    members = [("a.txt", b"alpha " * 500), ("d/b.bin", bytes(range(256)) * 9)]
    buf = io.BytesIO()
    wz.write_winzip_aes(buf, members, "pw", strength=strength,
                        salt_seed=b"t")
    blob = buf.getvalue()
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        got = {i.filename: wz.read_member(blob, i, b"pw")
               for i in zf.infolist()}
    assert got == dict(members)


def test_wrong_password_and_tamper_raise():
    buf = io.BytesIO()
    wz.write_winzip_aes(buf, [("x", b"payload" * 64)], "right",
                        salt_seed=b"t")
    blob = buf.getvalue()
    info = zipfile.ZipFile(io.BytesIO(blob)).infolist()[0]
    with pytest.raises(RuntimeError, match="wrong password"):
        wz.read_member(blob, info, b"wrong")
    with pytest.raises(RuntimeError, match="password"):
        wz.read_member(blob, info, None)
    # flip one ciphertext byte (past header+salt+verifier) → HMAC must fail
    pos = info.header_offset + 30 + len(info.filename) + len(info.extra) + 20
    bad = blob[:pos] + bytes([blob[pos] ^ 1]) + blob[pos + 1:]
    with pytest.raises(RuntimeError, match="authentication"):
        wz.read_member(bad, info, b"right")


def test_archive_scan_reads_aes_zip(spark, tmp_path):
    """The full distributed path: an AES bundle next to a plain bundle,
    one scan with password= reads both; the fail/skip routing treats a
    missing password exactly like any undecodable archive."""
    root = str(tmp_path)
    secret = [("s/one.txt", b"classified " * 100),
              ("s/two.txt", b"\x00\xffbinary\x07" * 33)]
    wz.write_winzip_aes(os.path.join(root, "secret.zip"), secret, "k3y",
                        salt_seed=b"gate")
    with zipfile.ZipFile(os.path.join(root, "plain.zip"), "w",
                         zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("p.txt", b"open data")

    rows = {(r["member"]): (r["size_bytes"], bytes(r["content"]))
            for r in read_archive_members(
                spark, f"{root}/*.zip", password="k3y").collect()}
    want = dict(secret) | {"p.txt": b"open data"}
    assert {m: (len(c), c) for m, c in want.items()} == rows

    with pytest.raises(Exception, match="secret.zip"):
        read_archive_members(spark, f"{root}/secret.zip").collect()
    survivors = read_archive_members(spark, f"{root}/*.zip",
                                     on_error="skip").collect()
    assert {r["member"] for r in survivors} == {"p.txt"}
