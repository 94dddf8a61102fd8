"""Field-level encryption / key hashing — the reference's crypto utility
surface (common/src/main/java/io/zyient/base/common/utils/CypherUtils.java:
``CIPHER_ALGO = "AES/CBC/PKCS5Padding"`` :41, ``encrypt``/``decrypt``
:118-170 with password + IV-spec, ``getKeyHash``/``getHash`` = Base64(MD5)
:93-116, ``checkPassword`` key derivation :58-73, ``formatIvString``
:75-85) and the filesystem ``EncryptionHandler`` contract
(filesystem/.../encryption/EncryptionHandler.java:27-45).

Spark-first: the ciphers are the BUILT-IN ``aes_encrypt``/``aes_decrypt``
expressions — JVM-side, inside whole-stage codegen, no Python in the loop —
configured to the reference's exact algorithm (AES/CBC with PKCS padding and
an explicit IV, so ciphertexts are deterministic and stable across runs the
way CypherUtils' fixed-IV encryption is). Spark prepends the IV to the
ciphertext (output = IV || C, so ``octet_length = 16 + 16*(floor(n/16)+1)``
for an n-byte plaintext — a closed form the DuckDB oracle checks).

Key sizing follows ``checkPassword``: the derived key string must reach 16
bytes and is truncated to the largest of 16/24/32 it covers (AES-128/192/256).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AES_KEY_LENGTHS = (32, 24, 16)


def derive_key(password: str, name: str) -> bytes:
    """``CypherUtils.checkPassword`` (:58-73): key material is
    ``"{name}--{password}"``; under 16 bytes is an error, and longer keys
    truncate with the reference's STRICTLY-GREATER thresholds — ``>32 → 32,
    >24 → 24, >16 → 16`` — including the quirk that an exactly-32-byte
    input truncates to 24 (AES-192) rather than staying AES-256, because
    ciphertexts must interoperate with the reference.

    Returns BYTES, truncated on the UTF-8 encoding: AES demands exactly
    16/24/32 KEY BYTES, and a multi-byte character split by the cut must
    stay as its leading bytes — decoding back to str would drop the
    fragment and hand AES a 30-byte key it rejects at runtime."""
    raw = f"{name}--{password}".encode("utf-8")
    if len(raw) < 16:
        raise ValueError(
            f"invalid password: derived key must reach 16 bytes "
            f"(expected lengths 16/24/32), got {len(raw)}")
    for n in _AES_KEY_LENGTHS:
        if len(raw) > n:
            return raw[:n]
    return raw  # exactly 16


def format_iv(iv: str | bytes) -> bytes:
    """``CypherUtils.formatIvString`` (:75-85): exactly 16 BYTES — longer
    IVs truncate (on bytes, see :func:`derive_key`), shorter raise."""
    raw = iv if isinstance(iv, bytes) else iv.encode("utf-8")
    if len(raw) < 16:
        raise ValueError(f"IV must be at least 16 bytes, got {len(raw)}")
    return raw[:16]


def _key_bytes(key: str | bytes) -> bytes:
    raw = key if isinstance(key, bytes) else key.encode("utf-8")
    if len(raw) not in _AES_KEY_LENGTHS:
        raise ValueError(
            f"AES key must be 16/24/32 bytes, got {len(raw)} — derive it "
            "with derive_key()")
    return raw


def encrypt_field(col, key: str | bytes, iv: str | bytes) -> Column:
    """AES/CBC/PKCS-encrypt a string column → Base64 string (the
    ``encryptAsString`` form CypherUtils returns). Deterministic: the
    explicit IV is the reference's fixed-IV contract — same input, same
    ciphertext, so encrypted columns stay joinable/groupable. Use a
    per-dataset random IV where that linkability is itself a leak."""
    c = F.aes_encrypt(F.col(col) if isinstance(col, str) else col,
                      F.lit(_key_bytes(key)), F.lit("CBC"), F.lit("PKCS"),
                      F.lit(format_iv(iv)))
    return F.base64(c)


def decrypt_field(col, key: str | bytes) -> Column:
    """Inverse of :func:`encrypt_field` (Base64 → AES/CBC/PKCS decrypt →
    string). The IV rides the ciphertext (Spark's IV || C layout), so only
    the key is needed."""
    c = F.unbase64(F.col(col) if isinstance(col, str) else col)
    return F.aes_decrypt(c, F.lit(_key_bytes(key)), F.lit("CBC"),
                         F.lit("PKCS")).cast("string")


def try_decrypt_field(col, key: str | bytes) -> Column:
    """NULL-on-failure variant (wrong key / corrupt ciphertext) — the
    quarantine-friendly form for DLQ routing instead of a failed job."""
    c = F.unbase64(F.col(col) if isinstance(col, str) else col)
    return F.try_aes_decrypt(c, F.lit(_key_bytes(key)), F.lit("CBC"),
                             F.lit("PKCS")).cast("string")


def key_hash(col) -> Column:
    """``CypherUtils.getKeyHash``/``getHash`` (:93-116): Base64 of the raw
    MD5 digest (NOT of the hex string) — the reference's key-fingerprint
    format, used to index keys in its KeyStore without storing them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(F.unhex(F.md5(c)))
