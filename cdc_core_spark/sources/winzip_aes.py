"""WinZip-AES (AE-1/AE-2) protected-zip support, self-contained.

The reference reads password-protected ingest bundles
(filesystem/.../encryption/ProtectedZipHandler.java); the stdlib's
``zipfile`` only speaks legacy ZipCrypto, so AES bundles (compression
method 99) need this module. Everything here follows the published
WinZip AE-2 specification and FIPS-197 — no third-party crypto dep:

- member layout: ``salt (8/12/16) + verifier (2) + ciphertext + auth (10)``
- keys: ``PBKDF2-HMAC-SHA1(password, salt, 1000, 2*keylen+2)`` split into
  AES key | HMAC-SHA1 key | 2-byte password verifier (``hashlib`` has
  PBKDF2 built in)
- cipher: AES-CTR with a 16-byte LITTLE-endian counter starting at 1 and
  no nonce (the WinZip quirk — not NIST CTR)
- auth: first 10 bytes of HMAC-SHA1 over the ciphertext (AE-2 zeroes the
  member CRC; AE-1 keeps it — both accepted)
- extra field 0x9901 carries (vendor version, strength, REAL compression
  method) since the method slot says 99

The AES core is implemented once, vectorized over all counter blocks with
numpy (S-box/xtime as uint8 lookup tables built from the GF(2^8)
definition at import). CTR only ever needs the ENCRYPT direction, so
that's all there is. Correctness is pinned by the FIPS-197 Appendix C
known-answer vectors plus a cross-validation against the JVM's
``javax.crypto`` AES/CTR in tests (two independent implementations).

Scale shape: decryption happens inside the archive-shred Arrow task
(`sources/archive.py`), so parallelism comes from the archive count —
same as the unencrypted path. The numpy core does ~10 table lookups per
round over one (n_blocks, 4, 4) array; good for tens of MB/s per task,
which is bundle-ingest territory, not bulk-column crypto (that stays on
the JVM's AES-NI via functions/crypto.py).
"""

from __future__ import annotations

import hashlib
import hmac
import io
import struct
import zlib

import numpy as np

WINZIP_AES_METHOD = 99
AES_EXTRA_ID = 0x9901
#: AE strength code -> (AES key bytes, salt bytes)
_STRENGTH = {1: (16, 8), 2: (24, 12), 3: (32, 16)}
_PBKDF2_ROUNDS = 1000
_AUTH_LEN = 10


# --------------------------------------------------------------- AES core
def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    """S-box and xtime (GF(2^8) ×2) tables from first principles
    (FIPS-197 §5.1.1): multiplicative inverse in GF(2^8) mod x^8+x^4+x^3+x+1
    followed by the affine transform."""
    # exp/log tables over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(b: int) -> int:
        return 0 if b == 0 else exp[255 - log[b]]

    sbox = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        c, r = inv(b), 0x63
        for i in range(8):
            bit = ((c >> i) ^ (c >> ((i + 4) % 8)) ^ (c >> ((i + 5) % 8))
                   ^ (c >> ((i + 6) % 8)) ^ (c >> ((i + 7) % 8))
                   ^ (r >> i)) & 1
            sbox[b] |= bit << i
    xtime = np.array([(b << 1) ^ (0x1B if b & 0x80 else 0) & 0xFF
                      for b in range(256)], dtype=np.uint16).astype(np.uint8)
    return sbox, xtime


_SBOX, _XTIME = _build_tables()
#: ShiftRows as a flat byte-gather: byte i holds state[i % 4][i // 4]
#: (FIPS-197 input order), so out[r + 4c] = in[r + 4*((c + r) % 4)]
_SHIFT = np.array([(r + 4 * ((c + r) % 4)) for c in range(4)
                   for r in range(4)], dtype=np.intp)


def _expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 §5.2 key schedule → (rounds+1, 16) uint8 round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    rounds = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        w = list(words[i - 1])
        if i % nk == 0:
            w = w[1:] + w[:1]
            w = [int(_SBOX[b]) for b in w]
            w[0] ^= rcon
            rcon = (rcon << 1) ^ (0x11B if rcon & 0x80 else 0)
            rcon &= 0xFF
        elif nk == 8 and i % nk == 4:
            w = [int(_SBOX[b]) for b in w]
        words.append([a ^ b for a, b in zip(words[i - nk], w)])
    flat = np.array(words, dtype=np.uint8).reshape(rounds + 1, 16)
    return flat


def _encrypt_blocks(round_keys: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Encrypt (n, 16) uint8 blocks in parallel (vectorized FIPS-197
    cipher). Byte i of each block is state[i % 4][i // 4]."""
    n_rounds = round_keys.shape[0] - 1
    s = blocks ^ round_keys[0]
    for rnd in range(1, n_rounds):
        s = _SBOX[s][:, _SHIFT]
        # MixColumns on the (n, col, row) view: byte r+4c sits at [:, c, r]
        v = s.reshape(-1, 4, 4)
        s0, s1, s2, s3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
        all_x = s0 ^ s1 ^ s2 ^ s3
        out = np.empty_like(v)
        out[:, :, 0] = s0 ^ all_x ^ _XTIME[s0 ^ s1]
        out[:, :, 1] = s1 ^ all_x ^ _XTIME[s1 ^ s2]
        out[:, :, 2] = s2 ^ all_x ^ _XTIME[s2 ^ s3]
        out[:, :, 3] = s3 ^ all_x ^ _XTIME[s3 ^ s0]
        s = out.reshape(-1, 16) ^ round_keys[rnd]
    s = _SBOX[s][:, _SHIFT] ^ round_keys[n_rounds]
    return s


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt — the KAT/cross-validation surface."""
    if len(block) != 16:
        raise ValueError("block must be 16 bytes")
    out = _encrypt_blocks(_expand_key(key),
                          np.frombuffer(block, dtype=np.uint8).reshape(1, 16))
    return out.tobytes()


#: blocks per keystream chunk (4 MiB) — the CTR transform streams in
#: fixed-size chunks so one huge member costs constant transient memory
#: instead of ~4-5× its size in whole-member numpy temporaries (the AES
#: rounds allocate several full-size arrays each); per-chunk this is a
#: few dozen MB regardless of member size
_CTR_CHUNK_BLOCKS = 4 * 1024 * 1024 // 16


def _ctr_chunk(round_keys: np.ndarray, first_block: int,
               n_blocks: int) -> np.ndarray:
    """Keystream for blocks [first_block, first_block + n_blocks): WinZip
    CTR = 16-byte LITTLE-endian counter starting at 1, no nonce."""
    counters = np.zeros((n_blocks, 16), dtype=np.uint8)
    # low 8 bytes little-endian cover any realistic member (< 2^64 blocks);
    # '<u8' pins the in-memory byte order so the .view is LE on any host
    counters[:, :8] = (np.arange(first_block, first_block + n_blocks,
                                 dtype=np.dtype("<u8"))
                       .view(np.uint8).reshape(n_blocks, 8))
    return _encrypt_blocks(round_keys, counters).reshape(-1)


def _ctr_apply(key: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty_like(buf)
    step = _CTR_CHUNK_BLOCKS * 16
    for off in range(0, len(buf), step):
        chunk = buf[off:off + step]
        ks = _ctr_chunk(rk, off // 16 + 1, (len(chunk) + 15) // 16)
        out[off:off + step] = chunk ^ ks[:len(chunk)]
    return out.tobytes()


# ------------------------------------------------------ zip member codec
def parse_aes_extra(extra: bytes) -> tuple[int, int, int]:
    """Locate the 0x9901 field → (vendor_version, strength, real_method)."""
    i = 0
    while i + 4 <= len(extra):
        hid, ln = struct.unpack_from("<HH", extra, i)
        if hid == AES_EXTRA_ID and ln >= 7:
            ver, vendor, strength, method = struct.unpack_from(
                "<H2sBH", extra, i + 4)
            if vendor != b"AE" or strength not in _STRENGTH:
                raise RuntimeError(
                    f"malformed WinZip AES extra field: vendor={vendor!r} "
                    f"strength={strength}")
            return ver, strength, method
        i += 4 + ln
    raise RuntimeError("member uses method 99 but has no 0x9901 AES extra "
                       "field")


def _derive(password: bytes, salt: bytes, key_len: int):
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, _PBKDF2_ROUNDS,
                             dklen=2 * key_len + 2)
    return dk[:key_len], dk[key_len:2 * key_len], dk[2 * key_len:]


def decrypt_member(raw: bytes, password: bytes, strength: int) -> bytes:
    """salt+verifier+ciphertext+auth → plaintext (still compressed).
    RuntimeError on wrong password or tampered bytes — the same error
    class zipfile raises for bad ZipCrypto passwords, so the archive
    scanner's fail/skip routing treats both schemes identically."""
    key_len, salt_len = _STRENGTH[strength]
    if len(raw) < salt_len + 2 + _AUTH_LEN:
        raise RuntimeError("AES member too short for salt+verifier+auth")
    salt = raw[:salt_len]
    verifier = raw[salt_len:salt_len + 2]
    ct = raw[salt_len + 2:-_AUTH_LEN]
    auth = raw[-_AUTH_LEN:]
    aes_key, mac_key, check = _derive(password, salt, key_len)
    if check != verifier:
        raise RuntimeError("wrong password for WinZip AES member "
                           "(verifier mismatch)")
    want = hmac.new(mac_key, ct, hashlib.sha1).digest()[:_AUTH_LEN]
    if not hmac.compare_digest(want, auth):
        raise RuntimeError("WinZip AES authentication failed (corrupt or "
                           "tampered member)")
    return _ctr_apply(aes_key, ct)


def read_member(blob: bytes, info, password: bytes | None) -> bytes:
    """Decrypt + decompress one method-99 member of an in-memory zip.
    ``info`` is the stdlib ZipInfo (central-directory view); the raw bytes
    are located via the LOCAL header because its name/extra lengths can
    differ from the central directory's."""
    if password is None:
        raise RuntimeError(
            f"member {info.filename!r} is WinZip-AES encrypted; pass "
            "password=")
    _ver, strength, method = parse_aes_extra(info.extra)
    sig, = struct.unpack_from("<I", blob, info.header_offset)
    if sig != 0x04034B50:
        raise RuntimeError(f"bad local header for {info.filename!r}")
    fn_len, ex_len = struct.unpack_from("<HH", blob, info.header_offset + 26)
    start = info.header_offset + 30 + fn_len + ex_len
    raw = blob[start:start + info.compress_size]
    plain = decrypt_member(raw, password, strength)
    if method == zlib.DEFLATED:  # 8
        d = zlib.decompressobj(-15)
        plain = d.decompress(plain) + d.flush()
    elif method != 0:  # 0 = stored
        raise RuntimeError(
            f"member {info.filename!r}: unsupported inner compression "
            f"method {method}")
    if len(plain) != info.file_size:
        raise RuntimeError(
            f"member {info.filename!r}: decrypted size {len(plain)} != "
            f"declared {info.file_size}")
    return plain


# ---------------------------------------------------------------- writer
def write_winzip_aes(path_or_buf, members, password: str,
                     strength: int = 3, salt_seed: bytes | None = None):
    """Write an AE-2 zip of ``members`` ([(name, bytes), ...]) — the
    roundtrip half (ProtectedZipHandler writes protected bundles too) and
    the fixture builder for the gate. ``salt_seed`` derives each member's
    salt as sha256(seed+name) for BIT-STABLE fixtures; leave None for
    fresh random salts (the only right choice outside tests). Members are
    deflated, timestamps pinned to the zip epoch."""
    import os as _os
    key_len, salt_len = _STRENGTH[strength]
    pwd = password.encode("utf-8")
    out = io.BytesIO() if isinstance(path_or_buf, str) else path_or_buf
    central = []
    for name, data in members:
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        deflated = comp.compress(data) + comp.flush()
        if salt_seed is not None:
            salt = hashlib.sha256(salt_seed + name.encode()).digest()[:salt_len]
        else:
            salt = _os.urandom(salt_len)
        aes_key, mac_key, verifier = _derive(pwd, salt, key_len)
        ct = _ctr_apply(aes_key, deflated)
        auth = hmac.new(mac_key, ct, hashlib.sha1).digest()[:_AUTH_LEN]
        payload = salt + verifier + ct + auth
        nm = name.encode("utf-8")
        extra = struct.pack("<HHH2sBH", AES_EXTRA_ID, 7, 2, b"AE", strength,
                            zlib.DEFLATED)
        offset = out.tell()
        # flag bit 0 = encrypted; bit 11 (0x800) = name is UTF-8 — without
        # it readers decode non-ASCII names as cp437 mojibake; CRC = 0 per
        # AE-2; dos date = zip epoch
        flags = 1 | (0x800 if not name.isascii() else 0)
        head = struct.pack("<IHHHHHIII", 0x04034B50, 51, flags, 99, 0, 0x21,
                           0, len(payload), len(data))
        out.write(head + struct.pack("<HH", len(nm), len(extra)) + nm + extra)
        out.write(payload)
        central.append((nm, extra, payload, offset, len(data), flags))
    cd_start = out.tell()
    for nm, extra, payload, offset, usize, flags in central:
        out.write(struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 51, 51,
                              flags, 99, 0, 0x21, 0, len(payload), usize,
                              len(nm), len(extra), 0, 0, 0, 0, offset))
        out.write(nm + extra)
    cd_len = out.tell() - cd_start
    out.write(struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(central),
                          len(central), cd_len, cd_start, 0))
    if isinstance(path_or_buf, str):
        with open(path_or_buf, "wb") as f:
            f.write(out.getvalue())
