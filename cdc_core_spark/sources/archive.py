"""Archive scan — zip/tar ingest bundles shredded into one row per member
(the reference unpacks bundles to local disk with
common/.../utils/ZipUtils.java:113-150 ``unzip`` before reading them;
password-protected bundles via filesystem/.../encryption/
ProtectedZipHandler.java — the ``password`` parameter covers BOTH the
legacy ZipCrypto scheme ``zipfile`` understands and WinZip-AES members
(compression method 99), which decrypt through the self-contained
``winzip_aes`` codec: PBKDF2 key derivation, numpy-vectorized AES-CTR,
HMAC-SHA1 authentication — no third-party crypto dependency).

Spark-first shape: ``spark.read.format("binaryFile")`` lists and reads the
archives distributed (one task per archive — zip/tar are not splittable, so
PARALLELISM COMES FROM THE NUMBER OF ARCHIVES, the standard answer for
bundle ingest; a single 100-GB zip is an anti-pattern the docstring can't
fix), then an Arrow-batched ``mapInArrow`` opens each archive IN MEMORY and
emits ``(archive, member, size_bytes, content)`` rows — no local-disk
unpack step, no driver involvement, binary-safe content.

Memory bounds: output RecordBatches are flushed per archive AND whenever
the accumulated member bytes pass a threshold, so neither a batch of many
archives nor one archive with many members accumulates unbounded rows, and
the 2 GiB offset capacity of 32-bit Arrow binary arrays is never hit (a
SINGLE member over 2 GiB would still fail — split such bundles upstream).

Member filtering pushes into the extractor (``member_pattern``) so a bundle
with mixed payloads (data + manifests + junk) only materializes the wanted
members. Directory entries are always skipped.
"""

from __future__ import annotations

import fnmatch
import io
import struct
import tarfile
import zipfile
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from cdc_core_spark.sources import winzip_aes

#: decoded member rows
ARCHIVE_SCHEMA = ("archive string, member string, size_bytes bigint, "
                  "content binary")

#: flush an output batch when buffered member content passes this
_FLUSH_BYTES = 256 * 1024 * 1024

#: errors that mean "this file is not a (readable) archive" — the skip set.
#: RuntimeError = zipfile's (and winzip_aes's) wrong/missing-password;
#: zlib/EOF/OSError cover truncated or corrupt compression streams;
#: struct.error = a truncated AES extra field / local header whose declared
#: offsets run past the blob (winzip_aes parses those with struct)
_DECODE_ERRORS = (zipfile.BadZipFile, zipfile.LargeZipFile, tarfile.TarError,
                  RuntimeError, zlib.error, EOFError, OSError, struct.error)


def _named_errors(it, name: str):
    """Re-raise extraction errors with the offending archive named — at
    1000 archives/task, 'bad zip' without a path is undebuggable."""
    try:
        yield from it
    except _DECODE_ERRORS as exc:
        raise RuntimeError(
            f"failed to extract archive {name!r}: {exc}") from exc


def _zip_members(name: str, blob: bytes, pat: str | None,
                 password: bytes | None):
    # compression method 99 = WinZip AES (the scheme ProtectedZipHandler
    # supports beyond ZipCrypto). stdlib can't decrypt it; the built-in
    # winzip_aes codec (FIPS-197-KAT'd numpy AES-CTR + HMAC auth) can —
    # per MEMBER, so mixed archives (plain + AES entries) read fine. A
    # wrong password raises RuntimeError from either scheme, keeping the
    # fail/skip routing uniform.
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if pat and not fnmatch.fnmatch(info.filename, pat):
                continue
            if info.compress_type == winzip_aes.WINZIP_AES_METHOD:
                content = winzip_aes.read_member(blob, info, password)
            else:
                content = zf.read(info, pwd=password)
            yield name, info.filename, info.file_size, content


def _tar_members(name: str, blob: bytes, pat: str | None,
                 _password: bytes | None):
    # mode "r:*" sniffs plain/gz/bz2/xz tarballs
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            if pat and not fnmatch.fnmatch(info.name, pat):
                continue
            f = tf.extractfile(info)
            yield name, info.name, info.size, f.read() if f else b""


def read_archive_members(spark: SparkSession, path: str,
                         member_pattern: str | None = None,
                         password: str | None = None,
                         on_error: str = "fail") -> DataFrame:
    """One row per archive member under ``path`` (glob ok): ``(archive,
    member, size_bytes, content)``. ``archive`` is the FULL source path —
    same-named bundles in different drop directories must stay distinct
    keys. Zip vs tar is chosen per file by extension (``.zip`` → zip, else
    tar — covers .tar, .tar.gz, .tgz, .tar.bz2, .tar.xz).
    ``member_pattern`` is an fnmatch glob applied inside the extractor,
    before any bytes are materialized into rows. ``password`` unlocks
    ZipCrypto-protected zips (ProtectedZipHandler analog).

    ``on_error``: ``"fail"`` (default) re-raises extraction errors with the
    offending archive named — a corrupt bundle should stop a CDC ingest
    loudly; ``"skip"`` drops undecodable archives (stray non-archive files
    in the drop directory, wrong password) and keeps the scan alive — pair
    it with a reconciliation count when you use it."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    pwd = password.encode("utf-8") if password is not None else None
    bin_df = (spark.read.format("binaryFile").load(path)
              .select("path", "content"))

    def shred(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import pyarrow as pa

        def to_batch(rows):
            return pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in rows], type=pa.string()),
                 pa.array([r[1] for r in rows], type=pa.string()),
                 pa.array([r[2] for r in rows], type=pa.int64()),
                 pa.array([r[3] for r in rows], type=pa.binary())],
                ["archive", "member", "size_bytes", "content"])

        for b in batches:
            for rec in b.to_pylist():
                name = rec["path"]
                members = (_zip_members if name.lower().endswith(".zip")
                           else _tar_members)
                if on_error == "skip":
                    # materialize all-or-nothing BEFORE emitting: a
                    # mid-archive failure must not leave partial rows
                    # behind when the archive is then skipped. Catch only
                    # DECODE errors — an environmental MemoryError in here
                    # must fail the task (and retry), not silently drop a
                    # valid bundle
                    try:
                        rows = list(members(name, rec["content"],
                                            member_pattern, pwd))
                    except _DECODE_ERRORS:
                        continue
                else:
                    # fail mode streams: a mid-archive error kills the task
                    # and Spark discards its partial output anyway, so
                    # memory stays bounded by the flush threshold
                    rows = _named_errors(
                        members(name, rec["content"], member_pattern, pwd),
                        name)
                chunk, buffered = [], 0
                for row in rows:
                    # flush BEFORE appending when the next member would
                    # cross the threshold — appending first could push one
                    # chunk past the 2 GiB Arrow 32-bit offset capacity
                    # (255 MB buffered + a 1.9 GiB member is legal input)
                    if chunk and buffered + len(row[3]) >= _FLUSH_BYTES:
                        yield to_batch(chunk)
                        chunk, buffered = [], 0
                    chunk.append(row)
                    buffered += len(row[3])
                if chunk:
                    yield to_batch(chunk)

    return bin_df.mapInArrow(shred, schema=ARCHIVE_SCHEMA)
