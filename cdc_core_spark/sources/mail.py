"""Mail-intake source — the reference's ``intake`` module (mail ingestion)
re-expressed Spark-first.

Reference surface: intake/.../base/core/sources/email/MailDataStore.java +
AbstractMailDataStore.java (IMAP/Exchange message stores: folder listing,
message fetch, a mail query parser) with server sessions in
intake/.../base/core/connections/mail/IMAPConnection.java. The Spark-first
split mirrors the repo's other protocol sources (SFTP in remote_fs.py,
queues in streaming/stream.py):

* **Mailbox archives (mbox) shred DISTRIBUTED.** Bulk mail lands in the
  lake as mbox exports (every IMAP sync/export tool emits them), so the
  scan is ``binaryFile`` — one task per mbox file, files aren't splittable
  — plus an Arrow-batched shred through the stdlib ``email`` parser
  (mboxrd dialect: ``>From `` unescaping applied, so body lines that
  legitimately start with ``From `` round-trip losslessly). One row per
  message with SCALAR typed columns; attachments ride a separate
  ``read_mbox_attachments`` scan as ``binary`` payload rows (the
  multimodal plumbing shape).
* **Live IMAP sessions are an options contract** (``imap_source_options``)
  — the sandbox ships no mail server, so the connection layer is the same
  documented-options pattern as ``kafka_source_options``: production wires
  ``imaplib`` fetches into a staging directory of raw messages/mbox files
  (the remote_fs ``sync_remote_dir`` shape) and points the shred at it.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAIL_SCHEMA = ("mbox string, seq int, message_id string, sender string, "
               "subject string, ts long, body string, n_attachments int")
ATTACHMENT_SCHEMA = ("mbox string, seq int, filename string, "
                     "size_bytes bigint, content binary")

_FROM_ESC = re.compile(rb"^(>+)(From )", re.M)


def _split_mbox(blob: bytes) -> list[bytes]:
    """Split raw mbox bytes into per-message bytes (the ``From `` separator
    lines dropped, mboxrd ``>From `` escapes undone). Framing is strictly
    ``\\n``-line-wise (NOT splitlines, which also breaks on a bare ``\\r``
    — an embedded CR must never fabricate a message boundary the writer
    didn't escape). The blank SEPARATOR line a writer emits before the
    next ``From `` line belongs to the mailbox framing, not the message,
    so exactly one trailing blank line (LF or CRLF — IMAP-staged mboxes
    are CRLF) is stripped per message — the standard mboxrd reader
    convention."""
    msgs: list[list[bytes]] = []
    segs = blob.split(b"\n")
    for i, seg in enumerate(segs):
        if seg.startswith(b"From "):
            msgs.append([])
            continue
        if msgs:   # leading junk before the first From_ line is not a message
            msgs[-1].append(seg + (b"\n" if i < len(segs) - 1 else b""))
    out = []
    for m in msgs:
        raw = b"".join(m)
        if raw.endswith(b"\r\n\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n\n"):
            raw = raw[:-1]
        out.append(_FROM_ESC.sub(_unescape_one, raw))
    return out


def _check_mbox(name: str, blob: bytes, on_error: str) -> list[bytes] | None:
    """Shared stray-file routing (the archive-scan contract): a non-empty
    file with no ``From `` separator is not an mbox — fail names it, skip
    returns None; an empty mbox is a legal empty list."""
    raws = _split_mbox(blob)
    if not raws and len(blob):
        if on_error == "skip":
            return None
        raise RuntimeError(
            f"file {name!r} is non-empty but has no 'From ' separator "
            "line — not an mbox (on_error='skip' drops stray files "
            "instead)")
    # non-blank bytes BEFORE the first separator = a truncated download's
    # leading message fragment; dropping it silently would violate the
    # loud-fail contract (whitespace-only leaders are tolerated)
    if raws and not blob.startswith(b"From "):
        head = blob.split(b"\nFrom ", 1)[0]
        if head.strip():
            if on_error == "skip":
                return None
            raise RuntimeError(
                f"mbox {name!r} has {len(head)} bytes before its first "
                "'From ' separator (truncated download?) — refusing to "
                "silently drop the leading message fragment "
                "(on_error='skip' drops the whole file instead)")
    return raws


def _unescape_one(m: "re.Match[bytes]") -> bytes:
    # mboxrd: strip exactly ONE ">" — ">>From " was an escaped ">From "
    return m.group(1)[1:] + m.group(2)


def _safe_decode(data: bytes, charset: str | None) -> str:
    """Decode with the declared charset, falling back to UTF-8: real mail
    routinely declares bogus charsets (``x-unknown``…), and one such
    message must degrade to replacement characters, not kill the whole
    distributed scan with a LookupError."""
    try:
        return data.decode(charset or "utf-8", errors="replace")
    except LookupError:
        return data.decode("utf-8", errors="replace")


def _decode_header(raw: str | None) -> str | None:
    if raw is None:
        return None
    import email.header
    parts = []
    for text, charset in email.header.decode_header(raw):
        if isinstance(text, bytes):
            text = _safe_decode(text, charset)
        parts.append(text)
    return "".join(parts)


def _body_text(msg) -> str | None:
    """First non-attachment text/* part, decoded per its declared charset —
    the MailDataStore 'message text' projection."""
    for part in msg.walk():
        if part.get_content_maintype() != "text":
            continue
        if part.get_filename():
            continue   # named text parts are attachments
        payload = part.get_payload(decode=True)
        if payload is None:
            continue
        return _safe_decode(payload, part.get_content_charset())
    return None


def _parse_ts_ms(msg) -> int | None:
    import email.utils
    from datetime import timezone
    raw = msg.get("Date")
    if not raw:
        return None
    try:
        dt = email.utils.parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        return None
    if dt is None:
        return None
    if dt.tzinfo is None:
        # RFC 5322 '-0000' (unknown zone) parses NAIVE; pin it to UTC so
        # ts never depends on the executor host's local timezone
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def read_mbox_messages(spark: SparkSession, path: str,
                       on_error: str = "fail") -> DataFrame:
    """One row per message across every mbox file under ``path`` (glob ok):
    ``(mbox=full path, seq=position in file, message_id, sender, subject,
    ts=Date header as epoch ms (null when absent/unparsable), body=first
    text part, n_attachments)``. Parallelism = number of mbox files (mbox
    is not splittable — same contract as the archive scan); headers are
    RFC 2047-decoded, bodies decoded per their declared charset.

    ``on_error`` (the archive-scan contract): a non-empty file with no
    ``From `` separator is not an mbox — ``"fail"`` (default) raises with
    the file named, ``"skip"`` drops it (stray files in a drop directory)
    and keeps the scan alive. An EMPTY mbox is legal either way."""
    import email

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    bin_df = (spark.read.format("binaryFile").load(path)
              .select("path", "content"))

    def shred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                raws = _check_mbox(name, bytes(blob), on_error)
                if raws is None:
                    continue
                rows = []
                for seq, raw in enumerate(raws):
                    m = email.message_from_bytes(raw)
                    rows.append((
                        name, seq, m.get("Message-ID"),
                        _decode_header(m.get("From")),
                        _decode_header(m.get("Subject")),
                        _parse_ts_ms(m), _body_text(m),
                        sum(1 for p in m.walk() if p.get_filename()),
                    ))
                # one output frame PER FILE: memory stays bounded by a
                # single mbox's parsed text (~the blob the scan already
                # holds), never the whole input batch of files
                if rows:
                    yield pd.DataFrame(rows, columns=[
                        "mbox", "seq", "message_id", "sender", "subject",
                        "ts", "body", "n_attachments"])

    return bin_df.mapInPandas(shred, schema=MAIL_SCHEMA)


#: flush threshold for decoded attachment bytes per output frame — the
#: archive scan's batch-bounding rule (archive._FLUSH_BYTES rationale)
_ATT_FLUSH_BYTES = 256 << 20


def read_mbox_attachments(spark: SparkSession, path: str,
                          on_error: str = "fail") -> DataFrame:
    """One row per attachment: ``(mbox, seq, filename, size_bytes,
    content=raw bytes)`` — the opaque-binary + typed-metadata shape the
    multimodal operators consume (operators/multimodal.py). Same
    ``on_error`` stray-file routing as ``read_mbox_messages``; decoded
    attachment bytes flush to output in ≤256 MB frames so an
    attachment-heavy mailbox never buffers whole in one Arrow batch."""
    import email

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    bin_df = (spark.read.format("binaryFile").load(path)
              .select("path", "content"))

    def flush(rows):
        return pd.DataFrame(rows, columns=[
            "mbox", "seq", "filename", "size_bytes", "content"])

    def shred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                raws = _check_mbox(name, bytes(blob), on_error)
                if raws is None:
                    continue
                rows, buffered = [], 0
                for seq, raw in enumerate(raws):
                    m = email.message_from_bytes(raw)
                    for part in m.walk():
                        fn = part.get_filename()
                        if not fn:
                            continue
                        data = part.get_payload(decode=True) or b""
                        if rows and buffered + len(data) >= _ATT_FLUSH_BYTES:
                            yield flush(rows)
                            rows, buffered = [], 0
                        rows.append((name, seq, _decode_header(fn),
                                     len(data), data))
                        buffered += len(data)
                if rows:
                    yield flush(rows)

    return bin_df.mapInPandas(shred, schema=ATTACHMENT_SCHEMA)


def imap_source_options(host: str, username: str, folder: str = "INBOX",
                        port: int = 993, search: str = "ALL") -> dict:
    """IMAP session contract (IMAPConnection.java analog) — the documented
    options a production syncer feeds ``imaplib.IMAP4_SSL``: connect, SELECT
    the folder, UID SEARCH, fetch RFC822 bodies into a staging directory
    (one mbox per sync window, the ``sync_remote_dir`` shape), then
    ``read_mbox_messages`` shreds the staging dir distributed. Returned as
    a plain dict like ``kafka_source_options`` so tests can pin the shape
    without a server."""
    return {
        "protocol": "imaps", "host": host, "port": int(port),
        "username": username, "folder": folder, "search": search,
        # password resolves via the environment/secret store, never inline
        "fetch": "RFC822",
    }
