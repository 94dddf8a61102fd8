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
    lines dropped, mboxrd ``>From `` escapes undone). Works line-wise, so a
    message body that was properly escaped by the writer can never be
    mistaken for a boundary. The blank SEPARATOR line a writer emits before
    the next ``From `` line belongs to the mailbox framing, not the
    message, so exactly one trailing blank line is stripped per message —
    the standard mboxrd reader convention."""
    msgs: list[list[bytes]] = []
    for line in blob.splitlines(keepends=True):
        if line.startswith(b"From "):
            msgs.append([])
            continue
        if msgs:   # leading junk before the first From_ line is not a message
            msgs[-1].append(line)
    out = []
    for m in msgs:
        raw = b"".join(m)
        if raw.endswith(b"\n\n"):
            raw = raw[:-1]
        out.append(_FROM_ESC.sub(_unescape_one, raw))
    return out


def _unescape_one(m: "re.Match[bytes]") -> bytes:
    # mboxrd: strip exactly ONE ">" — ">>From " was an escaped ">From "
    return m.group(1)[1:] + m.group(2)


def _decode_header(raw: str | None) -> str | None:
    if raw is None:
        return None
    import email.header
    parts = []
    for text, charset in email.header.decode_header(raw):
        if isinstance(text, bytes):
            text = text.decode(charset or "utf-8", errors="replace")
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
        return payload.decode(part.get_content_charset() or "utf-8",
                              errors="replace")
    return None


def _parse_ts_ms(msg) -> int | None:
    import email.utils
    raw = msg.get("Date")
    if not raw:
        return None
    try:
        dt = email.utils.parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        return None
    if dt is None:
        return None
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
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                raws = _split_mbox(bytes(blob))
                if not raws and len(blob):
                    if on_error == "skip":
                        continue
                    raise RuntimeError(
                        f"file {name!r} is non-empty but has no 'From ' "
                        "separator line — not an mbox (on_error='skip' "
                        "drops stray files instead)")
                for seq, raw in enumerate(raws):
                    m = email.message_from_bytes(raw)
                    rows.append((
                        name, seq, m.get("Message-ID"),
                        _decode_header(m.get("From")),
                        _decode_header(m.get("Subject")),
                        _parse_ts_ms(m), _body_text(m),
                        sum(1 for p in m.walk() if p.get_filename()),
                    ))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "mbox", "seq", "message_id", "sender", "subject",
                    "ts", "body", "n_attachments"])

    return bin_df.mapInPandas(shred, schema=MAIL_SCHEMA)


def read_mbox_attachments(spark: SparkSession, path: str) -> DataFrame:
    """One row per attachment: ``(mbox, seq, filename, size_bytes,
    content=raw bytes)`` — the opaque-binary + typed-metadata shape the
    multimodal operators consume (operators/multimodal.py)."""
    import email

    bin_df = (spark.read.format("binaryFile").load(path)
              .select("path", "content"))

    def shred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                for seq, raw in enumerate(_split_mbox(bytes(blob))):
                    m = email.message_from_bytes(raw)
                    for part in m.walk():
                        fn = part.get_filename()
                        if not fn:
                            continue
                        data = part.get_payload(decode=True) or b""
                        rows.append((name, seq, _decode_header(fn),
                                     len(data), data))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "mbox", "seq", "filename", "size_bytes", "content"])

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
