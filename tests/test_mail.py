"""Mail-intake source (reference `intake` module: MailDataStore /
IMAPConnection analogs): distributed mbox shred with mboxrd escaping,
RFC 2047 headers, charset-decoded bodies, binary attachments."""

from __future__ import annotations

import os
from email.message import EmailMessage

from cdc_core_spark.sources import mail


def _mboxrd_bytes(messages: list[EmailMessage]) -> bytes:
    """Serialize messages to mboxrd: From_ separators + '>From ' escaping —
    what any conformant exporter writes."""
    out = []
    for m in messages:
        raw = m.as_bytes()
        body_escaped = b"\n".join(
            b">" + ln if ln.lstrip(b">").startswith(b"From ") else ln
            for ln in raw.split(b"\n"))
        out.append(b"From exporter@local Thu Jan  1 00:00:00 1970\n"
                   + body_escaped.rstrip(b"\n") + b"\n\n")
    return b"".join(out)


def _msg(subject, body, sender="a@x", date="Thu, 01 Jan 1970 00:00:10 +0000",
         attachments=()):
    m = EmailMessage()
    m["From"] = sender
    m["Subject"] = subject
    m["Date"] = date
    m["Message-ID"] = f"<m{abs(hash(subject)) % 1000}@x>" \
        if not subject.isascii() else f"<{subject}@x>"
    m.set_content(body)
    for fn, data in attachments:
        m.add_attachment(data, maintype="application",
                         subtype="octet-stream", filename=fn)
    return m


def test_mbox_messages_roundtrip(spark, tmp_path):
    raw_png = bytes([0x89, 0x50, 0x4E, 0x47, 0x00, 0xFF])
    msgs = [
        _msg("plain", "hello world\n"),
        # a body line starting with "From " must survive mboxrd escaping
        _msg("escaped", "line one\nFrom the start of a line\n>From too\n"),
        # RFC 2047 non-ASCII subject + an attachment
        _msg("unié ✓", "body\n", attachments=[("img.bin", raw_png)]),
    ]
    p = tmp_path / "box.mbox"
    p.write_bytes(_mboxrd_bytes(msgs))

    rows = {r["subject"]: r for r in
            mail.read_mbox_messages(spark, str(p)).collect()}
    assert set(rows) == {"plain", "escaped", "unié ✓"}
    assert rows["plain"]["body"] == "hello world\n"
    assert rows["plain"]["sender"] == "a@x"
    assert rows["plain"]["ts"] == 10_000          # Date header, epoch ms
    assert rows["plain"]["message_id"] == "<plain@x>"
    assert rows["escaped"]["body"] == \
        "line one\nFrom the start of a line\n>From too\n"
    assert rows["unié ✓"]["n_attachments"] == 1
    assert rows["plain"]["n_attachments"] == 0
    # per-file seq is the position in the mbox
    assert [rows[s]["seq"] for s in ("plain", "escaped", "unié ✓")] == [0, 1, 2]

    atts = mail.read_mbox_attachments(spark, str(p)).collect()
    assert len(atts) == 1
    assert atts[0]["filename"] == "img.bin"
    assert bytes(atts[0]["content"]) == raw_png
    assert atts[0]["size_bytes"] == len(raw_png)


def test_mbox_glob_scans_many_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"b{i}.mbox").write_bytes(
            _mboxrd_bytes([_msg(f"s{i}", f"body {i}\n")]))
    df = mail.read_mbox_messages(spark, str(tmp_path / "*.mbox"))
    got = {(os.path.basename(r["mbox"].replace("file:", "")), r["subject"])
           for r in df.collect()}
    assert got == {("b0.mbox", "s0"), ("b1.mbox", "s1"), ("b2.mbox", "s2")}


def test_unparsable_date_is_null_not_crash(spark, tmp_path):
    m = _msg("nodate", "x\n", date="not a date")
    p = tmp_path / "d.mbox"
    p.write_bytes(_mboxrd_bytes([m]))
    row = mail.read_mbox_messages(spark, str(p)).first()
    assert row["ts"] is None and row["subject"] == "nodate"


def test_imap_source_options_shape():
    opts = mail.imap_source_options("mail.example.com", "svc",
                                    folder="Ingest", search="UNSEEN")
    assert opts == {"protocol": "imaps", "host": "mail.example.com",
                    "port": 993, "username": "svc", "folder": "Ingest",
                    "search": "UNSEEN", "fetch": "RFC822"}


def test_mboxrd_roundtrip_property():
    """Property check (pure Python, no Spark): ANY batch of text bodies —
    including bodies full of 'From ' / '>From ' lines, blank-line runs, and
    unicode — survives mboxrd serialize→split→parse with every message's
    body and subject intact and in order."""
    from email import message_from_bytes

    from hypothesis import given, settings
    from hypothesis import strategies as st

    body_line = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        max_size=40)
    bodies = st.lists(
        st.lists(body_line, min_size=0, max_size=6).map(
            lambda ls: "\n".join(ls) + "\n"),
        min_size=1, max_size=5)

    @settings(max_examples=60, deadline=None)
    @given(bodies=bodies)
    def check(bodies):
        msgs = [_msg(f"s{i}", b) for i, b in enumerate(bodies)]
        blob = _mboxrd_bytes(msgs)
        raws = mail._split_mbox(blob)
        assert len(raws) == len(bodies)
        for i, raw in enumerate(raws):
            m = message_from_bytes(raw)
            assert mail._decode_header(m.get("Subject")) == f"s{i}"
            got = mail._body_text(m)
            # set_content normalizes a body's trailing newline; compare
            # modulo that single writer-side normalization
            assert got.rstrip("\n") == bodies[i].rstrip("\n")

    check()


def test_stray_non_mbox_file_routing(spark, tmp_path):
    """A non-empty file with no From_ separator is not an mbox: fail mode
    names it, skip mode drops it and keeps the scan alive; an EMPTY mbox
    is legal in both modes."""
    import pytest

    (tmp_path / "good.mbox").write_bytes(_mboxrd_bytes([_msg("ok", "x\n")]))
    (tmp_path / "stray.mbox").write_bytes(b"\x89PNG not mail at all")
    (tmp_path / "empty.mbox").write_bytes(b"")

    with pytest.raises(Exception, match="stray.mbox"):
        mail.read_mbox_messages(spark, str(tmp_path / "*.mbox")).collect()
    got = mail.read_mbox_messages(spark, str(tmp_path / "*.mbox"),
                                  on_error="skip").collect()
    assert [r["subject"] for r in got] == ["ok"]


def test_hostile_real_world_mail_edges():
    """Pure-Python edge battery from the review: bare-CR bodies must not
    fabricate boundaries, CRLF mboxes drop exactly one framing blank line,
    bogus charsets degrade to replacement text instead of LookupError, and
    naive RFC 5322 '-0000' dates pin to UTC."""
    from email import message_from_bytes

    # bare \r before 'From ' is ONE \n-line: no bogus boundary
    blob = (b"From x Thu Jan  1 00:00:00 1970\n"
            b"Subject: s\n\nhello\rFrom mid\n\n")
    raws = mail._split_mbox(blob)
    assert len(raws) == 1
    assert mail._body_text(message_from_bytes(raws[0])) == "hello\rFrom mid\n"

    # CRLF mbox: the framing blank line is stripped, body keeps its CRLF
    blob = (b"From x Thu Jan  1 00:00:00 1970\r\n"
            b"Subject: s\r\n\r\nbody\r\n\r\n")
    raws = mail._split_mbox(blob)
    assert len(raws) == 1
    assert mail._body_text(message_from_bytes(raws[0])) == "body\r\n"

    # unknown charset: replacement decode, not a task-killing LookupError
    assert mail._safe_decode(b"caf\xe9", "x-bogus-charset") == "caf�"
    assert mail._decode_header("=?x-bogus?B?aGVsbG8=?=") == "hello"

    # naive '-0000' date is UTC, independent of host timezone
    m = message_from_bytes(b"Date: Thu, 01 Jan 1970 00:00:10 -0000\n\nx")
    assert mail._parse_ts_ms(m) == 10_000


def test_attachments_stray_file_routing(spark, tmp_path):
    """read_mbox_attachments shares the on_error contract (a stray file
    must not silently contribute zero rows under the default)."""
    import pytest

    raw = bytes([1, 2, 3])
    (tmp_path / "good.mbox").write_bytes(
        _mboxrd_bytes([_msg("ok", "x\n", attachments=[("a.bin", raw)])]))
    (tmp_path / "stray.mbox").write_bytes(b"not mail")
    with pytest.raises(Exception, match="stray.mbox"):
        mail.read_mbox_attachments(spark, str(tmp_path / "*.mbox")).collect()
    got = mail.read_mbox_attachments(spark, str(tmp_path / "*.mbox"),
                                     on_error="skip").collect()
    assert len(got) == 1 and bytes(got[0]["content"]) == raw


def test_leading_fragment_refused_in_fail_mode(spark, tmp_path):
    """Bytes before the first 'From ' separator = a truncated download's
    leading message fragment — fail mode must refuse, not silently drop it;
    skip mode drops the file; whitespace-only leaders stay tolerated."""
    import pytest

    from cdc_core_spark.sources.mail import read_mbox_messages

    good = (b"From a@b Thu Jan  1 00:00:00 1970\n"
            b"Subject: s1\n\nbody\n")
    (tmp_path / "trunc.mbox").write_bytes(b"cut-off tail of msg 0\n" + good)
    (tmp_path / "blank.mbox").write_bytes(b"\n\n" + good)
    with pytest.raises(Exception, match="trunc.mbox"):
        read_mbox_messages(spark, str(tmp_path / "trunc.mbox")).collect()
    rows = read_mbox_messages(spark, f"{tmp_path}/*.mbox",
                              on_error="skip").collect()
    assert [r["subject"] for r in rows] == ["s1"]  # blank leader tolerated
