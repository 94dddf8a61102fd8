"""Reader tests using the reference's golden-data shape: the same `customers`
rows in CSV / JSON / XML / fixed-width forms (reference test resources:
mapping/src/test/resources/data/customers_202311231439.csv etc.)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_core_spark.sources import readers

ROWS = [
    {"_id": 1, "customerName": "Acme Corp", "city": "Austin", "creditLimit": 1200.5},
    {"_id": 2, "customerName": "Globex", "city": "Berlin", "creditLimit": 900.0},
    {"_id": 3, "customerName": "Initech", "city": "Oslo", "creditLimit": 300.25},
]


def _assert_customers(df):
    got = {r["_id"]: r for r in df.collect()}
    assert len(got) == 3
    assert got[1]["customerName"] == "Acme Corp"
    assert float(got[3]["creditLimit"]) == 300.25


def test_read_csv(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("_id,customerName,city,creditLimit\n" + "\n".join(
        f'{r["_id"]},{r["customerName"]},{r["city"]},{r["creditLimit"]}' for r in ROWS))
    _assert_customers(readers.read_csv(spark, str(p)))


def test_read_csv_custom_sep_schema(spark, tmp_path):
    p = tmp_path / "c.psv"
    p.write_text("_id|customerName|city|creditLimit\n" + "\n".join(
        f'{r["_id"]}|{r["customerName"]}|{r["city"]}|{r["creditLimit"]}' for r in ROWS))
    df = readers.read_csv(spark, str(p), sep="|",
                          schema="_id int, customerName string, city string, creditLimit double")
    assert dict(df.dtypes)["creditLimit"] == "double"
    _assert_customers(df)


def test_read_json(spark, tmp_path):
    import json
    p = tmp_path / "c.json"
    p.write_text(json.dumps(ROWS))
    _assert_customers(readers.read_json(spark, str(p)))


def test_read_xml(spark, tmp_path):
    p = tmp_path / "c.xml"
    items = "".join(
        f'<customer><_id>{r["_id"]}</_id><customerName>{r["customerName"]}</customerName>'
        f'<city>{r["city"]}</city><creditLimit>{r["creditLimit"]}</creditLimit></customer>'
        for r in ROWS)
    p.write_text(f"<customers>{items}</customers>")
    _assert_customers(readers.read_xml(spark, str(p), row_tag="customer"))


def test_read_positional(spark, tmp_path):
    p = tmp_path / "c.txt"
    lines = [f"{r['_id']:<4}{r['customerName']:<12}{r['city']:<8}{r['creditLimit']:<10}"
             for r in ROWS]
    p.write_text("\n".join(lines))
    df = readers.read_positional(spark, str(p), [
        ("_id", 1, 4), ("customerName", 5, 12), ("city", 17, 8), ("creditLimit", 25, 10)])
    df = df.selectExpr("cast(_id as int) _id", "customerName", "city",
                       "cast(creditLimit as double) creditLimit")
    _assert_customers(df)


def test_infer_json_schema(spark):
    s = readers.infer_json_schema(spark, '{"a": 1, "b": "x", "c": [1.5]}')
    assert "a" in s and "ARRAY" in s.upper()


def test_read_excel_roundtrip(spark, tmp_path):
    p = tmp_path / "c.xlsx"
    cols = list(ROWS[0].keys())
    readers.write_excel_minimal(str(p), cols, [tuple(r[c] for c in cols) for r in ROWS])
    _assert_customers(readers.read_excel(spark, str(p)))


def test_read_excel_shared_strings_and_gaps(spark, tmp_path):
    # exercise the sharedStrings branch + missing trailing cells via a zip
    # built with the standard parts but t="s" cells
    import zipfile
    p = tmp_path / "s.xlsx"
    readers.write_excel_minimal(str(p), ["a", "b"], [(1, "x")])
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    ss = (f'<?xml version="1.0"?><sst xmlns="{ns}"><si><t>hello</t></si></sst>')
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
             '<row><c t="s"><v>0</v></c><c><v>2.5</v></c></row>'
             '<row><c t="s"><v>0</v></c></row>'
             "</sheetData></worksheet>")
    with zipfile.ZipFile(p) as zin:
        items = {n: zin.read(n) for n in zin.namelist()}
    items["xl/sharedStrings.xml"] = ss.encode()
    items["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zout:
        for n, data in items.items():
            zout.writestr(n, data)
    rows = readers._parse_xlsx(str(p))
    assert rows == [["hello", 2.5], ["hello"]]


def test_read_excel_named_sheet(spark, tmp_path):
    p = tmp_path / "multi.xlsx"
    readers.write_excel_multi(str(p), [
        ("Data", ["a", "b"], [(1, "x"), (2, "y")]),
        ("Summary", ["total"], [(3,)]),
    ])
    by_name = readers.read_excel(spark, str(p), sheet="Summary").collect()
    assert [r["total"] for r in by_name] == [3]
    by_idx = readers.read_excel(spark, str(p), sheet=0).collect()
    assert sorted(r["a"] for r in by_idx) == [1, 2]
    with pytest.raises(ValueError, match="unknown sheet"):
        readers.read_excel(spark, str(p), sheet="Nope")
    with pytest.raises(ValueError, match="out of range"):
        readers.read_excel(spark, str(p), sheet=5)


def test_read_excel_sheet_index_past_ten(spark, tmp_path):
    # 11+ sheets: index resolution must follow workbook order, not the
    # lexicographic file order where sheet10.xml sorts before sheet2.xml
    p = tmp_path / "many.xlsx"
    readers.write_excel_multi(str(p), [
        (f"S{i}", ["v"], [(i,)]) for i in range(12)])
    assert readers.read_excel(spark, str(p), sheet=10).collect()[0]["v"] == 10
    assert readers.read_excel(spark, str(p), sheet="S2").collect()[0]["v"] == 2


def test_read_excel_sparse_interior_cells(spark, tmp_path):
    # POI/Excel omit blank cells and carry r="B2" refs; an empty interior
    # cell must NOT shift later values into the wrong column
    p = tmp_path / "sparse.xlsx"
    readers.write_excel_multi(str(p), [
        ("Sheet1", ["a", "b", "c"], [(1, None, "z"), (None, "m", None)]),
    ])
    rows = readers._parse_xlsx(str(p))
    assert rows == [["a", "b", "c"], [1, None, "z"], [None, "m"]]
    got = readers.read_excel(spark, str(p)).collect()
    assert got[0]["c"] == "z" and got[0]["b"] is None
    assert got[1]["b"] == "m" and got[1]["c"] is None


def test_excel_sheet_name_with_specials(spark, tmp_path):
    p = tmp_path / "amp.xlsx"
    readers.write_excel_multi(str(p), [('P&L "Q1"', ["v"], [(5,)])])
    assert readers.read_excel(spark, str(p), sheet='P&L "Q1"').collect()[0]["v"] == 5


def test_parse_xlsx_out_of_order_cell_refs(tmp_path):
    """Cells listed out of ascending r= order must land in their referenced
    columns, not be appended positionally."""
    import zipfile
    p = tmp_path / "ooo.xlsx"
    readers.write_excel_minimal(str(p), ["a", "b", "c"], [(1, 2, 3)])
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
             '<row r="1"><c r="C1"><v>30</v></c><c r="A1"><v>10</v></c></row>'
             "</sheetData></worksheet>")
    with zipfile.ZipFile(p) as zin:
        items = {n: zin.read(n) for n in zin.namelist()}
    items["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zout:
        for n, data in items.items():
            zout.writestr(n, data)
    assert readers._parse_xlsx(str(p)) == [[10, None, 30]]


def test_xlsx_no_workbook_fallback_index_out_of_range(tmp_path):
    # the no-workbook.xml numeric fallback must raise the same descriptive
    # ValueError as the workbook path, not a bare IndexError
    import zipfile
    p = tmp_path / "nw.xlsx"
    readers.write_excel_minimal(str(p), ["a"], [(1,)])
    with zipfile.ZipFile(p) as zin:
        items = {n: zin.read(n) for n in zin.namelist()
                 if n not in ("xl/workbook.xml", "xl/_rels/workbook.xml.rels")}
    with zipfile.ZipFile(p, "w") as zout:
        for n, data in items.items():
            zout.writestr(n, data)
    assert readers._parse_xlsx(str(p), sheet=0)  # fallback still resolves
    with pytest.raises(ValueError, match="out of range"):
        readers._parse_xlsx(str(p), sheet=5)


def test_archive_scan_zip_and_tar_members(spark, tmp_path):
    """ZipUtils-analog bundle ingest: zip and tar.gz archives shredded into
    (archive, member, size, content) rows distributed via binaryFile +
    mapInArrow — binary-safe content, member_pattern pushdown, directory
    entries skipped."""
    import io
    import tarfile
    import zipfile

    from cdc_core_spark.sources.archive import read_archive_members

    d = tmp_path / "bundles"
    d.mkdir()
    with zipfile.ZipFile(d / "b1.zip", "w") as zf:
        zf.writestr("data/a.jsonl", '{"x": 1}\n')
        zf.writestr("data/bin.dat", bytes(range(256)))   # binary-safe
        zf.writestr("MANIFEST.txt", "junk")
        zf.writestr("data/", "")                          # dir entry
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        payload = b'{"x": 2}\n'
        info = tarfile.TarInfo("data/c.jsonl")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    (d / "b2.tar.gz").write_bytes(buf.getvalue())

    collected = read_archive_members(spark, str(d)).collect()
    rows = {(r["archive"].rsplit("/", 1)[-1], r["member"]): r
            for r in collected}
    assert set(rows) == {("b1.zip", "data/a.jsonl"), ("b1.zip", "data/bin.dat"),
                         ("b1.zip", "MANIFEST.txt"), ("b2.tar.gz", "data/c.jsonl")}
    # archive is the FULL path: same-named bundles in different drop dirs
    # must stay distinct keys
    assert all(r["archive"].startswith("file:") for r in collected)
    assert bytes(rows[("b1.zip", "data/bin.dat")]["content"]) == bytes(range(256))
    assert rows[("b2.tar.gz", "data/c.jsonl")]["size_bytes"] == 9

    # member_pattern filters inside the extractor
    only = read_archive_members(spark, str(d), member_pattern="data/*.jsonl")
    assert {r["member"] for r in only.collect()} == {"data/a.jsonl",
                                                     "data/c.jsonl"}
    # members flow straight into the JSON parse path
    parsed = only.select(F.from_json(F.decode("content", "utf-8"),
                                     "x int").alias("r")).select("r.x")
    assert sorted(r["x"] for r in parsed.collect()) == [1, 2]


def test_archive_scan_error_routing_and_zipcrypto(spark, tmp_path):
    """A stray non-archive file in the drop directory must fail loudly by
    default (named in the error), and on_error='skip' keeps the scan alive
    with the valid bundles intact and NO partial rows. A ZipCrypto-protected
    zip decrypts with password= (ProtectedZipHandler analog)."""
    import subprocess
    import zipfile

    import pytest

    from cdc_core_spark.sources.archive import read_archive_members

    d = tmp_path / "drop"
    d.mkdir()
    with zipfile.ZipFile(d / "ok.zip", "w") as zf:
        zf.writestr("m.txt", "fine")
    (d / "stray.md").write_text("not an archive")

    with pytest.raises(Exception, match="stray.md"):
        read_archive_members(spark, str(d)).collect()
    rows = read_archive_members(spark, str(d), on_error="skip").collect()
    assert [(r["archive"].rsplit("/", 1)[-1], r["member"]) for r in rows] \
        == [("ok.zip", "m.txt")]

    # ZipCrypto (stdlib zipfile can read, not write, encrypted members —
    # create via the zip CLI)
    enc = tmp_path / "enc"
    enc.mkdir()
    (enc / "secret.txt").write_text("s3cret")
    import shutil
    if shutil.which("zip"):
        subprocess.run(["zip", "-q", "-P", "pw123", str(enc / "e.zip"),
                        "secret.txt"], cwd=enc, check=True)
        got = read_archive_members(spark, str(enc / "e.zip"),
                                   password="pw123").collect()
        assert bytes(got[0]["content"]) == b"s3cret"
        with pytest.raises(Exception, match="e.zip"):
            read_archive_members(spark, str(enc / "e.zip"),
                                 password="wrong").collect()


def test_archive_aes_method_without_extra_field_rejected(tmp_path):
    """A member CLAIMING method 99 without the mandatory 0x9901 AES extra
    field (a malformed/mislabeled bundle — the built-in winzip_aes codec
    decrypts real ones, tests/test_winzip_aes.py) must raise the decode
    error class the fail/skip routing understands, and a missing password
    on a genuine AES member must name the member."""
    import io
    import zipfile

    import pytest

    from cdc_core_spark.sources.archive import _zip_members
    from cdc_core_spark.sources.winzip_aes import write_winzip_aes

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("x.txt", b"secret")
    blob = bytearray(buf.getvalue())
    # patch the compression-method field to 99 in the local header
    # (offset 8) and the central directory entry (offset 10)
    lh = blob.find(b"PK\x03\x04")
    blob[lh + 8:lh + 10] = (99).to_bytes(2, "little")
    cd = blob.find(b"PK\x01\x02")
    blob[cd + 10:cd + 12] = (99).to_bytes(2, "little")

    with pytest.raises(RuntimeError, match="extra field"):
        list(_zip_members("drop/a.zip", bytes(blob), None, b"pw"))

    aes = io.BytesIO()
    write_winzip_aes(aes, [("y.txt", b"data")], "pw", salt_seed=b"t")
    with pytest.raises(RuntimeError, match="y.txt"):
        list(_zip_members("drop/b.zip", aes.getvalue(), None, None))


def test_read_excel_formula_bool_error_cells(spark, tmp_path):
    """Cells Excel itself writes that the fixture writer doesn't: t="str"
    (formula's cached TEXT result), t="b" (boolean), t="e" (error) — the
    numeric fallthrough used to crash on the first and silently turn the
    second into 0/1."""
    import zipfile
    p = tmp_path / "f.xlsx"
    readers.write_excel_minimal(str(p), ["a"], [("x",)])
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
             '<row><c t="str"><v>abc</v></c><c t="b"><v>1</v></c>'
             '<c t="b"><v>0</v></c><c t="e"><v>#DIV/0!</v></c>'
             '<c><v>2</v></c></row>'
             "</sheetData></worksheet>")
    with zipfile.ZipFile(p) as zin:
        items = {n: zin.read(n) for n in zin.namelist()}
    items["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zout:
        for n, data in items.items():
            zout.writestr(n, data)
    assert readers._parse_xlsx(str(p)) == [["abc", True, False, "#DIV/0!", 2]]


def test_read_excel_pads_header_narrower_than_data(spark, tmp_path):
    """Real writers omit trailing blank header cells, leaving the header row
    narrower than the data rows — the extra columns must be padded with
    generated names, not silently truncated."""
    p = tmp_path / "w.xlsx"
    readers.write_excel_minimal(str(p), ["a", "b"], [("x", "y", "z")])
    df = readers.read_excel(spark, str(p))
    assert df.columns == ["a", "b", "c2"]
    row = df.collect()[0]
    assert (row["a"], row["b"], row["c2"]) == ("x", "y", "z")


def test_read_excel_pad_names_avoid_collision(spark, tmp_path):
    p = tmp_path / "w2.xlsx"
    readers.write_excel_minimal(str(p), ["c2", "x"], [("a", "b", "c")])
    df = readers.read_excel(spark, str(p))
    assert len(set(df.columns)) == 3 and df.columns[:2] == ["c2", "x"]


def test_read_excel_header_only_sheet(spark, tmp_path):
    """A header row with zero data rows (a legal 'no records' export) must
    come back as an empty typed frame, not a schema-inference crash."""
    p = str(tmp_path / "empty.xlsx")
    readers.write_excel_minimal(p, ["a", "b"], [])
    got = readers.read_excel(spark, p)
    assert got.columns == ["a", "b"] and got.count() == 0
