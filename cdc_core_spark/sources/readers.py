"""File-format readers — Spark-first ports of the reference's InputReader
implementations (mapping/src/main/java/io/zyient/core/mapping/readers/impl/):

| reference reader                   | here                      |
|------------------------------------|---------------------------|
| SeparatedInputReader (CSV)         | read_csv                  |
| JsonInputReader                    | read_json                 |
| XmlInputReader                     | read_xml (Spark 4 native) |
| PositionalInputReader              | read_positional           |
| ExcelInputReader                   | read_excel (pandas, tiny) |
| DbInputReader (JDBC + QueryBuilder)| read_jdbc                 |

Each reference reader pulls row batches into ``SourceMap`` dicts
(ReadCursor.java:41-52); here each is a distributed scan returning a
DataFrame, so the "batch" is Spark's own partition/vectorized-parquet
machinery and Catalyst handles projection pushdown into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(spark: SparkSession, path: str, header: bool = True,
             sep: str = ",", schema: str | None = None,
             multi_line: bool = False) -> DataFrame:
    """SeparatedInputReader (SeparatedInputReader.java:44-97): header +
    separator config; schema inference if none given."""
    r = (spark.read.option("header", header).option("sep", sep)
         .option("multiLine", multi_line))
    return r.csv(path, schema=schema) if schema else r.option("inferSchema", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None,
              multi_line: bool = True) -> DataFrame:
    """JsonInputReader (JsonInputReader.java:36): array-of-objects files →
    rows (multiLine); JSONL when multi_line=False."""
    r = spark.read.option("multiLine", multi_line)
    return r.json(path, schema=schema) if schema else r.json(path)


def read_xml(spark: SparkSession, path: str, row_tag: str,
             schema: str | None = None) -> DataFrame:
    """XmlInputReader (XmlInputReader.java:36): element path → rows.
    Spark 4 ships the XML source natively (rowTag)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    return r.schema(schema).load(path) if schema else r.load(path)


def read_positional(spark: SparkSession, path: str,
                    layout: list[tuple[str, int, int]]) -> DataFrame:
    """PositionalInputReader (PositionalInputReader.java:88): fixed-width
    columns as (name, start_1_based, length) substring projections over a
    text scan — one select, no per-row code."""
    df = spark.read.text(path)
    return df.select(*[
        F.trim(F.substring(F.col("value"), start, length)).alias(name)
        for name, start, length in layout
    ])


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0,
               header: bool = True, schema: str | None = None) -> DataFrame:
    """ExcelInputReader (ExcelInputReader.java:64): driver-side read — Excel
    inputs are small config/intake files in the reference, never bulk data,
    so a distributed scan buys nothing. Dependency-free: xlsx is a zip of
    XML parts; this parses sheet rows + sharedStrings directly (no openpyxl
    in the container). Supports shared/inline strings and numbers — the
    subset the reference's header+grid reader handles."""
    rows = _parse_xlsx(path, sheet)
    if not rows:
        raise ValueError(f"no rows in {path}")
    if header:
        names, data = rows[0], rows[1:]
    else:
        names, data = [f"c{i}" for i in range(len(rows[0]))], rows
    names = [str(n) for n in names]
    # width = widest row, not the header row: real writers omit trailing
    # blank header cells, so slicing to len(names) would silently drop the
    # extra columns' data — pad the header with generated names instead
    width = max([len(names)] + [len(r) for r in data])
    taken = set(names)
    for i in range(len(names), width):
        pad = f"c{i}"
        while pad in taken:   # a real header cell may already be named c{i}
            pad += "_"
        taken.add(pad)
        names = names + [pad]
    data = [tuple((r + [None] * width)[:width]) for r in data]
    if schema:
        return spark.createDataFrame(data, schema=schema)
    if not data:
        # header-only sheet ("no records this window" export): pandas
        # inference has nothing to infer from and createDataFrame would
        # crash with a message naming neither file nor cause — return an
        # empty all-string frame under the header names instead
        from pyspark.sql.types import StringType, StructField, StructType
        return spark.createDataFrame(
            [], StructType([StructField(n, StringType(), True)
                            for n in names]))
    pdf = __import__("pandas").DataFrame(data, columns=names)
    return spark.createDataFrame(pdf)


def write_excel_minimal(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Minimal single-sheet xlsx writer (tests/fixtures only)."""
    write_excel_multi(path, [("Sheet1", columns, rows)])


def _col_letter(i: int) -> str:
    """0-based column index → A1 letters (0→A, 26→AA)."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def write_excel_multi(path: str,
                      sheets: list[tuple[str, list[str], list[tuple]]]) -> None:
    """Multi-sheet xlsx writer (tests/fixtures only): inline strings, raw
    numbers, and POI-faithful sparse encoding — None cells are OMITTED and
    every cell carries its r="B2" reference, exactly the layout real writers
    produce (exercises the reader's gap-padding path)."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell(ci: int, ri: int, v) -> str:
        ref = f"{_col_letter(ci)}{ri}"
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>')

    def sheet_xml(columns, rows) -> str:
        body = "".join(
            f'<row r="{ri}">' + "".join(
                cell(ci, ri, v) for ci, v in enumerate(r) if v is not None)
            + "</row>"
            for ri, r in enumerate([tuple(columns)] + list(rows), start=1))
        return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>' + body
                + "</sheetData></worksheet>")

    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(sheets) + 1))
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
          'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          + overrides + "</Types>")
    sheet_decls = "".join(
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" '
        f'r:id="rId{i}"/>'
        for i, (name, _c, _r) in enumerate(sheets, start=1))
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          f'<sheets>{sheet_decls}</sheets></workbook>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId0" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            '</Relationships>')
    wb_rel_items = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1))
    wbrels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
              + wb_rel_items + "</Relationships>")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wbrels)
        for i, (_name, columns, rows) in enumerate(sheets, start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml(columns, rows))


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _cell_col_index(ref: str | None) -> int | None:
    """'B2' → 1 (0-based column index from the letters of an A1 ref)."""
    if not ref:
        return None
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1 if n else None


def _resolve_sheet_part(z, sheet: str | int) -> str:
    """Resolve a sheet name or workbook-order index to its worksheet part via
    xl/workbook.xml + its rels (what POI — the reference ExcelInputReader's
    engine — does). Raises on an unknown sheet name. Falls back to
    numeric-suffix-ordered sheet files only when workbook.xml is absent
    (lexicographic ordering would misresolve sheet10 before sheet2)."""
    import re as _re
    from xml.etree import ElementTree as ET

    names = set(z.namelist())
    if "xl/workbook.xml" in names:
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            for rel in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")).iter(
                    f"{_REL_NS}Relationship"):
                rels[rel.get("Id")] = rel.get("Target")
        sheets: list[tuple[str, str | None]] = []
        for s in ET.fromstring(z.read("xl/workbook.xml")).iter(f"{_XLSX_NS}sheet"):
            target = rels.get(s.get(f"{_RID_NS}id"))
            if target is not None:
                target = target.lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
            sheets.append((s.get("name"), target))
        if isinstance(sheet, str):
            by_name = {n: t for n, t in sheets}
            if sheet not in by_name:
                raise ValueError(
                    f"unknown sheet {sheet!r}; workbook has {[n for n, _ in sheets]}")
            part = by_name[sheet]
        else:
            if not 0 <= sheet < len(sheets):
                raise ValueError(f"sheet index {sheet} out of range "
                                 f"({len(sheets)} sheets)")
            part = sheets[sheet][1]
        if part is not None:
            return part
        # workbook.xml without usable rels: fall through to file ordering
    if isinstance(sheet, str):
        raise ValueError(f"cannot resolve sheet name {sheet!r}: no xl/workbook.xml")
    parts = sorted(
        (n for n in names if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(_re.search(r"sheet(\d+)\.xml$", n).group(1)))
    if not 0 <= sheet < len(parts):
        raise ValueError(f"sheet index {sheet} out of range "
                         f"({len(parts)} sheets)")
    return parts[sheet]


def _parse_xlsx(path: str, sheet: str | int = 0) -> list[list]:
    import zipfile
    from xml.etree import ElementTree as ET

    NS = _XLSX_NS
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{NS}t"))
                      for si in root.iter(f"{NS}si")]
        root = ET.fromstring(z.read(_resolve_sheet_part(z, sheet)))
        out: list[list] = []
        for row in root.iter(f"{NS}row"):
            # index cells by their r="B2" column reference: real writers
            # (Excel/POI) omit blank cells, and cells may legally appear
            # out of ascending order — positional appends would attribute
            # values to the wrong columns in either case
            cells: dict[int, object] = {}
            for c in row.iter(f"{NS}c"):
                ci = _cell_col_index(c.get("r"))
                if ci is None:
                    ci = max(cells, default=-1) + 1
                t = c.get("t")
                if t == "inlineStr":
                    val = "".join(x.text or "" for x in c.iter(f"{NS}t"))
                else:
                    v = c.find(f"{NS}v")
                    if v is None or v.text is None:
                        val = None
                    elif t == "s":
                        val = shared[int(v.text)]
                    elif t == "str":
                        val = v.text  # formula cell's cached TEXT result
                    elif t == "b":
                        val = v.text.strip() == "1"
                    elif t == "e":
                        val = v.text  # error cell: surface "#DIV/0!" etc.
                    else:
                        num = float(v.text)
                        val = int(num) if num.is_integer() else num
                cells[ci] = val
            width = max(cells, default=-1) + 1
            out.append([cells.get(i) for i in range(width)])
        return out


def read_jdbc(spark: SparkSession, url: str, table_or_query: str,
              properties: dict | None = None,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None, num_partitions: int = 8) -> DataFrame:
    """DbInputReader + QueryBuilder paged cursor (DbInputReader.java:135):
    Spark's JDBC source with predicate-partitioned parallel reads replaces
    the hand-rolled paging cursor."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table_or_query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", lower_bound).option("upperBound", upper_bound)
                  .option("numPartitions", num_partitions))
    return reader.load()


def infer_json_schema(spark: SparkSession, sample_json: str) -> str:
    """SchemaHelper.parseField inference analog (SchemaHelper.java:149-299):
    delegate to schema_of_json."""
    return spark.range(1).select(
        F.schema_of_json(F.lit(sample_json)).alias("s")).collect()[0]["s"]
