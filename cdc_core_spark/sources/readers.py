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
    width = len(names)
    data = [tuple((r + [None] * width)[:width]) for r in data]
    if schema:
        return spark.createDataFrame(data, schema=schema)
    pdf = __import__("pandas").DataFrame(data, columns=names)
    return spark.createDataFrame(pdf)


def write_excel_minimal(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Minimal xlsx writer (tests/fixtures only): one sheet, inline strings,
    raw numbers. Produces the standard OPC zip layout any reader accepts."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell(v) -> str:
        if v is None:
            return "<c/>"
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f"<c><v>{v}</v></c>"
        return f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    body = "".join(
        "<row>" + "".join(cell(v) for v in r) + "</row>"
        for r in [tuple(columns)] + list(rows))
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>' + body
             + "</sheetData></worksheet>")
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
          'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>')
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId0" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            '</Relationships>')
    wbrels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
              '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
              'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
              '</Relationships>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wbrels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _parse_xlsx(path: str, sheet: str | int = 0) -> list[list]:
    import re as _re
    import zipfile
    from xml.etree import ElementTree as ET

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{NS}t"))
                      for si in root.iter(f"{NS}si")]
        idx = sheet if isinstance(sheet, int) else 0
        sheets = sorted(n for n in z.namelist()
                        if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))
        root = ET.fromstring(z.read(sheets[idx]))
        out: list[list] = []
        for row in root.iter(f"{NS}row"):
            vals: list = []
            for c in row.iter(f"{NS}c"):
                t = c.get("t")
                if t == "inlineStr":
                    vals.append("".join(x.text or "" for x in c.iter(f"{NS}t")))
                    continue
                v = c.find(f"{NS}v")
                if v is None or v.text is None:
                    vals.append(None)
                elif t == "s":
                    vals.append(shared[int(v.text)])
                else:
                    num = float(v.text)
                    vals.append(int(num) if num.is_integer() else num)
            out.append(vals)
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
