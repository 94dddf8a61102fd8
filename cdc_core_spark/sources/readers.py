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
               header: int = 0) -> DataFrame:
    """ExcelInputReader (ExcelInputReader.java:64): driver-side pandas read
    (Excel inputs are small config/intake files in the reference); requires
    openpyxl — gated import."""
    import pandas as pd
    try:
        pdf = pd.read_excel(path, sheet_name=sheet, header=header)
    except ImportError as e:  # openpyxl not in this container
        raise NotImplementedError(
            "Excel read requires openpyxl, not available in this environment") from e
    return spark.createDataFrame(pdf)


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
