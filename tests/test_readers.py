"""Reader tests using the reference's golden-data shape: the same `customers`
rows in CSV / JSON / XML / fixed-width forms (reference test resources:
mapping/src/test/resources/data/customers_202311231439.csv etc.)."""

from __future__ import annotations

import pytest

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


def test_read_excel_gated(spark, tmp_path):
    pytest.importorskip("openpyxl", reason="openpyxl not in container")
    import pandas as pd
    p = tmp_path / "c.xlsx"
    pd.DataFrame(ROWS).to_excel(p, index=False)
    _assert_customers(readers.read_excel(spark, str(p)))
