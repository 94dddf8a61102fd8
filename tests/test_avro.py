"""Avro change-record wire format: Python binary codec roundtrips, plus
cross-validation against the REAL JVM org.apache.avro codec (the avro core
jar ships with Spark) — the fallback must speak genuine Avro binary
encoding, not a lookalike."""

from __future__ import annotations

import json

import pytest

from cdc_core_spark.functions import avro_codec as A

ROW = {"op": 4, "txid": 12345678901, "op_ts": 1700000000123, "event_seq": 42,
       "schema_version": "1.1", "repo": "r3", "path": "p17",
       "lang": "purchase", "language": None, "content": "c:17:42",
       "size_bytes": 7, "rev": 2147483690}
ROW_NULLS = {"op": 5, "txid": -1, "op_ts": 9, "event_seq": 3,
             "schema_version": "1.0", "repo": "r0", "path": "p1",
             "lang": None, "language": None, "content": None,
             "size_bytes": None, "rev": None}
FIELDS = A._fields(A.ENVELOPE_AVRO_SCHEMA)


def test_python_roundtrip():
    for row in (ROW, ROW_NULLS):
        assert A.decode_record(FIELDS, A.encode_record(FIELDS, row)) == row


def test_varint_zigzag_edges():
    for n in (0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -2**31, 2**62, -2**62):
        buf = bytearray()
        A._write_long(buf, n)
        got, pos = A._read_long(bytes(buf), 0)
        assert got == n and pos == len(buf)


def _jvm_schema(spark):
    return spark._jvm.org.apache.avro.Schema.Parser().parse(
        A.ENVELOPE_AVRO_SCHEMA)


def test_python_encode_jvm_decode(spark):
    """Bytes produced by the Python codec must parse with the JVM's
    GenericDatumReader — the wire-format ground truth."""
    jvm = spark._jvm
    sch = _jvm_schema(spark)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    for row in (ROW, ROW_NULLS):
        payload = A.encode_record(FIELDS, row)
        dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
            payload, None)
        rec = reader.read(None, dec)
        for name, t, _null in FIELDS:
            v = rec.get(name)
            want = row[name]
            if v is None:
                assert want is None
            elif t == "string":
                assert str(v.toString()) == want
            else:
                assert int(str(v)) == want


def test_jvm_encode_python_decode(spark):
    """Bytes produced by the JVM GenericDatumWriter must parse with the
    Python codec."""
    jvm = spark._jvm
    sch = _jvm_schema(spark)
    # build the GenericRecord via Avro's own JSON decoder — py4j auto-unboxes
    # java.lang.Long back to Python int, so direct rec.put() can't type union
    # values correctly (Avro JSON encoding tags unions: {"long": 7})
    avro_json = json.dumps({
        "op": 3, "txid": ROW["txid"], "op_ts": ROW["op_ts"], "event_seq": 42,
        "schema_version": "1.1", "repo": {"string": "r3"},
        "path": {"string": "p17"}, "lang": {"string": "purchase"},
        "content": {"string": "c:17:42"}, "size_bytes": {"long": 7},
        "language": None, "rev": {"long": 2147483690}})
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    jdec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, avro_json)
    rec = reader.read(None, jdec)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    writer.write(rec, enc)
    enc.flush()
    got = A.decode_record(FIELDS, bytes(baos.toByteArray()))
    want = dict(ROW, op=3)
    assert got == want


def test_dataframe_roundtrip(spark):
    ddl = A.spark_ddl(A.ENVELOPE_AVRO_SCHEMA)
    rows = [tuple(r[n] for n, _t, _x in FIELDS) for r in (ROW, ROW_NULLS)]
    df = spark.createDataFrame(rows, ddl)
    back = A.from_avro_envelope(A.to_avro_envelope(df))
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_unsupported_union_rejected():
    bad = json.dumps({"type": "record", "name": "X", "fields": [
        {"name": "a", "type": ["string", "long"]}]})
    with pytest.raises(ValueError, match="unions"):
        A._fields(bad)


def test_double_nan_roundtrips_as_nan():
    """A genuine NaN in a nullable double field is a legal Avro value and
    must NOT collapse to the null union branch."""
    import math

    sch = json.dumps({"type": "record", "name": "S", "fields": [
        {"name": "id", "type": "long"},
        {"name": "score", "type": ["null", "double"], "default": None}]})
    fields = A._fields(sch)
    out = A.decode_record(fields, A.encode_record(
        fields, {"id": 1, "score": float("nan")}))
    assert out["id"] == 1 and math.isnan(out["score"])
    out2 = A.decode_record(fields, A.encode_record(
        fields, {"id": 2, "score": None}))
    assert out2["score"] is None


def test_codec_roundtrip_property():
    """Property-based: any envelope row round-trips through the binary
    codec bit-exactly (hypothesis drives the value space)."""
    from hypothesis import given, settings, strategies as st

    longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    txt = st.text(max_size=60)

    row_st = st.fixed_dictionaries({
        "op": ints, "txid": longs, "op_ts": longs, "event_seq": longs,
        "schema_version": txt,
        "repo": st.one_of(st.none(), txt),
        "path": st.one_of(st.none(), txt),
        "lang": st.one_of(st.none(), txt),
        "language": st.one_of(st.none(), txt),
        "content": st.one_of(st.none(), txt),
        "size_bytes": st.one_of(st.none(), longs),
        "rev": st.one_of(st.none(), longs),
    })

    @given(row_st)
    @settings(max_examples=200, deadline=None)
    def check(row):
        assert A.decode_record(FIELDS, A.encode_record(FIELDS, row)) == row

    check()


def test_fallback_dataframe_roundtrip_exact_longs(spark, monkeypatch):
    """The FALLBACK DataFrame codec (no spark-avro jar) must keep longs
    above 2^53 exact even when the column also carries NULLs — the pandas
    path would coerce such a column to float64 and silently round; the
    Arrow path must not."""
    monkeypatch.setattr(A, "native_avro_available", lambda _s: False)
    big = (1 << 53) + 1
    row_big = dict(ROW, size_bytes=big, rev=big + 2)
    ddl = A.spark_ddl(A.ENVELOPE_AVRO_SCHEMA)
    rows = [tuple(r[n] for n, _t, _x in FIELDS) for r in (row_big, ROW_NULLS)]
    # coalesce(1): the big long and the NULL MUST share one Arrow batch —
    # in separate partitions each batch is all-null or all-value and the
    # pandas float64 coercion this test exists to catch never triggers
    df = spark.createDataFrame(rows, ddl).coalesce(1)
    back = A.from_avro_envelope(A.to_avro_envelope(df))
    got = {r["op"]: r.asDict() for r in back.collect()}
    assert got[row_big["op"]]["size_bytes"] == big
    assert got[row_big["op"]]["rev"] == big + 2
    assert got[ROW_NULLS["op"]]["size_bytes"] is None


def test_encode_record_rejects_null_in_non_nullable_field():
    """A None in a non-nullable field must fail loudly, not serialize the
    literal string 'None' (wire corruption) or crash with a bare TypeError
    mid-task."""
    import pytest

    from cdc_core_spark.functions.avro_codec import encode_record

    fields = [("repo", "string", False), ("rev", "long", False)]
    with pytest.raises(ValueError, match="non-nullable.*repo"):
        encode_record(fields, {"repo": None, "rev": 1})
    with pytest.raises(ValueError, match="non-nullable.*rev"):
        encode_record(fields, {"repo": "r", "rev": None})


def test_from_avro_envelope_null_value_yields_null_record(spark):
    """A NULL value cell (Kafka tombstone message) must decode to an
    all-null record like the native from_avro PERMISSIVE path — not kill
    the task with bytes(None)."""
    from cdc_core_spark.functions.avro_codec import (from_avro_envelope,
                                                     to_avro_envelope)

    df = spark.createDataFrame([ROW], schema=", ".join(
        f"{n} {'bigint' if t == 'long' else ('int' if t == 'int' else t)}"
        for n, t, _ in FIELDS))
    wire = to_avro_envelope(df).union(
        spark.createDataFrame([(None,)], "value binary"))
    back = from_avro_envelope(wire).collect()
    assert len(back) == 2
    by_repo = {r["repo"]: r for r in back}
    assert by_repo["r3"]["op"] == 4
    null_row = by_repo[None]
    assert all(v is None for v in null_row.asDict().values())


def test_int_overflow_refused_at_encode():
    """Avro int shares the long wire form — an out-of-range value would
    encode fine and be silently TRUNCATED by Java's BinaryDecoder.readInt;
    the codec must corrupt loudly on the write side instead."""
    import pytest

    from cdc_core_spark.functions import avro_codec as ac
    buf = bytearray()
    ac._encode_value(buf, "int", 2**31 - 1)   # max int32 ok
    ac._encode_value(buf, "int", -(2**31))    # min int32 ok
    with pytest.raises(ValueError, match="overflows avro int"):
        ac._encode_value(bytearray(), "int", 2**31)
    ac._encode_value(bytearray(), "long", 2**31)  # long unaffected
