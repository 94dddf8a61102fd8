"""Scalar transformer + mapping engine tests (SURVEY §2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_core_spark.functions import transforms as T
from cdc_core_spark.functions.mapping import Rule, apply_rules, compile_mapping


def test_numeric_transformers(spark):
    df = spark.createDataFrame(
        [("1,234", "$1,234.56", "9,999,999,999", "garbage")],
        "i string, cur string, l string, bad string")
    r = df.select(T.to_int("i").alias("i"), T.currency_value("cur").alias("c"),
                  T.to_long("l").alias("l"), T.to_int("bad").alias("b")).collect()[0]
    assert r["i"] == 1234 and r["c"] == 1234.56
    assert r["l"] == 9_999_999_999 and r["b"] is None


def test_date_transformers(spark):
    df = spark.createDataFrame([("23/11/2023", "2023-11-23 14:39:00")], "d string, ts string")
    r = df.select(
        T.parse_date("d", "dd/MM/yyyy").alias("d"),
        T.parse_timestamp("ts").alias("ts"),
        T.date_to_epoch_days(T.parse_date("d", "dd/MM/yyyy")).alias("days"),
    ).collect()[0]
    assert str(r["d"]) == "2023-11-23"
    assert r["days"] == 19684
    back = spark.range(1).select(T.epoch_days_to_date(F.lit(19684)).alias("d")).collect()[0]
    assert str(back["d"]) == "2023-11-23"


def test_regex_enum_transformers(spark):
    df = spark.createDataFrame([("order-0042-x", "GOLD")], "s string, tier string")
    r = df.select(
        T.regex_extract("s", r"order-(\d+)", 1).alias("num"),
        T.regex_replace("s", r"\d", "#").alias("masked"),
        T.enum_map("tier", {"GOLD": 1, "SILVER": 2}, default=0).alias("tier_id"),
    ).collect()[0]
    assert r["num"] == "0042" and r["masked"] == "order-####-x" and r["tier_id"] == 1


def test_decision_tree(spark):
    df = spark.createDataFrame([(5,), (50,), (500,)], "v int")
    out = df.select("v", T.decision_tree(
        [("v < 10", "small"), ("v < 100", "medium")], default="large").alias("b")).collect()
    assert [r["b"] for r in out] == ["small", "medium", "large"]


def test_compile_mapping_nested_and_wildcard(spark):
    df = spark.createDataFrame([(1, "Ada", "L", "x")], "id int, first string, last string, extra string")
    out = compile_mapping(df, [
        {"target": "customer_id", "source": "id"},
        {"target": "name.first", "source": "first"},
        {"target": "name.last", "source": "last"},
        {"target": "source_system", "const": "crm"},
        {"target": "full", "expr": "concat(first, ' ', last)"},
    ], keep_unmapped_as="extras").collect()[0]
    assert out["customer_id"] == 1
    assert out["name"]["first"] == "Ada" and out["name"]["last"] == "L"
    assert out["source_system"] == "crm" and out["full"] == "Ada L"
    assert out["extras"]["extra"] == "x"


def test_rules_filter_validate_transform(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "US"), (2, -5.0, "US"), (3, 7.0, None), (4, 1.0, "ignore")],
        "id int, amount double, country string")
    good, bad = apply_rules(df, [
        Rule("filter", predicate="country = 'ignore'"),
        Rule("validation", predicate="amount >= 0", error="negative_amount"),
        Rule("validation", predicate="country IS NOT NULL", error="null_country"),
        Rule("transformation", target="amount_cents", expr="cast(amount * 100 as long)"),
    ])
    g = {r["id"]: r for r in good.collect()}
    b = {r["id"]: r["_errors"] for r in bad.collect()}
    assert set(g) == {1} and g[1]["amount_cents"] == 1000
    assert b[2] == ["negative_amount"] and b[3] == ["null_country"]
    assert 4 not in set(g) | set(b)  # filtered silently


def test_sha256_checksum(spark):
    import hashlib
    r = spark.createDataFrame([("abc",)], "s string").select(
        T.sha256_checksum("s").alias("h")).collect()[0]
    assert r["h"] == hashlib.sha256(b"abc").hexdigest()


def test_rules_chain_order_transform_then_validate(spark):
    """RulesExecutor runs the chain in order: a validation AFTER a
    transformation must see the transformed value."""
    from cdc_core_spark.functions.mapping import Rule, apply_rules

    df = spark.createDataFrame([(1, "5"), (2, "-3")], "id int, raw string")
    rules = [
        Rule("transformation", target="amt", expr="cast(raw as int)"),
        Rule("validation", predicate="amt > 0", error="nonpos"),
        Rule("transformation", target="amt", expr="amt * 100"),
    ]
    good, bad = apply_rules(df, rules)
    assert [r["id"] for r in good.collect()] == [1]
    assert good.collect()[0]["amt"] == 500      # later transform applied
    brow = bad.collect()[0]
    assert brow["id"] == 2 and brow["_errors"] == ["nonpos"]


def test_keep_unmapped_excludes_expr_sources(spark):
    from cdc_core_spark.functions.mapping import compile_mapping

    df = spark.createDataFrame([(1, 2, "x")], "a int, b int, note string")
    out = compile_mapping(df, [{"target": "total", "expr": "a + b"}],
                          keep_unmapped_as="props").collect()[0]
    assert out["total"] == 3
    assert dict(out["props"]) == {"note": "x"}  # a/b consumed, not extras


# ---------------------------------------------------------------- lookup rules
def test_lookup_enrich_exists_and_reference(spark):
    """DBExistsRule + DBReferenceRule in one broadcast join: exists flag,
    field copy onto the record, new target creation, no row multiplication."""
    from cdc_core_spark.functions.mapping import lookup_enrich
    rec = spark.createDataFrame(
        [(1, "acme", "old"), (2, "none", "keep"), (3, "dupco", None)],
        "id int, vendor string, segment string")
    ref = spark.createDataFrame(
        [("acme", "RETAIL", 10), ("dupco", "WHOLESALE", 20),
         ("dupco", "DISCOUNT", 5)],
        "name string, seg string, rank int")
    out = lookup_enrich(
        rec, ref, on={"vendor": "name"},
        mapping={"segment": "seg", "ref_rank": "rank"},
        order_by=["rank"], exists_col="vendor_ok")
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 3                       # dup ref keys don't multiply
    assert rows[1]["segment"] == "RETAIL" and rows[1]["vendor_ok"]
    assert rows[2]["segment"] == "keep" and not rows[2]["vendor_ok"]
    # first match pinned by order_by: rank 5 wins for dupco
    assert rows[3]["segment"] == "DISCOUNT" and rows[3]["ref_rank"] == 5


def test_lookup_enrich_null_source_never_overwrites(spark):
    """DBReferenceRule.java:48 'if (value != null) set' — a matched row with
    a null source keeps the record's existing value."""
    from cdc_core_spark.functions.mapping import lookup_enrich
    rec = spark.createDataFrame([(1, "k", "orig")],
                                "id int, key string, val string")
    ref = spark.createDataFrame([("k", None)], "key string, v string")
    out = lookup_enrich(rec, ref, on={"key": "key"}, mapping={"val": "v"},
                        exists_col="hit")
    r = out.collect()[0]
    assert r["val"] == "orig" and r["hit"]


def test_lookup_enrich_is_broadcast(spark):
    """The reference side must broadcast — no shuffle of the record stream."""
    from cdc_core_spark.functions.mapping import lookup_enrich
    rec = spark.range(100).withColumnRenamed("id", "k")
    ref = spark.createDataFrame([(1, "x")], "k bigint, tag string")
    out = lookup_enrich(rec, ref, on={"k": "k"}, mapping={"tag": "tag"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_lookup_enrich_order_by_uncopied_column(spark):
    """Dedupe-by-recency: ordering by a reference column that is NOT a
    mapping source must work (it rides through the pre-reduce and is
    dropped afterwards, never leaking into the output)."""
    from cdc_core_spark.functions.mapping import lookup_enrich
    rec = spark.createDataFrame([(1, "k")], "id int, key string")
    ref = spark.createDataFrame(
        [("k", "old", 1), ("k", "new", 2)],
        "key string, val string, updated_at int")
    out = lookup_enrich(rec, ref, on={"key": "key"},
                        mapping={"val": "val"}, order_by=["updated_at"])
    r = out.collect()[0]
    assert r["val"] == "old"              # min_by ascending pins first match
    assert "updated_at" not in out.columns


def test_lookup_enrich_descending_keeps_latest(spark):
    """descending=True is the dedupe-by-recency form: fields come from the
    reference row with the LARGEST ordering value."""
    from cdc_core_spark.functions.mapping import lookup_enrich
    rec = spark.createDataFrame([(1, "k")], "id int, key string")
    ref = spark.createDataFrame(
        [("k", "old", 1), ("k", "new", 2)],
        "key string, val string, updated_at int")
    out = lookup_enrich(rec, ref, on={"key": "key"}, mapping={"val": "val"},
                        order_by=["updated_at"], descending=True)
    assert out.collect()[0]["val"] == "new"


def test_compile_mapping_conflicting_targets_raise(spark):
    """Mapping both a column and a child of it must fail with a clear
    validation error, not an opaque TypeError from the struct walk."""
    import pytest

    from cdc_core_spark.functions.mapping import compile_mapping
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="conflicting mapping targets"):
        compile_mapping(df, [{"target": "a", "source": "x"},
                             {"target": "a.b", "source": "y"}])
    with pytest.raises(ValueError, match="conflicting mapping targets"):
        compile_mapping(df, [{"target": "a.b", "source": "y"},
                             {"target": "a", "source": "x"}])


def test_crypto_field_roundtrip_and_key_rules(spark):
    """CypherUtils parity: AES/CBC/PKCS roundtrip (unicode + empty +
    block-boundary strings), deterministic fixed-IV ciphertexts, Base64(MD5)
    key hash, checkPassword key-derivation truncation, wrong-key behavior."""
    import pytest

    from cdc_core_spark.functions import crypto

    # key derivation mirrors checkPassword's strictly-greater thresholds:
    # 43 bytes -> 32; 28 -> 24; 23 -> 16; and the reference quirk that an
    # exactly-32-byte input truncates to 24. Keys are BYTES — a multi-byte
    # char split by the cut keeps its leading bytes so AES always sees a
    # legal 16/24/32-byte key
    assert len(crypto.derive_key("p" * 40, "n")) == 32
    assert len(crypto.derive_key("p" * 25, "n")) == 24
    assert len(crypto.derive_key("p" * 20, "n")) == 16
    assert len(crypto.derive_key("p" * 29, "n")) == 24  # 32 -> 24
    assert len(crypto.derive_key("p" * 13, "n")) == 16  # exactly 16
    assert len(crypto.derive_key("\u65e5\u672c\u8a9e\u306e\u30d1\u30b9\u30ef\u30fc\u30c9\u3067\u3059\u3088", "n")) == 32
    assert len(crypto.format_iv("\u20ac" * 6)) == 16  # 18 raw bytes -> 16
    with pytest.raises(ValueError, match="16 bytes"):
        crypto.derive_key("short", "n")
    with pytest.raises(ValueError, match="IV"):
        crypto.format_iv("tooshort")

    key = crypto.derive_key("correct horse battery staple", "t")
    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, ""), (3, "x" * 32), (4, "a")],
        "id long, t string")
    enc = crypto.encrypt_field("t", key, "0123456789abcdef")
    out = df.select("id", "t", enc.alias("c"),
                    crypto.decrypt_field(enc, key).alias("rt")).collect()
    for r in out:
        assert r["rt"] == r["t"]
    # deterministic: re-encrypting yields the identical ciphertext
    again = {r["id"]: r["c"] for r in
             df.select("id", enc.alias("c")).collect()}
    assert again == {r["id"]: r["c"] for r in out}

    # wrong key: strict decrypt raises, try_ variant yields NULL rows
    wrong = crypto.derive_key("another password here!", "t")
    ct = df.select(enc.alias("c"))
    with pytest.raises(Exception):
        ct.select(crypto.decrypt_field("c", wrong)).collect()
    nulls = ct.select(crypto.try_decrypt_field("c", wrong).alias("d")).collect()
    assert all(r["d"] is None for r in nulls)

    # key hash: Base64 of the RAW md5 digest, cross-checked in python
    import base64
    import hashlib
    got = df.select("t", crypto.key_hash("t").alias("h")).collect()
    for r in got:
        want = base64.b64encode(
            hashlib.md5(r["t"].encode()).digest()).decode()
        assert r["h"] == want


def test_data_size_units(spark):
    """UnitsParser analog: unit table, case-insensitivity, bare bytes,
    nulls for garbage/unknown units; documented divergences (TB = 1024^4,
    bare integers parse) covered explicitly."""
    from cdc_core_spark.functions import transforms as T

    rows = [(1, "512 MB"), (2, "2kb"), (3, "3 G"), (4, "1 TB"), (5, "123"),
            (6, "1.5 MB"), (7, "12 XB"), (8, ""), (9, None), (10, " 7 k ")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {r["id"]: r["b"] for r in
           df.select("id", T.data_size("s").alias("b")).collect()}
    assert got[1] == 512 * 1024 ** 2
    assert got[2] == 2 * 1024
    assert got[3] == 3 * 1024 ** 3
    assert got[4] == 1024 ** 4          # divergence: reference TB == GB bug
    assert got[5] == 123                # divergence: reference regex chokes
    assert got[6] is None               # reference regex has no decimals
    assert got[7] is None               # unknown unit
    assert got[8] is None and got[9] is None
    assert got[10] == 7 * 1024


def test_crypto_multibyte_password_encrypts(spark):
    """A password whose UTF-8 truncation splits a multi-byte char must still
    yield a legal AES key (bytes, not a decode-ignore string) and roundtrip."""
    from cdc_core_spark.functions import crypto

    key = crypto.derive_key("日本語のパスワードですよだからね", "n")
    df = spark.createDataFrame([("secret",)], "t string")
    enc = crypto.encrypt_field("t", key, "€€€€€€")  # 18-byte IV -> 16
    r = df.select(crypto.decrypt_field(enc, key).alias("rt")).collect()[0]
    assert r["rt"] == "secret"


def test_data_size_ansi_overflow_is_null(spark):
    """ANSI mode must not crash the job: out-of-range numbers and
    overflowing unit multiplies yield null, per the contract."""
    from cdc_core_spark.functions import transforms as T

    df = spark.createDataFrame(
        [(1, "9" * 20), (2, "9000000000 TB"), (3, "1 KB")], "id long, s string")
    got = {r["id"]: r["b"] for r in
           df.select("id", T.data_size("s").alias("b")).collect()}
    assert got[1] is None and got[2] is None and got[3] == 1024


def test_to_int_parses_decimal_money_strings(spark):
    """NumberFormat.parse().intValue() semantics: '$1,234.56' → 1234 (not
    null — a direct int try_cast of a decimal string is null), truncation
    toward zero, and integer strings beyond 2^53 stay EXACT (they must not
    round-trip through double)."""
    import cdc_core_spark.functions.transforms as T

    big = 9007199254740993            # 2^53 + 1: double would corrupt it
    df = spark.createDataFrame(
        [("$1,234.56", str(big)), ("-2.9", "junk")], "a string, b string")
    rows = df.select(T.to_int("a").alias("a"),
                     T.to_long("b").alias("b")).collect()
    assert rows[0]["a"] == 1234 and rows[0]["b"] == big
    assert rows[1]["a"] == -2 and rows[1]["b"] is None


def test_compile_mapping_duplicate_leaf_target_raises(spark):
    import pytest

    from cdc_core_spark.functions import mapping
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="duplicate mapping target"):
        mapping.compile_mapping(df, [{"target": "out", "source": "a"},
                                     {"target": "out", "const": 0}])
