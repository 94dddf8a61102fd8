"""DataStore read API: Q-search, keyed lookup, cursor paging."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_core_spark.query import Cursor, Q, find_by_key, search

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_search_where_sort_limit(spark):
    q = Q(where="o_orderstatus = :st AND o_totalprice > :minp",
          sort=[("o_totalprice", "desc"), ("o_orderkey", "asc")],
          params={"st": "O", "minp": 1000})
    got = search(_orders(spark), q, max_results=5).collect()
    assert len(got) == 5
    prices = [r["o_totalprice"] for r in got]
    assert prices == sorted(prices, reverse=True)
    assert all(r["o_orderstatus"] == "O" and r["o_totalprice"] > 1000 for r in got)


def test_search_predicate_pushdown(spark):
    q = Q(where="o_orderstatus = 'F'")
    plan = search(_orders(spark), q)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_find_by_key(spark):
    df = _orders(spark)
    some = df.select("o_orderkey").first()["o_orderkey"]
    got = find_by_key(df, {"o_orderkey": some}).collect()
    assert len(got) == 1 and got[0]["o_orderkey"] == some


def test_bound_where_prefix_params_and_quote_escape():
    # :p must not corrupt :p2 (longest-first, word-boundary match), and a
    # quote inside a string value must be SQL-escaped, not break the expr
    q = Q(where="a = :p AND b = :p2 AND c = :name",
          params={"p": 1, "p2": 2, "name": "O'Brien"})
    assert q.bound_where() == "a = 1 AND b = 2 AND c = 'O\\'Brien'"
    q2 = Q(where="x = :flag AND y IS NOT DISTINCT FROM :none",
           params={"flag": True, "none": None})
    assert q2.bound_where() == "x = true AND y IS NOT DISTINCT FROM NULL"


def test_search_with_quoted_string_param(spark):
    df = spark.createDataFrame([(1, "O'Brien"), (2, "Smith")],
                               "id int, name string")
    got = search(df, Q(where="name = :n", params={"n": "O'Brien"})).collect()
    assert [r["id"] for r in got] == [1]


def test_cursor_pages_cover_exactly_once(spark):
    df = _orders(spark)
    q = Q(where="o_totalprice > 50000", sort=[("o_totalprice", "desc")])
    cur = Cursor(df, q, page_size=97, tiebreak="o_orderkey")
    seen = []
    for page in cur:
        assert len(page) <= 97
        seen.extend(r["o_orderkey"] for r in page)
    expected = {r["o_orderkey"] for r in df.filter("o_totalprice > 50000").collect()}
    assert len(seen) == len(expected)          # no dup, no loss
    assert set(seen) == expected


def test_bound_where_token_inside_value_not_rebound():
    # single-pass substitution: a ':token' inside an earlier-substituted
    # string VALUE must never be rewritten by a later parameter
    q = Q(where="n = :name AND i = :id", params={"name": "uses :id", "id": 7})
    assert q.bound_where() == "n = 'uses :id' AND i = 7"


def test_keyset_cursor_matches_offset_cursor(spark):
    """Seek paging must cover exactly the same rows in the same order as the
    offset cursor, and its seek predicate must reach the scan (pushdown)."""
    from cdc_core_spark.query import KeysetCursor

    df = _orders(spark)
    q = Q(where="o_totalprice > 50000", sort=[("o_totalprice", "desc")])
    ks = KeysetCursor(df, q, page_size=97, tiebreak="o_orderkey")
    seen = [r["o_orderkey"] for page in ks for r in page]
    off = Cursor(df, q, page_size=97, tiebreak="o_orderkey")
    expected = [r["o_orderkey"] for page in off for r in page]
    assert seen == expected and len(seen) == len(set(seen))

    ks2 = KeysetCursor(df, q, page_size=97, tiebreak="o_orderkey")
    ks2.next_page()
    plan = (ks2._base.filter(ks2._seek_pred())
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:300]


def test_keyset_cursor_ascending_same_col_tiebreak(spark):
    from cdc_core_spark.query import KeysetCursor

    df = _orders(spark)
    q = Q(sort=[("o_orderkey", "asc")])
    ks = KeysetCursor(df, q, page_size=500, tiebreak="o_orderkey")
    seen = [r["o_orderkey"] for page in ks for r in page]
    assert seen == sorted(seen) and len(seen) == df.count()


def test_keyset_cursor_null_sort_values_asc_and_desc(spark):
    """NULL sort values must not truncate the scroll: Spark orders nulls
    FIRST under asc and LAST under desc, and a naive `col > lit(None)` seek
    would go NULL for every row and silently end the scroll after the null
    segment (asc: on page one)."""
    from cdc_core_spark.query import KeysetCursor

    rows = [(i, None if i % 3 == 0 else float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, score double")

    for direction in ("asc", "desc"):
        ks = KeysetCursor(df, Q(sort=[("score", direction)]),
                          page_size=7, tiebreak="id")
        pages = [[(r["score"], r["id"]) for r in page] for page in ks]
        seen = [x for page in pages for x in page]
        assert len(seen) == 100 and len({i for _, i in seen}) == 100
        # order must match a single global sort with the same null placement
        key = (lambda x: (x[0] is not None, x[0], x[1])) if direction == "asc" \
            else (lambda x: (x[0] is None, -(x[0] or 0.0), x[1]))
        assert seen == sorted(seen, key=key)


def test_keyset_cursor_null_tiebreak_rejected(spark):
    from cdc_core_spark.query import KeysetCursor
    import pytest

    df = spark.createDataFrame([(None, 1.0), (2, 2.0)], "id int, score double")
    ks = KeysetCursor(df, Q(sort=[("id", "asc")]), page_size=1, tiebreak="id")
    with pytest.raises(ValueError, match="non-null unique"):
        ks.next_page()
        ks.next_page()


def test_param_binding_backslashes_and_typed_literals(spark):
    """Backslash-bearing strings must bind losslessly (Spark string literals
    process backslash escapes — quote-doubling alone leaves a trailing
    escape that swallows the closing quote or lets a crafted value inject
    into the predicate), and date/Decimal/IN-list params must render as
    real SQL literals instead of repr()."""
    import datetime
    import decimal

    import pytest

    from cdc_core_spark.query import Q, search

    df = spark.createDataFrame(
        [("C:\\temp\\", 1, datetime.date(2020, 1, 5)),
         ("plain", 2, datetime.date(2021, 6, 1)),
         ("x\\' OR true OR '", 3, datetime.date(2022, 1, 1))],
        "name string, n int, d date")

    got = search(df, Q(where="name = :v", params={"v": "C:\\temp\\"})).collect()
    assert [r["n"] for r in got] == [1]
    # the injection-shaped value matches ONLY its own row
    got = search(df, Q(where="name = :v",
                       params={"v": "x\\' OR true OR '"})).collect()
    assert [r["n"] for r in got] == [3]

    got = search(df, Q(where="d > :since",
                       params={"since": datetime.date(2021, 1, 1)})).collect()
    assert sorted(r["n"] for r in got) == [2, 3]
    got = search(df, Q(where="n IN :ns", params={"ns": [1, 3]})).collect()
    assert sorted(r["n"] for r in got) == [1, 3]
    got = search(df, Q(where="n < :lim",
                       params={"lim": decimal.Decimal("2.5")})).collect()
    assert sorted(r["n"] for r in got) == [1, 2]
    with pytest.raises(TypeError, match="unsupported query parameter"):
        Q(where="n = :o", params={"o": object()}).bound_where()


def test_keyset_cursor_short_circuits_after_partial_page(spark):
    """A partial page proves exhaustion: the scroll must not issue one more
    whole scan job just to observe an empty page."""
    from cdc_core_spark.query import KeysetCursor, Q

    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    cur = KeysetCursor(df, Q(sort=[("id", "asc")]), page_size=2,
                       tiebreak="id")
    sizes = [len(p) for p in cur]
    assert sizes == [2, 2, 1]
    assert cur._exhausted and cur.next_page() == []


def test_bound_where_rejects_non_finite_floats():
    """repr(inf/nan) is a bare identifier Catalyst would resolve as a
    COLUMN — the binder must refuse, not emit it."""
    import pytest

    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            Q(where="score < :cap", params={"cap": bad}).bound_where()
