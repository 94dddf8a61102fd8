"""Physical-plan audits: the 100-TB properties the engine claims are asserted
STRUCTURALLY, not by wall-clock — filters reach the parquet scan
(PushedFilters), partition pruning reaches the epoch scan (PartitionFilters),
small dims broadcast, aggregations have a map-side partial stage, top-k plans
as TakeOrderedAndProject, and no audited plan contains a scale-killer
(CartesianProduct, row-at-a-time BatchEvalPython).

These guard the *plan*, so a refactor that silently de-optimizes (drops a
broadcast hint, breaks pushdown by wrapping a column in a Python UDF, turns a
pruned epoch scan into a full scan) fails CI even though small-fixture
results stay correct.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


# plan-only entries: building the DataFrame runs no job and has no side
# effects (engine-replay / stored-index entries execute work at call time
# and are audited by their own tests instead). Audited by q_ FUNCTION, not
# queries() key — gate consolidations (search_q = page ∪ topk ∪ point,
# text_stats ⊇ fingerprint) must not blunt the per-shape plan assertions.
LAZY_QUERIES = {
    "pricing_summary": "q_pricing_summary",
    "revenue_by_nation": "q_revenue_by_nation",
    "topk_orders": "q_topk_orders",
    "search_q": "q_search",
    "point_lookup": "q_point_lookup",
    "query_surface": "q_query_surface",
    "anti_semi_setops": "q_anti_semi_setops",
    "setop_except": "q_setop_except",
    "grouping_sets": "q_grouping_sets",
    "json_extract": "q_json_extract",
    "dedup_exact": "q_dedup_exact",
    "text_stats": "q_text_stats",
    "fingerprint": "q_fingerprint",
    "chunk_text": "q_chunk_text",
    "ann_cosine_topk": "q_ann_cosine_topk",
    "checksum": "q_checksum",
}


@pytest.fixture(scope="module")
def plans(spark):
    return {name: plan(getattr(entry, fn)(spark, SF_DIR))
            for name, fn in LAZY_QUERIES.items()}


def test_no_scale_killers_in_any_audited_plan(plans):
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name  # per-row Python UDF


def test_filter_pushdown_reaches_scan(plans):
    assert "LessThanOrEqual(l_shipdate" in plans["pricing_summary"]
    assert "EqualTo(c_custkey,42)" in plans["point_lookup"].replace(" ", "")
    assert "GreaterThan(o_totalprice" in plans["search_q"]


def test_column_pruning_reaches_scan(plans):
    # Q1 touches 7 of lineitem's 16 columns; the scan must not read the rest
    p = plans["pricing_summary"]
    assert "l_comment" not in p and "l_partkey" not in p


def test_aggregation_has_map_side_partial(plans):
    assert "partial_sum" in plans["pricing_summary"]
    assert "partial_count" in plans["revenue_by_nation"]


def test_small_dims_broadcast(plans):
    assert plans["revenue_by_nation"].count("BroadcastHashJoin") >= 2


def test_topk_is_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["topk_orders"]


def test_lww_is_partial_max_by_single_shuffle(spark):
    ev = (spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
          .select(F.col("user_id").alias("k"),
                  F.col("ts").cast("timestamp").cast("long").alias("_op_ts"),
                  F.monotonically_increasing_id().alias("_event_seq"),
                  F.col("event_type")))
    from cdc_core_spark.lww import lww_reduce
    p = plan(lww_reduce(ev, ["k"], ["event_type"]))
    assert "partial_max_by" in p          # map-side combine before the shuffle
    import re
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1  # exactly one shuffle


def test_no_row_python_udf_in_package_source():
    """Static sweep backing the plan-level BatchEvalPython check: the package
    must never register a row-at-a-time Python UDF (only pandas_udf /
    mapInPandas / applyInPandas Arrow paths are allowed)."""
    import glob
    import re
    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cdc_core_spark")
    banned = re.compile(r"(?<!pandas_)\budf\(|spark\.udf\.register|@udf\b")
    hits = []
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        for i, line in enumerate(open(f), 1):
            if banned.search(line):
                hits.append(f"{f}:{i}: {line.strip()}")
    assert not hits, hits


def test_epoch_scan_is_partition_pruned(spark, t1):
    events = spark.read.parquet(os.path.join(t1["dir"], "change_events"))
    pruned = events.filter(F.col("checkpoint_epoch").isin([2, 3]))
    p = plan(pruned)
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*checkpoint_epoch[^\]]*)\]", p)
    assert m, p
    # and the filter does NOT degrade to a post-scan Filter over all epochs:
    # only the two partitions' files are actually opened (inputFiles() is
    # pre-pruning by contract, so ask the executed scan itself)
    files = {r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()}
    assert files and all(
        "checkpoint_epoch=2" in f or "checkpoint_epoch=3" in f for f in files)


def test_text_search_query_side_broadcasts(spark):
    """The term list is a literal handful: the index join must broadcast it
    (no shuffle of the corpus-sized index for a 3-term query) and the
    relevance ranking must stay a TakeOrdered-able sort, with TF-IDF's
    df join ALSO broadcast."""
    from cdc_core_spark.operators import textsearch as ts
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    idx = ts.build_text_index(d, "doc_id", "text")
    for scoring in ("tf", "tfidf"):
        nd = 1000 if scoring == "tfidf" else None
        p = plan(ts.search_text(idx, ["merge", "stream"], scoring=scoring,
                                n_docs=nd))
        # no shuffled join anywhere: dropping a broadcast hint would regress
        # to SortMergeJoin and must fail here, not just lose the broadcast
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, scoring
        want_bhj = 2 if scoring == "tfidf" else 1   # terms join (+ df join)
        assert p.count("BroadcastHashJoin") >= want_bhj, scoring
        assert "CartesianProduct" not in p, scoring
        assert "BatchEvalPython" not in p, scoring


def test_crypto_expressions_stay_jvm_side(spark):
    """aes_encrypt/aes_decrypt are built-in JVM expressions — the checksum
    gate plan must contain no Python evaluation and keep the scan pruned to
    the two referenced columns."""
    import __spark_entry__ as e
    p = plan(e.queries()["checksum"](spark, SF_DIR))
    assert "BatchEvalPython" not in p
    assert "aesEncrypt" in p and "aesDecrypt" in p  # JVM built-in expressions
    # scan pruned to exactly the two referenced columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_key_predicate_pushes_through_mor_fold(spark, tmp_path):
    """A point predicate on the key columns must reach the parquet scan's
    PushedFilters THROUGH the merge-on-read fold (filter on grouping keys
    commutes with the max_by aggregate and the base∪delta union). This is
    the row-group half of point-lookup pruning: bucket hashing picks the
    file, the pushed EqualTo + sorted compaction (table sort_order prop,
    tests/test_sort_order.py) lets the reader skip row groups inside it.
    The tombstone filter must push too — deleted rows die in the scan."""
    from cdc_core_spark.lake import SnapshotTable, bucket_expr

    tbl = SnapshotTable.create(
        str(tmp_path / "t"),
        fields=[{"name": "repo", "type": "string"},
                {"name": "path", "type": "string"},
                {"name": "content", "type": "string"}],
        key_cols=["repo", "path"], n_buckets=4)
    df = (spark.range(300)
          .select(F.concat(F.lit("r"), (F.col("id") % 3).cast("string"))
                  .alias("repo"),
                  F.concat(F.lit("p"), F.col("id").cast("string"))
                  .alias("path"),
                  F.lit("x").alias("content"),
                  F.lit(1).cast("bigint").alias("_op_ts"),
                  F.col("id").alias("_event_seq"),
                  F.lit(False).alias("_deleted"))
          .withColumn("_bucket", bucket_expr(["repo", "path"], 4)))
    tbl.commit_merge(df, list(range(4)), epoch=0, manifests=[])
    out = tbl.read(spark).filter((F.col("repo") == "r1")
                                 & (F.col("path") == "p7"))
    p = plan(out)
    flat = p.replace(" ", "")
    assert "EqualTo(repo,r1)" in flat and "EqualTo(path,p7)" in flat, p
    assert "Not(EqualTo(_deleted,true))" in flat, p
    assert out.count() == 1
