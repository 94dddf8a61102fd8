"""Intake task-flow state machine (flow.py): set-based step transitions
over the CdcEngine ledger — response mapping (OK / ContinueWithError /
StopWithError / MoveToError), retry budget, exactly-once step replay,
crash-resume by re-open, and the key_history-backed audit trail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_core_spark.flow import (
    STATE_CONTINUE_WITH_ERROR, STATE_MOVED_TO_ERROR, STATE_OK,
    STATE_STOP_WITH_ERROR, STEP_INTAKE, TaskFlow)


def _new_flow(spark, tmp_path, n=6):
    tf = TaskFlow(spark, str(tmp_path / "ledger"), "intake_g1")
    docs = spark.range(n).select(
        F.concat(F.lit("doc"), F.col("id")).alias("cid"),
        F.lit("s3://in").alias("src"),
        F.col("id").alias("size"))
    tf.submit(docs, correlation_col="cid", source_col="src",
              params_cols=["size"], now_ms=1000)
    return tf


def _state_map(tf):
    return {r["correlation_id"]: (r["step"], r["task_state"], r["retries"])
            for r in tf.tasks().collect()}


def test_submit_and_ok_step(spark, tmp_path):
    tf = _new_flow(spark, tmp_path)
    st = _state_map(tf)
    assert len(st) == 6
    assert all(v == (STEP_INTAKE, STATE_OK, 0) for v in st.values())

    def classify(df):
        return df.select("correlation_id", F.lit(True).alias("_ok"))

    tf.run_step("classify", classify, STEP_INTAKE, now_ms=2000)
    st = _state_map(tf)
    assert all(v == ("classify", STATE_OK, 0) for v in st.values())
    # params JSON bag survives the transition
    p = tf.tasks().select(
        "correlation_id",
        F.get_json_object("params", "$.size").alias("sz")).collect()
    assert {r["correlation_id"]: r["sz"] for r in p}["doc3"] == "3"


def test_response_mapping_and_error_store(spark, tmp_path):
    tf = _new_flow(spark, tmp_path)

    def fail_some(df):
        return df.select(
            "correlation_id",
            (~F.col("correlation_id").isin("doc1", "doc2")).alias("_ok"),
            F.lit("boom").alias("_error"))

    # continue: failures advance with the error recorded
    tf.run_step("extract", fail_some, STEP_INTAKE, on_error="continue")
    st = _state_map(tf)
    assert st["doc1"] == ("extract", STATE_CONTINUE_WITH_ERROR, 0)
    assert st["doc0"] == ("extract", STATE_OK, 0)

    # quarantine: failures become MoveToError (terminal), stay at their step
    def fail_doc3(df):
        return df.select(
            "correlation_id",
            (F.col("correlation_id") != "doc3").alias("_ok"),
            F.lit("bad doc").alias("_error"))

    tf.run_step("validate", fail_doc3, "extract", on_error="quarantine")
    st = _state_map(tf)
    assert st["doc3"] == ("extract", STATE_MOVED_TO_ERROR, 0)
    assert st["doc1"] == ("validate", STATE_OK, 0)
    err = {r["correlation_id"] for r in tf.errored().collect()}
    assert err == {"doc3"}

    # terminal step stamps end_ms; MoveToError rows are not eligible
    def done(df):
        return df.select("correlation_id", F.lit(True).alias("_ok"))

    tf.run_step("publish", done, "validate", terminal=True, now_ms=9000)
    rows = {r["correlation_id"]: r for r in tf.tasks().collect()}
    assert rows["doc0"]["end_ms"] == 9000
    assert rows["doc3"]["end_ms"] is None
    assert rows["doc3"]["task_state"] == STATE_MOVED_TO_ERROR


def test_retry_budget_stop_with_error(spark, tmp_path):
    tf = _new_flow(spark, tmp_path, n=2)
    calls = []

    def flaky(df):
        calls.append(1)
        ok = F.lit(len(calls) >= 3)   # succeeds on the 3rd attempt
        return df.select("correlation_id", ok.alias("_ok"),
                         F.lit("transient").alias("_error"))

    tf.run_step("fetch", flaky, STEP_INTAKE, on_error="stop", max_retries=5)
    st = _state_map(tf)
    assert all(v == (STEP_INTAKE, STATE_STOP_WITH_ERROR, 1)
               for v in st.values())
    tf.run_step("fetch", flaky, STEP_INTAKE, on_error="stop", max_retries=5)
    assert all(v[2] == 2 for v in _state_map(tf).values())
    tf.run_step("fetch", flaky, STEP_INTAKE, on_error="stop", max_retries=5)
    st = _state_map(tf)
    assert all(v == ("fetch", STATE_OK, 0) for v in st.values())

    # exhausted budget: a StopWithError task past max_retries is ineligible
    def always_fail(df):
        return df.select("correlation_id", F.lit(False).alias("_ok"))

    tf.run_step("verify", always_fail, "fetch", on_error="stop",
                max_retries=0)
    st1 = _state_map(tf)
    assert all(v == ("fetch", STATE_STOP_WITH_ERROR, 1)
               for v in st1.values())
    ep = tf.run_step("verify", always_fail, "fetch", on_error="stop",
                     max_retries=0)
    assert _state_map(tf) == st1          # nobody eligible: no change
    assert ep in tf.engine.table.committed_epochs()


def test_exactly_once_and_crash_resume(spark, tmp_path):
    tf = _new_flow(spark, tmp_path)

    def classify(df):
        return df.select("correlation_id", F.lit(True).alias("_ok"))

    ep = tf.run_step("classify", classify, STEP_INTAKE)
    before = _state_map(tf)
    # replaying the SAME epoch is the exactly-once no-op
    tf.run_step("classify", classify, STEP_INTAKE, epoch=ep)
    assert _state_map(tf) == before
    # crash-resume: a fresh TaskFlow over the same root picks up the state
    tf2 = TaskFlow(spark, str(tmp_path / "ledger"), "intake_g1")
    assert _state_map(tf2) == before
    # and an auto-epoch re-run of the completed step finds nothing eligible
    tf2.run_step("classify", classify, STEP_INTAKE)
    assert _state_map(tf2) == before


def test_audit_trail_via_key_history(spark, tmp_path):
    tf = _new_flow(spark, tmp_path, n=3)

    def ok(df):
        return df.select("correlation_id", F.lit(True).alias("_ok"))

    tf.run_step("classify", ok, STEP_INTAKE)
    tf.run_step("publish", ok, "classify", terminal=True)
    trail = tf.audit_trail("doc1").collect()
    assert [r["step"] for r in trail] == [STEP_INTAKE, "classify", "publish"]
    assert [r["task_state"] for r in trail] == [STATE_OK] * 3
    # commit-ordered: table versions strictly increase along the trail
    versions = [r["version"] for r in trail]
    assert versions == sorted(versions)
