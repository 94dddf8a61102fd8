"""Randomized TaskFlow model check: random step schedules (mixed on_error
policies, retry budgets, failure sets, exactly-once replays, crash-resume
re-opens) applied to BOTH the Spark TaskFlow and a pure-Python state
machine implementing the documented transition rules — final ledgers must
agree exactly. Same methodology as tests/test_engine_model.py /
test_decision_table_model.py."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_core_spark.flow import (
    STATE_CONTINUE_WITH_ERROR, STATE_MOVED_TO_ERROR, STATE_OK,
    STATE_STOP_WITH_ERROR, STEP_INTAKE, TaskFlow, _RUNNABLE)

N_TASKS = 12


def _model_run_step(model: dict, step: str, from_step: str, fail: set,
                    on_error: str, max_retries: int, terminal: bool,
                    now: int) -> None:
    for cid, t in model.items():
        eligible = t["step"] == from_step and (
            t["state"] in _RUNNABLE
            or (t["state"] == STATE_STOP_WITH_ERROR
                and t["retries"] <= max_retries))
        if not eligible:
            continue
        retrying = t["state"] == STATE_STOP_WITH_ERROR
        if cid not in fail:
            t.update(step=step, state=STATE_OK, retries=0, error=None)
            if terminal:
                t["end"] = now
        elif on_error == "continue":
            t.update(step=step, state=STATE_CONTINUE_WITH_ERROR,
                     retries=0, error="boom")
        elif on_error == "quarantine":
            t.update(state=STATE_MOVED_TO_ERROR, retries=0, error="boom")
        else:  # stop
            t.update(state=STATE_STOP_WITH_ERROR,
                     retries=(t["retries"] + 1) if retrying else 1,
                     error="boom")


def _ledger(tf: TaskFlow) -> dict:
    return {r["correlation_id"]:
            {"step": r["step"], "state": r["task_state"],
             "retries": r["retries"], "error": r["error"],
             "end": r["end_ms"]}
            for r in tf.tasks().collect()}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_flow_random_schedule_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / "ledger")
    tf = TaskFlow(spark, root, f"g{seed}")
    ids = [f"t{i}" for i in range(N_TASKS)]
    tf.submit(spark.createDataFrame([(i,) for i in ids],
                                    "correlation_id string"),
              now_ms=0)
    model = {cid: {"step": STEP_INTAKE, "state": STATE_OK, "retries": 0,
                   "error": None, "end": None} for cid in ids}

    steps = [STEP_INTAKE]
    for k in range(5):
        step = f"s{k}"
        from_step = rng.choice(steps[-2:])      # chain, sometimes re-branch
        on_error = rng.choice(["continue", "stop", "quarantine"])
        max_retries = rng.randint(0, 2)
        terminal = k == 4
        fail = {cid for cid in ids if rng.random() < 0.35}
        now = (k + 1) * 1000

        def fn(df, _fail=frozenset(fail)):
            return df.select(
                "correlation_id",
                (~F.col("correlation_id").isin(*_fail) if _fail
                 else F.lit(True)).alias("_ok"),
                F.lit("boom").alias("_error"))

        ep = tf.run_step(step, fn, from_step, on_error=on_error,
                         max_retries=max_retries, terminal=terminal,
                         now_ms=now)
        _model_run_step(model, step, from_step, fail, on_error,
                        max_retries, terminal, now)
        steps.append(step)

        if rng.random() < 0.4:     # exactly-once: replay the SAME epoch
            tf.run_step(step, fn, from_step, on_error=on_error,
                        max_retries=max_retries, terminal=terminal,
                        epoch=ep, now_ms=now)
        if rng.random() < 0.3:     # crash-resume: re-open from disk
            tf = TaskFlow(spark, root, f"g{seed}")

    assert _ledger(tf) == model
