"""Intake task-flow state machine — the reference's ``TaskFlow`` workflow
engine re-expressed set-based over the engine's own ledger machinery.

Reference semantics (intake/src/main/java/io/zyient/intake/flow/):
``TaskAuditRecord`` rows ``{task_group, task_name, source, correlation_id,
start_time, end_time, step, step_update_timestamp, task_state, error,
params}`` persisted per intake record (TaskAuditRecord.java:28-63,
TaskAuditManager.java); a task group runs its tasks over each record and
every task answers an ``ETaskResponse`` — ``OK``, ``Error``,
``ContinueWithError`` (record the error, keep going), ``StopWithError``
(halt this record at the step), ``MoveToError`` (route the record to the
error store), ``Stop`` (ETaskResponse.java:27-35); group lifecycle
``Initialized/Running/Stopped/Error`` (ETaskGroupState.java:18-25).

Spark-first shape — three deliberate departures from the row-at-a-time
original:

* **The ledger IS a CDC table.** Task state lives in a ``CdcEngine``-owned
  ``SnapshotTable`` keyed by ``correlation_id``; every step transition is
  an UPSERT epoch through the same envelope as any change stream. That
  buys, for free: atomic snapshot commits, exactly-once step replay
  (a committed epoch re-runs as a no-op — crash-resume is "run it again"),
  wall-clock time travel over the ledger, and a per-task audit trail via
  ``SnapshotTable.key_history`` (the TaskAuditManager analog — every
  committed state of one task with epoch/version attribution).
* **A step transforms the SET, not the row.** ``run_step`` hands the step
  function one DataFrame of every eligible task and commits all
  transitions in ONE epoch — at 10^8 intake records a per-record task
  loop is the anti-pattern; a step is a batch transform with per-row
  success/failure columns.
* **Responses are data, not control flow.** The step function marks each
  row ``_ok`` (+ optional ``_error``); the flow maps failures onto the
  reference's response vocabulary via ``on_error``:
  ``"continue"`` → ContinueWithError (advance, error recorded),
  ``"stop"`` → StopWithError (task stays at its step; re-running the step
  retries it until ``max_retries`` is exhausted),
  ``"quarantine"`` → MoveToError (terminal, excluded from every later
  step — the error-store route).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.registry import SchemaDef, SchemaRegistry

#: ETaskResponse vocabulary (ETaskResponse.java:27) — the subset a
#: set-based flow can land in ledger state (Running is a row in flight
#: inside a step job, never a committed state; Unknown never commits)
STATE_OK = "OK"
STATE_CONTINUE_WITH_ERROR = "ContinueWithError"
STATE_STOP_WITH_ERROR = "StopWithError"
STATE_MOVED_TO_ERROR = "MoveToError"
STATE_STOPPED = "Stop"

#: states a later step may pick up from (terminal: MoveToError, Stop)
_RUNNABLE = (STATE_OK, STATE_CONTINUE_WITH_ERROR)

#: the step every submitted task starts at (the intake ingestion point)
STEP_INTAKE = "intake"

_FIELDS = (
    {"name": "correlation_id", "type": "string", "nullable": False,
     "key": True},
    {"name": "task_group", "type": "string", "nullable": True},
    {"name": "source", "type": "string", "nullable": True},
    {"name": "step", "type": "string", "nullable": True},
    {"name": "task_state", "type": "string", "nullable": True},
    {"name": "error", "type": "string", "nullable": True},
    {"name": "retries", "type": "long", "nullable": True},
    {"name": "start_ms", "type": "long", "nullable": True},
    {"name": "end_ms", "type": "long", "nullable": True},
    {"name": "params", "type": "string", "nullable": True},
)


def _registry() -> SchemaRegistry:
    reg = SchemaRegistry([])
    reg.register(SchemaDef("task_audit", 1, 0, _FIELDS, {}))
    return reg


class TaskFlow:
    """One task group's ledger + step runner (TaskGroup/TaskAuditManager
    analog). ``root`` is the ledger table's directory; re-opening an
    existing root resumes the group where it left off."""

    def __init__(self, spark: SparkSession, root: str, task_group: str,
                 n_buckets: int = 8):
        self.spark = spark
        self.task_group = task_group
        self.engine = CdcEngine(spark, root, _registry(),
                                entity="task_audit", n_buckets=n_buckets)
        if not self.engine.table.exists():
            # empty initial load creates the table + the initial_loaded
            # marker so step epochs can commit (group state: Initialized)
            self.engine.initial_load(
                spark.createDataFrame(
                    [], ", ".join(f"{f['name']} "
                                  f"{'bigint' if f['type'] == 'long' else f['type']}"
                                  for f in _FIELDS)),
                schema_version="1.0")

    # ------------------------------------------------------------- intake
    def submit(self, df: DataFrame, correlation_col: str = "correlation_id",
               source_col: str | None = None,
               params_cols: Sequence[str] | None = None,
               epoch: int | None = None, now_ms: int | None = None) -> int:
        """Register a batch of records as tasks at ``STEP_INTAKE``/OK.
        ``params_cols`` are packed into the JSON ``params`` column (the
        TaskAuditParam map analog). Re-submitting a committed ``epoch`` is
        the exactly-once no-op; re-submitting an existing correlation_id
        in a NEW epoch resets the task (the newest version wins — pass
        stable epoch ids from your feed's offsets to avoid that).
        Returns the epoch used."""
        epoch = self._resolve_epoch(epoch)
        if epoch in self.engine.table.committed_epochs():
            return epoch
        now = int(time.time() * 1000) if now_ms is None else int(now_ms)
        params = (F.to_json(F.struct(*[F.col(c) for c in params_cols]))
                  if params_cols else F.lit(None).cast("string"))
        ev = df.select(
            F.lit(3).cast("bigint").alias("op"),          # INSERT
            F.col(correlation_col).cast("string").alias("correlation_id"),
            F.lit(self.task_group).alias("task_group"),
            (F.col(source_col).cast("string") if source_col
             else F.lit(None).cast("string")).alias("source"),
            F.lit(STEP_INTAKE).alias("step"),
            F.lit(STATE_OK).alias("task_state"),
            F.lit(None).cast("string").alias("error"),
            F.lit(0).cast("bigint").alias("retries"),
            F.lit(now).cast("bigint").alias("start_ms"),
            F.lit(None).cast("bigint").alias("end_ms"),
            params.alias("params"),
            F.lit(epoch).cast("bigint").alias("op_ts"),
            F.lit(epoch).cast("bigint").alias("event_seq"),
            F.lit("1.0").alias("schema_version"),
        )
        self.engine.apply_epoch(ev, epoch)
        return epoch

    # -------------------------------------------------------------- steps
    def run_step(self, step: str, fn: Callable[[DataFrame], DataFrame],
                 from_step: str, *, on_error: str = "stop",
                 max_retries: int = 0, terminal: bool = False,
                 epoch: int | None = None,
                 now_ms: int | None = None) -> int:
        """Advance every eligible task through one step in ONE epoch.

        Eligible: tasks at ``from_step`` whose state is OK /
        ContinueWithError, plus StopWithError tasks still inside
        ``max_retries`` (the retry path). ``fn`` receives the eligible
        ledger rows (all ledger columns; ``params`` is the JSON bag) and
        must return ``correlation_id`` + ``_ok`` (boolean) + optionally
        ``_error`` (string) and an updated ``params``. Rows ``fn`` drops
        stay untouched and eligible for the next run (document what your
        step skipped — silent drops are on the step author); ``fn`` must
        return at most ONE row per correlation_id (a duplicated id makes
        the two transitions collapse by within-epoch LWW with an
        arbitrary winner — same-version ties have no order).

        ``terminal=True`` stamps ``end_ms`` on rows that complete this
        step (the group's finish line). Returns the epoch used;
        re-running a committed epoch is a no-op (exactly-once)."""
        if on_error not in ("continue", "stop", "quarantine"):
            raise ValueError(
                f"on_error must be continue|stop|quarantine: {on_error!r}")
        epoch = self._resolve_epoch(epoch)
        if epoch in self.engine.table.committed_epochs():
            return epoch
        now = int(time.time() * 1000) if now_ms is None else int(now_ms)

        cur = self.tasks()
        elig = cur.filter(
            (F.col("step") == from_step)
            & (F.col("task_state").isin(*_RUNNABLE)
               | ((F.col("task_state") == STATE_STOP_WITH_ERROR)
                  & (F.col("retries") <= F.lit(max_retries)))))
        out = fn(elig)
        for c in ("correlation_id", "_ok"):
            if c not in out.columns:
                raise ValueError(f"step fn must return a {c!r} column")
        res = out.select(
            "correlation_id", F.col("_ok").cast("boolean").alias("_ok"),
            (F.col("_error") if "_error" in out.columns
             else F.lit(None)).cast("string").alias("_error"),
            *([F.col("params").alias("_params")]
              if "params" in out.columns else []))
        j = elig.alias("t").join(res.alias("r"), "correlation_id", "inner")

        ok = F.col("r._ok")
        retrying = F.col("t.task_state") == STATE_STOP_WITH_ERROR
        if on_error == "continue":
            new_state = F.when(ok, STATE_OK).otherwise(
                STATE_CONTINUE_WITH_ERROR)
            new_step = F.lit(step)
        elif on_error == "quarantine":
            new_state = F.when(ok, STATE_OK).otherwise(STATE_MOVED_TO_ERROR)
            new_step = F.when(ok, F.lit(step)).otherwise(F.col("t.step"))
        else:  # stop: task stays at from_step, retryable until exhausted
            new_state = F.when(ok, STATE_OK).otherwise(STATE_STOP_WITH_ERROR)
            new_step = F.when(ok, F.lit(step)).otherwise(F.col("t.step"))
        # a first failure under "stop" starts the retry counter at 1 so
        # `retries <= max_retries` counts RE-runs; continue/quarantine
        # failures advance or terminate, their counter stays 0
        first_fail = 1 if on_error == "stop" else 0
        new_retries = F.when(ok, F.lit(0)).otherwise(
            F.when(retrying, F.col("t.retries") + 1)
            .otherwise(F.lit(first_fail)))
        params_col = (F.coalesce(F.col("r._params"), F.col("t.params"))
                      if "_params" in res.columns else F.col("t.params"))
        end_col = (F.when(ok, F.lit(now)).otherwise(F.col("t.end_ms"))
                   if terminal else F.col("t.end_ms"))

        ev = j.select(
            F.lit(4).cast("bigint").alias("op"),          # UPDATE/upsert
            F.col("correlation_id"),
            F.col("t.task_group").alias("task_group"),
            F.col("t.source").alias("source"),
            new_step.alias("step"),
            new_state.alias("task_state"),
            F.when(ok, F.lit(None).cast("string"))
             .otherwise(F.coalesce(F.col("r._error"),
                                   F.lit("step failed"))).alias("error"),
            new_retries.cast("bigint").alias("retries"),
            F.col("t.start_ms").alias("start_ms"),
            end_col.cast("bigint").alias("end_ms"),
            params_col.alias("params"),
            F.lit(epoch).cast("bigint").alias("op_ts"),
            F.lit(epoch).cast("bigint").alias("event_seq"),
            F.lit("1.0").alias("schema_version"),
        )
        self.engine.apply_epoch(ev, epoch)
        return epoch

    # ------------------------------------------------------------- queries
    def tasks(self) -> DataFrame:
        """Current ledger state (one row per task)."""
        return self.engine.table.read(self.spark)

    def errored(self) -> DataFrame:
        """The error-store view: MoveToError (terminal) plus tasks
        currently halted at StopWithError — whether a halted task is
        exhausted depends on the retry budget of the NEXT run_step call,
        which the ledger cannot know in advance."""
        return self.tasks().filter(
            F.col("task_state").isin(STATE_MOVED_TO_ERROR,
                                     STATE_STOP_WITH_ERROR))

    def audit_trail(self, correlation_id: str) -> DataFrame:
        """Every committed state of one task, commit-ordered — the
        TaskAuditManager per-record trail, via the lake's key_history."""
        return self.engine.table.key_history(
            self.spark, {"correlation_id": correlation_id})

    def _resolve_epoch(self, epoch: int | None) -> int:
        if epoch is not None:
            return int(epoch)
        done = self.engine.table.committed_epochs()
        return (max(done) + 1) if done else 0
