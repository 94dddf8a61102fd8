"""Model-based randomized check of the full SnapshotTable maintenance
surface: a seeded random interleaving of delta commits (upserts + tombstone
deletes), full/incremental compaction, re-bucketing, snapshot expiration and
orphan sweeps is applied both to the table and to a driver-side dict model;
after EVERY step the visible table state must equal the model, and the
committed-epoch ledger must equal the epochs the model committed.

This is the interleaving coverage the per-feature tests can't give: e.g.
expire_snapshots directly after a re-bucket, incremental compaction over a
bucket whose only rows are tombstones, a changelog-invisible rewrite between
two delta bursts.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from cdc_core_spark.lake import SnapshotTable, bucket_expr

FIELDS = [{"name": "k", "type": "string", "nullable": False, "key": True},
          {"name": "v", "type": "long", "nullable": True}]


def _commit_batch(spark, t, model, rows, epoch):
    """rows: list[(k, v_or_None)] — None = tombstone delete. op_ts strictly
    increasing per call, so every row is its key's LWW winner."""
    nb = t.latest().n_buckets
    ts = epoch  # monotonic: epochs increase
    df = (spark.createDataFrame(
        [(k, v if v is not None else 0, v is None) for k, v in rows],
        "k string, v long, _deleted boolean")
        .withColumn("_op_ts", F.lit(ts).cast("bigint"))
        .withColumn("_event_seq", F.lit(0).cast("bigint"))
        .withColumn("_bucket", bucket_expr(["k"], nb)))
    t.commit_delta(df, epoch=epoch, manifests=[
        {"checkpoint_epoch": epoch, "partition_id": 0,
         "events_read": len(rows), "events_applied": len(rows),
         "events_error": 0, "max_op_ts": ts, "max_event_seq": 0,
         "wall_ms": 0}])
    for k, v in rows:
        if v is None:
            model.pop(k, None)
        else:
            model[k] = v


def _assert_state(spark, t, model):
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == model


_SOAK = [int(x) for x in os.environ.get("CDC_MODEL_SEEDS", "").split(",") if x]


@pytest.mark.parametrize("seed", [42] + _SOAK)
def test_randomized_maintenance_interleaving(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable.create(str(tmp_path / "t"), FIELDS, ["k"], n_buckets=4)
    model: dict[str, int] = {}
    committed: set[int] = set()
    keyspace = [f"k{i:03d}" for i in range(60)]
    epoch = 0

    ops_run = []
    for step in range(24):
        op = rng.choices(
            ["delta", "delete", "compact_full", "compact_incr",
             "rebucket", "expire", "orphans"],
            weights=[5, 3, 2, 3, 1, 2, 1])[0]
        ops_run.append(op)
        if op == "delta":
            ks = rng.sample(keyspace, rng.randint(1, 12))
            _commit_batch(spark, t, model,
                          [(k, rng.randint(0, 999)) for k in ks], epoch)
            committed.add(epoch)
            epoch += 1
        elif op == "delete":
            live = sorted(model) or keyspace
            ks = rng.sample(live, min(len(live), rng.randint(1, 5)))
            # mix of real deletes and deletes of (maybe) absent keys
            ks.append(rng.choice(keyspace))
            _commit_batch(spark, t, model, [(k, None) for k in set(ks)], epoch)
            committed.add(epoch)
            epoch += 1
        elif op == "compact_full":
            t.compact(spark)
        elif op == "compact_incr":
            t.compact(spark, min_delta_files=rng.randint(1, 3))
        elif op == "rebucket":
            t.compact(spark, n_buckets=rng.choice([3, 5, 8]))
        elif op == "expire":
            t.expire_snapshots(keep_last=rng.randint(1, 3))
        elif op == "orphans":
            t.remove_orphan_files(grace_s=0)
        _assert_state(spark, t, model)
        assert t.committed_epochs() == committed

    # every op class must run at least once: deterministic tail for any the
    # random draw missed
    for op in {"delta", "delete", "compact_full", "compact_incr", "rebucket",
               "expire", "orphans"} - set(ops_run):
        if op == "delta":
            _commit_batch(spark, t, model, [("k000", 1)], epoch)
            committed.add(epoch)
            epoch += 1
        elif op == "delete":
            _commit_batch(spark, t, model, [("k000", None)], epoch)
            committed.add(epoch)
            epoch += 1
        elif op == "compact_full":
            t.compact(spark)
        elif op == "compact_incr":
            t.compact(spark, min_delta_files=1)
        elif op == "rebucket":
            t.compact(spark, n_buckets=7)
        elif op == "expire":
            t.expire_snapshots(keep_last=1)
        elif op == "orphans":
            t.remove_orphan_files(grace_s=0)
        _assert_state(spark, t, model)
        assert t.committed_epochs() == committed
    # and the final table is reachable by a fresh handle with a clean cache
    fresh = SnapshotTable(t.root)
    _assert_state(spark, fresh, model)
    assert fresh.committed_epochs() == committed
