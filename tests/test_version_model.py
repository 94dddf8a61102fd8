"""Model-based randomized check of the VERSION-CONTROL surface: a seeded
random interleaving of delta commits, tags, append-only rollbacks,
branch cycles (publish-squash / cherry-pick-onto-moved-main / audit-reject),
compaction and snapshot expiration is applied both to the table and to a
driver-side model; after EVERY step the visible state, the exactly-once
epoch ledger, the retained-version set, a random historical read AND the
wall-clock time-travel contract must match the model.

The time-travel invariant is the strong one the per-feature tests can't
express: every retained version's effective publish instant is FROZEN at
commit time — retention may delete history but must never rewind nor
inflate a survivor's instant (`eff_overrides` pins), so
``snapshot_as_of(eff(v))`` answers identically before and after any
interleaving of expires, tags, rollbacks and branch publishes.

This is the interleaving coverage pairwise tests miss: rollback to a
version published by a cherry-pick, expire directly after a rollback
resurrected old files, a tag pinning a version amid newer expired ones,
a rejected audit branch leaving main's ledger untouched mid-walk.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from cdc_core_spark.lake import SnapshotTable, bucket_expr

FIELDS = [{"name": "k", "type": "string", "nullable": False, "key": True},
          {"name": "v", "type": "long", "nullable": True}]
NB = 4


def _vis(keymap: dict) -> dict:
    return {k: v for k, (_, v) in keymap.items() if v is not None}


def _merge(keymap: dict, rows, ts: int) -> None:
    """LWW fold of one delta batch into the model keymap (op_ts wins)."""
    for k, v in rows:
        old = keymap.get(k)
        if old is None or ts > old[0]:
            keymap[k] = (ts, v)


def _commit_rows(spark, handle, rows, epoch: int):
    """rows: list[(k, v_or_None)] — None = tombstone. op_ts = epoch
    (globally increasing), so later epochs always win the fold."""
    df = (spark.createDataFrame(
        [(k, v if v is not None else 0, v is None) for k, v in rows],
        "k string, v long, _deleted boolean")
        .withColumn("_op_ts", F.lit(epoch).cast("bigint"))
        .withColumn("_event_seq", F.lit(0).cast("bigint"))
        .withColumn("_bucket", bucket_expr(["k"], NB)))
    handle.commit_delta(df, epoch=epoch, manifests=[
        {"checkpoint_epoch": epoch, "partition_id": 0,
         "events_read": len(rows), "events_applied": len(rows),
         "events_error": 0, "max_op_ts": epoch, "max_event_seq": 0,
         "wall_ms": 0}])


_SOAK = [int(x) for x in os.environ.get("CDC_MODEL_SEEDS", "").split(",") if x]


@pytest.mark.parametrize("seed", [42] + _SOAK)
def test_randomized_version_control_interleaving(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable.create(str(tmp_path / "t"), FIELDS, ["k"],
                             n_buckets=NB)
    keyspace = [f"k{i:03d}" for i in range(40)]

    keymap: dict[str, tuple[int, int | None]] = {}   # k -> (op_ts, v|None)
    states: dict[int, dict] = {0: {}}                # version -> keymap copy
    committed: set[int] = set()
    retained: set[int] = {0}
    tags: dict[str, int] = {}
    eff_model: dict[int, int] = {}                   # version -> frozen eff
    running = [None]                                 # clamp accumulator
    epoch = 0

    def sync_new_versions(snapshot_state: dict | None = None):
        """Record versions that appeared since the last op: frozen effective
        instants (running-max over raw stamps, in version order) and the
        per-version state snapshot for historical reads."""
        hist = t.history()
        new = []
        for h in hist:
            v = h["version"]
            if v not in eff_model:
                ts = h["committed_at_ms"]
                assert ts is not None
                running[0] = ts if running[0] is None else max(running[0], ts)
                eff_model[v] = running[0]
                new.append(v)
        if new:
            assert min(new) > max(retained)          # versions only append
            retained.update(new)
            for v in new:
                states[v] = dict(snapshot_state if snapshot_state is not None
                                 else keymap)
        return new

    eff_model[0] = t.history()[0]["committed_at_ms"]
    running[0] = eff_model[0]

    def check():
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got == _vis(keymap)
        assert t.committed_epochs() == committed
        hist_versions = [h["version"] for h in t.history()]
        assert hist_versions == sorted(retained)
        # the frozen-instant contract: every retained version answers
        # time travel at ITS OWN instant, before and after retention
        for v in sorted(retained):
            exp = max(u for u in retained if eff_model[u] <= eff_model[v])
            assert t.snapshot_as_of(eff_model[v]).version == exp, \
                f"as_of(eff[{v}]) after ops {ops_run}"
        # one deep historical read per step
        v = rng.choice(sorted(retained))
        old = t.read(spark, snap=t.snapshot(v))
        assert {r["k"]: r["v"] for r in old.collect()} == _vis(states[v])

    def op_delta():
        nonlocal epoch
        ks = rng.sample(keyspace, rng.randint(1, 8))
        rows = [(k, rng.randint(0, 999)) for k in ks]
        # mixed-in tombstone — key distinct from the upserts: same-key rows
        # at one (op_ts, event_seq) would be an ambiguous LWW tie
        live = [k for k in keymap
                if keymap[k][1] is not None and k not in set(ks)]
        if live and rng.random() < 0.5:
            rows.append((rng.choice(live), None))
        _commit_rows(spark, t, rows, epoch)
        _merge(keymap, rows, epoch)
        committed.add(epoch)
        epoch += 1
        sync_new_versions()

    tag_seq = [0]

    def op_tag():
        tag_seq[0] += 1                  # names never reused after drop_tag
        name = f"tag{tag_seq[0]}"
        v = rng.choice(sorted(retained))
        t.create_tag(name, v)
        tags[name] = v

    def op_drop_tag():
        if not tags:
            return
        name = rng.choice(sorted(tags))
        t.drop_tag(name)
        del tags[name]

    def op_rollback():
        cand = [v for v in sorted(retained) if v < max(retained)]
        if not cand:
            return
        target = rng.choice(cand)
        t.rollback(target)
        keymap.clear()
        keymap.update(states[target])
        sync_new_versions()                          # ledger untouched

    def op_branch(ending: str):
        nonlocal epoch
        name = f"b{epoch}"
        br = t.create_branch(name)
        bmap = dict(keymap)
        picks: list[tuple[int, list, int]] = []      # (branch ver, rows, ep)
        beps: set[int] = set()
        for _ in range(rng.randint(1, 2)):
            ks = rng.sample(keyspace, rng.randint(1, 5))
            rows = [(k, rng.randint(0, 999)) for k in ks]
            _commit_rows(spark, br, rows, epoch)
            _merge(bmap, rows, epoch)
            picks.append((br.latest().version, rows, epoch))
            beps.add(epoch)
            epoch += 1
        if ending == "reject":
            t.drop_branch(name)                      # audit failed: no trace
            return
        if ending == "publish":                      # squash, main unmoved
            t.publish_branch(name)
            keymap.clear()
            keymap.update(bmap)
            committed.update(beps)
            sync_new_versions()
            t.drop_branch(name)
            return
        # cherry-pick path: main must move past the fork first
        ks = rng.sample(keyspace, rng.randint(1, 4))
        rows = [(k, rng.randint(0, 999)) for k in ks]
        _commit_rows(spark, t, rows, epoch)
        _merge(keymap, rows, epoch)
        committed.add(epoch)
        epoch += 1
        sync_new_versions()
        for bv, rows, ep in picks:
            t.cherry_pick(bv, from_branch=name)
            _merge(keymap, rows, ep)                 # older ts: loses ties
            committed.add(ep)
            sync_new_versions()
        t.drop_branch(name)

    def op_compact():
        t.compact(spark, min_delta_files=rng.choice([None, 1, 3]))
        sync_new_versions()

    def op_expire():
        keep = rng.randint(1, 3)
        order = sorted(retained)
        cand = order[:-keep]
        expected = [v for v in cand if v not in set(tags.values())]
        stats = t.expire_snapshots(keep_last=keep)
        assert stats["snapshots_removed"] == len(expected)
        retained.difference_update(expected)

    def op_orphans():
        t.remove_orphan_files(grace_s=0)

    OPS = {"delta": op_delta, "tag": op_tag, "drop_tag": op_drop_tag,
           "rollback": op_rollback, "reject": lambda: op_branch("reject"),
           "publish": lambda: op_branch("publish"),
           "pick": lambda: op_branch("pick"), "compact": op_compact,
           "expire": op_expire, "orphans": op_orphans}
    WEIGHTS = {"delta": 6, "tag": 2, "drop_tag": 1, "rollback": 2,
               "reject": 1, "publish": 2, "pick": 2, "compact": 2,
               "expire": 2, "orphans": 1}

    ops_run: list[str] = []
    op_delta()                                       # never start empty
    ops_run.append("delta")
    check()
    for _ in range(22):
        op = rng.choices(list(OPS), weights=[WEIGHTS[o] for o in OPS])[0]
        ops_run.append(op)
        OPS[op]()
        check()
    # deterministic tail: every op class at least once per seed
    for op in OPS:
        if op not in ops_run:
            ops_run.append(op)
            OPS[op]()
            check()
    # a fresh handle (clean caches, pins read back from the ledger) agrees
    fresh = SnapshotTable(t.root)
    assert {r["k"]: r["v"]
            for r in fresh.read(spark).collect()} == _vis(keymap)
    assert fresh.committed_epochs() == committed
    for v in sorted(retained):
        exp = max(u for u in retained if eff_model[u] <= eff_model[v])
        assert fresh.snapshot_as_of(eff_model[v]).version == exp
