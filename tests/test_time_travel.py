"""Wall-clock time travel + age-based retention + metadata inspection.

Every published snapshot doc is stamped with its publish instant
(``committed_at_ms`` — the Iceberg snapshot ``timestamp-ms``; the reference
keeps the same fact per transaction in its journal records,
core/src/main/java/io/zyient/core/state — tnx timestamps). That stamp
drives three table-operations features a 100-TB deployment leans on:

* ``snapshot_as_of(ts_ms)`` — ``TIMESTAMP AS OF`` reads, with a running-max
  clamp so a backwards wall-clock step between commits can never make
  as-of reads non-monotone;
* ``expire_snapshots(older_than_ms=...)`` — age-based retention
  (``expireOlderThan``), conjunct with ``keep_last`` (``retainLast``);
* ``inspect(spark, kind)`` — history/files/block_deltas/refs metadata as
  DataFrames (the Iceberg inspection-table surface).
"""

from __future__ import annotations

import json
import os

import pytest

from cdc_core_spark.lake import SnapshotTable

from tests.test_occ import _commit, _mk, _state


def _doc_path(t: SnapshotTable, version: int) -> str:
    return os.path.join(t.log_dir, f"v{version:012d}.json")


def _set_ts(t: SnapshotTable, version: int, ts_ms: int | None) -> None:
    """Rewrite one doc's publish stamp (test-only: simulates clock steps
    and pre-timestamp builds without monkeypatching the global clock)."""
    p = _doc_path(t, version)
    with open(p) as f:
        d = json.load(f)
    if ts_ms is None:
        d.pop("committed_at_ms", None)
    else:
        d["committed_at_ms"] = ts_ms
    with open(p, "w") as f:
        json.dump(d, f)


def test_snapshot_as_of_basic(spark, tmp_path):
    t = _mk(tmp_path)                                     # v0 (create)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)     # v3

    hist = t.history()
    stamps = [h["committed_at_ms"] for h in hist]
    assert all(isinstance(s, int) for s in stamps)
    assert stamps == sorted(stamps)      # publishes are sequential here

    # exact-instant and in-between instants resolve to the version live then
    assert t.snapshot_as_of(stamps[1]).version == 1
    assert t.snapshot_as_of(stamps[2] - 1).version == 1
    assert t.snapshot_as_of(stamps[3]).version == 3
    assert t.snapshot_as_of(stamps[3] + 10_000).version == 3   # future → head
    assert _state(spark, t) == {1: 11, 2: 20}
    old = t.read(spark, snap=t.snapshot_as_of(stamps[1]))
    assert {r["k"]: r["v"] for r in old.collect()} == {1: 10}

    with pytest.raises(FileNotFoundError, match="newer than"):
        t.snapshot_as_of(stamps[0] - 1)


def test_as_of_clamps_backwards_clock_steps(spark, tmp_path):
    """A commit stamped EARLIER than its parent (wall clock stepped back)
    inherits the running max: as-of at the parent's instant returns the
    LATER version — monotone reads, the Iceberg log-resolution rule."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _set_ts(t, 0, 1000)
    _set_ts(t, 1, 5000)
    _set_ts(t, 2, 3000)                                   # clock stepped back

    assert t.snapshot_as_of(5000).version == 2   # v2's effective ts = 5000
    assert t.snapshot_as_of(4999).version == 0   # v1/v2 both clamp past 4999
    # pre-timestamp docs (legacy builds) inherit the clamp, stay reachable
    _set_ts(t, 2, None)
    assert t.snapshot_as_of(5000).version == 2


def test_expire_by_age(spark, tmp_path):
    t = _mk(tmp_path)                                     # v0
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)     # v3
    for v, ts in enumerate([1000, 2000, 3000, 4000]):
        _set_ts(t, v, ts)

    with pytest.raises(ValueError, match="keep_last and/or older_than_ms"):
        t.expire_snapshots()

    stats = t.expire_snapshots(older_than_ms=2500)
    assert stats["snapshots_removed"] == 2                # v0, v1
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)
    assert t.snapshot(2).version == 2                     # young enough
    assert _state(spark, t) == {1: 11, 2: 20}
    assert t.committed_epochs() == {0, 1, 2}              # ledger survives

    # conjunction: old enough AND beyond keep_last — keep_last=2 pins v2
    # even though it is older than the cutoff
    assert t.expire_snapshots(keep_last=2,
                              older_than_ms=10_000)["snapshots_removed"] == 0
    # age alone never expires the head
    assert t.expire_snapshots(older_than_ms=10_000)["snapshots_removed"] == 1
    assert t.latest().version == 3


def test_expire_by_age_skips_tags_and_legacy_docs(spark, tmp_path):
    t = _mk(tmp_path)                                     # v0
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    for v, ts in enumerate([1000, 2000, 3000]):
        _set_ts(t, v, ts)
    t.create_tag("audit", 1)
    _set_ts(t, 0, None)                                   # legacy: no stamp

    stats = t.expire_snapshots(older_than_ms=10_000)
    # v0 has no stamp (never aged out), v1 is tagged, v2 is head
    assert stats["snapshots_removed"] == 0
    t.drop_tag("audit")
    assert t.expire_snapshots(older_than_ms=10_000)["snapshots_removed"] == 1
    assert t.snapshot(0).version == 0                     # legacy still safe
    # keep_last reclaims what age cannot
    assert t.expire_snapshots(keep_last=1)["snapshots_removed"] == 1


def test_expire_persists_the_clock_floor(spark, tmp_path):
    """Expiring the snapshot that ANCHORED the running-max clamp must not
    rewind the effective instants of retained docs: the newest expired
    effective instant is persisted as the ledger's ``clock_floor_ms`` and
    seeds every later clamp walk. Without it, as-of reads change answers
    after retention and a follow-up age-based expire deletes snapshots
    whose effective instant was newer than the cutoff."""
    t = _mk(tmp_path)                                     # v0
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)     # v3
    _set_ts(t, 0, 5000)          # the clamp anchor
    _set_ts(t, 1, 1000)          # clock stepped back …
    _set_ts(t, 2, 900)           # … twice
    _set_ts(t, 3, 6000)

    assert t.snapshot_as_of(5000).version == 2   # v1/v2 clamp to 5000
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(1000)                   # nothing effective ≤ 1000

    # expire ONLY the anchor (v0: eff 5000 < 5500; v1/v2 clamp to 5000 too,
    # but keep_last=3 pins them)
    assert t.expire_snapshots(keep_last=3,
                              older_than_ms=5500)["snapshots_removed"] == 1
    # the anchor's effective instant survives as the ledger floor …
    assert t._expired_base_doc()["clock_floor_ms"] == 5000
    # … so retained docs keep their clamped instants: same answers as before
    assert t.snapshot_as_of(5000).version == 2
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(1000)
    # … and age retention cannot delete history the cutoff said to keep
    # (v1/v2 are effectively at 5000, NOT at their raw 1000/900 stamps)
    assert t.expire_snapshots(older_than_ms=2000)["snapshots_removed"] == 0
    # a cutoff beyond the floor still reclaims them, and max-folds the floor
    assert t.expire_snapshots(older_than_ms=5500)["snapshots_removed"] == 2
    assert t._expired_base_doc()["clock_floor_ms"] == 5000
    assert t.latest().version == 3
    assert t.committed_epochs() == {0, 1, 2}              # ledger survives


def test_expire_keeps_tagged_older_snapshot_instant(spark, tmp_path):
    """A TAGGED snapshot retained amid NEWER expired ones keeps ITS OWN
    effective instant: retention pins every survivor's instant into the
    ledger (``eff_overrides``) rather than seeding the whole walk with a
    chain-wide floor — a floor seed would inflate the pinned doc's instant
    to the newest expired one, breaking the 'tag versions to pin them'
    contract ``snapshot_as_of``'s own error message advertises."""
    t = _mk(tmp_path)                                     # v0
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)     # v3
    _commit(spark, t, [(3, 30, False)], 400, epoch=3)     # v4
    for v, ts in enumerate([500, 1000, 2000, 3000, 4000]):
        _set_ts(t, v, ts)
    t.create_tag("audit", 1)

    assert t.snapshot_as_of(1000).version == 1
    # keep_last=1 expires v0/v2/v3 (v1 is tagged, v4 is head)
    assert t.expire_snapshots(keep_last=1)["snapshots_removed"] == 3
    # the tagged survivor answers at ITS instant, exactly as before …
    assert t.snapshot_as_of(1000).version == 1
    assert t.snapshot_as_of(1500).version == 1
    old = t.read(spark, snap=t.snapshot_as_of(1000))
    assert {r["k"]: r["v"] for r in old.collect()} == {1: 10}
    # … instants inside the expired gap resolve to the newest RETAINED
    # snapshot at-or-before them (the Iceberg snapshot-log rule) …
    assert t.snapshot_as_of(3999).version == 1
    assert t.snapshot_as_of(4000).version == 4
    # … and pre-v1 history is genuinely gone
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(999)
    # age retention still sees the pinned instants, not inflated ones:
    # nothing to do (v1 tagged, v4 head), and the pins survive the rerun
    assert t.expire_snapshots(older_than_ms=9999)["snapshots_removed"] == 0
    assert t.snapshot_as_of(1000).version == 1


def test_branch_doc_above_fork_never_takes_main_pins(spark, tmp_path):
    """eff_overrides are keyed by MAIN version numbers; a branch doc above
    the fork shares its number with a diverged main doc and must keep its
    own clock, not main's pinned one."""
    t = _mk(tmp_path)                                     # v0
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1 (fork)
    br = t.create_branch("wap")
    _commit(spark, t, [(2, 20, False)], 200, epoch=1)     # main v2 (diverged)
    _commit(spark, br, [(3, 30, False)], 300, epoch=2)    # branch v2
    _set_ts(t, 0, 500)
    _set_ts(t, 1, 2000)
    _set_ts(t, 2, 9000)                                   # main v2: far ahead
    p = os.path.join(br.log_dir, "v000000000002.json")    # branch v2 → 3000
    with open(p) as f:
        d = json.load(f)
    d["committed_at_ms"] = 3000
    with open(p, "w") as f:
        json.dump(d, f)

    # expire v0 on main → pins {1: 2000, 2: 9000} land in the ledger
    assert t.expire_snapshots(keep_last=2)["snapshots_removed"] == 1
    # branch v2 keeps its own 3000 instant (main's v2 pin must not apply)
    assert br.snapshot_as_of(3000).version == 2
    assert br.snapshot_as_of(2999).version == 1
    assert t.snapshot_as_of(8999).version == 1            # main unchanged


def test_as_of_on_branch_crosses_the_fork(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # main v1
    br = t.create_branch("wap")
    _commit(spark, br, [(2, 20, False)], 200, epoch=1)    # branch v2
    ts_main = t.history()[1]["committed_at_ms"]
    ts_br = br.history()[-1]["committed_at_ms"]

    assert br.snapshot_as_of(ts_main).version == 1        # pre-fork doc
    assert br.snapshot_as_of(ts_br).version == 2
    assert t.snapshot_as_of(ts_br).version == 1           # main never saw v2


def test_inspect_metadata_dataframes(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False), (2, 20, False)], 100, epoch=0)
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)
    t.create_branch("b1")
    t.create_tag("rel", 1)

    h = t.inspect(spark, "history")
    assert h.columns == ["version", "epoch", "parent", "n_buckets",
                         "n_files", "n_manifests", "committed_at_ms",
                         "rollback_of", "props"]
    rows = {r["version"]: r for r in h.collect()}
    assert set(rows) == {0, 1, 2} and rows[2]["parent"] == 1
    assert rows[1]["committed_at_ms"] <= rows[2]["committed_at_ms"]

    f = t.inspect(spark, "files")
    assert f.columns == ["path", "bucket", "kind", "schema_id", "epoch",
                         "bytes"]
    assert f.count() == len(t.latest().files)
    assert f.filter("bytes is null or bytes <= 0").count() == 0

    bd = t.inspect(spark, "block_deltas")
    assert bd.count() == len(t.block_deltas())
    assert bd.filter("deleted").count() == 0              # nothing rewritten

    refs = {(r["name"], r["type"]): r["version"]
            for r in t.inspect(spark, "refs").collect()}
    assert refs[("main", "head")] == 2
    assert refs[("b1", "branch")] == 2 and refs[("rel", "tag")] == 1

    with pytest.raises(ValueError, match="unknown inspect kind"):
        t.inspect(spark, "nope")


def test_publish_branch_rerun_ignores_publish_stamp(spark, tmp_path):
    """Idempotent-rerun identity must exclude committed_at_ms: the rerun's
    rebuilt squash can never reproduce the crashed run's write-time stamp."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("wap")
    _commit(spark, br, [(1, 11, False)], 200, epoch=1)
    first = t.publish_branch("wap")
    rerun = t.publish_branch("wap")                       # crash-resume path
    assert rerun.version == first.version
    assert _state(spark, t) == {1: 11}
