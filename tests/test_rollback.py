"""rollback(): append-only undo to a retained snapshot's data state.

The Iceberg ``rollback_to_snapshot`` analog (reference analog: transaction
rollback / replayable-offset reset in the processing loop,
core/src/main/java/io/zyient/base/core/processing/Processor.java — lifted
from per-batch to whole-table state). Rules pinned here:

* history stays append-only (a NEW head commit, never a version deletion),
  so time travel to rolled-PAST versions keeps working until retention;
* schema does NOT revert (table-level metadata), layout (n_buckets) does;
* the exactly-once epoch ledger is untouched — rolled-back epochs stay
  committed, so a resumed replay skips them and the state STAYS rolled
  back;
* no auto-rebase: a concurrent commit raises CommitConflictError;
* read_changes refuses to cross a rollback commit (not incrementally
  readable) unless the consumer opts into skip;
* retention keeps resurrected files alive (the rollback head references
  them) even after the target snapshot itself expires.
"""

from __future__ import annotations

import pytest

from cdc_core_spark.lake import CommitConflictError, SnapshotTable

from tests.test_occ import _commit, _mk, _state


def test_rollback_restores_state_append_only(spark, tmp_path):
    t = _mk(tmp_path)                                     # v0 (create)
    _commit(spark, t, [(1, 10, False), (2, 20, False)], 100, epoch=0)  # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(3, 30, False)], 300, epoch=2)     # v3 (the bad one)

    snap = t.rollback(2)                                  # v4
    assert snap.version == 4 and snap.parent == 3
    assert snap.rollback_of == 2 and snap.maintenance is False
    assert _state(spark, t) == {1: 11, 2: 20}             # v2's data state

    # append-only: the rolled-past version stays readable (time travel)
    assert _state(spark, SnapshotTable(str(tmp_path))) == {1: 11, 2: 20}
    pre = t.read(spark, snap=t.snapshot(3))
    assert {r["k"]: r["v"] for r in pre.collect()} == {1: 11, 2: 20, 3: 30}

    # the marker annotates exactly the rollback commit in history/inspect
    hist = {h["version"]: h["rollback_of"] for h in t.history()}
    assert hist == {0: None, 1: None, 2: None, 3: None, 4: 2}
    rows = {r["version"]: r["rollback_of"]
            for r in t.inspect(spark, "history").collect()}
    assert rows[4] == 2 and rows[3] is None


def test_rollback_noop_and_bounds(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1

    assert t.rollback(1).version == 1                     # already there
    with pytest.raises(ValueError, match="ahead of head"):
        t.rollback(7)
    with pytest.raises(FileNotFoundError):
        t.rollback(-1)                                    # never published


def test_rollback_keeps_epoch_ledger(spark, tmp_path):
    """Rolled-back epochs stay committed: a resumed replay of the same
    event log skips them, so the state STAYS rolled back — repaired events
    must arrive as a NEW epoch (the reprocess_errors path)."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 99, False)], 200, epoch=1)     # v2 (bad epoch)
    t.rollback(1)

    assert t.committed_epochs() == {0, 1}                 # ledger untouched
    # the repaired value lands as a NEW epoch over the rolled-back state
    _commit(spark, t, [(1, 11, False)], 300, epoch=2)
    assert _state(spark, t) == {1: 11}


def test_rollback_does_not_revert_schema(spark, tmp_path):
    """Iceberg rule: schema is table metadata, not snapshot state — the
    target's files read through normal evolution (added column → null)."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    t.commit_metadata(
        new_fields=t.latest().fields + [{"name": "w", "type": "long"}],
        new_aliases=t.latest().aliases)                   # v2: ADD COLUMN w
    _commit(spark, t, [(2, 20, False)], 200, epoch=1)     # v3

    snap = t.rollback(1)
    assert [f["name"] for f in snap.fields] == ["k", "v", "w"]  # no revert
    rows = {r["k"]: (r["v"], r["w"]) for r in t.read(spark).collect()}
    assert rows == {1: (10, None)}                        # v1 data, new col


def test_rollback_never_rebases_over_concurrent_commit(spark, tmp_path,
                                                       monkeypatch):
    """A commit landing between the head read and the publish must raise,
    never be silently undone by an auto-rebase onto the new head."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2

    stale = t.latest_meta()                               # reader pins head…
    t2 = SnapshotTable(str(tmp_path))
    _commit(spark, t2, [(2, 20, False)], 300, epoch=2)    # …interloper lands
    monkeypatch.setattr(t, "latest_meta", lambda: stale)
    with pytest.raises(CommitConflictError, match="state moved"):
        t.rollback(1)
    # nothing published: the interloper's commit is intact
    assert _state(spark, t2) == {1: 11, 2: 20}
    assert t2.latest().version == 3


def test_read_changes_refuses_to_cross_a_rollback(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(2, 20, False)], 200, epoch=1)     # v2
    t.rollback(1)                                         # v3
    _commit(spark, t, [(3, 30, False)], 300, epoch=2)     # v4

    with pytest.raises(ValueError, match="rolls the table back"):
        t.read_changes(spark, from_version=2)
    with pytest.raises(ValueError, match="rolls the table back"):
        t.read_changes(spark, from_version=2, strict=True)
    # opt-in skip: the consumer re-reads full state across the rollback;
    # only genuinely-appended rows after it are delivered
    ch = t.read_changes(spark, from_version=2, on_logical_rewrite="skip")
    assert {(r["k"], r["v"], r["_change_version"])
            for r in ch.collect()} == {(3, 30, 4)}
    # a range entirely after the rollback is ordinary incremental reading
    ch2 = t.read_changes(spark, from_version=3)
    assert {(r["k"], r["v"]) for r in ch2.collect()} == {(3, 30)}


def test_rollback_survives_retention(spark, tmp_path):
    """expire_snapshots keeps the files the rollback head references even
    after the TARGET snapshot's doc expires — live-file union over
    retained docs, not over the rollback pointer."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # v1
    _commit(spark, t, [(1, 11, False)], 200, epoch=1)     # v2
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)     # v3
    t.rollback(1)                                         # v4

    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots_removed"] == 4                # v0..v3 gone
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)                                     # target expired…
    assert _state(spark, t) == {1: 10}                    # …state survives
    assert t.committed_epochs() == {0, 1, 2}              # ledger folded


def test_rollback_resurrects_compacted_files_in_block_deltas(spark, tmp_path):
    """Rolling back past a compaction resurrects the pre-compaction files:
    block_deltas must report them live again (and the compacted files as
    dropped by the rollback version)."""
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False), (2, 20, False)], 100, epoch=0)  # v1
    pre = {f["path"] for f in t.latest().files}
    t.compact(spark)                                      # v2 rewrite
    post = {f["path"] for f in t.latest().files}
    t.rollback(1)                                         # v3

    assert {f["path"] for f in t.latest().files} == pre
    assert _state(spark, t) == {1: 10, 2: 20}
    rows = {r["path"]: r for r in t.block_deltas()}
    for p in pre:
        assert rows[p]["deleted"] is False
        assert rows[p]["removed_version"] is None
    for p in post - pre:
        assert rows[p]["deleted"] is True
        assert rows[p]["removed_version"] == 3


def test_rollback_reverts_bucket_layout_with_the_files(spark, tmp_path):
    """n_buckets travels with the file set it bucketed — rolling back past
    a re-bucket restores the old layout so key→bucket routing stays
    consistent with the restored files."""
    t = _mk(tmp_path)
    _commit(spark, t, [(k, k * 10, False) for k in range(8)], 100, epoch=0)
    t.compact(spark, n_buckets=8)                         # v2: re-bucket 4→8
    assert t.latest().n_buckets == 8
    t.rollback(1)                                         # v3
    assert t.latest().n_buckets == 4
    assert _state(spark, t) == {k: k * 10 for k in range(8)}


def test_rollback_on_a_branch(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)     # main v1
    br = t.create_branch("wap")
    _commit(spark, br, [(1, 99, False)], 200, epoch=1)    # branch v2

    snap = br.rollback(1)                                 # undo on the branch
    assert snap.version == 3 and snap.rollback_of == 1
    assert _state(spark, br) == {1: 10}                   # back to the fork
    assert t.latest().version == 1                        # main untouched
    assert _state(spark, t) == {1: 10}
