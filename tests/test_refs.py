"""Refs (branches + tags) and the write-audit-publish flow.

A branch is an isolated commit chain forked from main (Iceberg refs /
``spark.wap.branch`` analog): commits staged on it are invisible to main
readers until ``fast_forward`` publishes the whole chain atomically as pure
metadata. Tags pin versions against retention. The CDC payoff is WAP:
``CdcEngine.wap_replay`` stages epochs on a branch, audits the staged state,
and only then lets downstream readers see it — the reference's
validate-before-persist gate (rules → quarantine,
mapping/.../rules/RulesExecutor.java; PersistencePipeline.java:80-93) lifted
from per-row to whole-staged-state.

These tests pin the parts a 100-TB deployment depends on: isolation, the
exactly-once ledger crossing the fork, divergence refusing to splice,
crash-resume idempotence of the publish, and retention/orphan sweeps never
eating a live ref's files.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from cdc_core_spark.engine import CdcEngine, WapAuditError
from cdc_core_spark.lake import CommitConflictError, SnapshotTable

from tests.conftest import assert_final_equal
from tests.test_occ import _commit, _mk, _state


def test_branch_isolation_then_fast_forward(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False), (2, 20, False)], 100, epoch=0)

    br = t.create_branch("wap")
    assert t.branches() == {"wap": 1}
    _commit(spark, br, [(2, 21, False)], 200, epoch=1)
    _commit(spark, br, [(3, 30, False)], 300, epoch=2)

    # staged state visible on the branch, invisible on main
    assert _state(spark, br) == {1: 10, 2: 21, 3: 30}
    assert _state(spark, t) == {1: 10, 2: 20}
    assert t.committed_epochs() == {0}
    # the branch's ledger includes main's pre-fork epochs (exactly-once
    # resume on the branch must skip them)
    assert br.committed_epochs() == {0, 1, 2}

    head = t.fast_forward("wap")
    assert head.version == br.latest().version
    assert _state(spark, t) == {1: 10, 2: 21, 3: 30}
    assert t.committed_epochs() == {0, 1, 2}
    # published docs parent-chain continuously through the fork
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(len(hist)))

    t.drop_branch("wap")
    assert t.branches() == {}
    with pytest.raises(FileNotFoundError):
        t.branch("wap")


def test_fast_forward_idempotent_and_crash_resumable(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    _commit(spark, br, [(1, 11, False)], 200, epoch=1)
    _commit(spark, br, [(2, 20, False)], 300, epoch=2)

    # simulate a crash mid-publish: only the first branch doc copied
    first = sorted(p for p in os.listdir(br.log_dir) if p.startswith("v"))[0]
    shutil.copyfile(os.path.join(br.log_dir, first),
                    os.path.join(t.log_dir, first))

    t.fast_forward("b")                      # resumes past the copied doc
    assert _state(spark, t) == {1: 11, 2: 20}
    v = t.latest().version
    t.fast_forward("b")                      # plain rerun: no-op
    assert t.latest().version == v


def test_fast_forward_divergence_raises(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    _commit(spark, br, [(1, 11, False)], 200, epoch=1)
    _commit(spark, t, [(2, 20, False)], 250, epoch=3)   # main advances too
    with pytest.raises(CommitConflictError, match="DIFFERENT v2"):
        t.fast_forward("b")
    assert _state(spark, t) == {1: 10, 2: 20}           # main untouched

    # empty branch + advanced main: equally non-fast-forwardable
    t.create_branch("empty")
    _commit(spark, t, [(3, 30, False)], 260, epoch=4)
    with pytest.raises(CommitConflictError, match="no commits"):
        t.fast_forward("empty")


def test_branch_head_behind_main_raises(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    _commit(spark, br, [(1, 11, False)], 200, epoch=1)
    t.fast_forward("b")
    _commit(spark, t, [(2, 20, False)], 300, epoch=2)   # main moves past head
    with pytest.raises(CommitConflictError, match="past the branch head"):
        t.fast_forward("b")


def test_orphan_sweep_never_eats_live_branch_files(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    _commit(spark, br, [(2, 20, False)], 200, epoch=1)

    removed = t.remove_orphan_files(grace_s=0.0)
    assert removed == []                     # branch deltas are referenced
    assert _state(spark, br) == {1: 10, 2: 20}

    t.drop_branch("b")                       # now they are debris
    removed = t.remove_orphan_files(grace_s=0.0)
    assert removed                           # ...and get collected
    assert _state(spark, t) == {1: 10}


def test_tag_protects_version_from_expiration(spark, tmp_path):
    t = _mk(tmp_path)
    for i in range(4):
        _commit(spark, t, [(i, i * 10, False)], 100 + i, epoch=i)
    pinned = t.create_tag("audit-point", version=3)
    assert pinned == 3 and t.tags() == {"audit-point": 3}
    with pytest.raises(FileExistsError):
        t.create_tag("audit-point")          # re-tag a live name: refuse
    with pytest.raises(FileNotFoundError):
        t.create_tag("ghost", version=99)

    t.expire_snapshots(keep_last=1)
    snap = t.ref_snapshot("audit-point")     # tagged version survives
    assert snap.version == 3
    assert _state(spark, t) == {0: 0, 1: 10, 2: 20, 3: 30}
    assert {r["k"] for r in t.read(spark, snap=snap).collect()} == {0, 1, 2}
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)                        # untagged history is gone
    assert t.committed_epochs() == {0, 1, 2, 3}   # ledger survives

    t.drop_tag("audit-point")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.snapshot(3)


def test_branch_fork_protects_expiration(spark, tmp_path):
    t = _mk(tmp_path)
    for i in range(3):
        _commit(spark, t, [(i, i, False)], 100 + i, epoch=i)
    br = t.create_branch("b")                # fork at v3
    _commit(spark, br, [(9, 9, False)], 500, epoch=9)
    _commit(spark, t, [(5, 5, False)], 400, epoch=5)   # main diverges (v4)

    t.expire_snapshots(keep_last=1)
    assert t.snapshot(3).version == 3        # the fork doc is pinned
    assert _state(spark, br) == {0: 0, 1: 1, 2: 2, 9: 9}
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)                        # pre-fork history expires fine


def test_fast_forward_copies_manifest_list_sidecars(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    br.inline_files_max = 1                  # force the sidecar path
    _commit(spark, br, [(2, 20, False), (3, 30, False)], 200, epoch=1)
    doc = json.load(open(sorted(os.path.join(br.log_dir, p)
                                for p in os.listdir(br.log_dir)
                                if p.startswith("v"))[-1]))
    assert isinstance(doc["files"], dict)    # really split out
    t.fast_forward("b")
    t.drop_branch("b")
    assert _state(spark, t) == {1: 10, 2: 20, 3: 30}


def test_ref_name_validation_and_main_only_guards(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    for bad in ("", "a/b", "../x", ".hidden", "x" * 65):
        with pytest.raises(ValueError):
            t.create_branch(bad)
    br = t.create_branch("b")
    for call in (lambda: br.create_branch("c"), lambda: br.fast_forward("b"),
                 lambda: br.drop_branch("b"), lambda: br.create_tag("t"),
                 lambda: br.expire_snapshots(1),
                 lambda: br.remove_orphan_files()):
        with pytest.raises(ValueError, match="main ref"):
            call()
    with pytest.raises(FileExistsError):
        t.create_branch("b")


def test_wap_replay_publishes_audited_state(spark, t1, registry, tmp_path):
    """End-to-end WAP: staged replay + passing audit == a direct replay."""
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    seen = {}

    def audit(e):
        # runs against the BRANCH state: full backlog already staged
        seen["epochs"] = {r["checkpoint_epoch"]
                          for r in e.manifests_df().collect()}
        seen["rows"] = e.count_final()
        return seen["rows"] > 0

    eng = CdcEngine(spark, str(tmp_path / "w"), registry, n_buckets=8)
    eng.wap_replay(f'{t1["dir"]}/change_events', branch="audit",
                   audit=audit, source_df=src)
    assert seen["rows"] == len(t1["expected"])
    assert seen["epochs"], "audit must have seen staged manifests"
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])
    assert eng.table.branches() == {}        # published branch dropped
    # exactly-once across the publish: a plain rerun is a no-op
    v = eng.table.latest().version
    eng.replay(f'{t1["dir"]}/change_events')
    assert eng.table.latest().version == v


def test_wap_replay_audit_reject_keeps_main_clean(spark, t1, registry,
                                                  tmp_path):
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng = CdcEngine(spark, str(tmp_path / "w"), registry, n_buckets=8)
    with pytest.raises(WapAuditError):
        eng.wap_replay(f'{t1["dir"]}/change_events', branch="audit",
                       audit=lambda e: False, source_df=src)
    # main holds ONLY the initial load; the staged branch is kept
    assert eng.table.committed_epochs() == set()
    assert "audit" in eng.table.branches()
    n_initial = eng.count_final()
    assert n_initial == len(src.toPandas())

    # rerun with a passing audit: branch epochs resume-skip, then publish
    eng.wap_replay(f'{t1["dir"]}/change_events', branch="audit",
                   audit=lambda e: True)
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])


def test_publish_branch_single_atomic_commit(spark, tmp_path):
    """The WAP publish: a multi-commit branch lands on main as ONE squash
    commit behind one CAS — no intermediate prefix is ever a main state —
    and the epoch ledger survives even for manifest-less branch commits."""
    from tests.test_occ import _delta_df

    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)        # fork head v1
    br = t.create_branch("b")
    _commit(spark, br, [(2, 20, False)], 200, epoch=1)
    _commit(spark, br, [(3, 30, False)], 300, epoch=2)
    br.commit_delta(_delta_df(spark, [(4, 40, False)], 400),
                    epoch=3, manifests=[])                   # epochs-field path

    n_before = len(t.history())
    head = t.publish_branch("b")
    assert len(t.history()) == n_before + 1                  # exactly one commit
    assert head.version == 2                                 # fork(1) + 1
    assert _state(spark, t) == {1: 10, 2: 20, 3: 30, 4: 40}
    assert t.committed_epochs() == {0, 1, 2, 3}
    assert len(head.manifests) == 2                          # folded forward

    v = t.latest().version
    assert t.publish_branch("b").version == v                # rerun: no-op
    _commit(spark, t, [(9, 90, False)], 900, epoch=9)        # main moves on
    assert t.publish_branch("b").version == t.latest().version  # still no-op
    t.drop_branch("b")


def test_publish_branch_divergence_raises(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    br = t.create_branch("b")
    _commit(spark, br, [(1, 11, False)], 200, epoch=1)
    _commit(spark, t, [(2, 20, False)], 250, epoch=5)        # main diverges
    with pytest.raises(CommitConflictError, match="diverged"):
        t.publish_branch("b")
    assert _state(spark, t) == {1: 10, 2: 20}                # main untouched


def test_read_changes_across_expired_gap_names_the_cause(spark, tmp_path):
    """A tag pins its own doc, not its successors: a changelog range from a
    tagged version across expired successors must fail with the cause, not
    a bare open() error."""
    t = _mk(tmp_path)
    for i in range(4):
        _commit(spark, t, [(i, i, False)], 100 + i, epoch=i)
    t.create_tag("chk", version=2)
    t.expire_snapshots(keep_last=1)                          # v2, v4 survive
    with pytest.raises(FileNotFoundError, match="expired by retention"):
        t.read_changes(spark, 2)


def test_drop_tag_rejects_traversal_names(spark, tmp_path):
    t = _mk(tmp_path)
    _commit(spark, t, [(1, 10, False)], 100, epoch=0)
    t.create_tag("x")
    with pytest.raises(ValueError):
        t.drop_tag("../expired-base")
    assert t.tags() == {"x": t.latest().version}             # nothing removed


def test_wap_replay_resumes_crashed_initial_load(spark, t1, registry,
                                                 tmp_path):
    """Crash between table create and the initial data commit leaves
    exists()==True without the initial_loaded prop; wap_replay(source_df=)
    must finish the load (same rule as plain replay), not skip it."""
    eng = CdcEngine(spark, str(tmp_path / "w"), registry, n_buckets=8)
    sdef = registry.get("source_repos", "1.0")
    SnapshotTable.create(eng.table.root, fields=[dict(f) for f in sdef.fields],
                         key_cols=sdef.key_cols(), n_buckets=8,
                         aliases=dict(sdef.aliases),
                         props={"schema_version": "1.0"})
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.wap_replay(f'{t1["dir"]}/change_events', source_df=src)
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])
