"""Git repo sync source: a real git history replayed through the engine must
converge to the repo's actual HEAD working tree (SURVEY §2.1 'Git repo sync';
content sha equality is the BASELINE invariant applied to a real repo)."""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import functions as F

from cdc_core_spark.engine import CdcEngine, OP_DELETE, OP_INSERT
from cdc_core_spark.sources import gitsync


def _run(repo, *args, env_ts=None):
    env = dict(os.environ,
               GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@x",
               GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@x")
    if env_ts:
        env["GIT_AUTHOR_DATE"] = env["GIT_COMMITTER_DATE"] = env_ts
    subprocess.run(["git", "-C", repo, *args], check=True,
                   capture_output=True, env=env)


def _write(repo, rel, text):
    p = os.path.join(repo, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(text)


def _mk_history(repo):
    os.makedirs(repo)
    _run(repo, "init", "-q", "-b", "main")
    _write(repo, "a.py", "print(1)\n")
    _write(repo, "b.txt", "hello\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c0",
                                 env_ts="2024-01-01T00:00:00Z")
    _write(repo, "a.py", "print(2)\n")
    _write(repo, "docs/d.md", "# title\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c1",
                                 env_ts="2024-01-01T00:00:00Z")  # same second
    _run(repo, "rm", "-q", "b.txt")
    _write(repo, "docs/d.md", "# title v2\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c2",
                                 env_ts="2024-01-02T00:00:00Z")
    _run(repo, "mv", "a.py", "e.py")
    _run(repo, "commit", "-qm", "c3", env_ts="2024-01-03T00:00:00Z")


def test_git_history_replays_to_head_state(spark, registry, tmp_path):
    repo = str(tmp_path / "r")
    _mk_history(repo)

    events = gitsync.events_from_git(spark, repo, "org/r")
    # rename surfaced as delete+insert; same-second commits stay ordered
    ops = {(r["path"], r["rev"]): r["op"] for r in events.collect()}
    assert ops[("a.py", 3)] == OP_DELETE and ops[("e.py", 3)] == OP_INSERT
    seqs = [r["event_seq"] for r in
            events.orderBy("rev", "event_seq").collect()]
    assert seqs == sorted(seqs) and len(seqs) == len(set(seqs))

    ev_dir = str(tmp_path / "events")
    events.write.partitionBy("checkpoint_epoch").parquet(ev_dir)

    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=4)
    empty = spark.createDataFrame([], "repo string, path string")
    eng.replay(ev_dir, source_df=empty, schema_version="1.1")

    got = {r["path"]: (r["content"], r["rev"]) for r in
           eng.read_final().collect()}
    head_files = subprocess.run(
        ["git", "-C", repo, "ls-files"], check=True, capture_output=True,
        text=True).stdout.split()
    assert set(got) == set(head_files) == {"e.py", "docs/d.md"}
    for p in head_files:
        want = subprocess.run(["git", "-C", repo, "show", f"HEAD:{p}"],
                              check=True, capture_output=True,
                              text=True).stdout
        assert got[p][0] == want
    assert got["e.py"][1] == 3 and got["docs/d.md"][1] == 2
    # per-epoch manifests: one per commit → resumable exactly-once history
    eps = {r["checkpoint_epoch"] for r in eng.manifests_df().collect()}
    assert eps == {-1, 0, 1, 2, 3}
    # lang derived from extension (table is at 1.x: pre-rename `lang`)
    langs = {r["path"]: r["lang"] for r in
             eng.read_final().select("path", F.col("lang")).collect()}
    assert langs == {"e.py": "py", "docs/d.md": "md"}


def test_quoted_and_spaced_paths_roundtrip(spark, registry, tmp_path):
    """git C-quotes paths with non-ASCII/quote chars in --name-status output;
    spaces stay literal. Both must land in the table under their REAL path
    and hydrate the right blob."""
    repo = str(tmp_path / "r")
    os.makedirs(repo)
    _run(repo, "init", "-q", "-b", "main")
    _write(repo, "sp ace.py", "x = 1\n")
    _write(repo, "unié.md", "accént\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c0",
                                 env_ts="2024-01-01T00:00:00Z")

    assert gitsync._unquote('"uni\\303\\251.md"') == "unié.md"
    assert gitsync._unquote("plain.py") == "plain.py"

    events = gitsync.events_from_git(spark, repo, "org/r")
    got = {r["path"]: r["content"] for r in events.collect()}
    assert got == {"sp ace.py": "x = 1\n", "unié.md": "accént\n"}


def test_merge_commits_and_conflict_resolutions_replay_to_head(
        spark, registry, tmp_path):
    """Merge commits must emit change events (plain --name-status shows
    nothing for them): side-branch work arrives as the merge's first-parent
    delta, and an 'evil merge' conflict resolution — content matching
    NEITHER parent — must win LWW even when the side branch carries a
    future-skewed author clock."""
    repo = str(tmp_path / "r")
    os.makedirs(repo)
    _run(repo, "init", "-q", "-b", "main")
    _write(repo, "f.txt", "base\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c0",
                                 env_ts="2024-01-01T00:00:00Z")
    _run(repo, "checkout", "-qb", "feat")
    _write(repo, "f.txt", "feature\n")
    _write(repo, "only_feat.txt", "side\n")
    # side-branch clock skewed months into the future
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "f1",
                                 env_ts="2024-06-01T00:00:00Z")
    _run(repo, "checkout", "-q", "main")
    _write(repo, "f.txt", "mainline\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c1",
                                 env_ts="2024-01-02T00:00:00Z")
    # conflicting merge — resolve f.txt to brand-new content
    env = dict(os.environ, GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@x",
               GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@x",
               GIT_AUTHOR_DATE="2024-01-03T00:00:00Z",
               GIT_COMMITTER_DATE="2024-01-03T00:00:00Z")
    merge = subprocess.run(["git", "-C", repo, "merge", "feat"],
                           capture_output=True, env=env)
    assert merge.returncode != 0  # conflict expected
    _write(repo, "f.txt", "resolved\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "merge",
                                 env_ts="2024-01-03T00:00:00Z")

    events = gitsync.events_from_git(spark, repo, "org/r")
    ev_dir = str(tmp_path / "events")
    events.write.partitionBy("checkpoint_epoch").parquet(ev_dir)
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=4)
    empty = spark.createDataFrame([], "repo string, path string")
    eng.replay(ev_dir, source_df=empty, schema_version="1.1")

    got = {r["path"]: r["content"] for r in eng.read_final().collect()}
    head_files = subprocess.run(
        ["git", "-C", repo, "ls-files"], check=True, capture_output=True,
        text=True).stdout.split()
    assert set(got) == set(head_files) == {"f.txt", "only_feat.txt"}
    assert got["f.txt"] == "resolved\n"      # the evil-merge resolution
    assert got["only_feat.txt"] == "side\n"  # side-branch work via merge


def test_submodule_gitlinks_skipped_and_binary_blobs_roundtrip(
        spark, tmp_path):
    """A submodule gitlink (mode 160000) must be filtered at listing time —
    hydrating it would query a commit object absent from the host repo's odb
    and kill the ingest. A binary blob must survive LOSSLESSLY under the
    default on_binary='base64' policy (is_binary flags it), and 'replace'
    must stay available as the documented lossy option."""
    sub = str(tmp_path / "sub")
    os.makedirs(sub)
    _run(sub, "init", "-q", "-b", "main")
    _write(sub, "s.txt", "inner\n")
    _run(sub, "add", "."); _run(sub, "commit", "-qm", "s0",
                                env_ts="2024-01-01T00:00:00Z")

    repo = str(tmp_path / "host")
    os.makedirs(repo)
    _run(repo, "init", "-q", "-b", "main")
    _write(repo, "a.txt", "text\n")
    raw = bytes([0xFF, 0x00, 0x89, 0x50, 0x4E, 0x47, 0xFE])
    with open(os.path.join(repo, "img.bin"), "wb") as f:
        f.write(raw)
    _run(repo, "add", ".")
    _run(repo, "-c", "protocol.file.allow=always", "submodule", "add",
         "-q", sub, "vendor/sub")
    _run(repo, "commit", "-qm", "c0", env_ts="2024-01-01T00:00:00Z")

    events = gitsync.events_from_git(spark, repo, "org/host")
    rows = {r["path"]: r for r in events.collect()}
    assert "vendor/sub" not in rows          # gitlink filtered
    assert ".gitmodules" in rows             # the config file IS a blob
    assert rows["a.txt"]["is_binary"] is False
    assert rows["a.txt"]["content"] == "text\n"
    import base64
    assert rows["img.bin"]["is_binary"] is True
    assert base64.b64decode(rows["img.bin"]["content"]) == raw
    assert rows["img.bin"]["size_bytes"] == len(raw)

    lossy = gitsync.events_from_git(spark, repo, "org/host",
                                    on_binary="replace")
    got = {r["path"]: r["content"] for r in lossy.collect()}
    assert "�" in got["img.bin"]


def test_blob_to_gitlink_typechange_emits_delete(spark, registry, tmp_path):
    """A path that starts life as a regular file and is later REPLACED by a
    submodule gitlink (raw status T, dst mode 160000) must emit a DELETE —
    skipping it like other gitlink events would leave stale file content at
    a path HEAD's tree no longer has as a blob, breaking convergence."""
    repo = str(tmp_path / "r")
    os.makedirs(repo)
    _run(repo, "init", "-q", "-b", "main")
    _write(repo, "vendor/lib", "old blob\n")
    _write(repo, "keep.txt", "keep\n")
    _run(repo, "add", "."); _run(repo, "commit", "-qm", "c0",
                                 env_ts="2024-01-01T00:00:00Z")
    head = subprocess.run(
        ["git", "-C", repo, "rev-parse", "HEAD"], check=True,
        capture_output=True, text=True).stdout.strip()
    # replace the blob with a gitlink at the SAME path (mode 100644→160000)
    # via plumbing: the pointed-to commit need not be fetchable — exactly
    # the hydration hazard the listing-time filter exists for
    _run(repo, "update-index", "--add", "--cacheinfo",
         f"160000,{head},vendor/lib")
    _run(repo, "commit", "-qm", "c1", env_ts="2024-01-02T00:00:00Z")

    events = gitsync.events_from_git(spark, repo, "org/r")
    ops = {(r["path"], r["rev"]): r["op"] for r in events.collect()}
    assert ops[("vendor/lib", 0)] == OP_INSERT
    assert ops[("vendor/lib", 1)] == OP_DELETE   # not silently skipped

    ev_dir = str(tmp_path / "events")
    events.write.partitionBy("checkpoint_epoch").parquet(ev_dir)
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=4)
    empty = spark.createDataFrame([], "repo string, path string")
    eng.replay(ev_dir, source_df=empty, schema_version="1.1")
    assert {r["path"] for r in eng.read_final().collect()} == {"keep.txt"}


def test_newline_path_rejected_at_listing(spark, tmp_path):
    """git permits a committed path containing a newline, but this git's
    cat-file batch protocol (< 2.42, no -Z) cannot query it — the listing
    must fail loudly BEFORE emitting events, not desync hydration later."""
    import pytest

    repo = str(tmp_path / "nl")
    subprocess.run(["git", "init", "-q", repo], check=True)
    with open(os.path.join(repo, "a\nb.txt"), "w") as f:
        f.write("x")
    env = {**os.environ,
           "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True, env=env)
    subprocess.run(["git", "-C", repo, "commit", "-qm", "c"],
                   check=True, env=env)
    with pytest.raises(ValueError, match="newline"):
        gitsync.list_change_events(repo, "org/nl")


def test_non_utf8_path_raises_named_error():
    """A latin-1 filename in history must fail with repo/commit/path named
    and a remediation, not a bare UnicodeDecodeError."""
    import pytest

    from cdc_core_spark.sources.gitsync import _unquote

    with pytest.raises(ValueError, match="not valid UTF-8"):
        _unquote('"caf\\351.txt"')
    assert _unquote('"caf\\303\\251.txt"') == "café.txt"  # utf-8 ok
