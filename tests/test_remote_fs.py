"""Remote-filesystem parity layer: URI/conf resolution for object stores +
the incremental sync protocol (RemoteFsCache analog) under the tested
LocalBackend; SftpBackend is import-gated (no SSH libs in sandbox)."""

from __future__ import annotations

import json
import os

import pytest

from cdc_core_spark.sources import remote_fs as rfs


def _write(root, rel, text):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p) or root, exist_ok=True)
    with open(p, "w") as f:
        f.write(text)


def test_spark_uri_resolution():
    uri, confs = rfs.spark_uri("s3", bucket="drop", root="in",
                               endpoint="s3.eu-west-1.amazonaws.com")
    assert uri == "s3a://drop/in"
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "s3.eu-west-1.amazonaws.com"
    uri, confs = rfs.spark_uri("azure", container="c", account="acct",
                               root="in", auth_type="OAuth")
    assert uri == "abfss://c@acct.dfs.core.windows.net/in"
    assert confs == {"spark.hadoop.fs.azure.account.auth.type.acct"
                     ".dfs.core.windows.net": "OAuth"}
    # s3 without optional endpoint: uri resolves, optional conf dropped
    uri, confs = rfs.spark_uri("s3", bucket="b", root="r")
    assert uri == "s3a://b/r" and confs == {}
    with pytest.raises(ValueError, match="sync_remote_dir"):
        rfs.spark_uri("sftp")
    # a typo'd settings key must fail at config time, not silently drop
    # the conf it was meant to fill (→ cluster-side default-endpoint 403)
    with pytest.raises(ValueError, match="endpont"):
        rfs.spark_uri("s3", bucket="b", root="r", endpont="s3.example.com")


def test_sync_incremental_change_detection_and_atomicity(tmp_path):
    remote = str(tmp_path / "remote")
    staging = str(tmp_path / "staging")
    _write(remote, "a.csv", "one")
    _write(remote, "sub/b.csv", "two")
    _write(remote, "junk.log", "no")
    be = rfs.LocalBackend(remote)

    landed = []
    got = rfs.sync_remote_dir(be, staging, pattern="*.csv",
                              on_file=landed.append)
    assert sorted(got) == ["a.csv", "sub/b.csv"]
    assert sorted(os.path.basename(p) for p in landed) == ["a.csv", "b.csv"]
    assert open(os.path.join(staging, "sub/b.csv")).read() == "two"
    assert not os.path.exists(os.path.join(staging, "junk.log"))

    # unchanged → no bytes move
    assert rfs.sync_remote_dir(be, staging, pattern="*.csv") == []

    # changed file (size change) re-fetches; new file arrives
    _write(remote, "a.csv", "one-changed")
    _write(remote, "c.csv", "three")
    got = rfs.sync_remote_dir(be, staging, pattern="*.csv")
    assert sorted(got) == ["a.csv", "c.csv"]
    assert open(os.path.join(staging, "a.csv")).read() == "one-changed"

    # no temp debris visible to a scan of the staging dir
    assert not [f for f in os.listdir(staging) if f.endswith(".tmp")]
    # state doc tracks every synced file
    state = json.load(open(os.path.join(staging, "_sync_state.json")))
    assert set(state) == {"a.csv", "sub/b.csv", "c.csv"}


def test_sync_crash_refetches_only_inflight_file(tmp_path):
    remote = str(tmp_path / "remote")
    staging = str(tmp_path / "staging")
    _write(remote, "a.csv", "one")
    _write(remote, "b.csv", "two")

    class FlakyBackend(rfs.LocalBackend):
        def fetch(self, relpath, dest):
            # in-flight temp names must be _-prefixed so a Spark scan of
            # the staging dir never sees them, even after SIGKILL
            assert os.path.basename(dest).startswith("_")
            if relpath == "b.csv":
                raise OSError("connection reset")
            super().fetch(relpath, dest)

    with pytest.raises(OSError):
        rfs.sync_remote_dir(FlakyBackend(remote), staging)
    # a.csv landed and is remembered; b.csv left no partial file
    assert os.path.exists(os.path.join(staging, "a.csv"))
    assert not os.path.exists(os.path.join(staging, "b.csv"))
    assert not [f for f in os.listdir(staging) if f.endswith(".tmp")]
    got = rfs.sync_remote_dir(rfs.LocalBackend(remote), staging)
    assert got == ["b.csv"]    # only the in-flight file re-fetches


def test_sftp_backend_is_import_gated():
    with pytest.raises(ImportError, match="paramiko"):
        rfs.SftpBackend("host", "user")


def test_reserved_state_name_refused_and_batched_state(tmp_path):
    """A remote file named _sync_state.json would be clobbered by the state
    republish (silently never delivered) — refused loudly. State is
    republished in batches; a final write still lands everything."""
    remote = tmp_path / "remote"
    staging = tmp_path / "staging"
    remote.mkdir()
    for i in range(7):
        (remote / f"f{i}.txt").write_text(f"v{i}")
    got = rfs.sync_remote_dir(rfs.LocalBackend(str(remote)), str(staging),
                              state_every=3)
    assert len(got) == 7
    state = json.load(open(staging / "_sync_state.json"))
    assert set(state) == {f"f{i}.txt" for i in range(7)}  # final flush
    assert rfs.sync_remote_dir(rfs.LocalBackend(str(remote)),
                               str(staging)) == []  # incremental no-op

    (remote / "_sync_state.json").write_text("{}")
    with pytest.raises(ValueError, match="reserved"):
        rfs.sync_remote_dir(rfs.LocalBackend(str(remote)), str(staging))
