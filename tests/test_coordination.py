"""Heartbeat + single-writer lease (coordination.py — Heartbeat.java /
HeartbeatThread / DistributedLock analogs)."""

from __future__ import annotations

import json
import os

import pytest

from cdc_core_spark import coordination as coord
from cdc_core_spark.engine import CdcEngine


def test_process_lock_mutual_exclusion(tmp_path):
    root = str(tmp_path)
    a = coord.ProcessLock(root, owner="a").acquire()
    with pytest.raises(coord.LockHeldError, match="held by a"):
        coord.ProcessLock(root, owner="b").acquire()
    a.release()
    with coord.ProcessLock(root, owner="b"):   # context-manager form
        assert json.load(open(os.path.join(root, "_lock.json")))["owner"] == "b"
    assert not os.path.exists(os.path.join(root, "_lock.json"))


def test_process_lock_steals_stale_lease(tmp_path):
    root = str(tmp_path)
    # a "crashed" holder: lease file exists but was stamped long ago
    dead = coord.ProcessLock(root, owner="dead", ttl_ms=10).acquire()
    dead._held = False  # simulate process death without release
    import time
    time.sleep(0.05)
    b = coord.ProcessLock(root, owner="b", ttl_ms=10).acquire()
    assert json.load(open(b.path))["owner"] == "b"
    b.release()
    # steal_stale=False must refuse instead
    coord.ProcessLock(root, owner="dead2", ttl_ms=10).acquire()._held = False
    time.sleep(0.05)
    with pytest.raises(coord.LockHeldError):
        coord.ProcessLock(root, owner="c", ttl_ms=10,
                          steal_stale=False).acquire()


def test_heartbeat_roundtrip_and_staleness(tmp_path):
    root = str(tmp_path)
    assert coord.read_heartbeat(root, "e") is None
    assert coord.is_stale(None, ttl_ms=1000)
    hb = coord.write_heartbeat(root, "e", "running", epoch=3)
    got = coord.read_heartbeat(root, "e")
    assert got["state"] == "running" and got["epoch"] == 3
    assert not coord.is_stale(got, ttl_ms=60_000)
    assert coord.is_stale(got, ttl_ms=1,
                          now_ms=got["timestamp_ms"] + 1000)
    assert hb["pid"] == os.getpid()


def test_replay_lease_blocks_second_driver_and_beats(spark, t1, registry,
                                                     tmp_path):
    root = str(tmp_path / "e")
    eng = CdcEngine(spark, root, registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    # a competing holder owns the table → replay fails fast, commits nothing
    other = coord.ProcessLock(root, owner="other-driver").acquire()
    with pytest.raises(coord.LockHeldError):
        eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    assert not eng.table.exists()
    other.release()
    # normal run: lease released afterwards, heartbeat converges to idle
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    assert not os.path.exists(os.path.join(root, "_lock.json"))
    hb = coord.read_heartbeat(root, "source_repos")
    assert hb["state"] == "idle" and hb["epoch"] == 7
    # rerun (all committed) stays idle and still releases the lease
    eng.replay(f'{t1["dir"]}/change_events')
    assert coord.read_heartbeat(root, "source_repos")["state"] == "idle"
    assert not os.path.exists(os.path.join(root, "_lock.json"))


def test_renew_and_release_respect_stolen_lease(tmp_path):
    """Fencing: a holder that stalls past its TTL and loses the lease to a
    stealer must (a) learn the loss on renew instead of clobbering the new
    holder's lock, and (b) never delete the new holder's lock on release."""
    import time

    root = str(tmp_path)
    a = coord.ProcessLock(root, owner="a", ttl_ms=10).acquire()
    time.sleep(0.05)                       # a stalls past its TTL
    b = coord.ProcessLock(root, owner="b").acquire()   # steals the lease
    with pytest.raises(coord.LockHeldError, match="held by b"):
        a.renew()
    assert not a._held
    a.release()                            # no-op after the failed renew
    assert json.load(open(b.path))["owner"] == "b"
    b.renew()                              # rightful holder still renews
    b.release()
    assert not os.path.exists(b.path)

    # release WITHOUT a prior renew must also leave the thief's lock alone
    c = coord.ProcessLock(root, owner="c", ttl_ms=10).acquire()
    time.sleep(0.05)
    d = coord.ProcessLock(root, owner="d").acquire()
    c.release()                            # still thinks it holds — stolen
    assert json.load(open(d.path))["owner"] == "d"
    d.release()


def test_unreadable_lock_husk_is_stealable_by_mtime(tmp_path):
    """A writer killed mid-initial-write leaves an empty/torn _lock.json
    with no readable doc. A fresh husk must fail closed (a racer may be
    mid-write), but once its mtime is older than the ttl it must be
    stolen — otherwise every future acquire raises until manual cleanup."""
    import os
    import time

    import pytest

    from cdc_core_spark.coordination import LockHeldError, ProcessLock

    root = str(tmp_path / "t")
    os.makedirs(root)
    husk = os.path.join(root, "_lock.json")
    with open(husk, "w") as f:
        f.write("{\"truncat")          # torn doc: json.load fails

    # fresh husk: fail closed
    with pytest.raises(LockHeldError):
        ProcessLock(root, ttl_ms=60_000).acquire()

    # stale husk (mtime pushed past ttl): steal succeeds
    old = time.time() - 120
    os.utime(husk, (old, old))
    lock = ProcessLock(root, ttl_ms=60_000).acquire()
    assert lock._held
    lock.release()
