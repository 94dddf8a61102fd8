"""Lifecycle guarantees of the gate scratch-root helper.

The disk-backed gate wrappers in ``__spark_entry__`` share ``_scratch``:
per-PID roots so concurrent drivers can never rmtree each other's live
tables, a PID-liveness (never age-based) sweep of dead siblings, and an
embedded-Derby unboot before a database directory is cleared — without
which a same-JVM re-invocation reconnects to a stale booted instance
pointing at deleted inodes."""

import os
import subprocess

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_scratch_is_per_pid_and_clears_own_root():
    root = entry._scratch("utest", SF)
    assert f"pid{os.getpid()}" in root
    os.makedirs(root)
    marker = os.path.join(root, "m.txt")
    open(marker, "w").write("x")
    # clear=True removes this process's previous invocation...
    assert not os.path.exists(entry._scratch("utest", SF))
    # ...and clear=False leaves it alone
    os.makedirs(root)
    open(marker, "w").write("x")
    entry._scratch("utest", SF, clear=False)
    assert os.path.exists(marker)


def test_scratch_sweeps_dead_pids_but_spares_live_ones():
    parent = os.path.dirname(entry._scratch("utest2", SF))
    # a PID guaranteed dead: a subprocess that already exited (and was
    # reaped, so kill(0) raises ProcessLookupError)
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = os.path.join(parent, f"pid{proc.pid}")
    os.makedirs(dead, exist_ok=True)
    # a PID guaranteed alive: our parent process
    live = os.path.join(parent, f"pid{os.getppid()}")
    os.makedirs(live, exist_ok=True)
    entry._scratch("utest2", SF)
    assert not os.path.exists(dead), "dead sibling should be swept"
    assert os.path.exists(live), "live sibling must never be swept"
    os.rmdir(live)


def test_derby_gate_survives_same_jvm_reinvocation(spark):
    """Embedded Derby keeps a db booted for the JVM lifetime; before the
    _derby_shutdown step, rerunning a Derby gate in one process raised
    container-not-found SQLExceptions after the rmtree."""
    a = entry.q_datastore_writeback(spark, SF).count()
    b = entry.q_datastore_writeback(spark, SF).count()
    assert a == b > 0
