"""Table maintenance: tombstone expiry + compaction keep visible state intact."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cdc_core_spark.engine import CdcEngine

from tests.conftest import assert_final_equal


def test_expire_and_compact_preserve_state(spark, t1, registry, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)

    internal = eng.table.read(spark, with_internal_cols=True)
    n_tomb = internal.filter("_deleted").count()
    assert n_tomb > 0  # the fixture deletes ~15% of keys

    max_ts = internal.agg(F.max("_op_ts")).collect()[0][0]
    eng.expire_tombstones(watermark_op_ts=max_ts + 1)
    after = eng.table.read(spark, with_internal_cols=True)
    assert after.filter("_deleted").count() == 0
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])

    n_files_before = len(eng.table.latest().files)
    eng.compact()
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])
    # compaction leaves exactly one file group (current schema) per bucket
    snap = eng.table.latest()
    assert len({f["schema_id"] for f in snap.files}) == 1
    assert len(snap.files) <= max(n_files_before, 8)


def test_compact_every_bounds_delta_depth(spark, t1, registry, tmp_path):
    """replay(compact_every=3) re-bases mid-run: final state identical, and
    at most the last (epochs % 3) epochs' delta layers remain un-based."""
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src, compact_every=3)
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])
    snap = eng.table.latest()
    delta_commits = {f["path"].split("/")[1] for f in snap.files
                     if f.get("kind") == "delta"}
    assert len(delta_commits) <= 2  # 8 epochs, compacted after 3 and 6


def test_old_snapshots_remain_readable(spark, t1, registry, tmp_path):
    """Time travel: every published snapshot stays readable (files are never
    deleted by commits — the snapshot log is an immutable chain)."""
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src, epochs=[0, 1])
    import json
    logs = sorted(glob.glob(os.path.join(str(tmp_path / "e"), "target", "_log", "v*.json")))
    with open(logs[1]) as f:  # snapshot after initial load
        from cdc_core_spark.lake import Snapshot
        snap0 = Snapshot(**json.load(f))
    rows_then = eng.table.read(spark, snap=snap0).count()
    assert rows_then == src.count()  # initial-load state still reconstructable
