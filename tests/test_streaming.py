"""Structured Streaming ingest: tail the event-log dir as a file stream,
converge to the same final state as the batch replay / oracle."""

from __future__ import annotations

import glob
import os

from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.streaming.stream import stream_ingest

from tests.conftest import assert_final_equal


def test_stream_ingest_converges(spark, t1, registry, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.initial_load(src, "1.0")
    stream_ingest(eng, f'{t1["dir"]}/change_events', str(tmp_path / "ckpt"),
                  max_files_per_trigger=1, available_now=True)
    got = eng.read_final_with_sha().toPandas()
    assert_final_equal(got, t1["expected"])


def test_stream_restart_is_exactly_once(spark, t1, registry, tmp_path):
    """Run the stream twice against the same engine + checkpoint: second run
    has nothing new and must not change state (manifest count stable)."""
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.initial_load(src, "1.0")
    stream_ingest(eng, f'{t1["dir"]}/change_events', str(tmp_path / "ckpt"))
    n_manifests = len(eng.table.all_manifests())
    state1 = eng.read_final_with_sha().toPandas()
    stream_ingest(eng, f'{t1["dir"]}/change_events', str(tmp_path / "ckpt"))
    assert len(eng.table.all_manifests()) == n_manifests
    state2 = eng.read_final_with_sha().toPandas()
    assert_final_equal(state2, state1)
