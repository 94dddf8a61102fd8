"""Replay-equality: the correctness contract (SURVEY.md §5.1).

Synthesize the source table + CDC event log (seeded), replay through the
engine epoch by epoch, assert per-row content sha256 equality (plus every
payload column) of the final table state against the independent pandas
oracle that applies events sequentially in (op_ts, event_seq) order per key.
"""

from __future__ import annotations

from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.oracle import expected_quarantine_count

from tests.conftest import assert_final_equal


def test_replay_matches_oracle(spark, t1, registry, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=16)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    got = eng.read_final_with_sha().toPandas()
    assert_final_equal(got, t1["expected"])
    # quarantine received exactly the malformed deliveries
    assert eng.errors_df().count() == expected_quarantine_count(t1["fx"].change_events)


def test_replay_salted_matches_oracle(spark, t1, registry, tmp_path):
    """Salting must never change results (SURVEY §7 risk 5) — full replay with
    the two-stage salted LWW path enabled."""
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=8, salt=7)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    got = eng.read_final_with_sha().toPandas()
    assert_final_equal(got, t1["expected"])


def test_schema_evolved_final_schema(spark, t1, registry, tmp_path):
    """After the three in-band episodes the target exposes v2.1: size_bytes
    added, lang renamed to language, rev widened to long (values > 2^31)."""
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    final = eng.read_final()
    dt = dict(final.dtypes)
    assert dt["language"] == "string" and "lang" not in dt
    assert dt["size_bytes"] == "bigint"
    assert dt["rev"] == "bigint"
    assert final.filter("rev > 2147483647").count() > 0  # widened values flowed
    assert eng.table.latest().props["schema_version"] == "2.1"


def test_manifest_lineage(spark, t1, registry, tmp_path):
    """Manifests exist per (epoch, partition) with correct event counts
    (FIXTURES.md §5): sum(events_read) over data epochs = valid deliveries."""
    eng = CdcEngine(spark, str(tmp_path / "eng"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    mf = eng.manifests_df().toPandas()
    data_mf = mf[mf.checkpoint_epoch >= 0]
    # uniqueness on (epoch, partition)
    assert not data_mf.duplicated(["checkpoint_epoch", "partition_id"]).any()
    ev = t1["fx"].change_events
    from cdc_core_spark.oracle import is_valid_event
    n_valid = int(is_valid_event(ev[~ev["op"].isin([0, 1, 2])]).sum())
    assert data_mf["events_read"].sum() == n_valid
    assert (data_mf["wall_ms"] >= 0).all()
    assert set(data_mf["checkpoint_epoch"].unique()) == set(range(8))
