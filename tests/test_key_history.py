"""key_history: per-key audit trail equals the independent per-epoch-winner
model; maintenance rewrites stay out unless asked for."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cdc_core_spark import oracle
from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.synth import OP_DELETE


def _valid_events(fx) -> pd.DataFrame:
    ev = fx.change_events
    return ev[oracle.is_valid_event(ev)]


def _winners_per_epoch(ev: pd.DataFrame, repo: str, path: str) -> pd.DataFrame:
    """Independent model of what each epoch committed for one key: the
    (op_ts, event_seq)-max valid event of that epoch (within-epoch dup
    deliveries collapse to the same winner by definition)."""
    k = ev[(ev["repo"] == repo) & (ev["path"] == path)]
    return (k.sort_values(["op_ts", "event_seq"], kind="stable")
            .groupby("checkpoint_epoch").tail(1)
            .sort_values("checkpoint_epoch"))


def test_key_history_matches_per_epoch_winner_model(spark, t1, registry,
                                                    tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)

    ev = _valid_events(t1["fx"])
    # the busiest key: most distinct epochs touched (maximal history)
    busiest = (ev.groupby(["repo", "path"])["checkpoint_epoch"].nunique()
               .idxmax())
    repo, path = busiest
    exp = _winners_per_epoch(ev, repo, path)

    hist = (eng.table.key_history(spark, {"repo": repo, "path": path})
            .toPandas())
    init_rows = hist[hist["op_ts"].isna()]
    applied = hist[hist["op_ts"].notna()]

    # initial snapshot load contributes exactly one 'U' row iff the key
    # was in the source table
    in_src = ((t1["fx"].source_repos["repo"] == repo)
              & (t1["fx"].source_repos["path"] == path)).any()
    assert len(init_rows) == (1 if in_src else 0)
    if in_src:
        assert init_rows.iloc[0]["op"] == "U"

    assert applied["epoch"].tolist() == exp["checkpoint_epoch"].tolist()
    assert applied["op_ts"].tolist() == exp["op_ts"].astype("int64").tolist()
    assert applied["event_seq"].tolist() == \
        exp["event_seq"].astype("int64").tolist()
    assert applied["op"].tolist() == \
        ["D" if o == OP_DELETE else "U" for o in exp["op"]]
    # COMMIT order (a later epoch may carry an earlier-timestamped
    # out-of-order event, so op_ts is NOT monotone); initial load first
    assert hist["version"].is_monotonic_increasing
    assert hist["epoch"].fillna(-1).is_monotonic_increasing


def test_key_history_excludes_maintenance_rewrites(spark, t1, registry,
                                                   tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)

    ev = _valid_events(t1["fx"])
    # a key that survives (last event not a delete) so compaction carries it
    last = (ev.sort_values(["op_ts", "event_seq"], kind="stable")
            .groupby(["repo", "path"]).tail(1))
    alive = last[last["op"] != OP_DELETE].iloc[0]
    key = {"repo": alive["repo"], "path": alive["path"]}

    before = eng.table.key_history(spark, key).toPandas()
    eng.compact()
    after = eng.table.key_history(spark, key).toPandas()
    # the rewrite adds NO logical versions to the default view...
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True))
    # ...and shows up only when explicitly asked for
    with_rw = eng.table.key_history(spark, key,
                                    include_rewrites=True).toPandas()
    assert len(with_rw) > len(after)


def test_key_history_missing_key_and_null_key(spark, t1, registry, tmp_path):
    import pytest
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src, epochs=[0])
    assert eng.table.key_history(
        spark, {"repo": "no-such", "path": "nope"}).count() == 0
    with pytest.raises(ValueError, match="non-null"):
        eng.table.key_history(spark, {"repo": "r1", "path": None})
