"""temporal_table_join: Flink-style versioned temporal join over the lake
changelog, checked against an independent pandas point-in-time model built
from the fixture (committed versions = per-epoch LWW winners + initial
load; tombstone or pre-existence => NULL enrichment)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cdc_core_spark import oracle
from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.operators.temporal import temporal_table_join
from cdc_core_spark.synth import OP_DELETE

PAY = ["language", "content", "size_bytes", "rev"]


def _versions(fx, repo, path):
    """Committed version set for one key: per-epoch LWW winners with their
    (op_ts, event_seq) position, plus the initial-load row at -inf."""
    ev = fx.change_events
    ev = ev[oracle.is_valid_event(ev)]
    k = ev[(ev["repo"] == repo) & (ev["path"] == path)].copy()
    k["language"] = k["language"].combine_first(k["lang"])
    vers = (k.sort_values(["op_ts", "event_seq"], kind="stable")
            .groupby("checkpoint_epoch").tail(1))
    out = []
    src = fx.source_repos
    init = src[(src["repo"] == repo) & (src["path"] == path)]
    if len(init):
        row = init.iloc[0]
        out.append({"valid_from": -float("inf"), "event_seq": -1,
                    "deleted": False, "language": row["lang"],
                    "content": row["content"], "size_bytes": None,
                    "rev": None})
    for _, r in vers.iterrows():
        out.append({"valid_from": r["op_ts"], "event_seq": r["event_seq"],
                    "deleted": r["op"] == OP_DELETE,
                    "language": r["language"], "content": r["content"],
                    "size_bytes": r["size_bytes"], "rev": r["rev"]})
    return out


def _expected_at(vers, ts):
    cands = [v for v in vers if v["valid_from"] <= ts]
    if not cands:
        return None
    best = max(cands, key=lambda v: (v["valid_from"], v["event_seq"]))
    return None if best["deleted"] else best


def _nz(v):
    try:
        if pd.isna(v):  # None, float NaN, pandas NA alike
            return None
    except (TypeError, ValueError):
        pass
    return v


@pytest.mark.parametrize("broadcast", [False, True])
def test_temporal_table_join_matches_point_in_time_model(
        spark, t1, registry, tmp_path, broadcast):
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)

    ev = t1["fx"].change_events
    ev = ev[oracle.is_valid_event(ev)]
    busiest = (ev.groupby(["repo", "path"])["checkpoint_epoch"].nunique()
               .sort_values(ascending=False).head(3).index.tolist())

    probes, expect = [], []
    pid = 0
    for repo, path in busiest:
        vers = _versions(t1["fx"], repo, path)
        for v in vers:
            if v["valid_from"] == -float("inf"):
                continue
            for dt in (-1, 0, 1):
                ts = int(v["valid_from"]) + dt
                probes.append((pid, repo, path, ts))
                expect.append((pid, _expected_at(vers, ts)))
                pid += 1
    probe_df = spark.createDataFrame(
        pd.DataFrame(probes, columns=["pid", "repo", "path", "ts"]),
        "pid long, repo string, path string, ts long")

    got = (temporal_table_join(spark, probe_df, eng.table, "ts",
                               payload=PAY, broadcast=broadcast)
           .toPandas().set_index("pid"))
    for pid, exp in expect:
        row = got.loc[pid]
        if exp is None:
            assert _nz(row["language"]) is None, (pid, row)
            assert _nz(row["content"]) is None, (pid, row)
        else:
            assert _nz(row["language"]) == _nz(exp["language"]), (pid, row, exp)
            assert _nz(row["content"]) == _nz(exp["content"]), (pid, row, exp)
            assert _nz(row["size_bytes"]) == _nz(exp["size_bytes"]), (
                pid, row, exp)
            assert _nz(row["rev"]) == _nz(exp["rev"]), (pid, row, exp)


def test_temporal_table_join_preimage(spark, t1, registry, tmp_path):
    """allow_exact_matches=False = the PRE-image: probing at a committed
    version's own timestamp returns the version strictly before it —
    equal to the inclusive join at ts-1 for every probe (the fixture's
    timestamps are >1ms apart per key, so the shift crosses no other
    version)."""
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    ev = t1["fx"].change_events
    ev = ev[oracle.is_valid_event(ev)]
    busiest = (ev.groupby(["repo", "path"])["checkpoint_epoch"].nunique()
               .sort_values(ascending=False).head(2).index.tolist())
    rows = []
    pid = 0
    for repo, path in busiest:
        for v in _versions(t1["fx"], repo, path):
            if v["valid_from"] == -float("inf"):
                continue
            rows.append((pid, repo, path, int(v["valid_from"])))
            pid += 1
    probe = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "repo", "path", "ts"]),
        "pid long, repo string, path string, ts long")
    pre = (temporal_table_join(spark, probe, eng.table, "ts", payload=PAY,
                               allow_exact_matches=False)
           .toPandas().set_index("pid").sort_index())
    shifted = probe.withColumn("ts", probe["ts"] - 1)
    incl = (temporal_table_join(spark, shifted, eng.table, "ts",
                                payload=PAY)
            .toPandas().set_index("pid").sort_index())
    for c in PAY:
        a = [_nz(v) for v in pre[c]]
        b = [_nz(v) for v in incl[c]]
        assert a == b, c


def test_temporal_table_join_forwards_max_history(spark, t1, registry,
                                                  tmp_path):
    """The broadcast guard knob must be reachable from this API level —
    max_history=1 trips on any multi-version fixture key, the default
    does not (regression: the knob used to be unforwardable)."""
    import pytest
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    probe = spark.createDataFrame(
        [(0, "r0", "p0", 10**15)], "pid long, repo string, path string, ts long")
    with pytest.raises(Exception, match="max_history"):
        temporal_table_join(spark, probe, eng.table, "ts",
                            payload=["content"], broadcast=True,
                            max_history=1).collect()
    got = temporal_table_join(spark, probe, eng.table, "ts",
                              payload=["content"], broadcast=True)
    assert got.count() == 1


def test_temporal_table_join_initial_load_floor(spark, t1, registry,
                                                tmp_path):
    """A probe before every change event (the engine stamps the initial
    load at LWW position (-1,-1), below every real epoch-ms timestamp)
    still sees the initial snapshot row, and an unknown key enriches to
    NULL."""
    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=8)
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    row = t1["fx"].source_repos.iloc[0]
    probe = spark.createDataFrame(
        [(0, row["repo"], row["path"], 0),
         (1, "no-such-repo", "nope", 10**15)],
        "pid long, repo string, path string, ts long")
    got = (temporal_table_join(spark, probe, eng.table, "ts",
                               payload=["content"])
           .toPandas().set_index("pid"))
    assert got.loc[0, "content"] == row["content"]
    assert _nz(got.loc[1, "content"]) is None
