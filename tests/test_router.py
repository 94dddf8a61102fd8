"""Multi-entity dispatch (router.py): one mixed change stream, one engine per
targetEntity, pushed-down routing filters, unroutable-row DLQ, exactly-once
on rerun. Reference: AvroChangeRecord targetDomain/targetEntity
(entity/.../model/AvroChangeRecord.java:42-99), per-entity store resolution
(entity/.../manager/SchemaManager.java:44-445)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cdc_core_spark import synth
from cdc_core_spark.engine import CdcEngine
from cdc_core_spark.registry import SchemaRegistry
from cdc_core_spark.router import route_replay, unroutable_df

TICKET_DOCS = [{
    "entity": "tickets", "major": 1, "minor": 0, "aliases": {},
    "fields": [
        {"name": "ticket_id", "type": "string", "nullable": False, "key": True},
        {"name": "status", "type": "string", "nullable": True},
        {"name": "content", "type": "string", "nullable": True},
    ],
}]

COLS = ["op", "target_entity", "repo", "path", "commit", "lang", "language",
        "content", "size_bytes", "rev", "ticket_id", "status",
        "op_ts", "event_seq", "txid", "schema_version", "checkpoint_epoch"]


def _ev(op, entity, epoch, seq, ts, **kw):
    row = {c: None for c in COLS}
    row.update(op=op, target_entity=entity, checkpoint_epoch=epoch,
               event_seq=seq, op_ts=ts, txid=seq, schema_version="1.0", **kw)
    return row


@pytest.fixture()
def mixed_stream(tmp_path):
    rows = [
        # source_repos: (r1,p1) insert→update; (r1,p2) insert→delete; (r2,p1) insert
        _ev(3, "source_repos", 0, 1, 100, repo="r1", path="p1", content="v1", lang="go", rev=1),
        _ev(4, "source_repos", 1, 2, 200, repo="r1", path="p1", content="v2", lang="go", rev=2),
        _ev(3, "source_repos", 0, 3, 100, repo="r1", path="p2", content="x", lang="py", rev=1),
        _ev(5, "source_repos", 1, 4, 300, repo="r1", path="p2"),
        _ev(3, "source_repos", 1, 5, 150, repo="r2", path="p1", content="y", lang="md", rev=1),
        # tickets: t1 open→closed; t2 open; one malformed (null key)
        _ev(3, "tickets", 0, 6, 110, ticket_id="t1", status="open", content="c1"),
        _ev(4, "tickets", 1, 7, 210, ticket_id="t1", status="closed", content="c2"),
        _ev(3, "tickets", 0, 8, 120, ticket_id="t2", status="open", content="c3"),
        _ev(4, "tickets", 1, 9, 130, status="lost"),
        # unroutable: null target ×2, unknown target ×1
        _ev(3, None, 0, 10, 140, repo="r9", path="p9", content="z"),
        _ev(4, None, 1, 11, 141, ticket_id="t9", status="?"),
        _ev(3, "ghosts", 1, 12, 142, repo="r8", path="p8", content="w"),
    ]
    ev = pd.DataFrame(rows, columns=COLS)
    for c in ("target_entity", "repo", "path", "commit", "lang", "language",
              "content", "ticket_id", "status", "schema_version"):
        ev[c] = ev[c].astype("string")
    for c in ("op", "size_bytes", "rev"):
        ev[c] = pd.array(ev[c], dtype="Int64")
    out = str(tmp_path / "events")
    for ep, part in ev.groupby("checkpoint_epoch"):
        pdir = os.path.join(out, f"checkpoint_epoch={ep}")
        os.makedirs(pdir, exist_ok=True)
        part.drop(columns=["checkpoint_epoch"]).to_parquet(
            os.path.join(pdir, "part-0.parquet"), index=False)
    return out


def _setup(spark, tmp_path):
    repos_reg = SchemaRegistry.from_docs(synth.registry_docs())
    tick_reg = SchemaRegistry.from_docs(TICKET_DOCS)
    engines = {
        "source_repos": CdcEngine(spark, str(tmp_path / "repos"), repos_reg,
                                  n_buckets=4),
        "tickets": CdcEngine(spark, str(tmp_path / "tick"), tick_reg,
                             entity="tickets", n_buckets=4),
    }
    sources = {
        "source_repos": spark.createDataFrame(
            [], schema="repo string, path string, commit string, lang string, content string"),
        "tickets": spark.createDataFrame(
            [], schema="ticket_id string, status string, content string"),
    }
    return engines, sources


def test_route_replay_dispatches_and_quarantines(spark, tmp_path, mixed_stream):
    engines, sources = _setup(spark, tmp_path)
    dlq = str(tmp_path / "unroutable")
    route_replay(spark, mixed_stream, engines, sources=sources,
                 unroutable_dir=dlq)

    repos = {(r["repo"], r["path"]): r for r in
             engines["source_repos"].read_final().collect()}
    assert set(repos) == {("r1", "p1"), ("r2", "p1")}  # (r1,p2) deleted
    assert repos[("r1", "p1")]["content"] == "v2"

    ticks = {r["ticket_id"]: r for r in engines["tickets"].read_final().collect()}
    assert set(ticks) == {"t1", "t2"}
    assert ticks["t1"]["status"] == "closed"

    # per-entity DLQ: the null-key tickets row quarantined by the tickets
    # engine only; cross-entity rows never bleed into another engine's DLQ
    assert engines["tickets"].errors_df().count() == 1
    assert engines["source_repos"].errors_df().count() == 0
    bad = unroutable_df(spark, dlq)
    assert bad.count() == 3
    assert bad.filter(F.col("error_reason") == "unroutable_entity").count() == 3


def test_route_replay_rerun_is_noop(spark, tmp_path, mixed_stream):
    engines, sources = _setup(spark, tmp_path)
    dlq = str(tmp_path / "unroutable")
    route_replay(spark, mixed_stream, engines, sources=sources, unroutable_dir=dlq)
    mf_before = {n: e.manifests_df().count() for n, e in engines.items()}
    route_replay(spark, mixed_stream, engines, sources=sources, unroutable_dir=dlq)
    assert {n: e.manifests_df().count() for n, e in engines.items()} == mf_before
    assert engines["source_repos"].read_final().count() == 2
    assert engines["tickets"].read_final().count() == 2
    assert unroutable_df(spark, dlq).count() == 3  # overwrite, not append


def test_routing_filter_is_pushed_to_scan(spark, tmp_path, mixed_stream):
    """The router's per-entity predicate must reach the parquet scan — at
    10^10 events each entity's replay reads only its rows."""
    events = spark.read.parquet(mixed_stream)
    routed = events.filter(F.col("target_entity") == "tickets")
    jvm = spark._jvm
    p = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        routed._jdf.queryExecution(), "formatted")
    assert "EqualTo(target_entity,tickets)" in p.replace(" ", "")


def test_unroutable_df_scheme_aware_probe(spark, tmp_path):
    """Never-written DLQ -> empty minimal frame (via a READ probe, not
    os.path — an object-store DLQ would otherwise read back empty)."""
    from cdc_core_spark.router import unroutable_df
    empty = unroutable_df(spark, str(tmp_path / "never_written"))
    assert empty.count() == 0 and empty.columns == ["error_reason"]
