"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Headline metric (the JSON `value`): wall seconds of the 20M-event `scale`
fixture replay-to-converged-table, median of 5 fresh-state runs — chosen
over the sf-sized fixture because its round-over-round signal is stable
while the small fixture swings ±20% with host windows (disclosed in
extras). Per-query walls at $SPARK_GRAFT_SF_DIR ride in `queries`, the
sf-fixture replay and throughputs in `extras`.

    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[] cores (default 32)
    CDC_BENCH_SCALE      override fixture scale (t1|t2|bench)

Fixture generation is cached under /tmp/cdc_bench_cache (untimed); the timed
region is engine work only: initial load + 8-epoch replay (LWW reduce +
bucket-pruned merge + manifest commits).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# map testdata scale → synthetic CDC fixture scale
# sf0.1 maps to the 5M-event "bench" fixture: the 500k-event t2 replay is
# per-epoch-overhead-bound (~22k ev/s) and misrepresents engine throughput,
# while bench costs only ~3s more wall and amortizes to ~190k ev/s
_SCALE_BY_SF = {"sf0.001": "t1", "sf0.01": "t1", "sf0.1": "bench"}
FIXTURE_SCALE = os.environ.get(
    "CDC_BENCH_SCALE", _SCALE_BY_SF.get(os.path.basename(SF_DIR.rstrip("/")), "t2"))

from cdc_core_spark.synth import DEFAULT_CACHE as CACHE  # one shared cache root

# (bench key → entry-module FUNCTION name): keys stay stable across rounds
# for BENCH_r{N} comparability even where the GATE dict consolidated several
# operators into one oracle entry — the bench measures the pure single
# operator, not the consolidated gate wrapper (whose extra equality/union
# work is verification overhead, not operator cost)
HEADLINE_QUERIES = [
    ("cdc_lww_latest", "q_cdc_lww_latest"),
    ("cdc_lww_salted", "q_cdc_lww_salted"),
    ("cdc_merge_state", "q_cdc_merge_state"),
    ("cdc_running_window", "q_cdc_running_window"),
    ("tumbling_window", "q_tumbling_window"),
    ("session_window", "q_session_window"),
    ("json_extract", "q_json_extract"),
    ("asof_join", "q_asof_join_bench"),
    ("range_join", "q_range_join"),
    ("pricing_summary", "q_pricing_summary"),
    ("revenue_by_nation", "q_revenue_by_nation"),
    ("anti_semi_setops", "q_anti_semi_setops"),
    ("cube", "q_cube"),
    ("rules_pipeline", "q_rules_pipeline"),
    ("decision_table", "q_decision_table"),
    ("text_search", "q_text_search_bench"),
    ("dedup_exact", "q_dedup_exact"),
    ("minhash_near_dupes", "q_minhash_near_dupes"),
    ("text_stats", "q_text_stats"),
    ("ann_cosine_topk", "q_ann_cosine_topk"),
    ("embedding_pairs_exact", "q_embedding_pairs_exact"),
]

# hash-heavy Python/Arrow paths wobble ±30% on first run from codegen +
# Arrow-worker warmup (r1→r2 minhash 4.36→4.75s vs 3.4s steady state);
# report the STEADY-STATE MEDIAN of 3 runs for these, methodology noted in
# the output JSON
MEDIAN_OF_3 = {"minhash_near_dupes"}


def ensure_fixture(scale: str) -> str:
    from cdc_core_spark import synth
    return synth.ensure_fixture(CACHE, scale)  # fingerprinted cache marker


def bench_replay(spark, fxdir: str, runs: int = 3,
                 warmup: bool = False) -> dict:
    """Median of ``runs`` FULL replays (fresh state dir each): this shared
    host's sustainable throughput drifts ±20% between windows (BASELINE.md),
    which would otherwise dominate the round-over-round comparison of the
    single most expensive headline entry. All walls are disclosed.
    ``warmup=True`` runs one untimed replay first — the big `scale` fixture's
    first pass is page-cache-cold (measured 2× the steady wall), which is a
    storage artifact, not engine throughput."""
    from pyspark.sql import functions as F
    from cdc_core_spark.engine import CdcEngine
    from cdc_core_spark.registry import SchemaRegistry
    from cdc_core_spark import synth

    reg = SchemaRegistry.from_docs(synth.registry_docs())
    src = spark.read.parquet(os.path.join(fxdir, "source_repos.parquet"))
    events_path = os.path.join(fxdir, "change_events")
    n_events = spark.read.parquet(events_path).count()

    walls, applied, n_final = [], 0, 0
    for i in range(-1 if warmup else 0, runs):
        root = os.path.join(CACHE, f"engine_run_{os.getpid()}_{i}")
        shutil.rmtree(root, ignore_errors=True)
        # flush the PREVIOUS run's dirty pages (written state + rmtree
        # metadata) before starting the clock: r4's first timed run paid
        # 2-3x for the warmup's deferred writeback landing mid-replay
        # (BENCH_r04 runs_sec [79.8, 37.0, 23.7] despite the warmup)
        os.sync()
        eng = CdcEngine(spark, root, reg, n_buckets=32)
        t0 = time.monotonic()
        eng.replay(events_path, source_df=src)
        n_final = eng.count_final()   # keys-only projected fold (see engine)
        if i >= 0:
            walls.append(time.monotonic() - t0)
        mf = eng.manifests_df().toPandas()
        applied = int(mf[mf.checkpoint_epoch >= 0]["events_read"].sum())
        shutil.rmtree(root, ignore_errors=True)
    wall = sorted(walls)[len(walls) // 2]
    return {"sec": round(wall, 3), "events": n_events, "events_applied": applied,
            "events_per_sec": round(applied / wall, 1), "final_rows": n_final,
            "runs_sec": [round(w, 3) for w in walls],
            "run_spread_pct": round(100 * (max(walls) - min(walls))
                                    / sorted(walls)[len(walls) // 2], 1),
            "methodology": f"median of {runs} full replays, fresh state dir each"}


def bench_skew_defense(spark, fxdir: str) -> dict:
    """SURVEY §7 risk 5 evidence: LWW over the hot-repo event log via
    (a) row_number window (naive — sorts the hot partition),
    (b) max_by aggregation (map-side partial combine), and
    (c) explicit two-stage salted aggregation. Same results, different shuffles."""
    from pyspark.sql import Window, functions as F
    from cdc_core_spark.lww import lww_reduce

    ev = (spark.read.parquet(os.path.join(fxdir, "change_events"))
          .filter(F.col("op").isin(3, 4, 5) & F.col("repo").isNotNull())
          .select("repo", "path", "content",
                  F.col("op_ts").alias("_op_ts"), F.col("event_seq").alias("_event_seq")))
    out = {}
    t0 = time.monotonic()
    w = Window.partitionBy("repo", "path").orderBy(F.desc("_op_ts"), F.desc("_event_seq"))
    (ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
     .write.format("noop").mode("overwrite").save())
    out["window_row_number_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lww_reduce(ev, ["repo", "path"], ["content"]).write.format("noop").mode("overwrite").save()
    out["max_by_agg_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lww_reduce(ev, ["repo", "path"], ["content"], salt=8).write.format("noop").mode("overwrite").save()
    out["salted_two_stage_sec"] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    from cdc_core_spark.session import get_spark
    import __spark_entry__ as entry

    fxdir = ensure_fixture(FIXTURE_SCALE)
    spark = get_spark(app_name="cdc_bench", cores=CPUS)

    queries: dict[str, float] = {}
    replay = bench_replay(spark, fxdir)
    queries["cdc_replay"] = replay["sec"]

    # HEADLINE value: the 20M-event `scale` fixture replay. The sf0.1-sized
    # fixture's median swings ±20% with host windows (BENCH_r03 extras:
    # 18.2–26.5s same-build) — round-over-round deltas drowned in noise —
    # while the scale fixture has been stable across rounds (502.9k→506.9k
    # ev/s r2→r3). Per-query walls keep the sf fixture for comparability.
    scale_replay = bench_replay(spark, ensure_fixture("scale"), runs=5,
                                warmup=True)

    for name, fn_name in HEADLINE_QUERIES:
        fn = getattr(entry, fn_name)
        runs = 3 if name in MEDIAN_OF_3 else 1
        walls = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        queries[name] = round(sorted(walls)[len(walls) // 2], 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "scale_replay_sec (20M-event replay-to-converged-table, "
                  "median of 5; events_per_sec in extras.scale_replay; "
                  "per-query walls + headline_total_sec in queries/extras)",
        "value": scale_replay["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "extras": {
            "fixture_scale": FIXTURE_SCALE,
            "cpus": CPUS,
            "headline_total_sec": total,
            "scale_replay": scale_replay,
            "replay": replay,
            "skew_defense": bench_skew_defense(spark, fxdir),
            "methodology": {
                **{q: "steady-state median of 3 runs "
                      "(codegen/Arrow warmup excluded)"
                   for q in sorted(MEDIAN_OF_3)},
                "asof_join": "window plan pinned (q_asof_join_bench) - the "
                              "auto-probe cost is right-side-dependent "
                              "and excluded from the operator wall",
                "scale_replay": "one untimed warmup replay (cold page "
                                "cache), then median of 5; os.sync() "
                                "between runs keeps deferred writeback "
                                "out of the timed region",
                "text_stats": "consolidated gate since r4 (adds "
                              "fingerprint + PII scrub/count + repetition "
                              "ratio columns) — not wall-comparable to "
                              "r<=3 entries",
            },
            "scaling": "see BENCH_SCALING.json (N-vs-4N spark-submit runs)",
        },
    }
    sys.stdout.write("\n" + json.dumps(out) + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
