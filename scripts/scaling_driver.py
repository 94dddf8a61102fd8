"""spark-submit driver for the N-vs-4N scaling measurement (BASELINE.md).

Replays the seeded synthetic CDC fixture to the converged table state and
prints one ``RESULT {json}`` line with wall time + applied-events/sec.

    spark-submit --master local[8]  --py-files cdc_core_spark.zip \
        scripts/scaling_driver.py <fixture_dir> <state_root>

The timed region is engine work only (initial load + every epoch's LWW
reduce + bucket-pruned merge + manifest commit); fixture synthesis is done
beforehand by scripts/run_scaling.py. Storage layout (n_buckets) is held
constant across parallelism levels so both runs do identical logical work.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    fixture_dir, state_root = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism

    from cdc_core_spark import synth
    from cdc_core_spark.engine import CdcEngine
    from cdc_core_spark.registry import SchemaRegistry

    reg = SchemaRegistry.from_docs(synth.registry_docs())
    shutil.rmtree(state_root, ignore_errors=True)
    eng = CdcEngine(spark, state_root, reg, n_buckets=32)
    src = spark.read.parquet(os.path.join(fixture_dir, "source_repos.parquet"))
    events_path = os.path.join(fixture_dir, "change_events")
    n_events = spark.read.parquet(events_path).count()

    t0 = time.monotonic()
    eng.replay(events_path, source_df=src)
    # convergence count via the keys-only projected fold (engine.count_final)
    # — the full-payload fold is NOT part of applying events, and at scale a
    # count that shuffles every content byte is the wrong plan; state_crc
    # below still reads the full payload (untimed) and pins the result
    n_final = eng.count_final()
    wall = time.monotonic() - t0

    mf = eng.manifests_df().toPandas()
    applied = int(mf[mf.checkpoint_epoch >= 0]["events_read"].sum())
    from cdc_core_spark.oracle import state_crc
    crc = state_crc(eng.read_final_with_sha())
    out = {"cores": cores, "events": n_events, "events_applied": applied,
           "sec": round(wall, 3), "events_per_sec": round(applied / wall, 1),
           "final_rows": n_final, "state_crc": int(crc)}
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
