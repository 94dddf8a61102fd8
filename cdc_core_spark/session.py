"""SparkSession factory tuned for the local[32] sandbox but written for scale.

The settings mirror what we would set on a 1000-executor cluster: AQE on
(runtime re-plan + skew-join splitting), Arrow transfers on (every pandas UDF
path is Arrow-batched), explicit shuffle parallelism. Only
``spark.driver.memory`` is sandbox-specific (local mode = single JVM).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdc_core_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` drives both the local master thread count and the default
    shuffle parallelism; pass ``cores=8`` / ``cores=32`` to reproduce the
    N-vs-4N scaling measurement from BASELINE.md.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores * 2, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd over snappy: measured on the 20M-event scale replay
        # (interleaved A/B, one JVM, 4 runs each) the wall is equal at best
        # case (24.0 vs 23.1s) but zstd's spread is 24.0-25.9s where snappy
        # swings 23.1-37.7s — snappy writes 1.85× the bytes (870 vs 470 MB
        # converged state), so it stalls on dirty-page writeback whenever the
        # host is flushing. At 100 TB the 1.85× matters twice more: state at
        # rest and every bandwidth-bound shuffle/replication hop.
        # This session default covers USER writes; engine-owned state writes
        # pin the codec per-write (fsutil.parquet_codec) so a caller-built
        # session under spark-submit gets the same bytes (test-pinned).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # level 1, not parquet-mr's default 3: ~22% faster scale-replay
        # wall at equal-or-smaller bytes on this data (measured —
        # fsutil.parquet_zstd_level docstring has the protocol)
        .config("spark.hadoop.parquet.compression.codec.zstd.level",
                os.environ.get("CDC_PARQUET_ZSTD_LEVEL", "1"))
        .config("spark.driver.memory", os.environ.get("CDC_DRIVER_MEM", "24g"))
        # MOR fold reads open many explicit file paths per snapshot; above
        # this threshold Spark launches a whole JOB just to LIST them —
        # measured 0.16-0.35s + scheduling per listing on the replay path
        # (round-5 event-log decomposition), pure serial overhead on a
        # local/posix store where driver-side threaded listing is
        # microseconds. 4096 matches the manifest-list sidecar cutoff; on
        # an object store tune back down if driver listing ever dominates.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
