"""Parquet bloom filters: the ``bloom_filters`` table prop rides every write.

Clustering (sort_order / zorder) only helps files a maintenance rewrite has
ordered; the hot commit path deliberately writes delta files UNSORTED, so a
point lookup there scans every row group the bucket holds. A bloom filter
per key column gives the reader statistics-independent equality skipping in
exactly those files, for ~120 KB per column per row group. These tests pin:
the filter is really in the footer of hot-path delta files (read back via
parquet-mr, pyarrow does not expose bloom metadata), it follows renames,
maintenance rewrites keep it, and the engine records/validates the prop.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_core_spark.lake import SnapshotTable, bucket_expr

FIELDS = [{"name": "k", "type": "long"}, {"name": "g", "type": "string"},
          {"name": "v", "type": "long"}]


def _bloom_offsets(spark, path: str) -> dict[str, int]:
    """column name → bloom filter offset (-1 = none) of row group 0."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(path), conf)
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    try:
        cols = rdr.getFooter().getBlocks().get(0).getColumns()
        return {str(cols.get(i).getPath().toDotString()):
                cols.get(i).getBloomFilterOffset()
                for i in range(cols.size())}
    finally:
        rdr.close()


def _rows(spark, data, ts):
    df = spark.createDataFrame(data, "k long, g string, v long, _deleted boolean")
    return (df.withColumn("_op_ts", F.lit(ts).cast("bigint"))
            .withColumn("_event_seq", F.col("k"))
            .withColumn("_bucket", bucket_expr(["k"], 2)))


def test_bloom_in_hot_path_delta_files_and_after_compact(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                             key_cols=["k"], n_buckets=2,
                             props={"bloom_filters": ["k"]})
    t.commit_delta(_rows(spark, [(i, "a", i * 2, False) for i in range(50)],
                         100), epoch=0, manifests=[])
    snap = t.latest()
    assert snap.files, "no files staged"
    for f in snap.files:
        offs = _bloom_offsets(spark, os.path.join(t.root, f["path"]))
        assert offs["k"] > 0, f"no bloom filter on k in {f['path']}"
        assert offs["g"] == -1, "bloom built for an unlisted column"

    t.compact(spark)  # maintenance rewrites keep the filters
    for f in t.latest().files:
        offs = _bloom_offsets(spark, os.path.join(t.root, f["path"]))
        assert offs["k"] > 0, f"compaction dropped the bloom on {f['path']}"
    assert t.read(spark).count() == 50


def test_bloom_follows_rename(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                             key_cols=["k"], n_buckets=2,
                             props={"bloom_filters": ["g"]})
    t.commit_delta(_rows(spark, [(1, "a", 2, False)], 100), epoch=0,
                   manifests=[])
    new_fields = [{"name": "k", "type": "long"},
                  {"name": "grp", "type": "string"},
                  {"name": "v", "type": "long"}]
    t.commit_metadata(new_fields, {"g": "grp"})
    t.commit_delta(
        _rows(spark, [(2, "b", 4, False)], 200)
        .withColumnRenamed("g", "grp"), epoch=1, manifests=[])
    # files written post-rename carry the NEW physical name; the pre-rename
    # file keeps `g` (and its bloom) — find the post-rename one
    all_offs = [_bloom_offsets(spark, os.path.join(t.root, f["path"]))
                for f in t.latest().files]
    post = [o for o in all_offs if "grp" in o]
    assert post, "no post-rename file found"
    assert all(o["grp"] > 0 for o in post), \
        "bloom prop did not remap through the rename"
    assert all(o["g"] > 0 for o in all_offs if "g" in o)


def test_engine_bloom_prop_wiring(spark, t1, registry, tmp_path):
    from cdc_core_spark.engine import CdcEngine

    with pytest.raises(ValueError, match="unknown columns"):
        CdcEngine(spark, str(tmp_path / "b"), registry,
                  bloom_filters=["nope"]).initial_load(
            spark.read.parquet(f'{t1["dir"]}/source_repos.parquet'))

    eng = CdcEngine(spark, str(tmp_path / "e"), registry, n_buckets=4,
                    bloom_filters=["repo", "path"])
    src = spark.read.parquet(f'{t1["dir"]}/source_repos.parquet')
    eng.replay(f'{t1["dir"]}/change_events', source_df=src)
    assert eng.table.latest_meta().props["bloom_filters"] == ["repo", "path"]

    from tests.conftest import assert_final_equal
    assert_final_equal(eng.read_final_with_sha().toPandas(), t1["expected"])
    # the high-cardinality key column carries a bloom in every file; the
    # 7-value repo column may legitimately come back -1 — parquet-mr omits
    # the filter when a chunk is fully dictionary-encoded, because the
    # dictionary page is already an exact membership filter
    for f in eng.table.latest().files[:4]:
        offs = _bloom_offsets(spark, os.path.join(eng.table.root, f["path"]))
        assert offs["path"] > 0, f["path"]

    with pytest.raises(ValueError, match="already exists with"):
        CdcEngine(spark, str(tmp_path / "e"), registry,
                  bloom_filters=["repo"])
