"""Document-store write-back: keyed whole-document replace/upsert/delete —
the reference's second DataStore implementation (Mongo), interface-matched
over a lake-resident JSON-document table.

Reference surface (persistence module):
* keyed ``replaceOne`` — the document with the same key is REPLACED whole,
  never column-merged — impl/mongo/MongoDbDataStore.java:243;
* ``upsertEntity`` (insert-or-replace) — MongoDbDataStore.java:267;
* keyed delete — MongoDbDataStore.java:289-309.

No document database ships in this container, so the store is a keyed
parquet table of ``(key_cols..., doc: string<json>)`` rows with atomic
versioned commits — the same staged + set-based shape as the RDBMS sink
(``sinks/datastore.py``), with the MERGE statement replaced by an anti-join
union (the lakehouse form of set-based upsert):

1. **Serialize** — payload columns fold into ONE JSON ``doc`` per row
   (``to_json(struct(...))``, JVM-side). Replace semantics come for free:
   the new doc is the whole document.
2. **Merge** — ``existing ANTI-JOIN incoming-keys  UNION  incoming`` (minus
   tombstones): one shuffle, no driver materialization, arbitrarily wide
   batches. With a real document DB the same frame streams through a
   foreachPartition bulk-write of replaceOne ops — the call shape is kept
   identical so the swap is mechanical.
3. **Publish** — the new state lands in a fresh ``v{N}`` directory and
   becomes visible only when its ``_COMMIT`` marker renames in (same
   crash-invisibility contract as ``lake.SnapshotTable``).

Idempotent under at-least-once replay: re-upserting the same winner set
reproduces the identical final state (replace is absorbing).
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _versions(root: str) -> list[int]:
    """Committed versions only — a data directory without its _COMMIT marker
    is an in-flight or crashed write and stays invisible."""
    out = []
    for p in glob.glob(os.path.join(root, "v*")):
        b = os.path.basename(p)
        if re.fullmatch(r"v\d{12}", b) and os.path.exists(
                os.path.join(p, "_COMMIT")):
            out.append(int(b[1:]))
    return sorted(out)


def _data_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version:012d}")


def store_exists(root: str) -> bool:
    return bool(_versions(root))


def read_documents(spark: SparkSession, root: str) -> DataFrame:
    """Current state: ``(key_cols..., doc)`` rows of the latest committed
    version."""
    vs = _versions(root)
    if not vs:
        raise FileNotFoundError(f"no committed document-store state under {root}")
    return spark.read.parquet(_data_dir(root, vs[-1]))


def shred_documents(df: DataFrame, schema_ddl: str) -> DataFrame:
    """Open the JSON doc back into typed columns (the read-side projection a
    document store serves; SchemaHelper JSON-shred analog)."""
    key_cols = [c for c in df.columns if c != "doc"]
    return df.select(*key_cols,
                     F.from_json("doc", schema_ddl).alias("_d")).select(
        *key_cols, "_d.*")


def find_document(spark: SparkSession, root: str, key: dict) -> DataFrame:
    """Keyed point read (MongoDbDataStore.findEntity analog)."""
    from cdc_core_spark.query import find_by_key
    return find_by_key(read_documents(spark, root), key)


def upsert_documents(df: DataFrame, root: str, key_cols: list[str],
                     deleted_col: str | None = None) -> None:
    """Keyed whole-document upsert (replaceOne semantics) with optional
    tombstone deletes.

    ``df`` must carry per-key UNIQUE rows (LWW winners): key columns, any
    payload columns (serialized into the doc), and optionally a boolean
    ``deleted_col``. Matched docs are replaced whole, new keys insert,
    tombstones remove the doc (matched or not — removing an absent key is a
    no-op, as in replaceOne+delete bulk writes).
    """
    spark = df.sparkSession
    payload = [c for c in df.columns
               if c not in key_cols and c != deleted_col]
    doc = F.to_json(F.struct(*payload)) if payload else F.lit("{}")
    incoming = df.select(
        *key_cols, doc.alias("doc"),
        (F.col(deleted_col) if deleted_col else F.lit(False)).alias("_del"))

    vs = _versions(root)
    if vs:
        existing = read_documents(spark, root)
        # replace semantics: ANY incoming key (replacement or tombstone)
        # supersedes the stored doc; survivors are the untouched keys
        survivors = existing.join(incoming.select(*key_cols),
                                  on=key_cols, how="left_anti")
        state = survivors.unionByName(
            incoming.filter(~F.col("_del")).drop("_del"))
        next_v = vs[-1] + 1
    else:
        state = incoming.filter(~F.col("_del")).drop("_del")
        next_v = 0

    os.makedirs(root, exist_ok=True)
    target = _data_dir(root, next_v)
    if os.path.isdir(target):  # crashed attempt without marker — invisible
        shutil.rmtree(target)
    staging = tempfile.mkdtemp(dir=root, prefix=".stage-")
    try:
        state.write.mode("overwrite").parquet(staging)
        os.rename(staging, target)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    # marker LAST: readers only see fully-written versions (crash between
    # rename and marker leaves an invisible orphan, never a torn state)
    with open(os.path.join(target, "_COMMIT"), "w") as f:
        f.write("ok")


def delete_documents(spark: SparkSession, root: str, key_cols: list[str],
                     keys_df: DataFrame) -> None:
    """Keyed bulk delete (MongoDbDataStore delete analog): publish a new
    version without the given keys — one anti-join."""
    tomb = keys_df.select(*key_cols).withColumn("_deleted", F.lit(True))
    upsert_documents(tomb, root, key_cols, deleted_col="_deleted")
