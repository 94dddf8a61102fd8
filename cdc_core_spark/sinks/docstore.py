"""Document-store write-back: keyed whole-document replace/upsert/delete —
the reference's second DataStore implementation (Mongo), interface-matched
over a lake-resident JSON-document table.

Reference surface (persistence module):
* keyed ``replaceOne`` — the document with the same key is REPLACED whole,
  never column-merged — impl/mongo/MongoDbDataStore.java:243;
* ``upsertEntity`` (insert-or-replace) — MongoDbDataStore.java:267;
* keyed delete — MongoDbDataStore.java:289-309.

No document database ships in this container, so the store is a keyed
table of ``(key_cols..., doc: string<json>)`` rows on ``lake.SnapshotTable``
— which supplies the three properties a document sink needs at scale:

1. **Bucket-pruned upserts.** A batch only rewrites the hash buckets its
   keys land in (``existing-touched ANTI-JOIN incoming  UNION  incoming``,
   committed via ``commit_merge(touched_buckets)``); untouched buckets are
   carried forward by reference. Cost is O(touched buckets), NOT O(table) —
   the property that makes keyed upserts viable against a 100-TB doc table.
   Replace semantics come free: the new doc is the whole document.
2. **Atomic versioned publish** — the snapshot CAS; a crash mid-write is
   invisible (unreferenced orphan files, never a torn state).
3. **Keyed point reads prune to one bucket** (``find_document``) — the
   same file-group pruning a document DB gets from its primary index.

With a real document DB the same per-key-unique winner frame streams
through a foreachPartition bulk write of replaceOne ops — the call shape
is kept identical so the swap is mechanical. Idempotent under
at-least-once replay: re-upserting the same winner set reproduces the
identical final state (replace is absorbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_core_spark.lake import SnapshotTable, bucket_expr

# reverse of lake.sql_type for deriving SnapshotTable field docs from a
# DataFrame schema (doc-store keys are scalars by contract)
_FROM_SPARK = {"bigint": "long", "int": "int", "smallint": "short",
               "string": "string", "boolean": "boolean", "double": "double",
               "float": "float", "timestamp": "timestamp", "binary": "binary"}


def _key_fields(df: DataFrame, key_cols: list[str]) -> list[dict]:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out = []
    for k in key_cols:
        t = _FROM_SPARK.get(by_name[k])
        if t is None:
            raise ValueError(f"unsupported doc-store key type {by_name[k]!r} "
                             f"for column {k!r}")
        out.append({"name": k, "type": t, "nullable": False, "key": True})
    return out


def store_exists(root: str) -> bool:
    return SnapshotTable(root).exists()


def read_documents(spark: SparkSession, root: str) -> DataFrame:
    """Current state: ``(key_cols..., doc)`` rows of the latest snapshot."""
    return SnapshotTable(root).read(spark)


def shred_documents(df: DataFrame, schema_ddl: str) -> DataFrame:
    """Open the JSON doc back into typed columns (the read-side projection a
    document store serves; SchemaHelper JSON-shred analog)."""
    key_cols = [c for c in df.columns if c != "doc"]
    return df.select(*key_cols,
                     F.from_json("doc", schema_ddl).alias("_d")).select(
        *key_cols, "_d.*")


def find_document(spark: SparkSession, root: str, key: dict) -> DataFrame:
    """Keyed point read (MongoDbDataStore.findEntity analog), pruned to the
    single bucket the key hashes to — one file group touched, not a scan."""
    from cdc_core_spark.query import find_by_key
    from cdc_core_spark.lake import sql_type
    tbl = SnapshotTable(root)
    snap = tbl.latest()
    key_cols = snap.key_cols
    # probe typed exactly like the stored key columns — xxhash64 is
    # type-sensitive, so an inferred (wider) probe type would mis-bucket.
    # DDL order must follow key_cols (not snap.fields declaration order):
    # the value tuple below binds positionally, and a table whose field
    # order differs from its key_cols order would otherwise hash swapped
    # values and silently probe the wrong bucket
    tmap = {f["name"]: sql_type(f["type"]) for f in snap.fields}
    ddl = ", ".join(f"{k} {tmap[k]}" for k in key_cols)
    probe = spark.createDataFrame([tuple(key[k] for k in key_cols)], ddl)
    b = probe.select(bucket_expr(key_cols, snap.n_buckets).alias("b")).first()["b"]
    # reuse the snapshot already loaded — read() without snap= would parse
    # the snapshot log + manifest-list sidecar a second time per point read
    return find_by_key(tbl.read(spark, buckets=[int(b)], snap=snap), key)


def upsert_documents(df: DataFrame, root: str, key_cols: list[str],
                     deleted_col: str | None = None,
                     n_buckets: int = 64) -> None:
    """Keyed whole-document upsert (replaceOne semantics) with optional
    tombstone deletes.

    ``df`` must carry per-key UNIQUE rows (LWW winners): key columns, any
    payload columns (serialized into the doc), and optionally a boolean
    ``deleted_col``. Matched docs are replaced whole, new keys insert,
    tombstones remove the doc (matched or not — removing an absent key is
    a no-op, as in replaceOne+delete bulk writes).

    ``n_buckets`` applies on first use only (afterwards the snapshot owns
    it; grow via ``SnapshotTable.compact(n_buckets=...)``).
    """
    spark = df.sparkSession
    payload = [c for c in df.columns
               if c not in key_cols and c != deleted_col]
    doc = F.to_json(F.struct(*payload)) if payload else F.lit("{}")
    # coalesce: a NULL delete flag means "not a delete" — under three-valued
    # logic an un-coalesced NULL would fail BOTH filter(~_del) and any
    # filter(_del), so the row would vanish from the replace set while its
    # key still anti-joined the stored doc away: a silent delete
    incoming = df.select(
        *key_cols, doc.alias("doc"),
        (F.coalesce(F.col(deleted_col), F.lit(False)) if deleted_col
         else F.lit(False)).alias("_del"))

    tbl = SnapshotTable(root)
    if not tbl.exists():
        fields = _key_fields(df, key_cols) + [
            {"name": "doc", "type": "string", "nullable": True}]
        tbl = SnapshotTable.create(root, fields=fields, key_cols=key_cols,
                                   n_buckets=n_buckets,
                                   props={"store": "documents"})
    # full latest() (not latest_meta): the probe read and the commit below
    # are PINNED to this one snapshot, closing the read→commit race — the
    # lake-level OCC rebases or conflicts if a concurrent writer lands
    meta = tbl.latest()
    nb = meta.n_buckets
    # normalize incoming key types to the TABLE'S declared types BEFORE
    # hashing: xxhash64 hashes int 7 and bigint 7 differently (the
    # bucket_expr contract), so a type-drifted batch (rev int from JSON vs
    # the stored bigint) would mis-bucket, miss the stored doc's bucket in
    # `touched`, and strand a stale duplicate that find_document's
    # correctly-typed probe then returns forever — a silent lost update.
    # find_document types its probe the same way (see above).
    from cdc_core_spark.lake import sql_type
    tmap = {f["name"]: sql_type(f["type"]) for f in meta.fields}
    incoming = incoming.select(
        *[F.col(k).cast(tmap[k]).alias(k) for k in key_cols],
        *[c for c in incoming.columns if c not in key_cols])
    # lazy localCheckpoint: the incoming lineage (often an upstream LWW
    # shuffle) feeds the touched-bucket collect, the anti-join probe AND the
    # commit_merge stage write — unmaterialized it would run 3x per upsert
    incoming = (incoming.withColumn("_bucket", bucket_expr(key_cols, nb))
                .localCheckpoint(eager=False))
    # O(touched buckets) driver list — the justified collect (cf. engine.py)
    touched = sorted(r["_bucket"] for r in
                     incoming.select("_bucket").distinct().collect())

    survivors = (tbl.read(spark, buckets=touched, snap=meta)
                 .withColumn("_bucket", bucket_expr(key_cols, nb))
                 .join(incoming.select(*key_cols), on=key_cols,
                       how="left_anti"))
    state = survivors.unionByName(
        incoming.filter(~F.col("_del")).drop("_del"))
    # replace semantics need no version tuple; constant internal cols keep
    # the SnapshotTable read contract (tombstone filter) satisfied
    state = (state.withColumn("_op_ts", F.lit(-1).cast("bigint"))
             .withColumn("_event_seq", F.lit(-1).cast("bigint"))
             .withColumn("_deleted", F.lit(False)))
    tbl.commit_merge(state, touched, epoch=None, manifests=[], base=meta)


def delete_documents(spark: SparkSession, root: str, key_cols: list[str],
                     keys_df: DataFrame) -> None:
    """Keyed bulk delete (MongoDbDataStore delete analog): one bucket-pruned
    anti-join commit without the deleted keys."""
    tomb = keys_df.select(*key_cols).withColumn("_deleted_flag", F.lit(True))
    upsert_documents(tomb, root, key_cols, deleted_col="_deleted_flag")
