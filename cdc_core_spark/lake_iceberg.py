"""Iceberg conformance shim — the SnapshotTable surface routed to REAL
Iceberg operations when the runtime jars are present.

``lake.SnapshotTable``'s docstring carries the operation-by-operation audit
(each call ↔ one Iceberg operation); this module makes that mapping code
instead of prose. It is deliberately thin: every method is one Spark-SQL /
DataFrameWriterV2 call against an Iceberg catalog, because the point is to
PROVE the engine's commit granularity and metadata contract line up with
Iceberg's, not to re-implement a lakehouse.

Sandbox note: this container ships no Iceberg jars, so
``iceberg_available(spark)`` returns False here and the conformance tests
(tests/test_lake_iceberg.py) skip. On a cluster, add
``--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>`` and a
catalog conf, and the same tests run against real Iceberg tables.

Contract parity with ``lake.SnapshotTable``:

* **commit_delta** → ``writeTo(...).append()`` with
  ``snapshot-property.cdc.epoch`` / ``.cdc.manifests`` summary props — the
  exactly-once ledger rides Iceberg snapshot summaries exactly as it rides
  our snapshot JSON docs.
* **commit_merge** → ``overwritePartitions()`` (the bucket-pruned
  copy-on-write: only partitions present in ``df`` are replaced, the rest
  carried by reference — Iceberg's dynamic partition overwrite is the same
  touched-subset rule as SnapshotTable's ``touched_buckets``).
* **committed_epochs** → scan of the ``.snapshots`` metadata table's
  summary maps (what SnapshotTable folds from its log docs, cached).
* **read** → table scan + the same LWW fold / tombstone filter
  (``lww.lww_reduce``), so MOR semantics are byte-identical to the
  engine's.
* **read_changes** → Iceberg incremental append scan
  (``start/end-snapshot-id`` read options) — the rule SnapshotTable's
  changelog mirrors, including refusal across replace snapshots.
* **compact** → ``CALL <catalog>.system.rewrite_data_files`` (maintenance
  rewrite: changes no logical rows, same invariant ``compact()`` keeps).
* **expire_snapshots** → ``CALL <catalog>.system.expire_snapshots`` after
  folding epoch/manifest summaries forward (retention must not lose the
  exactly-once ledger — same rule as SnapshotTable's expired-base doc).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_core_spark.lake import INTERNAL_COLS, sql_type

#: snapshot-summary keys carrying the exactly-once ledger
EPOCH_PROP = "cdc.epoch"
MANIFESTS_PROP = "cdc.manifests"
#: table properties: key columns (so an adapter can attach to an existing
#: table) and the ledger folded forward by expire_snapshots
KEY_COLS_PROP = "cdc.key-cols"
EXPIRED_EPOCHS_PROP = "cdc.expired-epochs"
EXPIRED_MANIFESTS_PROP = "cdc.expired-manifests"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath (the jar-gate
    for the conformance tests)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergSnapshotTable:
    """SnapshotTable-shaped adapter over a real Iceberg v2 table.

    ``ident`` is the fully-qualified table identifier
    (``catalog.db.table``); the catalog must be configured on the session
    (``spark.sql.catalog.<name>`` confs). Method-for-method mapping in the
    module docstring; the engine-visible semantics (winner-row deltas,
    internal version/tombstone columns, epoch-keyed exactly-once) are
    unchanged — only the commit/metadata substrate is Iceberg's.
    """

    def __init__(self, spark: SparkSession, ident: str):
        self.spark = spark
        self.ident = ident
        self.catalog = ident.split(".", 1)[0]
        self._key_cols: list[str] | None = None

    @property
    def key_cols(self) -> list[str]:
        """Key columns — recovered from the ``cdc.key-cols`` table property
        when the adapter is attached to an existing table (a resumed driver
        never re-runs ``create``), settable for tables made elsewhere."""
        if self._key_cols is None:
            raw = self._table_props().get(KEY_COLS_PROP)
            if raw is None:
                raise ValueError(
                    f"table {self.ident} has no {KEY_COLS_PROP!r} property — "
                    "it was not created by IcebergSnapshotTable.create; set "
                    ".key_cols explicitly before reading")
            self._key_cols = json.loads(raw)
        return self._key_cols

    @key_cols.setter
    def key_cols(self, cols: list[str]) -> None:
        self._key_cols = list(cols)

    # ---------------- DDL ----------------
    @staticmethod
    def create(spark: SparkSession, ident: str, fields: list[dict],
               key_cols: list[str], n_buckets: int = 16
               ) -> "IcebergSnapshotTable":
        cols = ", ".join(
            [f'{f["name"]} {sql_type(f["type"])}' for f in fields]
            + [f"{c} {t}" for c, t in INTERNAL_COLS.items()])
        buckets = ", ".join(f"bucket({n_buckets}, {k})" for k in key_cols[:1])
        spark.sql(
            f"CREATE TABLE {ident} ({cols}) USING iceberg "
            f"PARTITIONED BY ({buckets}) "
            "TBLPROPERTIES ('format-version'='2', "
            f"'{KEY_COLS_PROP}'='{json.dumps(key_cols)}')")
        t = IcebergSnapshotTable(spark, ident)
        t.key_cols = key_cols
        return t

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    # ---------------- commits ----------------
    def _props(self, writer, epoch: int | None, manifests: list[dict]):
        if epoch is not None:
            writer = writer.option(f"snapshot-property.{EPOCH_PROP}",
                                   str(epoch))
        if manifests:
            writer = writer.option(f"snapshot-property.{MANIFESTS_PROP}",
                                   json.dumps(manifests))
        return writer

    def commit_delta(self, df: DataFrame, epoch: int | None,
                     manifests: list[dict]) -> None:
        """MOR delta: one atomic append snapshot, epoch + manifest rows in
        the snapshot summary (Transaction.newAppend + summary props)."""
        self._props(df.drop("_bucket").writeTo(self.ident),
                    epoch, manifests).append()

    def commit_merge(self, df: DataFrame, epoch: int | None,
                     manifests: list[dict]) -> None:
        """Copy-on-write merge: dynamic partition overwrite replaces exactly
        the bucket partitions present in ``df`` and carries the rest — the
        Iceberg form of SnapshotTable's touched-bucket rewrite."""
        self._props(df.drop("_bucket").writeTo(self.ident),
                    epoch, manifests).overwritePartitions()

    # ---------------- reads ----------------
    def read(self, with_internal_cols: bool = False) -> DataFrame:
        from cdc_core_spark.lww import lww_reduce
        df = self.spark.table(self.ident)
        keys = self.key_cols
        payload = [c for c in df.columns
                   if c not in keys and c not in INTERNAL_COLS]
        out = lww_reduce(df, keys, payload + ["_deleted"])
        if not with_internal_cols:
            out = out.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)
        return out

    def snapshots(self) -> DataFrame:
        return self.spark.table(f"{self.ident}.snapshots")

    def committed_epochs(self) -> set[int]:
        """Live snapshot summaries ∪ the expired-ledger table property —
        exactly-once resume must survive retention, same as SnapshotTable's
        expired-base doc."""
        rows = (self.snapshots()
                .select(F.element_at("summary", EPOCH_PROP).alias("e"))
                .filter(F.col("e").isNotNull()).collect())
        return {int(r["e"]) for r in rows} | self._ledger_epochs()

    def all_manifests(self) -> list[dict]:
        """Lineage rows from live snapshot summaries PLUS the manifests
        folded into the expired-ledger property — the audit trail survives
        retention, not just the epoch ids."""
        out: list[dict] = list(self._ledger_manifests())
        # canonical-JSON dedupe: between ledger-fold and snapshot expiry a
        # crashed expire leaves the same rows in BOTH places
        seen = {json.dumps(m, sort_keys=True) for m in out}
        rows = (self.snapshots()
                .select(F.element_at("summary", MANIFESTS_PROP).alias("m"))
                .filter(F.col("m").isNotNull()).collect())
        for r in rows:
            for m in json.loads(r["m"]):
                if json.dumps(m, sort_keys=True) not in seen:
                    out.append(m)
        return out

    def read_changes(self, from_snapshot_id: int,
                     to_snapshot_id: int | None = None) -> DataFrame:
        """Incremental append scan (appendsBetween): Iceberg itself raises
        across replace snapshots — the same strict rule SnapshotTable's
        changelog enforces for logical rewrites."""
        r = (self.spark.read.format("iceberg")
             .option("start-snapshot-id", str(from_snapshot_id)))
        if to_snapshot_id is not None:
            r = r.option("end-snapshot-id", str(to_snapshot_id))
        df = r.load(self.ident)
        return df.withColumn(
            "_change_op",
            F.when(F.col("_deleted"), F.lit("delete")).otherwise(
                F.lit("upsert")))

    # ---------------- maintenance ----------------
    def compact(self) -> None:
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files"
            f"(table => '{self.ident.split('.', 1)[1]}')")

    def expire_snapshots(self, keep_last: int) -> None:
        """Retention with the ledger folded forward: epoch/manifest summary
        props of to-be-expired snapshots are re-committed as table
        properties first (the expired-base-doc analog), then Iceberg
        expires. Exactly-once resume survives retention."""
        snaps = (self.snapshots().orderBy("committed_at").collect())
        expiring = snaps[:-keep_last]
        eps = sorted({int(s["summary"][EPOCH_PROP]) for s in expiring
                      if s["summary"] and EPOCH_PROP in s["summary"]}
                     | self._ledger_epochs())
        # manifests fold forward too (the lineage half of the ledger);
        # dedup by canonical JSON so a retried expire (props set, CALL
        # failed) never double-counts rows still carried by live snapshots
        mans = list(self._ledger_manifests())
        seen = {json.dumps(m, sort_keys=True) for m in mans}
        for s in expiring:
            if s["summary"] and MANIFESTS_PROP in s["summary"]:
                for m in json.loads(s["summary"][MANIFESTS_PROP]):
                    key = json.dumps(m, sort_keys=True)
                    if key not in seen:
                        seen.add(key)
                        mans.append(m)
        self.spark.sql(
            f"ALTER TABLE {self.ident} SET TBLPROPERTIES "
            f"('{EXPIRED_EPOCHS_PROP}'='{json.dumps(eps)}', "
            f"'{EXPIRED_MANIFESTS_PROP}'='{json.dumps(mans)}')")
        if expiring:
            ts = snaps[-keep_last]["committed_at"].isoformat(sep=" ")
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots"
                f"(table => '{self.ident.split('.', 1)[1]}', "
                f"older_than => TIMESTAMP '{ts}')")

    def _table_props(self) -> dict[str, str]:
        return {r["key"]: r["value"] for r in self.spark.sql(
            f"SHOW TBLPROPERTIES {self.ident}").collect()}

    def _ledger_epochs(self) -> set[int]:
        raw = self._table_props().get(EXPIRED_EPOCHS_PROP)
        return set(json.loads(raw)) if raw else set()

    def _ledger_manifests(self) -> list[dict]:
        raw = self._table_props().get(EXPIRED_MANIFESTS_PROP)
        return json.loads(raw) if raw else []
