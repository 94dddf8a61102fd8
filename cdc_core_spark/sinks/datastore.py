"""DataStore write-back: keyed create/update/upsert/delete into an external
RDBMS over JDBC — the reference's headline persistence surface
(persistence/src/main/java/io/zyient/core/persistence/AbstractDataStore.java:140-226,
impl/rdbms/RdbmsDataStore.java:45-98; keyed replace semantics as in
impl/mongo/MongoDbDataStore.java:203-309).

Spark-first shape (NOT the reference's row-at-a-time Hibernate session):

1. **Stage** — the batch is written to a staging table with Spark's parallel
   JDBC writer (each partition opens its own connection; `numPartitions` /
   `batchsize` control fan-in). This is the part that must scale: 10^8
   winner rows stream straight from the shuffle into the database with no
   driver materialization.
2. **Merge** — ONE driver-side statement: ``MERGE INTO target USING stage ON
   <keys>`` with UPDATE / DELETE / INSERT arms. Set-based DML is how an
   RDBMS wants bulk upserts delivered; per-row upserts (what the reference
   does per entity) are 100-1000× slower at bulk scale. The merge runs over
   the py4j gateway (java.sql.DriverManager) — no extra Python deps, and the
   JDBC driver jar is already on Spark's classpath for the stage write.

The caller must hand in per-key UNIQUE rows (e.g. LWW winners out of
``lww_reduce``) — exactly the contract the engine's epoch loop produces.
Re-running the same merge is idempotent (same winners → same final rows),
which is what makes this sink safe under the at-least-once replay loop.

Tested against embedded Derby (jars ship with Spark; in local mode the
executors share the JVM so ``jdbc:derby:<dir>`` works end-to-end — on a
cluster the same call takes a network JDBC URL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _q(ident: str) -> str:
    """Quote a COLUMN identifier, case-preserving: Spark's JDBC writer quotes
    column names when it creates the stage table (JdbcUtils.schemaString →
    dialect.quoteIdentifier), so the merge must reference them with the exact
    DataFrame-column case. Table names stay UNQUOTED throughout (Spark passes
    dbtable through unquoted too, so both sides case-fold identically)."""
    return '"' + ident.replace('"', '""') + '"'


def _connect(spark, url: str, properties: dict | None):
    """Open one driver-side JDBC connection via the py4j gateway."""
    jvm = spark._jvm
    driver = (properties or {}).get("driver")
    if driver:
        # ensure the driver class is registered with DriverManager
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        if k != "driver":
            props.setProperty(k, str(v))
    return jvm.java.sql.DriverManager.getConnection(url, props)


def _exec_jdbc(spark, url: str, properties: dict | None,
               statements: list[str]) -> None:
    """Run driver-side DDL/DML on one JDBC connection."""
    conn = _connect(spark, url, properties)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


def _table_exists(spark, url: str, properties: dict | None, table: str) -> bool:
    conn = _connect(spark, url, properties)
    try:
        md = conn.getMetaData()
        # getTables patterns treat '_'/'%' as LIKE wildcards — escape them
        # with the driver's search-string escape so 'repo_state' can't match
        # 'repoXstate' and skip the CREATE
        esc = md.getSearchStringEscape()

        def pat(name: str) -> str:
            return (name.replace(esc, esc + esc)
                    .replace("_", esc + "_").replace("%", esc + "%"))

        # scope the probe to the CONNECTION'S schema — a wildcard schema
        # would match a same-named table someone else owns (AUDIT.X vs
        # APP.X), skip the CREATE, and fail the MERGE later. getSchema is
        # JDBC 4.1; fall back to the wildcard for drivers without it
        try:
            schema = conn.getSchema()
        except Exception:  # noqa: BLE001 — absent/unsupported: wildcard
            schema = None
        schema_pat = pat(schema) if schema else None
        # unquoted identifiers case-fold per database (Derby/Oracle upper,
        # Postgres/MySQL lower) — probe every folding of the name
        for cand in dict.fromkeys((table, table.upper(), table.lower())):
            rs = md.getTables(None, schema_pat, pat(cand), None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def upsert_jdbc(df: DataFrame, url: str, table: str, key_cols: list[str],
                properties: dict | None = None,
                deleted_col: str | None = None,
                version_col: str | None = None,
                column_types: str | None = None,
                stage_table: str | None = None,
                num_partitions: int | None = None,
                batch_size: int = 10_000) -> None:
    """Keyed upsert (and optional delete) of ``df`` into RDBMS ``table``.

    * ``key_cols`` — the entity key (IKey analog; composite supported).
    * ``deleted_col`` — boolean column marking tombstones: matched rows are
      DELETEd, unmatched tombstones are skipped (never inserted) — the
      RecordDelete op of the CDC envelope.
    * ``version_col`` — optimistic-concurrency guard (BaseEntity @Version /
      SchemaManager stale-write rejection, SchemaManager.java:382-387):
      UPDATE/DELETE arms only fire when ``stage.version > target.version``,
      so replayed or stale rows can't regress a newer EXISTING target row.
      Scope honestly stated: a hard DELETE leaves no version behind, so the
      NOT MATCHED INSERT arm cannot tell a brand-new key from a stale
      redelivery of a key deleted later — feed this sink epoch-ordered
      exactly-once batches (what ``CdcEngine.replay``'s committed-epoch
      skip guarantees); out-of-band replays of old batches need soft
      deletes (``_deleted`` flag column instead of ``deleted_col``) to keep
      the tombstone's version comparable.
    * ``column_types`` — Spark ``createTableColumnTypes`` spec for the stage
      write (e.g. ``"repo VARCHAR(64), path VARCHAR(256)"``). On Derby, give
      every STRING KEY column a VARCHAR type here: the default dialect maps
      StringType to CLOB, which Derby can't compare in the MERGE ON clause.
      Leave NULLABLE payload strings at the default CLOB — Spark binds null
      strings as ``setNull(Types.CLOB)`` regardless of the DDL override, and
      Derby rejects that against a VARCHAR column (ERROR 22005); CLOB
      assignment in UPDATE/INSERT arms is legal, only comparison isn't.

    Creates the target on first use (same shape as the stage table). The
    stage table is dropped afterwards.
    """
    spark = df.sparkSession
    stage = stage_table or f"{table}_stage"
    data_cols = [c for c in df.columns if c != deleted_col]

    writer = df.repartition(num_partitions) if num_partitions else df
    w = (writer.write.mode("overwrite")
         .option("truncate", "false").option("batchsize", batch_size))
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url, stage, properties=properties)

    if not _table_exists(spark, url, properties, table):
        cols = ", ".join(_q(c) for c in data_cols)
        _exec_jdbc(spark, url, properties, [
            f"CREATE TABLE {table} AS SELECT {cols} FROM {stage} "
            "WITH NO DATA"])

    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    sets = ", ".join(f"{_q(c)} = s.{_q(c)}"
                     for c in data_cols if c not in key_cols)
    ins_cols = ", ".join(_q(c) for c in data_cols)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in data_cols)
    newer = (f" AND s.{_q(version_col)} > t.{_q(version_col)}"
             if version_col else "")
    is_del = f"s.{_q(deleted_col)}" if deleted_col else None

    arms = []
    if is_del:
        arms.append(f"WHEN MATCHED AND {is_del}{newer} THEN DELETE")
        if sets:
            arms.append(f"WHEN MATCHED AND NOT {is_del}{newer} "
                        f"THEN UPDATE SET {sets}")
        arms.append(f"WHEN NOT MATCHED AND NOT {is_del} "
                    f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})")
    else:
        if sets:
            arms.append(f"WHEN MATCHED{newer} THEN UPDATE SET {sets}")
        arms.append(f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) "
                    f"VALUES ({ins_vals})")

    merge = (f"MERGE INTO {table} t USING {stage} s ON {on} "
             + " ".join(arms))
    _exec_jdbc(spark, url, properties, [merge, f"DROP TABLE {stage}"])


def insert_jdbc(df: DataFrame, url: str, table: str,
                properties: dict | None = None,
                column_types: str | None = None,
                batch_size: int = 10_000) -> None:
    """Keyed create path (AbstractDataStore.create analog): plain parallel
    append — duplicate keys are the caller's error, as in the reference."""
    w = (df.write.mode("append").option("batchsize", batch_size))
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url, table, properties=properties)


def delete_jdbc(spark, url: str, table: str, key_cols: list[str],
                keys_df: DataFrame, properties: dict | None = None,
                column_types: str | None = None) -> None:
    """Keyed delete (AbstractDataStore.delete analog): stage the key set,
    one set-based DELETE EXISTS, drop the stage."""
    stage = f"{table}_delkeys"
    w = keys_df.select(*key_cols).write.mode("overwrite")
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url, stage, properties=properties)
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    _exec_jdbc(spark, url, properties, [
        f"DELETE FROM {table} t WHERE EXISTS "
        f"(SELECT 1 FROM {stage} s WHERE {on})",
        f"DROP TABLE {stage}"])
