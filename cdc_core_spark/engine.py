"""CdcEngine — the epoch-driven replay loop (the MessageProcessor analog).

Reference control flow (messaging/.../processing/MessageProcessor.java:144-193):
acquire lock → load ProcessingState → compare stored vs live offset → seek →
``nextBatch`` → handle (ack / DLQ) → commit offset. Our Spark-first
equivalent is a driver epoch loop:

    for epoch not yet committed (manifest check = the offset seek):
        read event-log partition `checkpoint_epoch=e`   (partition-pruned scan)
        split schema ops (op 0/1/2) → registry → metadata-only evolution
        split malformed → quarantine table              (DLQ, MessageProcessor.sendError)
        LWW-reduce valid events to per-key winners      (sharded-executor analog)
        bucket-pruned copy-on-write MERGE into target   (keyed upsert/delete)
        atomically commit snapshot + per-partition manifests  (exactly-once)

Idempotence: re-running an epoch is a no-op — winners carry the same version
tuple as the target rows they produced, and LWW max_by of identical rows is
identity; the committed-epoch check skips it entirely on resume.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_core_spark import fsutil
from cdc_core_spark.lake import (SnapshotTable, bucket_expr,
                                 field_projection, sql_type)
from cdc_core_spark.lww import lww_reduce, lww_reduce_in_partition
from cdc_core_spark.registry import SchemaDef, SchemaRegistry, validate_evolution

OP_INSERT, OP_UPDATE, OP_DELETE = 3, 4, 5
SCHEMA_OPS = (0, 1, 2)
DATA_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)


class WapAuditError(RuntimeError):
    """wap_replay's audit rejected the staged branch state; main was never
    touched and the branch is retained for inspection."""


def _list_epochs(events_path: str) -> list[int] | None:
    """Epoch ids from the hive partition layout — a filesystem listing, not a
    Spark job. Returns None when the path isn't epoch-partitioned."""
    import glob as _glob
    dirs = _glob.glob(os.path.join(events_path, "checkpoint_epoch=*"))
    if not dirs:
        return None
    return sorted(int(os.path.basename(d).split("=")[1]) for d in dirs)


def _footer_stats(path: str, max_cols: tuple[str, ...]) -> tuple[int, int | None, int | None]:
    """(num_rows, max(col) per requested column) from parquet footer metadata —
    driver-side, no Spark job. Spark always writes int64 min/max statistics."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    maxima: list[int | None] = []
    for col in max_cols:
        idx = name_to_idx[col]
        best = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                best = st.max if best is None else max(best, st.max)
        maxima.append(best)
    return (md.num_rows, *maxima)


def _delta_footer_stats(root: str, new_files: list[dict], key_of):
    """Shared accumulation for the manifest-from-footers closures (single-
    epoch and grouped commit paths differ ONLY in the grouping key):
    per ``key_of(file)``, the applied row count, footer watermarks, and the
    staged write volume. One definition so a new manifest stat can never
    drift between the two paths."""
    applied: dict = {}
    max_ts: dict = {}
    max_seq: dict = {}
    wbytes: dict = {}
    wfiles: dict = {}
    for f in new_files:
        k = key_of(f)
        rows, mts, mseq = _footer_stats(os.path.join(root, f["path"]),
                                        ("_op_ts", "_max_seq"))
        applied[k] = applied.get(k, 0) + rows
        wbytes[k] = wbytes.get(k, 0) + f.get("bytes", 0)
        wfiles[k] = wfiles.get(k, 0) + 1
        if mts is not None:
            max_ts[k] = max(max_ts.get(k, mts), mts)
        if mseq is not None:
            max_seq[k] = max(max_seq.get(k, mseq), mseq)
    return applied, max_ts, max_seq, wbytes, wfiles


def valid_event_pred(key_cols: list[str] = ("repo", "path"),
                     content_col: str | None = "content"):
    """Quarantine predicate (reference DLQ: MessageProcessor.java:216-225):
    data op code, non-null KEY columns (schema-driven, not hardcoded — the
    engine serves any registered entity), non-null VERSION columns (the
    reference requires a TransactionId.sequence; a null (op_ts, event_seq)
    would enter LWW as the smallest-possible version — invisible on read
    yet counted as applied, and out-versioned by any redelivered older
    event — so it must quarantine, not apply), and DELETE must not carry
    content.

    Null-safe by construction: a null op makes the raw conjunction NULL,
    which `filter(pred)` drops but `filter(~pred)` ALSO drops — the counting
    and quarantine paths would disagree. coalesce(False) pins null-op rows
    to invalid on every consumer."""
    pred = F.col("op").isin(*DATA_OPS)
    for k in key_cols:
        pred = pred & F.col(k).isNotNull()
    pred = pred & F.col("op_ts").isNotNull() & F.col("event_seq").isNotNull()
    if content_col is not None:
        pred = pred & ~((F.col("op") == OP_DELETE)
                        & F.col(content_col).isNotNull())
    return F.coalesce(pred, F.lit(False))


def _error_reason(key_cols: list[str] = ("repo", "path")):
    """DLQ reason tag, null-safe on op (shared by both quarantine writers)."""
    null_key = F.lit(False)
    for k in key_cols:
        null_key = null_key | F.col(k).isNull()
    return (
        F.when(~F.coalesce(F.col("op").isin(*DATA_OPS), F.lit(False)),
               F.lit("invalid_op"))
        .when(null_key, F.lit("null_key"))
        .when(F.col("op_ts").isNull() | F.col("event_seq").isNull(),
              F.lit("null_version"))
        .otherwise(F.lit("delete_with_content"))
    )


class CdcEngine:
    def __init__(self, spark: SparkSession, root: str, registry: SchemaRegistry,
                 entity: str = "source_repos", n_buckets: int = 16,
                 salt: int | str | None = None, merge_mode: str | None = None,
                 sort_order: list[str] | None = None,
                 zorder: list[str] | None = None,
                 bloom_filters: list[str] | None = None):
        self.spark = spark
        self.root = root
        self.registry = registry
        self.entity = entity
        self.n_buckets = n_buckets
        # Table sort-order prop (Iceberg write sort-order analog): recorded
        # at table creation; compact() clusters base files by these columns
        # so pushed-down key predicates prune parquet row groups WITHIN the
        # bucket-pruned file. Deliberately maintenance-time only — the hot
        # replay path stays sort-free (the MOR fold reads whole buckets, so
        # clustering buys nothing there; point lookups are where it pays).
        self.sort_order = list(sort_order) if sort_order else None
        # Z-order variant of the same contract: >= 2 columns, maintenance
        # rewrites cluster by the interleaved Morton key (zorder.py) so
        # predicates on ANY named column prune row groups. Exclusive with
        # sort_order (competing physical layouts).
        self.zorder = list(zorder) if zorder else None
        if self.zorder:
            from cdc_core_spark.zorder import validate_zorder_cols
            validate_zorder_cols(self.zorder)
        if self.sort_order and self.zorder:
            raise ValueError("pass sort_order OR zorder, not both")
        # Parquet bloom filters on the named columns for EVERY engine-owned
        # write, hot-path delta files included (fsutil.parquet_write_options)
        # — equality row-group skipping where clustering can't reach.
        # Composes with either clustering prop.
        self.bloom_filters = list(bloom_filters) if bloom_filters else None
        # None = plain single-stage max_by (right default: partial agg
        # already collapses hot keys map-side), int = always salt that wide,
        # "auto" = decide per applied batch from lww.choose_lww_salt's
        # sampled key-histogram probe (salting an unskewed stream costs
        # 2.7×, measured — BENCH skew_defense — so auto only salts when one
        # key holds ≥ half the batch). With group-commit the probe runs once
        # per DDL-free epoch RUN, not per epoch, so its one sampled
        # aggregation job amortizes across the backlog being drained.
        if salt is not None and not isinstance(salt, int) and salt != "auto":
            raise ValueError(f"salt must be an int, None or 'auto', got {salt!r}")
        self.salt = salt
        # "mor" (merge-on-read deltas, default) | "cow-jvm" | "cow-arrow".
        # Validated HERE: an unrecognized value (a typo'd env var) would
        # otherwise silently fall through apply_epoch's mode checks into a
        # copy-on-write rewrite per epoch — a confusing failure far from
        # the actual mistake
        self.merge_mode = merge_mode or os.environ.get("CDC_MERGE_STRATEGY", "mor")
        if self.merge_mode not in ("mor", "cow-jvm", "cow-arrow"):
            raise ValueError(
                f"unknown merge_mode {self.merge_mode!r} (from the "
                "merge_mode argument or CDC_MERGE_STRATEGY): expected "
                "'mor', 'cow-jvm' or 'cow-arrow'")
        self.table = SnapshotTable(os.path.join(root, "target"))
        self.errors_dir = os.path.join(root, "errors")
        # sort_order is recorded at CREATION — on an existing table it
        # would otherwise be a silent no-op (initial_load skips, epoch
        # commits carry prev.props, compact keeps writing unclustered
        # files while the caller believes clustering is on). Compare
        # through the alias map so a post-rename caller passing the
        # CURRENT column names still matches a creation-time prop.
        meta = (self.table.latest_meta()
                if (self.sort_order or self.zorder or self.bloom_filters)
                and self.table.exists() else None)
        for prop, want_raw in (("sort_order", self.sort_order),
                               ("zorder", self.zorder),
                               ("bloom_filters", self.bloom_filters)):
            if want_raw and meta is not None:
                have = [meta.aliases.get(c, c)
                        for c in meta.props.get(prop, [])]
                want = [meta.aliases.get(c, c) for c in want_raw]
                if have != want:
                    raise ValueError(
                        f"table at {self.table.root} already exists with "
                        f"{prop}={meta.props.get(prop)!r}; "
                        f"requested {want_raw!r}. Retrofit via "
                        "table.commit_metadata(fields, aliases, "
                        f"props={{**props, '{prop}': [...]}}) then compact()")

    # ------------------------------------------------------------------ state
    @property
    def current_schema(self) -> SchemaDef:
        ver = self.table.latest_meta().props["schema_version"]
        return self.registry.get(self.entity, ver)

    def _key_cols(self) -> list[str]:
        return self.table.latest_meta().key_cols

    def _sync_buckets(self) -> None:
        """The table snapshot owns the bucket count (it can change via
        compact(n_buckets=...)); resync so a fresh engine instance
        constructed with a stale count never mis-buckets."""
        if self.table.exists():
            self.n_buckets = self.table.latest_meta().n_buckets

    def _pred_args(self, events: DataFrame) -> tuple[list[str], str | None]:
        """(key_cols, content_col) for the validity predicate — key columns
        from the table (evolution can never change them), content rule only
        when the event stream carries a content column."""
        key_cols = self._key_cols()
        return key_cols, ("content" if "content" in events.columns else None)

    # ----------------------------------------------------------- initial load
    def initial_load(self, source_df: DataFrame, schema_version: str = "1.0") -> None:
        """Snapshot/full-load path (reference: MessageMode.Snapshot,
        EntityReadState SNAPSHOT gate, entity/.../model/EntityReadState.java:53-55).
        Initial rows get version (-1, -1) so every real event out-versions them."""
        # resync the bucket count BEFORE computing _bucket: on the crash-rerun
        # branch (table exists, data commit never landed) the half-created
        # table's snapshot owns n_buckets — a fresh engine constructed with a
        # different count would otherwise hash rows with one count and commit
        # against the other, mis-bucketing every base row
        self._sync_buckets()
        sdef = self.registry.get(self.entity, schema_version)
        fields = [dict(f) for f in sdef.fields]
        base_props = {"schema_version": schema_version}
        for prop, cols in (("sort_order", self.sort_order),
                           ("zorder", self.zorder),
                           ("bloom_filters", self.bloom_filters)):
            if not cols:
                continue
            known = {f["name"] for f in fields}
            bad = [c for c in cols if c not in known]
            if bad:
                raise ValueError(
                    f"{prop} names unknown columns {bad!r} for entity "
                    f"{self.entity!r} schema {schema_version}")
            base_props[prop] = cols
        if not self.table.exists():
            self.table = SnapshotTable.create(
                self.table.root, fields=fields, key_cols=sdef.key_cols(),
                n_buckets=self.n_buckets, aliases=dict(sdef.aliases),
                props=base_props)
        elif self.table.latest_meta().props.get("initial_loaded"):
            raise FileExistsError(
                f"table at {self.table.root} is already initial-loaded")
        # else: crash-rerun — the schema-only v0 snapshot was published but
        # the data commit never landed; fall through and redo the load. The
        # "initial_loaded" flag only rides the DATA commit below, so replay()
        # can tell a half-created table from a loaded one (a crash between
        # create() and commit would otherwise silently skip the initial load
        # on resume and lose every never-updated base row).
        cols = []
        present = set(source_df.columns)
        for f in fields:
            c = (F.col(f["name"]) if f["name"] in present else F.lit(None))
            cols.append(c.cast(sql_type(f["type"])).alias(f["name"]))
        from pyspark.sql import Observation
        # a zero-row source (bootstrap purely from the change stream) plans
        # zero tasks, so its Observation never fires and .get would die in
        # the JVM — detect up front (take(1), trivial next to the load)
        empty_source = source_df.isEmpty()
        obs = Observation("initial_load")
        df = (source_df.select(cols)
              .withColumn("_op_ts", F.lit(-1).cast("bigint"))
              .withColumn("_event_seq", F.lit(-1).cast("bigint"))
              .withColumn("_deleted", F.lit(False))
              .withColumn("_bucket", bucket_expr(sdef.key_cols(), self.n_buckets))
              .observe(obs, F.count(F.lit(1)).alias("n")))

        def manifest():
            # evaluated post-write: the row count rides the write job's
            # observe metrics instead of a separate counting scan
            n = 0 if empty_source else int(obs.get["n"])
            return [{"checkpoint_epoch": -1, "partition_id": -1, "events_read": n,
                     "events_applied": n, "events_error": 0, "max_op_ts": -1,
                     "max_event_seq": -1, "wall_ms": 0,
                     "bytes_written": 0, "files_written": 0}]

        self.table.commit_merge(df, list(range(self.n_buckets)), epoch=None,
                                manifests=manifest,
                                props={**base_props, "initial_loaded": True})

    # -------------------------------------------------------- schema evolution
    def _apply_schema_ops(self, events: DataFrame,
                          schema_rows: list | None = None) -> SchemaDef:
        """In-band DDL path (op codes 0/1/2, AvroChangeType.isSchemaChange,
        entity/.../model/AvroChangeType.java:40-49): route to the registry and
        apply as a metadata-only evolution commit before the data MERGE.
        ``schema_rows`` lets the replay loop pass pre-collected DDL events for
        all epochs at once (one scan job instead of one per epoch)."""
        if schema_rows is None:
            schema_rows = (events.filter(F.col("op").isin(*SCHEMA_OPS))
                           .select("schema_version", "event_seq")
                           .orderBy("event_seq").collect())
        cur = self.current_schema
        for row in schema_rows:
            new = self.registry.get(self.entity, row["schema_version"])
            if (new.major, new.minor) <= (cur.major, cur.minor):
                continue  # replayed DDL — idempotent skip
            validate_evolution(cur, new)
            # merge, don't replace: props also carries the initial_loaded
            # marker (and any future table-level flags)
            self.table.commit_metadata(
                [dict(f) for f in new.fields], dict(new.aliases), epoch=None,
                props={**self.table.latest_meta().props,
                       "schema_version": new.version})
            cur = new
        return cur

    def _effective_salt(self, ev: DataFrame,
                        key_cols: list[str]) -> int | None:
        """Resolve the configured ``salt`` for one applied batch: pass ints
        and None through; ``"auto"`` runs the sampled hot-key probe
        (``lww.choose_lww_salt``) on the batch about to be reduced — the
        probe-triggered switch that removes the caller-knob footgun (salted
        two-stage costs 2.7× when skew is absent, measured)."""
        if self.salt != "auto":
            return self.salt
        from cdc_core_spark.lww import choose_lww_salt
        return choose_lww_salt(ev, key_cols)

    # ----------------------------------------------------------- event intake
    def _normalize_events(self, events: DataFrame, sdef: SchemaDef,
                          extra_cols: tuple[str, ...] = ()) -> DataFrame:
        """Project raw events onto the current schema: alias-map renamed
        payload columns (old writers → new name), cast (covers widening),
        null-fill added columns; attach the version columns (the storage
        bucket is computed on the WINNER set by each caller — attaching it
        per raw event here would be a dead expression).
        ``extra_cols`` pass through untouched (e.g. checkpoint_epoch for the
        group-commit path)."""
        # the projection itself is THE shared lake.field_projection — the
        # LWW merge depends on events being projected identically to stored
        # files, so the alias/coalesce/cast logic must have one definition
        cols = field_projection(set(events.columns), sdef.fields, sdef.aliases)
        cols.append(F.col("op").cast("int").alias("op"))
        cols.append(F.col("op_ts").cast("bigint").alias("_op_ts"))
        cols.append(F.col("event_seq").cast("bigint").alias("_event_seq"))
        cols.extend(F.col(c) for c in extra_cols)
        return events.select(cols)

    # ------------------------------------------------------------- epoch apply
    def apply_epoch(self, events: DataFrame, epoch: int,
                    err_stats: dict[int, int] | None = None,
                    schema_rows: list | None = None,
                    read_stats: dict[int, int] | None = None) -> list[dict]:
        """Process one epoch end-to-end and atomically commit. Returns the
        manifest rows written (one per touched storage bucket = partition_id).

        The replay loop passes pre-collected ``err_stats`` (per-bucket
        malformed counts) and ``schema_rows`` (in-band DDL events); without
        ``read_stats`` the epoch then costs two Spark jobs: (1) materialize
        the LWW winners (which carry their own lineage stats —
        ``with_stats``), and (2) the single-shuffle merge+write. Direct
        callers (tests, streaming) may omit them and pay the per-epoch scans
        instead.

        ``read_stats`` (per-bucket valid-event counts, precomputed by the
        replay loop in one count-only job for ALL epochs) upgrades the
        merge-on-read path to exactly ONE Spark job per epoch: the remaining
        manifest stats — events_applied, (max_op_ts, max_event_seq)
        watermark — are read from the staged parquet FOOTERS of the delta
        write itself (num_rows + column min/max statistics), so the separate
        winners-materialize job disappears. Values are identical to the
        two-job path: every valid event folds into its key's winner, and the
        winner's ``_max_seq``/``_op_ts`` maxima per bucket are exactly the
        footer maxima of the staged columns."""
        t0 = time.monotonic()
        self._sync_buckets()
        sdef = self._apply_schema_ops(events, schema_rows=schema_rows)
        key_cols = sdef.key_cols()
        payload_cols = [f["name"] for f in sdef.fields if f["name"] not in key_cols]

        data = events.filter(~F.coalesce(F.col("op"), F.lit(-1)).isin(*SCHEMA_OPS))
        kc, cc = self._pred_args(events)
        vpred = valid_event_pred(kc, cc)
        valid = data.filter(vpred)

        if err_stats is None:
            # standalone path: one aggregation job for malformed lineage.
            # bucket_expr is already total on null keys (xxhash64 skips null
            # inputs); keys are CAST to their declared types before hashing
            # because the write side buckets after _normalize_events' casts
            # and xxhash64 hashes int vs bigint differently — a raw-typed
            # hash would put stats in buckets the data never lands in
            ktypes = {f["name"]: f["type"] for f in sdef.fields
                      if f["name"] in key_cols}
            nb = bucket_expr(key_cols, self.n_buckets, cast_types=ktypes)
            err_stats = {
                r["_bucket"]: r["n"] for r in
                (data.filter(~vpred).withColumn("_bucket", nb)
                 .groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect())
            }
            if sum(err_stats.values()) > 0:
                self._quarantine(data.filter(~vpred), epoch)

        ev = self._normalize_events(valid, sdef)

        # LWW winners. The same aggregation carries per-key lineage
        # (_n_events, _max_seq), so every manifest stat — events_read,
        # events_applied, (max_op_ts, max_event_seq) watermark — comes from
        # the winner rows with no separate stats scan.
        winners = lww_reduce(ev, key_cols, payload_cols + ["op"],
                             salt=self._effective_salt(ev, key_cols),
                             with_stats=True)
        winners = winners.withColumn("_bucket", bucket_expr(key_cols, self.n_buckets))

        if read_stats is not None and self.merge_mode == "mor":
            # Single-job fast path: stage+commit the delta (keeping _max_seq
            # for the footer watermark), then derive per-bucket manifests
            # from the staged footers + precomputed read/err counts.
            delta = (winners.drop("_n_events")
                     .withColumn("_deleted", F.col("op") == OP_DELETE).drop("op"))

            def manifests_from_footers(new_files: list[dict]) -> list[dict]:
                applied, max_ts, max_seq, wbytes, wfiles = \
                    _delta_footer_stats(self.table.root, new_files,
                                        lambda f: f["bucket"])
                stats = {
                    b: {"_bucket": b, "events_applied": applied[b],
                        "events_read": read_stats.get(b, 0),
                        "max_op_ts": max_ts.get(b), "max_event_seq": max_seq.get(b),
                        "bytes_written": wbytes[b], "files_written": wfiles[b]}
                    for b in applied
                }
                return self._manifest_rows(epoch, stats, err_stats, t0)

            snap = self.table.commit_delta(delta, epoch=epoch,
                                           manifests=manifests_from_footers)
            return snap.manifests

        # Job 1 — materialize winners (persisted); ONE collect on the cache
        # yields every per-bucket manifest stat. (An observe/CollectMetrics
        # fusion into the write job was measured SLOWER — n_buckets×4
        # conditional aggregates per row cost more than one cached job.)
        # persist released in the finally: a failed stats collect or commit
        # (concurrent-writer CAS, task failure) must not pin the cached
        # winner set in executor memory — a long-running foreachBatch driver
        # retrying failed microbatches would leak one cache per failure
        winners.persist()
        try:
            return self._apply_epoch_committed(
                winners, epoch, err_stats, key_cols, payload_cols, t0)
        finally:
            winners.unpersist()

    def _apply_epoch_committed(self, winners, epoch, err_stats, key_cols,
                               payload_cols, t0):
        stat_rows = (winners.groupBy("_bucket")
                     .agg(F.count(F.lit(1)).alias("events_applied"),
                          F.sum("_n_events").alias("events_read"),
                          F.max("_op_ts").alias("max_op_ts"),
                          F.max("_max_seq").alias("max_event_seq"))
                     .collect())
        read_stats = {r["_bucket"]: r for r in stat_rows}
        touched = sorted(read_stats)
        manifests = self._manifest_rows(epoch, read_stats, err_stats, t0)

        mode = self.merge_mode
        if mode == "mor":
            # Job 2 (merge-on-read, default — the 10^10-event shape): append
            # the winner set as bucket-tagged DELTA files — O(epoch) write,
            # no table rewrite. Reads LWW-fold base+deltas; compact()
            # re-bases. DELETE winners become tombstone rows — they must keep
            # out-versioning late duplicate redeliveries of older events in
            # future epochs (exactly-once under at-least-once delivery).
            delta = (winners.drop("_n_events", "_max_seq")
                     .withColumn("_deleted", F.col("op") == OP_DELETE).drop("op"))
            self.table.commit_delta(delta, epoch=epoch, manifests=manifests)
            return manifests

        # Job 2 (copy-on-write): rewrite touched buckets as merged base files.
        base = (self.table.read(self.spark, buckets=touched, with_internal_cols=True)
                .withColumn("op", F.when(F.col("_deleted"), F.lit(OP_DELETE))
                                   .otherwise(F.lit(OP_UPDATE)))
                .drop("_deleted")
                .withColumn("_bucket", bucket_expr(key_cols, self.n_buckets)))
        union = base.unionByName(winners.drop("_n_events", "_max_seq"))
        if mode == "cow-arrow":
            # single-shuffle: shuffle by storage bucket (pure function of
            # the key), Arrow-batched in-partition fold
            merged = lww_reduce_in_partition(
                union.repartition(max(len(touched), 1), "_bucket"), key_cols)
            pre_part = True
        else:  # cow-jvm
            merged = lww_reduce(union, key_cols, payload_cols + ["op"])
            merged = merged.withColumn("_bucket", bucket_expr(key_cols, self.n_buckets))
            pre_part = False
        merged = merged.withColumn("_deleted", F.col("op") == OP_DELETE).drop("op")
        self.table.commit_merge(merged, touched, epoch=epoch, manifests=manifests,
                                pre_partitioned=pre_part)
        return manifests

    def apply_epoch_group(self, events: DataFrame, epochs: list[int],
                          err_by_epoch: dict[int, dict[int, int]],
                          read_by_epoch: dict[int, dict[int, int]],
                          schema_rows: list | None = None) -> list[dict]:
        """GROUP COMMIT: apply several epochs in ONE Spark job + ONE atomic
        snapshot (merge-on-read only; ``events`` must carry
        ``checkpoint_epoch`` restricted to ``epochs``).

        Every Spark job pays a constant planning/scheduling cost that doesn't
        parallelize — measured ~1.2s/epoch at local[4] on the 20M-event
        fixture, the dominant N→4N scaling-efficiency loss when draining a
        deep backlog of small epochs. Grouping DDL-free epoch runs amortizes
        it (the reference acks a whole poll batch per ``receiver.commit()``,
        MessageProcessor.java:195-214 — same batching, one level up).

        Semantics are unchanged: winners reduce per (epoch, key), the staged
        delta keeps one layer per epoch (``checkpoint_epoch=<e>/_bucket=<b>``),
        manifests stay per (epoch, bucket) with footer-derived watermarks,
        and the read path LWW-folds layers as before — so the converged
        state and every LOGICAL manifest value (events read/applied/error,
        watermarks) are bit-identical to the one-job-per-epoch path; the
        physical write-volume columns (bytes_written / files_written) may
        differ, because one grouped staging job lays files out differently
        than N per-epoch jobs. In-band DDL may appear only at the FIRST
        epoch of a group (the replay loop enforces this by starting a new
        group at every DDL-carrying epoch)."""
        t0 = time.monotonic()
        self._sync_buckets()
        sdef = self._apply_schema_ops(events, schema_rows=schema_rows)
        key_cols = sdef.key_cols()
        payload_cols = [f["name"] for f in sdef.fields if f["name"] not in key_cols]

        data = events.filter(~F.coalesce(F.col("op"), F.lit(-1)).isin(*SCHEMA_OPS))
        kc, cc = self._pred_args(events)
        valid = data.filter(valid_event_pred(kc, cc))
        ev = self._normalize_events(valid, sdef, extra_cols=("checkpoint_epoch",))
        winners = lww_reduce(ev, ["checkpoint_epoch"] + key_cols,
                             payload_cols + ["op"],
                             salt=self._effective_salt(ev, key_cols),
                             with_stats=True)
        winners = winners.withColumn("_bucket", bucket_expr(key_cols, self.n_buckets))
        delta = (winners.drop("_n_events")
                 .withColumn("_deleted", F.col("op") == OP_DELETE).drop("op"))

        def manifests_from_footers(new_files: list[dict]) -> list[dict]:
            applied, max_ts, max_seq, wbytes, wfiles = \
                _delta_footer_stats(self.table.root, new_files,
                                    lambda f: (f["epoch"], f["bucket"]))
            out: list[dict] = []
            for e in epochs:
                stats = {
                    b: {"_bucket": b, "events_applied": applied[(ep, b)],
                        "events_read": read_by_epoch.get(e, {}).get(b, 0),
                        "max_op_ts": max_ts.get((ep, b)),
                        "max_event_seq": max_seq.get((ep, b)),
                        "bytes_written": wbytes[(ep, b)],
                        "files_written": wfiles[(ep, b)]}
                    for (ep, b) in applied if ep == e
                }
                rows = self._manifest_rows(e, stats, err_by_epoch.get(e, {}), t0)
                if not rows:
                    # an EMPTY epoch inside a group still needs a committed
                    # record (the single-epoch path marks it via the
                    # snapshot's epoch field; here only the last epoch gets
                    # that) — emit a zero marker row, partition_id=-1 like
                    # the initial-load convention, so committed_epochs()
                    # sees it and resume stays a no-op
                    rows = [{"checkpoint_epoch": e, "partition_id": -1,
                             "events_read": 0, "events_applied": 0,
                             "events_error": 0, "max_op_ts": -1,
                             "max_event_seq": -1,
                             "wall_ms": int((time.monotonic() - t0) * 1000),
                             "bytes_written": 0, "files_written": 0}]
                out.extend(rows)
            return out

        snap = self.table.commit_delta_grouped(delta, epochs,
                                               manifests=manifests_from_footers)
        return snap.manifests

    def _manifest_rows(self, epoch: int, read_stats: dict, err_stats: dict,
                       t0: float) -> list[dict]:
        wall_ms = int((time.monotonic() - t0) * 1000)
        rows = []
        for b in sorted(set(read_stats) | set(err_stats)):
            rs = read_stats.get(b)
            if rs is not None and not isinstance(rs, dict):
                # the CoW stats path collects Spark Rows; the MOR footer
                # path builds dicts — normalize so the optional
                # write-volume keys can default uniformly
                rs = rs.asDict()
            rows.append({
                "checkpoint_epoch": epoch, "partition_id": b,
                "events_read": int(rs["events_read"]) if rs else 0,
                "events_applied": int(rs["events_applied"]) if rs else 0,
                "events_error": int(err_stats.get(b, 0)),
                "max_op_ts": int(rs["max_op_ts"]) if rs and rs["max_op_ts"] is not None else -1,
                "max_event_seq": int(rs["max_event_seq"]) if rs and rs["max_event_seq"] is not None else -1,
                "wall_ms": wall_ms,
                # write-amplification lineage: bytes/files this epoch's MOR
                # delta commit staged for the partition (0 on rows whose
                # commit path doesn't stage per-bucket deltas: quarantine-
                # only buckets, copy-on-write modes, initial load)
                "bytes_written": int(rs.get("bytes_written", 0)) if rs else 0,
                "files_written": int(rs.get("files_written", 0)) if rs else 0,
            })
        return rows

    def _quarantine(self, bad: DataFrame, epoch: int) -> None:
        """DLQ: original event + reason, per-epoch overwrite (idempotent rerun).
        Reference: error messages re-tagged mode=Error with correlation id
        (MessageProcessor.sendError, BaseKafkaProducer keyed send)."""
        # strip any in-event checkpoint_epoch column (the streaming EVENT
        # envelope carries one): the quarantine epoch is the DIRECTORY name,
        # and a stale in-file copy would contradict it for any non-Spark
        # reader of the DLQ files (Spark shadows it; pyarrow/DuckDB don't)
        out = bad.drop("checkpoint_epoch").withColumn(
            "error_reason", _error_reason(self._pred_args(bad)[0]))
        (out.write.mode("overwrite")
            .options(**fsutil.parquet_write_options())
            .parquet(os.path.join(self.errors_dir, f"checkpoint_epoch={epoch}")))

    # ------------------------------------------------------------------ replay
    def replay(self, events_path: str, source_df: DataFrame | None = None,
               schema_version: str = "1.0", epochs: list[int] | None = None,
               compact_every: int | None = None,
               group_commit: bool = True, lease: bool = True,
               transform=None,
               background_compact: int | None = None,
               refresh_stats: bool = False) -> None:
        """Resume-from-checkpoint replay loop. Skips epochs whose manifests are
        already committed (the ReceiverOffset committed-split analog).

        ``transform`` (optional ``DataFrame -> DataFrame``) is the ingest
        pipeline hook — the ``InputReader → Pipeline → DataStore``
        composition point (mapping/.../pipeline/PersistencePipeline.java:
        the reference runs its Mapping + rules over every record between
        read and persist). Compiled per-record plans slot in here:
        ``functions.mapping.compile_mapping`` / ``apply_rules`` chains or a
        ``functions.decision_table`` agenda. The callable receives the raw
        change-event frame ONCE per run (still a lazy plan — Catalyst fuses
        it into every epoch scan, so filters behind it still push down) and
        must preserve the envelope columns (op, repo, path, op_ts,
        event_seq, checkpoint_epoch, schema_version); it rewrites payload
        columns only. Because it applies before the lineage pre-stats scan,
        manifest counts, DLQ routing, and exactly-once bookkeeping all see
        the transformed stream — identical to the reference's ordering,
        where the pipeline runs before the DataStore ever sees a record.

        ``compact_every`` re-bases the merge-on-read deltas every N applied
        epochs (and read cost stays bounded by base + ≤N delta layers — at
        10^10-event scale this is the knob that trades write amplification
        against read fold depth). Compaction is itself a plain snapshot
        commit, so a crash mid-compaction is invisible to correctness.

        ``lease`` guards the run with the single-writer lease and emits
        per-group liveness heartbeats (coordination.py — DistributedLock /
        HeartbeatThread analogs); a second driver on the same table fails
        fast with LockHeldError instead of computing doomed commits. The
        snapshot CAS remains the correctness arbiter either way.

        ``background_compact=K`` runs incremental compaction
        (``min_delta_files=K``) on a driver-side thread CONCURRENTLY with
        the replay — the lake's optimistic commit rules are the only
        coordination (additive epoch deltas and input-preserving rewrites
        rebase over each other; the rewrite takes no lease). Unlike
        ``compact_every``, ingest never waits for a rewrite: Spark
        schedules both threads' jobs side by side. Measured on the bench
        fixture (``OCC_PROBE.json``): rewrites land mid-replay with zero
        conflicts, the racing replay wall matches or beats solo (the
        background rewrites keep the merge-on-read fold shallow), and the
        converged read is ~1.8× faster on the compacted end state. A
        maintainer failure is re-raised AFTER the replay completes —
        ingest is never sacrificed to a maintenance error.

        ``refresh_stats=True`` runs ``refresh_stats()`` (churn-proportional
        column statistics) after the replay's commits land."""
        import threading

        if background_compact is not None:
            stop, errs = threading.Event(), []
            th = threading.Thread(
                target=self._bg_compact_loop,
                args=(stop, errs, background_compact), daemon=True)
            th.start()
            try:
                self.replay(events_path, source_df, schema_version, epochs,
                            compact_every, group_commit, lease,
                            transform=transform)
            finally:
                stop.set()
                th.join()
            if errs:
                raise RuntimeError(
                    "background compaction failed (replay itself completed "
                    "and committed)") from errs[0]
            if refresh_stats:
                self.refresh_stats()
            return

        from cdc_core_spark import coordination as coord
        if lease:
            lock = coord.ProcessLock(self.root, owner=self.entity).acquire()
            try:
                self._replay_locked(events_path, source_df, schema_version,
                                    epochs, compact_every, group_commit,
                                    transform=transform,
                                    beat=lambda st, ep=None, err=None:
                                    (coord.write_heartbeat(self.root,
                                                           self.entity, st,
                                                           epoch=ep, error=err),
                                     lock.renew()))
            except Exception as ex:
                coord.write_heartbeat(self.root, self.entity, "failed",
                                      error=repr(ex))
                raise
            finally:
                lock.release()
        else:
            self._replay_locked(events_path, source_df, schema_version,
                                epochs, compact_every, group_commit,
                                transform=transform,
                                beat=lambda st, ep=None, err=None: None)
        if refresh_stats:
            self.refresh_stats()

    def refresh_stats(self) -> dict:
        """Churn-proportional column-statistics maintenance
        (``table_stats.refresh``: per-bucket HLL NDV sketches + null/min/
        max, recomputing only buckets whose files changed since the last
        analyze — the Iceberg post-write ANALYZE step). Opt-in via
        ``replay(refresh_stats=True)`` — it runs strictly AFTER the
        replay's commits (reads table state + writes only ``_stats/``
        sidecars, so it needs no lease and cannot perturb exactly-once
        bookkeeping)."""
        from cdc_core_spark import table_stats
        return table_stats.refresh(self.spark, self.table)

    def wap_replay(self, events_path: str, branch: str = "wap-audit",
                   audit=None, source_df: DataFrame | None = None,
                   schema_version: str = "1.0",
                   drop_branch: bool = True, **replay_kw) -> None:
        """Write-audit-publish replay (the Iceberg ``spark.wap.branch``
        flow over ``lake`` refs): every epoch commit is staged on an
        isolated BRANCH of the target table — invisible to main-ref
        readers — then ``audit`` validates the staged state, and only on
        success is the branch published atomically as ONE squash commit
        (``publish_branch``: a single version CAS, so readers see the whole
        audited state or none of it — per-epoch history of the staged
        interval lives in the manifests, not as separate main commits).
        This is the reference's validation-before-persist quality
        gate (rules → quarantine, mapping/.../rules/RulesExecutor.java;
        EntityValidationError upserts, PersistencePipeline.java:80-93)
        lifted from per-row to whole-staged-state: downstream consumers
        can never observe a batch that failed its audit.

        ``audit`` is a callable receiving THIS engine bound to the branch
        state (``read_final``/``count_final``/``manifests_df`` all resolve
        against the staged table); return False or raise to reject. On
        rejection the branch is KEPT for inspection
        (``eng.table.branch(name)``) and ``WapAuditError`` (or the
        audit's own exception) propagates — main is untouched. Re-running
        ``wap_replay`` with the same branch resumes: branch-committed
        epochs are skipped by the exactly-once manifests, the audit runs
        again over the completed state, and a crash between audit and
        publish re-enters ``publish_branch`` idempotently.

        The initial snapshot load (``source_df`` on a fresh table) commits
        to MAIN — it is the bootstrap readers must see; WAP stages the
        incremental epochs on top of it. At 100 TB the cost over a plain
        replay is zero data movement: branch and publish are both pure
        metadata."""
        main = self.table
        if main.ref is not None:
            raise ValueError("engine is already bound to a branch handle")
        # same completeness rule as _replay_locked: a crash between table
        # CREATE and the initial data commit leaves exists()==True with the
        # initial_loaded prop unset — the rerun must finish the load, not
        # skip it (initial_load itself is crash-idempotent)
        loaded = (main.exists()
                  and main.latest_meta().props.get("initial_loaded"))
        if source_df is not None and not loaded:
            self.initial_load(source_df, schema_version=schema_version)
        elif not loaded:
            raise FileNotFoundError(
                "wap_replay needs a completed initial load to fork "
                "(run initial_load / pass source_df first)")
        try:
            br = main.branch(branch)
        except FileNotFoundError:
            br = main.create_branch(branch)
        self.table = br
        try:
            self.replay(events_path, schema_version=schema_version,
                        **replay_kw)
            if audit is not None and audit(self) is False:
                raise WapAuditError(
                    f"audit rejected the staged state on branch "
                    f"{branch!r}; main is untouched — inspect via "
                    f"table.branch({branch!r}), repair (reprocess_errors / "
                    "drop_branch + re-stage), then rerun wap_replay")
        finally:
            self.table = main
        # squash publish: ONE commit behind one CAS — main readers see the
        # whole audited state or none of it, never an un-audited prefix
        # (fast_forward would expose intermediate epochs mid-copy)
        main.publish_branch(branch)
        if drop_branch:
            main.drop_branch(branch)
        self._sync_buckets()

    def _replay_locked(self, events_path: str, source_df: DataFrame | None,
                       schema_version: str, epochs: list[int] | None,
                       compact_every: int | None, group_commit: bool,
                       beat, transform=None) -> None:
        if (not self.table.exists()
                or not self.table.latest_meta().props.get("initial_loaded")):
            if source_df is None:
                raise ValueError(
                    "table missing or initial load incomplete, and no "
                    "initial source_df given")
            self.initial_load(source_df, schema_version)
        self._sync_buckets()
        events = self.spark.read.parquet(events_path)
        if transform is not None:
            # ingest pipeline hook — see replay() docstring; lazy, so it
            # fuses into every downstream epoch scan
            events = transform(events)
        if epochs is None:
            epochs = _list_epochs(events_path) or sorted(
                r["checkpoint_epoch"] for r in
                events.select("checkpoint_epoch").distinct().collect())
        done = self.table.committed_epochs()
        todo = [e for e in epochs if e not in done]
        if not todo:
            beat("idle")
            return
        beat("running")
        scope = events.filter(F.col("checkpoint_epoch").isin(todo))

        # One scan for ALL in-band DDL events of the run (vs one per epoch)
        schema_by_epoch: dict[int, list] = {e: [] for e in todo}
        for r in (scope.filter(F.col("op").isin(*SCHEMA_OPS))
                  .select("checkpoint_epoch", "schema_version", "event_seq")
                  .orderBy("event_seq").collect()):
            schema_by_epoch[r["checkpoint_epoch"]].append(r)

        # One count-only scan for ALL epochs' lineage pre-stats (valid reads
        # AND malformed counts per bucket — column-pruned to key cols + op +
        # epoch, no payload). Malformed-ness is state-independent, so DLQ
        # routing doesn't need to ride inside the per-epoch loop either.
        # Dynamic partition overwrite keeps re-runs idempotent without
        # clobbering other epochs' DLQ. With these in hand each MOR epoch
        # costs exactly ONE Spark job (see apply_epoch read_stats path).
        key_cols = self._key_cols()
        kc, cc = self._pred_args(events)
        vpred = valid_event_pred(kc, cc)
        # bucket_expr is total on null keys (xxhash64 skips nulls); keys
        # CAST to their declared types so these stats bucket exactly like
        # the normalized winners (raw event files may carry narrower
        # physical types — see bucket_expr's cast_types contract). Key
        # TYPES are stable across the stream: widening a key would change
        # the whole storage bucketing and requires an explicit re-bucket
        ktypes = {f["name"]: f["type"]
                  for f in self.table.latest_meta().fields
                  if f["name"] in key_cols}
        nb = bucket_expr(key_cols, self.n_buckets, cast_types=ktypes)
        data = scope.filter(~F.coalesce(F.col("op"), F.lit(-1)).isin(*SCHEMA_OPS))
        stat_rows = (data.withColumn("_bucket", nb).withColumn("_ok", vpred)
                     .groupBy("checkpoint_epoch", "_bucket", "_ok")
                     .agg(F.count(F.lit(1)).alias("n")).collect())
        err_by_epoch: dict[int, dict[int, int]] = {e: {} for e in todo}
        read_by_epoch: dict[int, dict[int, int]] = {e: {} for e in todo}
        n_err = 0
        for r in stat_rows:
            tgt = read_by_epoch if r["_ok"] else err_by_epoch
            tgt[r["checkpoint_epoch"]][r["_bucket"]] = r["n"]
            n_err += 0 if r["_ok"] else r["n"]
        if n_err:
            bad = data.filter(~vpred)
            (bad.withColumn("error_reason", _error_reason(kc))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .options(**fsutil.parquet_write_options())
             .partitionBy("checkpoint_epoch").parquet(self.errors_dir))

        # Group consecutive DDL-free epochs into one job+commit each
        # (apply_epoch_group). A DDL-carrying epoch starts a new group (its
        # DDL must apply before its own and all later data); compact_every
        # caps group length so the compaction cadence — and thus the delta
        # fold depth bound — is preserved. Only the merge-on-read mode has a
        # grouped path; cow modes stay per-epoch.
        groups: list[list[int]] = []
        cur: list[int] = []
        cap = compact_every or len(todo)
        for e in todo:
            if cur and (schema_by_epoch[e] or len(cur) >= cap
                        or not (group_commit and self.merge_mode == "mor")):
                groups.append(cur)
                cur = []
            cur.append(e)
        if cur:
            groups.append(cur)

        applied = 0
        for g in groups:
            if len(g) == 1:
                batch = events.filter(F.col("checkpoint_epoch") == g[0])
                self.apply_epoch(batch, g[0], err_stats=err_by_epoch[g[0]],
                                 schema_rows=schema_by_epoch[g[0]],
                                 read_stats=read_by_epoch[g[0]])
            else:
                batch = events.filter(F.col("checkpoint_epoch").isin(g))
                self.apply_epoch_group(batch, g, err_by_epoch, read_by_epoch,
                                       schema_rows=schema_by_epoch[g[0]])
            prev_applied, applied = applied, applied + len(g)
            beat("running", ep=g[-1])
            if compact_every and applied // compact_every > prev_applied // compact_every:
                # incremental: only delta-bearing buckets re-base; a bucket
                # the last `compact_every` epochs never touched is carried
                # by reference instead of rewritten (state-invariant)
                self.compact(min_delta_files=1)
        beat("idle", ep=todo[-1])

    # ------------------------------------------------------------- maintenance
    def expire_tombstones(self, watermark_op_ts: int) -> None:
        """Drop delete tombstones older than the watermark (table maintenance,
        run once the at-least-once redelivery window has passed — after this,
        a duplicate redelivery older than the watermark could resurrect a row,
        so pick the watermark ≤ min uncommitted upstream offset, exactly the
        ReceiverOffset committed-watermark contract).

        Bucket-pruned: one column-pruned scan finds which buckets actually
        hold expirable tombstones, and ONLY those are rewritten — at 100-TB
        scale the write cost follows the delete distribution, not the table
        size. Buckets without old tombstones are carried by reference."""
        self._sync_buckets()
        # the probe, the rewrite read and the commit are pinned to ONE
        # snapshot; the commit rebases over concurrent ingest (lake OCC)
        snap = self.table.latest()
        old_tomb = F.col("_deleted") & (F.col("_op_ts") < F.lit(watermark_op_ts))
        probe = (self.table.read(self.spark, with_internal_cols=True,
                                 snap=snap)
                 .filter(old_tomb)
                 .select(bucket_expr(self._key_cols(), self.n_buckets)
                         .alias("_bucket")))
        # O(buckets) driver list — the justified collect (cf. replay stats)
        todo = sorted(r["_bucket"] for r in probe.distinct().collect())
        if not todo:
            return
        df = (self.table.read(self.spark, buckets=todo,
                              with_internal_cols=True, snap=snap)
              .filter(~old_tomb)
              .withColumn("_bucket", bucket_expr(self._key_cols(), self.n_buckets)))
        self.table.commit_merge(df, todo, epoch=None, manifests=[],
                                maintenance=True, base=snap)

    def compact(self, n_buckets: int | str | None = None,
                min_delta_files: int | None = None,
                min_delta_bytes: int | None = None,
                target_rows_per_bucket: int = 1_000_000) -> None:
        """Rewrite buckets into one base file set under the current schema —
        bounds small-file count and delta-fold depth, and re-materializes
        alias/widen normalization (the Iceberg rewrite_data_files analog).

        ``min_delta_files`` makes the rewrite INCREMENTAL: only buckets whose
        delta-layer depth (file count from snapshot metadata — no data scan)
        reaches the threshold are rewritten; the rest carry forward by
        reference. This is the steady-state maintenance shape at 100 TB —
        compaction I/O follows where the churn went, not the table size
        (Iceberg ``rewriteDataFiles`` with a file filter).
        ``min_delta_bytes`` triggers on accumulated delta BYTES instead —
        the write-amplification-aware variant (sizes ride the snapshot's
        file records; the manifests' bytes_written column is the trend an
        operator reads to pick the threshold). Default (both None)
        rewrites everything.

        ``n_buckets`` RE-BUCKETS the table in the same atomic commit — the
        growth knob for 100-TB scale (static bucket counts eventually
        under-parallelize or over-fragment; re-bucket when average bucket
        size drifts out of range). Re-bucketing is necessarily full-table
        (old bucket ids are meaningless under the new hash), so it ignores
        ``min_delta_files``. Results are invariant: bucketing is pure key
        hashing, and subsequent engine instances pick the new count up from
        the snapshot (_sync_buckets).

        ``n_buckets="auto"`` sizes the new count from the table's
        STATISTICS instead of a scan (the stats earning their keep as a
        planner input): live-key count = the stored stats doc's row count
        (the merged state is keyed, so rows == keys), divided by
        ``target_rows_per_bucket`` and snapped to a power of two (so
        successive auto re-buckets halve/double instead of thrashing
        between near-equal counts). Requires a prior
        ``table_stats.analyze``/``refresh`` (raises FileNotFoundError
        otherwise — run one, or pass an explicit count); a stats doc a few
        epochs stale is fine, bucket sizing needs the magnitude, not the
        exact count."""
        self._sync_buckets()
        if n_buckets == "auto":
            from cdc_core_spark import table_stats as _ts
            doc = _ts.latest_stats_doc(self.table)
            if doc is None:
                raise FileNotFoundError(
                    "compact(n_buckets='auto') needs a statistics doc — "
                    "run table_stats.analyze()/refresh() first, or pass "
                    "an explicit bucket count")
            rows = sum(b["rows"] for b in doc["buckets"].values())
            n_buckets = max(1, 1 << max(
                0, (max(1, (rows + target_rows_per_bucket - 1)
                       // target_rows_per_bucket) - 1).bit_length()))
        nb = n_buckets or self.n_buckets
        self.table.compact(self.spark, n_buckets=n_buckets,
                           min_delta_files=min_delta_files,
                           min_delta_bytes=min_delta_bytes)
        self.n_buckets = nb

    def _bg_compact_loop(self, stop, errs: list,
                         min_delta_files: int) -> None:
        """Background maintainer driven by ``replay(background_compact=K)``:
        incremental rewrites against the live table, each pass pinned to
        the snapshot at its entry and rebased over whatever ingest commits
        meanwhile (lake OCC). Goes straight at ``self.table`` — never
        ``self.compact`` — so the replay thread's engine state
        (``n_buckets`` sync) is untouched. Between passes it waits for
        fresh ingest so an idle stream isn't rewritten in a hot loop.
        Any failure is recorded for the caller, which re-raises AFTER the
        replay finishes — a maintenance error must not kill ingest."""
        try:
            while not stop.is_set():
                if not self.table.exists():   # initial load not published yet
                    stop.wait(0.05)
                    continue
                v = self.table.latest_meta().version
                self.table.compact(self.spark,
                                   min_delta_files=min_delta_files)
                deadline = time.monotonic() + 5.0
                while (self.table.latest_meta().version <= v + 1
                       and time.monotonic() < deadline
                       and not stop.is_set()):
                    stop.wait(0.05)
        except Exception as e:               # re-raised by replay() post-run
            errs.append(e)

    # ------------------------------------------------------------------- reads
    def read_final(self, columns: list[str] | None = None) -> DataFrame:
        # the JVM shuffle fold, not table.read_aligned: measured at local[N]
        # the exchange is an in-memory copy and always beats the aligned
        # path's Python->JVM Arrow transfer (see read_aligned's docstring
        # for the numbers and the cluster regime where that flips).
        # ``columns`` prunes the projection into the scan (a .select on the
        # result cannot — the MOR fold blocks Catalyst column pruning).
        return self.table.read(self.spark, columns=columns)

    def count_final(self) -> int:
        """Converged-row count via a keys-only projected fold: the MOR fold
        must still run (tombstones and cross-epoch dedup make any metadata
        count wrong), but counting needs no payload column — at 100 TB a
        count that scans and shuffles every content byte is the wrong plan.
        Equal to ``read_final().count()`` by construction (winner identity
        is decided by key + version alone); pinned by test."""
        keys = self._key_cols()
        return self.table.read(self.spark, columns=[keys[0]]).count()

    def read_final_with_sha(self) -> DataFrame:
        """Final state + per-row content sha256 — the correctness invariant
        (FIXTURES.md §4; F.sha2 = ChecksumUtils.computeSHA256 analog)."""
        return self.read_final().withColumn("content_sha256", F.sha2(F.col("content"), 256))

    def manifests_df(self) -> DataFrame:
        """Per-(epoch, partition) lineage ledger. ``bytes_written`` /
        ``files_written`` are the MOR delta commit's staged write volume —
        the write-amplification signal an operator trends against
        ``events_applied`` to size ``compact_every`` (0 on copy-on-write /
        initial-load / quarantine-only rows)."""
        # default the write-volume fields: manifests committed by older
        # builds (or hand-written in tests) may predate them
        rows = [{"bytes_written": 0, "files_written": 0, **r}
                for r in self.table.all_manifests()]
        ddl = ("checkpoint_epoch int, partition_id int, events_read bigint, "
               "events_applied bigint, events_error bigint, max_op_ts bigint, "
               "max_event_seq bigint, wall_ms bigint, bytes_written bigint, "
               "files_written bigint")
        return self.spark.createDataFrame(rows, schema=ddl)

    def errors_df(self, empty_schema: str | None = None) -> DataFrame:
        """DLQ contents. A populated DLQ carries ALL original event columns
        plus (checkpoint_epoch, error_reason); an all-clean run never writes
        the directory, so the empty frame carries ONLY the minimal
        ``checkpoint_epoch int, error_reason string`` contract — callers
        selecting event columns must either guard on those two, or pass
        ``empty_schema`` (the event DDL, e.g. ``streaming.stream.EVENT_DDL``)
        so both paths stay column-compatible."""
        if not os.path.isdir(self.errors_dir):
            from pyspark.sql.types import (IntegerType, StringType,
                                           StructField, StructType)
            if empty_schema:
                # append only the DLQ columns the caller's DDL doesn't carry
                # (EVENT_DDL already ends in checkpoint_epoch — a blind
                # concat would duplicate it and break name resolution).
                # Parse with the real DDL parser, not string-splitting:
                # parameterized/nested types (decimal(10,2),
                # array<struct<a int,b int>>) contain commas that a split
                # would mis-tokenize into phantom column names
                st = StructType.fromDDL(empty_schema)
                have = {f.name.lower() for f in st.fields}
                for name, typ in (("checkpoint_epoch", IntegerType()),
                                  ("error_reason", StringType())):
                    if name not in have:
                        st = st.add(StructField(name, typ))
                return self.spark.createDataFrame([], schema=st)
            return self.spark.createDataFrame(
                [], schema="checkpoint_epoch int, error_reason string")
        return self.spark.read.parquet(self.errors_dir)

    def reprocess_errors(self, repair, repair_epoch: int,
                         source_epochs: list[int] | None = None) -> list[dict]:
        """DLQ retry path — the Error→Retry message-mode cycle
        (MessageObject.java:32-43 modes ``Error``/``Retry``; errors are
        produced by the sendError route, MessageProcessor.java:216-225).
        Reads the quarantine table (optionally only ``source_epochs``'
        partitions — partition-pruned scan), runs the caller's ``repair``
        plan over it (same contract as ``replay(transform=...)``: rewrite
        payload/envelope fields, keep the column set), and applies the
        result as NEW epoch ``repair_epoch`` with full bookkeeping:

        * exactly-once: ``repair_epoch`` gets its own commit manifests, so
          re-running the same repair is skipped up front;
        * rows STILL invalid after repair re-quarantine under
          ``repair_epoch`` (the unresolved remainder — original DLQ
          partitions are immutable audit and are never rewritten);
        * repaired events keep their ORIGINAL ``(op_ts, event_seq)``
          versions, so a repaired event that was long since superseded
          correctly loses the LWW merge instead of resurrecting stale data.

        Returns the manifest rows committed (empty when the DLQ selection
        is empty or the epoch was already committed)."""
        if repair_epoch in self.table.committed_epochs():
            return []
        bad = self.errors_df()
        if source_epochs is not None:
            bad = bad.filter(F.col("checkpoint_epoch").isin(source_epochs))
        bad = bad.drop("error_reason", "checkpoint_epoch")
        if bad.limit(1).count() == 0:
            return []
        return self.apply_epoch(repair(bad), repair_epoch)
