"""S3 event-notification driven ingest — process files as their arrival
notifications come in, never LIST the bucket.

Reference: the S3 sync listener consumes SQS messages carrying S3 event
notifications and syncs each referenced object
(filesystem/.../sync/s3/process/S3EventListener.java, S3EventConsumer.java).

Spark-first shape: the notification stream (SQS/Kafka/file-drop of the
standard AWS S3 event JSON, a public format) is shredded with ``from_json``;
each microbatch collects its (tiny) set of newly-created object paths on the
driver and scans EXACTLY those files. At 100-TB bucket scale this is the
entire value of notification-driven ingest — a LIST of 10^8 objects per
batch is the anti-pattern, the notification batch is O(new files) — the same
reason Spark's own Auto-Loader-style file notification mode exists.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the standard S3 event notification envelope (subset we consume) — field
#: names per the published AWS event message structure
S3_EVENT_SCHEMA = (
    "Records array<struct<"
    "eventName: string, eventTime: string, "
    "s3: struct<bucket: struct<name: string>, "
    "object: struct<key: string, size: bigint>>>>"
)


def parse_s3_events(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Shred raw notification JSON strings into one row per object event:
    (bucket, key, size_bytes, event_name, event_time). Keeps only
    ObjectCreated:* events (the listener's sync trigger); deletes and test
    events are dropped."""
    rec = F.explode(F.from_json(F.col(value_col), S3_EVENT_SCHEMA)["Records"])
    out = (df.select(rec.alias("r"))
           # S3 notifications URL-encode object keys (space → '+', %xx):
           # decode so 'in/red flower.parquet' resolves to the real object
           .select(F.col("r.s3.bucket.name").alias("bucket"),
                   F.url_decode(F.col("r.s3.object.key")).alias("key"),
                   F.col("r.s3.object.size").alias("size_bytes"),
                   F.col("r.eventName").alias("event_name"),
                   F.to_timestamp("r.eventTime").alias("event_time")))
    return out.filter(F.col("event_name").startswith("ObjectCreated"))


def _default_resolver(bucket: str, key: str) -> str:
    return f"s3a://{bucket}/{key}"


def malformed_notifications(df: DataFrame, value_col: str = "value") -> DataFrame:
    """The notification lines ``parse_s3_events`` silently drops because the
    JSON itself is unparseable (``from_json`` → null struct). Valid JSON that
    merely lacks ``Records`` — e.g. the s3:TestEvent sent on bucket
    configuration — is NOT flagged: dropping those is the contract. Used by
    the ingest loop's ``on_malformed`` guard so a corrupt feed line can't
    silently strand its objects (the module's whole premise is that there is
    no LIST fallback to rediscover them).

    Spark's PERMISSIVE ``from_json`` returns a null-FIELDED struct (not a
    null struct) for corrupt input, so unparseable JSON is detected via the
    ``columnNameOfCorruptRecord`` channel rather than a null test."""
    parsed = F.from_json(
        F.col(value_col), S3_EVENT_SCHEMA + ", _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"})
    return df.filter(F.col(value_col).isNotNull()
                     & (F.trim(F.col(value_col)) != F.lit(""))
                     & parsed["_corrupt"].isNotNull())


def notified_paths(notifications: DataFrame,
                   resolver: Callable[[str, str], str] = _default_resolver,
                   value_col: str = "value") -> list[str]:
    """Driver-side path list for one notification batch — O(batch), the
    deliberate exception to the no-collect rule: a batch of notifications is
    thousands of rows, not the table."""
    rows = (parse_s3_events(notifications, value_col)
            .select("bucket", "key").distinct().collect())
    return [resolver(r["bucket"], r["key"]) for r in rows]


def s3_event_ingest(engine, notifications_path: str, checkpoint_dir: str,
                    resolver: Callable[[str, str], str] = _default_resolver,
                    schema: str | None = None,
                    file_format: str = "parquet",
                    available_now: bool = True,
                    on_malformed: str = "error",
                    on_missing: str = "error"):
    """Notification-driven engine ingest: tail the notification feed (a text
    stream of S3 event JSON — swap the file source for the SQS/Kafka feed in
    deployment, the body is source-agnostic like stream_ingest), and per
    microbatch scan ONLY the notified objects and apply them as an epoch.

    Exactly-once composition is unchanged: Spark checkpoints the
    notification offsets, redelivered batches hit the engine's
    committed-epoch skip, and the epoch merge is idempotent.

    Both knobs are validated below (same contract as archive/mail): a
    typo'd value would otherwise silently revert to 'error' behavior —
    and for ``on_missing`` that is a permanently halted stream, the exact
    outage the knob exists to prevent.

    Failure routing — both knobs exist because there is no LIST fallback to
    rediscover a dropped object, so silent loss must be opt-in:

    * ``on_malformed``: ``"error"`` (default) fails the batch when a feed
      line is unparseable JSON (``malformed_notifications``) so the poison
      line is surfaced instead of its objects silently never syncing;
      ``"skip"`` drops them (documented residue).
    * ``on_missing``: a notified object can 404 at scan time (lifecycle
      expiry between notification and scan) — the scan error would otherwise
      fail the batch and every restart redelivers the same batch, halting the
      stream permanently. ``"error"`` (default) keeps that loud behavior;
      ``"skip"`` drops missing paths after a driver-side existence probe
      (O(batch) metadata calls)."""
    for knob, val in (("on_malformed", on_malformed),
                      ("on_missing", on_missing)):
        if val not in ("error", "skip"):
            raise ValueError(
                f"{knob} must be 'error' or 'skip', got {val!r}")
    from cdc_core_spark import fsutil
    from cdc_core_spark.streaming.stream import stream_epoch_base

    spark = engine.spark
    epoch_base = stream_epoch_base(engine, checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        epoch = epoch_base + int(batch_id)
        if epoch in engine.table.committed_epochs():
            return
        if on_malformed != "skip":
            bad = malformed_notifications(batch_df).limit(3).collect()
            if bad:
                sample = "; ".join(r["value"][:120] for r in bad)
                raise ValueError(
                    f"unparseable S3 event notification line(s) in batch "
                    f"{batch_id} (on_malformed='skip' to drop): {sample}")
        paths = notified_paths(batch_df, resolver)
        if on_missing == "skip":
            paths = [p for p in paths if fsutil.exists(spark, p)]
        if not paths:
            return
        reader = spark.read.format(file_format)
        if schema:
            reader = reader.schema(schema)
        engine.apply_epoch(reader.load(paths), epoch)

    q = (spark.readStream.format("text").load(notifications_path)
         .writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir))
    q = (q.trigger(availableNow=True) if available_now
         else q.trigger(processingTime="5 seconds"))
    query = q.start()
    if available_now:
        query.awaitTermination()
    return query  # continuous mode: caller owns stop()/awaitTermination()
