"""Structured Streaming ingest — the continuous-tail variant of the epoch loop.

The reference's processor loop (MessageProcessor.doRun, :144-193) is a
pull-based microbatch consumer; Spark's native equivalent is a streaming
source + ``foreachBatch``. Each microbatch flows through the exact same
engine path (quarantine → registry → LWW → merge → manifest commit), so
batch and streaming share one implementation — the Kappa-architecture shape.

Exactly-once: Spark's checkpoint gives at-least-once batch redelivery after
restart; the engine's committed-epoch check + idempotent merge upgrade it to
exactly-once effects (same mechanism as the batch path — re-applying a
committed batch id is a no-op).

At scale, swap the file source for ``spark.readStream.format("kafka")`` —
the foreachBatch body is unchanged (the reference's BaseKafkaConsumer /
BaseChronicleConsumer duality collapses into the source option).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cdc_core_spark.engine import CdcEngine

EVENT_DDL = ("op bigint, repo string, path string, commit string, lang string, "
             "language string, content string, size_bytes bigint, rev bigint, "
             "op_ts bigint, event_seq bigint, txid bigint, schema_version string, "
             "checkpoint_epoch int")


def stream_ingest(engine: CdcEngine, events_path: str, checkpoint_dir: str,
                  max_files_per_trigger: int = 1,
                  available_now: bool = True) -> None:
    """Tail the event-log directory as a file stream and apply each microbatch
    through the engine. ``availableNow`` drains the backlog and stops
    (test/backfill mode); disable it for a continuous tail."""
    stream = (engine.spark.readStream
              .schema(EVENT_DDL)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .option("basePath", events_path)
              .parquet(events_path + "/*"))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        epoch = int(batch_id)
        if epoch in engine.table.committed_epochs():
            return  # redelivered batch after restart — exactly-once skip
        if batch_df.isEmpty():
            return
        engine.apply_epoch(batch_df, epoch)

    q = (stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir))
    q = q.trigger(availableNow=True) if available_now else q.trigger(processingTime="5 seconds")
    query = q.start()
    if available_now:
        query.awaitTermination()
