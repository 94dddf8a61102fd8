"""Last-writer-wins reduction over change events.

The reference serializes all events of a key through a single-threaded shard
(core/.../executor/BaseShardedExecutor.java:137-209) so the last write by
``TransactionId.sequence`` wins (persistence/.../model/BaseEntity.java:125-128).
Order-insensitively, that is: *per key, keep the event with the maximum
version tuple ``(op_ts, event_seq)``*.

Spark-first realization: an **algebraic ``max_by`` aggregation**, not a
``row_number`` window. (Physically Spark plans ``max_by`` over a struct as a
SortAggregate — struct buffers aren't hash-aggregable — but crucially still
in partial+final mode.) Rationale at 10^10-event scale:

* partial aggregation gives a map-side combine (each task reduces its
  slice of a hot key to one row before the shuffle), so a hot repo with 30%
  of all events ships ~one row per upstream task instead of 3·10^9 rows to a
  single reducer — the window variant would shuffle-sort the entire hot
  partition with no pre-shuffle reduction;
* ``max_by`` over the version struct is associative/commutative, so an
  explicit **salted two-stage** variant (stage 1 per (key, salt), stage 2 per
  key) is available as a belt-and-braces skew defense and provably returns
  identical results (tested for any salt count);
* exact duplicate deliveries (same ``(repo, path, op_ts, event_seq)``) need
  no separate ``dropDuplicates`` shuffle — duplicates carry identical
  payloads, so the max_by tie collapses them for free.

Tie-break totality: the version struct compares ``op_ts`` first then
``event_seq`` (globally unique), never timestamp alone (SURVEY §7 risk 2).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERSION_ORDER = ("_op_ts", "_event_seq")


def lww_reduce(events: DataFrame, key_cols: list[str],
               payload_cols: list[str], salt: int | None = None,
               with_stats: bool = False) -> DataFrame:
    """Reduce to one winner row per key: the max-(op_ts, event_seq) event.

    ``events`` must carry ``_op_ts``/``_event_seq`` version columns.
    ``salt`` enables the explicit two-stage skew path (None = rely on
    Spark's built-in partial aggregation).

    ``with_stats`` additionally emits per-key lineage columns in the SAME
    aggregation (no extra scan job): ``_n_events`` (valid events reduced into
    this winner) and ``_max_seq`` (max event_seq seen — NOT necessarily the
    winner's seq under out-of-order op_ts). Winner op_ts is already the key's
    max op_ts (first component of the lexicographic version max).
    """
    ver = F.struct(*[F.col(c) for c in VERSION_ORDER])
    pay = F.struct(*[F.col(c) for c in VERSION_ORDER + tuple(payload_cols)])
    if salt is None:
        aggs = [F.max_by(pay, ver).alias("_w")]
        if with_stats:
            aggs += [F.count(F.lit(1)).alias("_n_events"),
                     F.max("_event_seq").alias("_max_seq")]
        won = events.groupBy(*key_cols).agg(*aggs)
    else:
        salted = events.withColumn(
            "_salt", F.pmod(F.xxhash64(*VERSION_ORDER), F.lit(salt)))
        aggs1 = [F.max_by(pay, ver).alias("_w")]
        if with_stats:
            aggs1 += [F.count(F.lit(1)).alias("_n_events"),
                      F.max("_event_seq").alias("_max_seq")]
        stage1 = salted.groupBy(*key_cols, "_salt").agg(*aggs1)
        ver1 = F.struct(F.col("_w._op_ts"), F.col("_w._event_seq"))
        aggs2 = [F.max_by(F.col("_w"), ver1).alias("_w")]
        if with_stats:
            aggs2 += [F.sum("_n_events").alias("_n_events"),
                      F.max("_max_seq").alias("_max_seq")]
        won = stage1.groupBy(*key_cols).agg(*aggs2)
    extra = ["_n_events", "_max_seq"] if with_stats else []
    return won.select(*key_cols, "_w.*", *extra)


def choose_lww_salt(events: DataFrame, key_cols: list[str],
                    sample_fraction: float = 0.001,
                    hot_share_threshold: float = 0.5,
                    min_sample_rows: int = 1_000,
                    salt: int = 16) -> int | None:
    """Cheap key-histogram probe → salt decision for ``lww_reduce``.

    One sampled aggregation job (``sample(fraction)`` pushes a Bernoulli
    filter into the scan; the probe moves ~``fraction`` of the key bytes,
    nothing else) measures the hottest key's share of events. Returns
    ``salt`` when that share ≥ ``hot_share_threshold``, else ``None``
    (plain single-stage ``max_by``).

    **Threshold rationale (measured, BENCH skew_defense)**: plain
    ``max_by``'s partial aggregation already collapses a hot key to ~one
    row per map task before the shuffle, so on this engine the salted
    two-stage path costs ~2.7× when skew is absent and wins only in the
    regime partial aggregation can't cover — a single key so dominant
    (≥ ~half the stream) that stage-1 fan-out of its per-task partials
    across ``salt`` reducers beats funneling them to one, e.g. when wide
    payload structs make the final-stage buffer the bottleneck. Hence the
    deliberately HIGH default threshold: salting is the exception, and a
    mis-probe in the common case costs 2.7×, while a mis-probe under
    extreme skew costs far less. An undersized sample (< ``min_sample_rows``
    rows) returns ``None`` — too little signal to justify the exception."""
    agg = (events.select(*key_cols).sample(fraction=sample_fraction, seed=7)
           .groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
           .agg(F.max("_n").alias("_hot"), F.sum("_n").alias("_tot"))
           .first())
    if agg["_tot"] is None or agg["_tot"] < min_sample_rows:
        return None
    return salt if agg["_hot"] / agg["_tot"] >= hot_share_threshold else None


def lww_reduce_adaptive(events: DataFrame, key_cols: list[str],
                        payload_cols: list[str],
                        with_stats: bool = False, **probe_kwargs) -> DataFrame:
    """``lww_reduce`` with the salt chosen by ``choose_lww_salt`` instead of
    a caller knob — removes the footgun of salting an unskewed stream
    (2.7× measured) or not salting a pathologically hot one. Equivalence
    (adaptive ≡ plain ≡ salted) is pinned by tests for both probe
    outcomes; the probe costs one sampled aggregation job."""
    salt = choose_lww_salt(events, key_cols, **probe_kwargs)
    return lww_reduce(events, key_cols, payload_cols, salt=salt,
                      with_stats=with_stats)


def lww_reduce_in_partition(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-partition LWW reduce via an Arrow-batched incremental fold.

    Requires every row of a key to live in one partition (e.g. after
    ``repartition(n, "_bucket")`` where ``_bucket`` is a pure function of the
    key). This replaces the second full-table shuffle of the merge path: the
    union of target-state and epoch winners is shuffled ONCE by storage
    bucket and reduced in place, so the MERGE is a single-shuffle job.

    The fold is associative: each Arrow batch is concatenated with the
    winners-so-far and re-reduced, bounding memory at O(distinct keys in
    partition) instead of O(partition).

    mapInArrow + ArrowDtype-backed pandas, NOT plain mapInPandas: the
    default Arrow→pandas conversion turns an int64 column containing ANY
    null into float64 (numpy has no nullable int), silently rounding values
    ≥ 2^53 on the way through — and a schema evolution that ADDs a bigint
    column guarantees nulls in old base rows, so after one evolution every
    cow-arrow merge would corrupt snowflake-scale ids while the max_by
    paths return them exactly. ArrowDtype columns keep the original Arrow
    buffers (and exact int64) end to end — the same reason the Avro codec
    uses mapInArrow.
    """
    cols = df.columns
    schema = df.schema

    def reduce_partition(batches):
        import pyarrow as pa
        acc = None
        in_schema = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if in_schema is None:
                in_schema = b.schema
            pdf = (pa.Table.from_batches([b])
                   .to_pandas(types_mapper=pd.ArrowDtype))
            both = pdf if acc is None else pd.concat([acc, pdf],
                                                     ignore_index=True)
            # na_position='first' + dropna=False: pandas sorts NA LAST and
            # drops null group keys by default — either would silently make
            # this fold diverge from Spark's max_by (null version loses,
            # null keys form their own group) on the other merge paths.
            # (SnapshotTable.read_aligned's pure-Arrow fold mirrors the same
            # two rules; read-vs-read_aligned equality tests pin them.)
            both = both.sort_values(["_op_ts", "_event_seq"], kind="stable",
                                    na_position="first")
            acc = (both.groupby(key_cols, as_index=False, sort=False,
                                dropna=False).tail(1))
        if acc is not None:
            out = pa.Table.from_pandas(acc[cols], preserve_index=False)
            yield from out.cast(in_schema).to_batches()

    return df.mapInArrow(reduce_partition, schema=schema)
