"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batch iteration, partition sizing, UDF
signatures) is real and tested; the actual codec work is STUBBED behind
``decode_fn`` hooks because no image/audio libraries ship in this container —
plug Pillow/torchaudio/ffmpeg decoders in production. A deterministic fake
decoder is provided so tests exercise the full distributed path.

Design notes for 100 TB:
* binary payloads live in their own column so Parquet column pruning skips
  them unless the op needs bytes;
* ``mapInPandas`` streams Arrow batches — peak executor memory is one batch,
  not one partition; cap ``spark.sql.execution.arrow.maxRecordsPerBatch``
  when payloads are large;
* outputs are flat feature columns (no re-emission of the blob) so downstream
  stages shuffle features, not media.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, mime string, width int, height int, "
                "duration_ms long, payload binary")


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel array derived from
    the payload itself (stable across runs/executors)."""
    a = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(a.size)), 1)
    return np.resize(a, (side, side)).astype(np.float64)


def real_decode(payload: bytes) -> np.ndarray:
    """Production hook — wire a real codec here (Pillow/av/soundfile)."""
    raise NotImplementedError("media codecs are not available in this container")


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id",
                     decode_fn: Callable[[bytes], np.ndarray] = fake_decode,
                     ) -> DataFrame:
    """Decode → per-item feature vector (mean/std/histogram-8), streamed in
    Arrow batches. Output drops the blob column by construction.

    The 8-bin histogram is emitted as flat scalar columns ``hist_0..hist_7``
    (not ``array<double>``): scalar features shuffle/prune better downstream,
    and the driver's correctness canon only handles scalar cells."""
    hist_cols = [f"hist_{i}" for i in range(8)]
    out_schema = (f"{id_col} long, n_bytes long, mean double, std double, "
                  + ", ".join(f"{c} double" for c in hist_cols))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def r6(x: float) -> float:
            # round-half-AWAY to 6 places (what SQL round() does): decode
            # sizes are often powers of two, so exact .5e-6 ties happen and
            # Python's banker's rounding would diverge from the SQL oracle
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_fn(bytes(payload))
                n = max(arr.size, 1)
                hist, _ = np.histogram(arr, bins=8, range=(0, 256))
                hist = np.floor(hist / n * 1e6 + 0.5) / 1e6
                # mean/std via the exact-integer-sum → double-divide sequence
                # (sqrt(E[x²] − E[x]²)): the same IEEE op order a SQL oracle
                # computes, so both sides round the identical double
                s1 = float(arr.sum())
                s2 = float((arr * arr).sum())
                mean = s1 / n
                std = math.sqrt(max(s2 / n - mean * mean, 0.0))
                rows.append((int(mid), len(payload), r6(mean),
                             r6(std), *hist.tolist()))
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "mean", "std",
                                              *hist_cols])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", target: tuple[int, int] = (32, 32),
                  decode_fn: Callable[[bytes], np.ndarray] = fake_decode) -> DataFrame:
    """Decode → nearest-neighbor resize → flat array (deterministic)."""
    h, w = target
    out_schema = f"{id_col} long, pixels array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_fn(bytes(payload))
                yi = (np.arange(h) * arr.shape[0] // h)
                xi = (np.arange(w) * arr.shape[1] // w)
                pix.append(arr[np.ix_(yi, xi)].ravel().tolist())
                ids.append(int(mid))
            yield pd.DataFrame({id_col: ids, "pixels": pix})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (codec stubbed — emits frame offsets from duration metadata only)."""
    # duration 0 (zero-length or metadata-missing asset) yields NO frames —
    # sequence(0, greatest(d-1, 0)) would emit a phantom frame at ts 0;
    # explode (not explode_outer) drops the empty array row entirely
    ts = F.when(F.col("duration_ms") > 0,
                F.sequence(F.lit(0).cast("long"),
                           (F.col("duration_ms") - 1).cast("long"),
                           F.lit(int(every_ms)).cast("long"))
                ).otherwise(F.array().cast("array<long>"))
    return (df.select(id_col, "duration_ms")
            .withColumn("frame_ts_ms", F.explode(ts))
            .withColumn("frame_index",
                        (F.col("frame_ts_ms") / F.lit(every_ms)).cast("int")))


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Derive a MEDIA_SCHEMA table from a text corpus: the payload is the
    document's bytes (opaque binary, exactly how a real pipeline carries
    undecoded media), metadata derived deterministically from the id. Lets
    the multimodal plumbing run over the provided testdata tables instead of
    a synthesized corpus — row count and payload sizes scale with the SF."""
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    mid = F.col(id_col).cast("long")
    # pmod, not %: Spark's % is SIGNED, so a negative doc id would hand
    # element_at an index ≤ 0 (runtime error at 0, silent LAST element at
    # negative) and produce negative widths/durations. Identical to % for
    # the non-negative ids the oracles mirror.
    kind = F.element_at(F.array(*[F.lit(k) for k, _ in kinds]),
                        (F.pmod(mid, 3) + 1).cast("int"))
    mime = F.element_at(F.array(*[F.lit(m) for _, m in kinds]),
                        (F.pmod(mid, 3) + 1).cast("int"))
    return docs.select(
        mid.alias("media_id"), kind.alias("kind"), mime.alias("mime"),
        (F.pmod(mid, 64) + 16).cast("int").alias("width"),
        (F.pmod(mid, 48) + 16).cast("int").alias("height"),
        F.pmod(mid * 37, 5000).cast("long").alias("duration_ms"),
        F.encode(F.col(text_col), "utf-8").alias("payload"))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload = seeded
    bytes; kind/mime cycled) for tests and benchmarks."""
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(F.array(*[F.lit(k) for k, _ in kinds]),
                        (F.col("media_id") % 3 + 1).cast("int"))
    mime = F.element_at(F.array(*[F.lit(m) for _, m in kinds]),
                        (F.col("media_id") % 3 + 1).cast("int"))
    payload = F.encode(
        F.concat_ws("", *[F.sha2(F.concat(F.col("media_id").cast("string"),
                                          F.lit(f"|{i}")), 256) for i in range(8)]),
        "utf-8")
    return (df.withColumn("kind", kind).withColumn("mime", mime)
            .withColumn("width", (F.col("media_id") % 64 + 16).cast("int"))
            .withColumn("height", (F.col("media_id") % 48 + 16).cast("int"))
            .withColumn("duration_ms", (F.col("media_id") * 37 % 5000).cast("long"))
            .withColumn("payload", payload))
