"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k, fully JVM-side
  (``zip_with``/``aggregate`` dot product against a literal query vector);
  the correctness baseline. One scan + one top-k (no full sort shuffle —
  Spark's ``orderBy().limit(k)`` compiles to TakeOrderedAndProject with
  per-partition partial top-k).
* ``ivf_topk`` — IVF-style scale path: deterministic seeded centroids,
  vectors pre-assigned to their nearest centroid (Arrow/numpy batch matmul),
  queries probe only the ``nprobe`` nearest cells. At 100 TB the assignment
  is a one-off write amortized over all queries, and each query touches
  ~nprobe/ncells of the data (partition-pruned when stored partitioned by
  cell id).
* ``lsh_topk`` — random-hyperplane bucketing prefilter + exact rerank.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_with_lit(vec_col, q: list[float]) -> "F.Column":
    arr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(F.zip_with(vec_col, arr, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col) -> "F.Column":
    return F.sqrt(F.aggregate(F.transform(vec_col, lambda a: a * a),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_scores(df: DataFrame, id_col: str, vec_col: str,
                  query: list[float]) -> DataFrame:
    qn = float(np.linalg.norm(query))
    v = F.col(vec_col).cast("array<double>")
    cos = _dot_with_lit(v, query) / (_norm(v) * F.lit(qn))
    return df.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query: list[float], k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine; deterministic tiebreak on id."""
    return (cosine_scores(df, id_col, vec_col, query)
            .orderBy(F.col("cosine").desc(), F.col("vec_id"))
            .limit(k))


def ivf_assign(df: DataFrame, id_col: str, vec_col: str,
               centroids: np.ndarray) -> DataFrame:
    """Assign every vector to its nearest centroid (squared-L2) using an
    Arrow-batched mapInPandas matmul — one numpy GEMM per batch, no per-row
    Python."""
    cn = (centroids ** 2).sum(axis=1)
    c_t = centroids.T.copy()
    out_schema = f"{id_col} long, cell int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = (m ** 2).sum(axis=1)[:, None] - 2.0 * (m @ c_t) + cn[None, :]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "cell": d.argmin(axis=1).astype(np.int32)})

    return df.select(id_col, vec_col).mapInPandas(assign, schema=out_schema)


def deterministic_centroids(df: DataFrame, vec_col: str, n_cells: int,
                            id_col: str) -> np.ndarray:
    """Seedless-deterministic centroid pick: the n_cells vectors with the
    smallest xxhash64(id) — stable across runs and cluster sizes."""
    rows = (df.select(id_col, vec_col)
            .withColumn("_h", F.xxhash64(F.col(id_col)))
            .orderBy("_h").limit(n_cells).collect())
    return np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, query: list[float],
             k: int = 10, n_cells: int = 16, nprobe: int = 4,
             centroids: np.ndarray | None = None,
             assignments: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells, exact rerank."""
    if centroids is None:
        centroids = deterministic_centroids(df, vec_col, n_cells, id_col)
    if assignments is None:
        assignments = ivf_assign(df, id_col, vec_col, centroids)
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:nprobe]]
    cand = df.join(assignments.filter(F.col("cell").isin(probe)), id_col, "inner")
    return cosine_topk(cand, id_col, vec_col, query, k)


def cosine_pairs_exact(df: DataFrame, id_col: str, vec_col: str,
                       threshold: float) -> DataFrame:
    """Exact all-pairs cosine similarity ≥ threshold (id_a < id_b).

    One side of the n×n comparison is collected to a broadcast numpy matrix;
    each Arrow batch of the other side does a single GEMM against it. Exact
    by construction — this is the correctness baseline that
    ``dedup.embedding_near_dupes`` (hyperplane-LSH bucketed) approximates;
    at 10^9-vector scale use the LSH variant and rerank, the broadcast side
    here is bounded by driver/executor memory.
    """
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((ids, m))
    thr = float(threshold)

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, mat = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
            sims = a @ mat.T
            a_ids = pdf[id_col].to_numpy().astype(np.int64)
            keep = (sims >= thr) & (a_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame({"id_a": a_ids[ai], "id_b": all_ids[bj],
                                "cosine": sims[ai, bj]})

    return (df.select(id_col, vec_col)
            .mapInPandas(pairs, schema="id_a long, id_b long, cosine double"))


def lsh_topk(df: DataFrame, id_col: str, vec_col: str, query: list[float],
             k: int = 10, n_planes: int = 12, dim: int | None = None,
             seed: int = 42, max_hamming: int = 2) -> DataFrame:
    """Random-hyperplane LSH prefilter: keep vectors whose sign-signature is
    within ``max_hamming`` bits of the query's, then exact rerank."""
    dim = dim or len(query)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query, dtype=np.float64)
    q_bits = (planes @ q >= 0).astype(int)
    v = F.col(vec_col).cast("array<double>")
    bits = [F.when(_dot_with_lit(v, p) >= 0, 1).otherwise(0) for p in planes]
    ham = bits[0] * 0
    for b, qb in zip(bits, q_bits):
        ham = ham + F.abs(b - F.lit(int(qb)))
    cand = df.withColumn("_ham", ham).filter(F.col("_ham") <= max_hamming).drop("_ham")
    return cosine_topk(cand, id_col, vec_col, query, k)
