"""Deduplication operators for training-data pipelines.

Five strategies, each chosen for a different scale/recall tradeoff:

* ``exact_dedup`` — sha256-normalized hash groupBy (one shuffle, map-side
  partial agg; the only exact method).
* ``ngram_jaccard_pairs`` — exact Jaccard over n-gram token sets computed via
  an inverted-index self-join (explode → groupBy gram → pair counts), the
  standard distributed set-similarity join; no O(N²) cross join.
* ``minhash_near_dupes`` — MinHash signatures (JVM-side xxhash64 per
  permutation) + LSH banding (candidate pairs only where a band collides),
  the 100-TB-scale near-dup path.
* ``simhash64`` — 64-bit SimHash; token hashing stays JVM-side, the bit-fold
  is a vectorized Arrow pandas UDF (numpy), hamming-distance pairs via
  band-of-bits blocking.
* ``embedding_near_dupes`` — cosine near-duplicates over an embedding column
  via random-hyperplane LSH bucketing + exact rerank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def normalize_text(col) -> "F.Column":
    """Canonicalize before hashing: lowercase, collapse whitespace, strip
    non-alphanumerics (keeps spaces)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by sha256(normalized text): returns one row per
    duplicate-set with the canonical (min) id and the group size."""
    h = F.sha2(normalize_text(text_col), 256)
    return (df.withColumn("text_hash", h)
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").alias("dup_count")))


def tokens(col) -> "F.Column":
    return F.split(normalize_text(col), " ")


def ngrams(col, n: int = 3) -> "F.Column":
    """Distinct word n-grams of the normalized text."""
    t = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n))))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold via inverted index:
    |A∩B| from gram co-occurrence counts, |A|,|B| from per-doc gram counts.
    Shuffle cost O(total grams), never O(N²)."""
    g = (df.select(F.col(id_col).alias("doc"), ngrams(text_col, n).alias("grams"))
           .withColumn("n_grams", F.size("grams")))
    sizes = g.select("doc", "n_grams")
    inv = g.select("doc", F.explode("grams").alias("gram"))
    co = (inv.alias("a").join(inv.alias("b"),
                              (F.col("a.gram") == F.col("b.gram"))
                              & (F.col("a.doc") < F.col("b.doc")))
          .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
          .agg(F.count("*").alias("inter")))
    out = (co.join(sizes.withColumnRenamed("doc", "doc_a")
                        .withColumnRenamed("n_grams", "na"), "doc_a")
             .join(sizes.withColumnRenamed("doc", "doc_b")
                        .withColumnRenamed("n_grams", "nb"), "doc_b"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (out.withColumn("jaccard", F.round(jac, 6))
               .filter(F.col("jaccard") >= threshold)
               .select("doc_a", "doc_b", "jaccard"))


def minhash_signature(col, num_perm: int = 64, shingle_n: int = 3) -> "F.Column":
    """MinHash signature as array<long>: per permutation i, min over shingles
    of xxhash64(shingle, i). All JVM-side, codegen'd."""
    sh = ngrams(col, shingle_n)
    return F.array(*[
        F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_perm)
    ])


def minhash_near_dupes(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, bands: int = 16,
                       shingle_n: int = 3, threshold: float = 0.5) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs.

    Candidates = pairs colliding in ≥1 of ``bands`` bands (rows/band =
    num_perm/bands); estimated Jaccard = fraction of matching signature
    positions; pairs below threshold are filtered after the cheap estimate.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = df.select(F.col(id_col).alias("doc"),
                     minhash_signature(text_col, num_perm, shingle_n).alias("sig"))
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bkey"))
        for b in range(bands)
    ])
    bdf = sigs.select("doc", F.explode(band_arr).alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    cand = (bdf.alias("x").join(bdf.alias("y"),
                                (F.col("x.band") == F.col("y.band"))
                                & (F.col("x.bkey") == F.col("y.bkey"))
                                & (F.col("x.doc") < F.col("y.doc")))
            .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .distinct())
    est = (cand.join(sigs.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sa")), "doc_a")
               .join(sigs.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sb")), "doc_b")
               .withColumn("est_jaccard",
                           F.size(F.filter(F.zip_with("sa", "sb", lambda a, b: a == b),
                                           lambda x: x))
                           / F.lit(float(num_perm))))
    return est.filter(F.col("est_jaccard") >= threshold).select("doc_a", "doc_b", "est_jaccard")


def _simhash_fold_fn(hashes: pd.Series) -> pd.Series:
    """Arrow-vectorized SimHash bit-fold: per row, sum ±1 per bit over token
    hashes, sign → 64-bit fingerprint. numpy inner loop, no per-row Python
    beyond the row iteration of ragged arrays."""
    out = np.empty(len(hashes), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, h in enumerate(hashes):
        if h is None or len(h) == 0:
            out[i] = 0
            continue
        a = np.asarray(h, dtype=np.int64).astype(np.uint64)
        bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.int64((v > 0).astype(np.uint64) @ (np.uint64(1) << shifts))
    return pd.Series(out)


def _simhash_fold(col):
    # pandas_udf parses its return DDL eagerly — build it at call time so
    # importing this module never requires an active SparkSession
    return pandas_udf(_simhash_fold_fn, "long")(col)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash fingerprints: token hashing in the JVM (xxhash64 over tokens),
    bit-fold in Arrow/numpy."""
    tok_hashes = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    return df.select(F.col(id_col).alias("doc"),
                     _simhash_fold(tok_hashes).alias("simhash"))


def simhash_near_dupes(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k, blocked on 4 16-bit
    bands (pigeonhole: any pair within hamming ≤ 3 collides in ≥1 band)."""
    sh = simhash64(df, id_col, text_col)
    band = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bkey"))
        for b in range(4)
    ])
    bdf = sh.select("doc", "simhash", F.explode(band).alias("b")).select(
        "doc", "simhash", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    pairs = (bdf.alias("x").join(bdf.alias("y"),
                                 (F.col("x.band") == F.col("y.band"))
                                 & (F.col("x.bkey") == F.col("y.bkey"))
                                 & (F.col("x.doc") < F.col("y.doc")))
             .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"),
                     F.col("x.simhash").alias("ha"), F.col("y.simhash").alias("hb"))
             .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (pairs.withColumn("hamming", ham)
                 .filter(F.col("hamming") <= max_hamming)
                 .select("doc_a", "doc_b", "hamming"))


def embedding_near_dupes(df: DataFrame, id_col: str, vec_col: str,
                         dim: int, threshold: float = 0.95,
                         n_planes: int = 16, bands: int = 4,
                         seed: int = 42) -> DataFrame:
    """Embedding cosine near-duplicates: banded random-hyperplane LSH
    (candidates = pairs agreeing on ALL bits of ≥1 band — banding gives the
    same OR-amplification as MinHash LSH, so a flipped bit near a hyperplane
    doesn't lose the pair), exact cosine rerank on candidates."""
    assert n_planes % bands == 0
    r = n_planes // bands
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    def dot_lit(vec, plane) -> "F.Column":
        arr = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(F.zip_with(vec, arr, lambda a, b: a * b),
                           F.lit(0.0), lambda acc, x: acc + x)
    v = F.col(vec_col).cast("array<double>")
    bits = [F.when(dot_lit(v, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes]
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat(*bits[b * r:(b + 1) * r]).alias("bkey"))
        for b in range(bands)
    ])
    b = (df.select(F.col(id_col).alias("doc"), v.alias("v"),
                   F.explode(band_arr).alias("bd"))
           .select("doc", "v", F.col("bd.band").alias("band"),
                   F.col("bd.bkey").alias("bkey")))
    pairs = (b.alias("x").join(b.alias("y"),
                               (F.col("x.band") == F.col("y.band"))
                               & (F.col("x.bkey") == F.col("y.bkey"))
                               & (F.col("x.doc") < F.col("y.doc")))
             .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"),
                     F.col("x.v").alias("va"), F.col("y.v").alias("vb"))
             .dropDuplicates(["doc_a", "doc_b"]))
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    return (pairs.withColumn("cosine", F.round(dot / (na * nb), 6))
                 .filter(F.col("cosine") >= threshold)
                 .select("doc_a", "doc_b", "cosine"))
