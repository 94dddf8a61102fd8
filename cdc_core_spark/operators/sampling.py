"""Deterministic sampling / splitting for training-data curation.

A 100-TB corpus pipeline needs sampling decisions that are reproducible and
CONTENT-STABLE: the same document must land on the same side of a
train/holdout split across runs, cluster sizes, and corpus versions —
otherwise every re-crawl/re-dedup leaks yesterday's eval docs into today's
training set. Random `df.sample` gives none of that; hashing the document id
with a salt gives all of it.

* ``split_bucket`` / ``consistent_split`` — md5(id:salt) → permille bucket →
  train/holdout tag. Pure built-in expressions, one scan, zero shuffles,
  trivially pushdown-friendly. Changing the salt re-draws the assignment;
  keeping it pins the split forever.
* ``consistent_sample`` — the same mechanism as a rate filter.
* ``stratified_sample_exact`` — exactly k docs per stratum, chosen by the
  smallest salted hashes (deterministic reservoir): one window shuffle per
  call, SQL-expressible (rank over hash), unlike `sampleBy` which is
  per-row-random and only approximate per stratum.

md5 (not xxhash64) on purpose: identical hex output exists in every SQL
engine, so assignments can be recomputed — and audited — outside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(id_col, salt: str, buckets: int = 1000):
    """Deterministic bucket in [0, buckets): first 48 bits of
    md5(id ':' salt) mod buckets."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 12), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(buckets))


def consistent_split(df: DataFrame, id_col: str, holdout_permille: int = 20,
                     salt: str = "split-v1",
                     split_col: str = "split") -> DataFrame:
    """Tag every row 'holdout' (bucket < permille) or 'train'.

    A NULL id has no stable identity to hash, so its split is NULL — never
    a silent 'train' (the when/otherwise fallthrough would have hidden it):
    the same population ``consistent_sample`` excludes, made visible so the
    caller can repair or filter it deliberately."""
    b = split_bucket(id_col, salt)
    return df.withColumn(
        split_col,
        F.when(F.col(id_col).isNull(), F.lit(None).cast("string"))
         .when(b < holdout_permille, F.lit("holdout"))
         .otherwise(F.lit("train")))


def consistent_sample(df: DataFrame, id_col: str, permille: int,
                      salt: str = "sample-v1") -> DataFrame:
    """Keep a deterministic ~permille/1000 subset (same ids every run).
    NULL ids are excluded (a null bucket fails the comparison) — consistent
    with consistent_split's NULL tag for the same rows."""
    return df.filter(split_bucket(id_col, salt) < permille)


def stratified_sample_exact(df: DataFrame, strata_col: str, id_col: str,
                            k: int, salt: str = "strata-v1") -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: rank by the salted hash
    (id as the total-order tiebreak) inside each stratum and keep the top k.
    One shuffle on the strata column; at scale prefer many strata per
    partition (the window is per-stratum sequential). NULL ids are excluded
    BEFORE ranking — consistent with consistent_split/consistent_sample's
    NULL handling; left in, their NULL hash would sort NULLS FIRST and
    preferentially fill the k slots."""
    w = (Window.partitionBy(strata_col)
         .orderBy(split_bucket(id_col, salt, buckets=1 << 48),
                  F.col(id_col)))
    return (df.filter(F.col(id_col).isNotNull())
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))
