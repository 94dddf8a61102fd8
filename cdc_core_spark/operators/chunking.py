"""Document chunking and sequence packing — the last mile of training-data
prep: long documents must be split into bounded windows, and short ones
packed together so training sequences don't waste context on padding.

* ``chunk_text`` — fixed-size character windows with overlap, one output row
  per chunk. Pure built-ins: ``explode(sequence(...))`` over the window
  starts + ``substring`` — no UDF, fully parallel, and the whole construction
  is expressible in ANSI SQL (the gate oracle recomputes it in DuckDB).
* ``pack_documents`` — sequential QUOTA packing per stratum: walk docs in
  (stratum, doc_id) order and assign each doc to pack
  ``floor(start_position / target_tokens)`` of the small-doc stream
  (oversized docs ≥ target are separated first and always stand alone).
  Expressed as a running-sum window + integer division — deterministic, one
  shuffle on the stratum column, closed-form, and therefore recomputable by
  an ANSI-SQL oracle. Packing runs PER STRATUM (e.g. language) because a
  single global ordered window would serialize onto one task; strata bound
  the window width, which is also what training pipelines want (don't pack
  French into an English batch).

Quota packing vs classic greedy ("close the pack when the next doc would
overflow, re-base the counter"): greedy's running re-base has no closed
form, so it can't be window-expressed OR oracle-checked; quota packing
differs from it only in fill ratio (a pack may overshoot by at most one
doc's tail), never in determinism or coverage — the documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_text(df: DataFrame, id_col: str, text_col: str,
               chunk_chars: int = 512, overlap: int = 64) -> DataFrame:
    """One row per window: (id, chunk_index, chunk). Windows start every
    ``chunk_chars - overlap`` characters; the last window is the remainder
    (≤ chunk_chars). A tail window whose remainder is ≤ ``overlap`` is NOT
    emitted — it would be a strict substring of the previous chunk,
    duplicating training text for no coverage gain. Empty docs yield one
    empty chunk."""
    if not 0 <= overlap < chunk_chars:
        # a NEGATIVE overlap would make the stride exceed the window and
        # silently drop a slice of every document between windows — the
        # worst failure mode for training text (no error, missing data)
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_chars, got "
            f"overlap={overlap} chunk_chars={chunk_chars}")
    step = chunk_chars - overlap
    n = F.length(F.col(text_col))
    # last start index: largest i with i*step + overlap < len (the window
    # contributes at least one character beyond the previous one), clamped
    # to 0 so every doc yields ≥ 1 chunk
    last_idx = F.greatest(F.floor((n - F.lit(overlap) - 1) / step), F.lit(0))
    idx = F.explode(F.sequence(F.lit(0), last_idx.cast("int")))
    out = (df.select(F.col(id_col), F.col(text_col))
           .withColumn("chunk_index", idx)
           .withColumn("chunk",
                       F.substring(F.col(text_col),
                                   F.col("chunk_index") * step + 1,
                                   chunk_chars))
           .drop(text_col))
    return out


def pack_documents(df: DataFrame, strata_col: str, id_col: str,
                   tokens_col: str, target_tokens: int) -> DataFrame:
    """Assign (stratum, doc) → pack_id by cumulative token quota within the
    stratum's (doc_id) order. Output: stratum, doc, tokens, pack_id where
    pack_id is dense within each stratum starting at 0; docs with
    tokens ≥ target each occupy their own pack."""
    w = Window.partitionBy(strata_col).orderBy(id_col)
    big = F.col(tokens_col) >= target_tokens
    # small docs: quota grouping on the running sum EXCLUDING oversized docs
    small_cum = F.sum(F.when(big, 0).otherwise(F.col(tokens_col))).over(w)
    small_pack = F.floor((small_cum - F.when(big, 0).otherwise(F.col(tokens_col)))
                         / target_tokens)
    # oversized docs get negative pack ids keyed by their rank so they can
    # never collide with quota packs; re-densified below
    big_rank = F.sum(big.cast("int")).over(w)
    raw = F.when(big, -big_rank).otherwise(small_pack)
    out = (df.select(F.col(strata_col), F.col(id_col),
                     F.col(tokens_col).cast("long").alias(tokens_col))
           .withColumn("_raw_pack", raw))
    # nulls LAST to match the SQL oracle's default null ordering: a NULL
    # tokens value yields a NULL _raw_pack, and Spark's default ASC NULLS
    # FIRST would give it pack_id 0 and shift every real pack id up
    dense = Window.partitionBy(strata_col).orderBy(
        F.col("_raw_pack").asc_nulls_last())
    return (out.withColumn("pack_id",
                           (F.dense_rank().over(dense) - 1).cast("long"))
            .drop("_raw_pack"))
