"""Full-text search over a document table — the reference's third DataStore
implementation (Solr), re-expressed as a lake-resident inverted index.

Reference surface: impl/solr/SolrDataStore.java (text query → scored doc
list) and impl/solr/SolrCursor.java (paged relevance-ordered scroll). The
reference delegates tokenization, the inverted index, and scoring to the
Solr engine; here each piece is one declarative DataFrame op so Catalyst
owns the plan:

* **Index build** — tokenize (same normalization as the dedup family) →
  explode → ``groupBy(term, doc)`` term frequencies, plus a tiny per-term
  document-frequency side table. One shuffle, map-side combine; at 100 TB
  persist it partitioned by a term-hash bucket so a query's semi-join
  prunes to the probed buckets.
* **Query** — the query's terms are a literal handful → broadcast inner
  join against the index (no corpus scan at all: only index rows for the
  queried terms move), aggregate per doc, rank.
* **Scoring** — deterministic sum of per-term TF (optionally
  TF·log(N/DF)), doc-id tiebreak, so results are stable and
  oracle-checkable; ``mode="all"`` keeps only docs matching EVERY term
  (the AND-of-terms form), ``mode="any"`` is the OR form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_core_spark.operators.dedup import tokens


def build_text_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted index: one ``(term, doc, tf)`` row per distinct term per
    document. Explode + groupBy — one shuffle with map-side partial counts."""
    return (df.select(F.col(id_col).alias("doc"),
                      F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term", "doc")
            .agg(F.count("*").alias("tf")))


def search_text(index: DataFrame, terms: list[str], mode: str = "any",
                limit: int | None = None) -> DataFrame:
    """Term query over the inverted index (SolrDataStore search analog).

    Returns ``(doc, n_terms_matched, score)`` ordered by score desc with a
    doc-id tiebreak — the deterministic relevance contract. ``mode="all"``
    requires every query term to match (AND); ``"any"`` is OR. The query
    term list is literal and tiny, so the join broadcasts — the only index
    rows that move are those for the queried terms (partition-pruned when
    the index is stored bucketed by term hash).
    """
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    norm = sorted({t.strip().lower() for t in terms if t and t.strip()})
    if not norm:
        raise ValueError("search_text needs at least one non-empty term")
    q = index.sparkSession.createDataFrame([(t,) for t in norm],
                                           "term string")
    hits = (index.join(F.broadcast(q), "term")
            .groupBy("doc")
            .agg(F.count("*").alias("n_terms_matched"),
                 F.sum("tf").alias("score")))
    if mode == "all":
        hits = hits.filter(F.col("n_terms_matched") == len(norm))
    out = hits.orderBy(F.col("score").desc(), F.col("doc").asc())
    return out.limit(limit) if limit is not None else out


def search_documents(df: DataFrame, id_col: str, text_col: str,
                     terms: list[str], mode: str = "any",
                     limit: int | None = None) -> DataFrame:
    """One-shot convenience: build the index in-plan and query it (for ad-hoc
    search; repeated queries should persist ``build_text_index`` output)."""
    return search_text(build_text_index(df, id_col, text_col), terms,
                       mode=mode, limit=limit)
