"""BM25 document ranking over a distributed corpus.

Okapi BM25 with the Lucene/Robertson idf form
``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive), the
natural companion to the engine's TF-IDF / inverted-index operators
(``__spark_entry__.q49/q50``). The reference has no ranking operator;
this extends the training-data-curation surface (query-based corpus
slicing, retrieval-style quality probes).

Scale shape (100 TB):

- terms are filtered to the query vocabulary *before* the tf
  aggregation, so the only wide shuffle is ``groupBy(doc, term)`` over
  matching postings;
- document-frequency counts and the global (N, avgdl) scalars are
  O(|query|) / O(1) rows — both broadcast;
- float determinism follows the repo convention: per-term double
  arithmetic → ``DECIMAL(18,6)`` → SUM → ``DOUBLE``, so both engines
  add identically-rounded addends in any order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    persist_tokens: bool = False,
) -> DataFrame:
    """Score every document containing >= 1 query term.

    Tokenization matches the engine's corpus-statistics convention
    (lowercase, collapse whitespace, split on single space). Returns
    (id_col, score DOUBLE, n_terms_hit BIGINT), one row per matching
    document.

    The tokenized relation feeds both the (N, avgdl) scalar agg and
    the postings scan, and the tf relation feeds both df-counts and
    scoring; ``persist_tokens=True`` persists both so the input plan
    is evaluated exactly once (persist_sets convention — measured 20×
    probe: 18.3 s → linear-constant removed on derived lineage).
    """
    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    docs = df.select(
        F.col(id_col),
        toks.alias("__toks"),
    ).withColumn("dl", F.size("__toks").cast("double"))
    if persist_tokens:
        docs = docs.persist()

    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    terms = docs.select(
        id_col, "dl", F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))

    tf = terms.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    if persist_tokens:
        tf = tf.persist()
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df")
    )

    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = idf * F.col("tf") * F.lit(k1 + 1.0) / denom

    return (
        scored.withColumn(
            "__contrib", per_term.cast("decimal(18,6)")
        )
        .groupBy(id_col)
        .agg(
            F.sum("__contrib").cast("double").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    *,
    k: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse N retriever
    rankings into one score ``Σ 1/(k + rank_i)`` — the standard hybrid
    text+vector retrieval combiner (items missing from a list simply
    contribute nothing). Returns ``(id_col, rrf double)``.

    Scale shape: a union of the (already tiny — top-k per retriever)
    rank lists and ONE id-keyed aggregate; nothing touches the
    corpora. Per-list contributions are integer-quantized
    (``floor(1e15/(k+rank))`` → BIGINT) before the sum, so the fused
    score is bit-identical regardless of how many lists fuse or which
    order the partial sums reduce in — same convention as
    operators/graph.pagerank."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = []
    for r in rankings:
        parts.append(
            r.select(
                F.col(id_col).alias("__id"),
                F.floor(
                    F.lit(1e15)
                    / (F.lit(float(k)) + F.col(rank_col).cast("double"))
                )
                .cast("bigint")
                .alias("__c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("__id")
        .agg(
            (F.sum("__c").cast("double") / F.lit(1e15)).alias("rrf")
        )
        .select(F.col("__id").alias(id_col), "rrf")
    )
