"""Model-based document scoring as pure Column expressions.

A trained quality classifier (the fastText / logistic-regression
screen every public curation pipeline runs — CCNet, RefinedWeb,
FineWeb) reduces at inference time to ``sigmoid(w·x + b)`` over
engineered features. This module runs that inference entirely inside
whole-stage codegen: the feature vector comes from
:func:`textops.quality_features` (regexp counts and ratios), the
weights are plain literals, and no Python UDF or model runtime is
involved — the shape to aim for when scoring 100 TB, where shipping
rows to a Python model server is the bottleneck.

Weight provenance is out of scope (train offline, paste weights);
the engine-side contract is only the feature formulas + linear form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lsdm_motogp_data_integration_spark.operators.textops import (
    quality_features,
)

# Hand-set demo weights over the quality_features keys — stands in for
# an offline-trained logistic regression (positive: alphabetic text
# with a natural stopword rate; negative: digit/punct noise).
DEFAULT_WEIGHTS: dict[str, float] = {
    "alpha_ratio": 2.0,
    "stopword_ratio": 1.5,
    "mean_word_len": -0.1,
    "digit_ratio": -3.0,
    "punct_ratio": -2.0,
    "space_ratio": 0.5,
}
DEFAULT_BIAS: float = -1.0


def quality_probability(
    col: Column | str,
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
) -> Column:
    """``sigmoid(w·x + b)`` over quality_features, rounded to 6 dp
    (the repo's cross-engine float-determinism convention)."""
    feats = quality_features(col)
    w = DEFAULT_WEIGHTS if weights is None else weights
    unknown = set(w) - set(feats)
    if unknown:
        raise ValueError(f"unknown feature weights: {sorted(unknown)}")
    z: Column = F.lit(float(bias))
    for name, weight in sorted(w.items()):
        z = z + F.lit(float(weight)) * feats[name]
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def classify_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
    threshold: float = 0.5,
) -> DataFrame:
    """Attach classifier outputs: probability and keep/drop decision.

    Returns (id_col, quality_prob DOUBLE, keep BOOLEAN)."""
    prob = quality_probability(text_col, weights, bias)
    return df.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= F.lit(float(threshold))).alias("keep"),
    )


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model scoring: per-document average negative
    log-likelihood under the corpus's own unigram distribution — the
    shape of CCNet/CC-100's "perplexity filter" (there a Wikipedia
    KenLM; here the self-trained unigram LM, which needs no external
    model artifact). Low = stereotyped/boilerplate-heavy text, high =
    rare-token soup; both tails are the usual drop candidates.

    Plan: one token explode -> per-(doc,term) counts (shuffle 1, the
    same relation a TF-IDF pass builds) -> vocabulary counts
    (shuffle 2, vocab-sized) -> join back on term (vocab-keyed shuffle
    join; NOT broadcast — a 100 TB corpus's vocabulary doesn't fit) ->
    per-doc rollup. The per-row double ``-ln(count/total) * tf`` is
    cast to DECIMAL(18,6) before the per-doc sum so the reduction is
    order-independent (the repo's float-determinism convention).

    Returns (id_col, n_tokens BIGINT, nll DOUBLE, ppl DOUBLE); docs
    with no tokens are absent (no LM score is defined for them).
    """
    words = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    per_term = (
        df.select(F.col(id_col), F.explode(words).alias("term"))
        # split('') yields [''] — drop the empty pseudo-token so blank
        # docs are genuinely absent (the documented contract) instead
        # of entering the vocabulary and skewing every probability
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = per_term.groupBy("term").agg(F.sum("tf").alias("ccnt"))
    total = vocab.agg(F.sum("ccnt").alias("__total"))
    scored = per_term.join(vocab, "term").crossJoin(F.broadcast(total))
    neglogp = -F.log(
        F.col("ccnt").cast("double") / F.col("__total").cast("double")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.sum((F.col("tf") * neglogp).cast("decimal(18,6)"))
        .cast("double")
        .alias("__nll_sum"),
    )
    nll = F.col("__nll_sum") / F.col("n_tokens").cast("double")
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(nll, 6).alias("nll"),
        F.round(F.exp(nll), 6).alias("ppl"),
    )
