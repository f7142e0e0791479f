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
