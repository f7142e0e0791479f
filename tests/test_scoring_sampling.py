from __future__ import annotations

from pyspark.sql import Row

from lsdm_motogp_data_integration_spark.operators.scoring import (
    classify_quality,
)
from lsdm_motogp_data_integration_spark.operators.textops import (
    mixture_sample,
)


def test_quality_classifier_orders_clean_above_noise(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over a lazy dog"),
            Row(doc_id=2, text="8409 22#$ 111 !!%% 0x9f 77&& 3.14 ??"),
        ]
    )
    out = {r["doc_id"]: r for r in classify_quality(df).collect()}
    assert out[1]["quality_prob"] > out[2]["quality_prob"]
    assert 0.0 <= out[2]["quality_prob"] <= 1.0
    # keep agrees with the threshold on the returned probability
    for r in out.values():
        assert r["keep"] == (r["quality_prob"] >= 0.5)


def test_quality_classifier_custom_weights_and_unknown_key(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    # all-zero weights -> sigmoid(bias) exactly
    row = classify_quality(
        df, weights={"alpha_ratio": 0.0}, bias=0.0
    ).collect()[0]
    assert abs(row["quality_prob"] - 0.5) < 1e-9
    with pytest.raises(ValueError):
        classify_quality(df, weights={"not_a_feature": 1.0}).collect()


def _mix_corpus(spark):
    rows = []
    for i in range(300):
        rows.append(Row(doc_id=i, grp="a" if i % 3 else "b"))
    return spark.createDataFrame(rows)


def test_mixture_sample_targets_composition(spark):
    df = _mix_corpus(spark)  # 200 'a', 100 'b'
    out = mixture_sample(
        df, "grp", {"a": 0.5, "b": 0.5}, budget=100, id_col="doc_id"
    ).collect()
    got_a = sum(1 for r in out if r["grp"] == "a")
    got_b = sum(1 for r in out if r["grp"] == "b")
    # expected ~50/50; md5 thresholding is binomial-ish, allow slack
    assert 30 <= got_a <= 70
    assert 30 <= got_b <= 70


def test_mixture_sample_caps_at_group_size_and_is_deterministic(spark):
    df = _mix_corpus(spark)
    # 'b' has 100 rows but its target share wants 0.9*500=450 -> rate
    # capped at 1.0: every 'b' row survives
    out1 = mixture_sample(
        df, "grp", {"a": 0.1, "b": 0.9}, budget=500, id_col="doc_id"
    ).collect()
    assert sum(1 for r in out1 if r["grp"] == "b") == 100
    out2 = mixture_sample(
        df.repartition(7),
        "grp",
        {"a": 0.1, "b": 0.9},
        budget=500,
        id_col="doc_id",
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_mixture_sample_default_prop_drops_unlisted_groups(spark):
    df = _mix_corpus(spark)
    out = mixture_sample(
        df, "grp", {"a": 1.0}, budget=50, id_col="doc_id"
    ).collect()
    assert all(r["grp"] == "a" for r in out)


def test_unigram_nll_hand_computed(spark):
    import math

    from lsdm_motogp_data_integration_spark.operators.scoring import (
        unigram_nll,
    )

    # corpus counts: a=2 b=2 c=1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    # d1: 3 tokens all with p=2/5 -> nll = -ln(0.4), ppl = 2.5
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["nll"] - (-math.log(0.4))) < 1e-4
    assert abs(out[1]["ppl"] - 2.5) < 1e-4
    # d2: -[ln(2/5) + ln(1/5)] / 2, ppl = sqrt(12.5)
    assert out[2]["n_tokens"] == 2
    expected = -(math.log(0.4) + math.log(0.2)) / 2
    assert abs(out[2]["nll"] - expected) < 1e-4
    assert abs(out[2]["ppl"] - math.sqrt(12.5)) < 1e-4
