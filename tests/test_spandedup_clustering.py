from __future__ import annotations

from pyspark.sql import Row

from lsdm_motogp_data_integration_spark.operators.ann import kmeans_clusters
from lsdm_motogp_data_integration_spark.operators.textops import (
    mask_repeated_ngrams,
)


def test_mask_repeated_ngrams_drops_repeat_spans_only(spark):
    df = spark.createDataFrame(
        [
            # words 6..11 repeat the 3-grams of 0..5 -> all dropped
            Row(doc_id=1, text="a b c d e f a b c d e f"),
            Row(doc_id=2, text="all words here are unique tokens"),
            Row(doc_id=3, text="x y"),  # shorter than k -> untouched
        ]
    )
    out = {
        r["doc_id"]: r
        for r in mask_repeated_ngrams(df, k=3).collect()
    }
    assert out[1]["text"] == "a b c d e f"
    assert out[1]["n_words_kept"] == 6
    assert out[1]["n_words_removed"] == 6
    assert out[2]["text"] == "all words here are unique tokens"
    assert out[2]["n_words_removed"] == 0
    assert out[3]["text"] == "x y"
    assert out[3]["n_words_removed"] == 0


def test_mask_repeated_ngrams_layout_independent(spark):
    rows = [
        Row(doc_id=i, text=f"alpha beta gamma delta w{i} alpha beta gamma delta")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, mask_repeated_ngrams(df, k=4).collect()))
    b = sorted(
        map(tuple, mask_repeated_ngrams(df.repartition(7), k=4).collect())
    )
    assert a == b
    # the trailing 4-gram repeat is dropped in every doc
    assert all(t[1] == f"alpha beta gamma delta w{t[0]}" for t in a)


def _vec_rows():
    rows = []
    for i in range(60):
        base = [0.0] * 8
        base[i % 4] = 1.0
        base[(i % 4 + 1) % 8] = 0.1 * (i % 3)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in base]))
    return rows


def test_kmeans_clusters_deterministic_and_valid(spark):
    df = spark.createDataFrame(_vec_rows())
    a = sorted(
        map(
            tuple,
            kmeans_clusters(
                df, "embedding", "vec_id", n_clusters=4, n_iters=2
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            kmeans_clusters(
                df.repartition(5),
                "embedding",
                "vec_id",
                n_clusters=4,
                n_iters=2,
            ).collect(),
        )
    )
    assert a == b
    assert all(0 <= t[1] < 4 for t in a)
    assert all(-1.0 <= t[2] <= 1.0 for t in a)
    # identical vectors must co-cluster: ids 0 and 12 share i%4 and i%3
    by_id = {t[0]: t[1] for t in a}
    assert by_id[0] == by_id[12]


def test_cross_doc_span_dedup_masks_later_docs(spark):
    """A k-gram shared by two docs survives only at its globally first
    (doc_id, start); the later doc loses exactly the shared span."""
    from lsdm_motogp_data_integration_spark.operators.textops import (
        cross_doc_span_dedup,
    )

    shared = "one two three four five"
    rows = [
        (1, f"{shared} alpha beta"),
        (2, f"gamma {shared} delta"),
        (3, "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in cross_doc_span_dedup(df, k=5).collect()
    }
    # doc 1 holds the keeper occurrence: fully intact
    assert got[1]["text"] == f"{shared} alpha beta"
    assert got[1]["n_words_removed"] == 0
    # doc 2: the five shared words masked, surrounding words kept
    assert got[2]["text"] == "gamma delta"
    assert got[2]["n_words_removed"] == 5
    # doc 3: untouched
    assert got[3]["text"] == rows[2][1]
    # conservation: kept + removed == total
    for r in got.values():
        assert r["n_words_kept"] + r["n_words_removed"] == len(
            (dict(rows)[r["doc_id"]]).split(" ")
        )


def test_cross_doc_span_dedup_within_keeper_doc_repeat(spark):
    """A cross-doc-duplicated gram repeated inside the keeper doc keeps
    only the first occurrence there too (global keeper rule)."""
    from lsdm_motogp_data_integration_spark.operators.textops import (
        cross_doc_span_dedup,
    )

    span = "a b c"
    df = spark.createDataFrame(
        [(1, f"{span} x {span}"), (2, f"{span} y")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in cross_doc_span_dedup(df, k=3).collect()}
    assert got[1]["text"].startswith(span)
    assert got[1]["n_words_removed"] >= 3  # the second occurrence in doc 1
    assert got[2]["n_words_removed"] >= 3  # doc 2's occurrence


def test_cross_doc_span_dedup_max_docs_per_gram(spark):
    """Grams above the document-frequency cap are treated as formulaic
    and left alone (they would hollow out the corpus and skew the
    gram-keyed shuffle)."""
    from lsdm_motogp_data_integration_spark.operators.textops import (
        cross_doc_span_dedup,
    )

    common = "p q r"
    df = spark.createDataFrame(
        [(i, f"{common} w{i}") for i in range(1, 5)], ["doc_id", "text"]
    )
    # cap 3 < the 4 docs carrying the gram: nothing is masked
    capped = cross_doc_span_dedup(df, k=3, max_docs_per_gram=3).collect()
    assert all(r["n_words_removed"] == 0 for r in capped)
    # no cap: docs 2-4 lose the shared gram
    uncapped = {
        r["doc_id"]: r["n_words_removed"]
        for r in cross_doc_span_dedup(df, k=3).collect()
    }
    assert uncapped == {1: 0, 2: 3, 3: 3, 4: 3}


def test_short_docs_emit_no_grams_cross_doc(spark):
    """Docs with fewer than k words must be untouched by cross-doc span
    dedup (the old greatest(n-k,0) start emitted a truncated partial
    gram, making short duplicate docs dedup-eligible below k)."""
    from lsdm_motogp_data_integration_spark.operators.textops import (
        cross_doc_span_dedup,
    )

    df = spark.createDataFrame(
        [(1, "thank you"), (2, "thank you"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cross_doc_span_dedup(df, k=5).collect()}
    assert out[1]["text"] == "thank you"
    assert out[2]["text"] == "thank you"   # NOT hollowed out
    assert out[1]["n_words_removed"] == 0
    assert out[2]["n_words_removed"] == 0
    assert out[3]["n_words_removed"] == 0  # no phantom '' gram


def test_null_text_counts_are_zero_not_null(spark):
    from pyspark.sql import types as T

    from lsdm_motogp_data_integration_spark.operators.textops import (
        cross_doc_span_dedup,
        mask_repeated_ngrams,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, None), (2, "a b c d e f g")], schema)
    for fn in (mask_repeated_ngrams, cross_doc_span_dedup):
        out = {r["doc_id"]: r for r in fn(df, k=5).collect()}
        assert out[1]["n_words_kept"] == 0
        assert out[1]["n_words_removed"] == 0  # bigint 0, not NULL/-1
        assert out[1]["text"] == ""
