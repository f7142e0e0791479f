from __future__ import annotations

import math

from pyspark.sql import Row

from lsdm_motogp_data_integration_spark.operators.boilerplate import (
    remove_boilerplate_lines,
)
from lsdm_motogp_data_integration_spark.operators.ranking import bm25_scores


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="HEADER\nalpha beta\nFOOTER"),
            Row(doc_id=2, text="HEADER\ngamma delta\nFOOTER"),
            Row(doc_id=3, text="HEADER\nalpha beta\nepsilon\nFOOTER"),
            Row(doc_id=4, text="HEADER\nFOOTER"),
            Row(doc_id=5, text="unique one\nunique two"),
        ]
    )


def test_boilerplate_removes_frequent_keeps_order(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _docs(spark), min_docs=3
        ).collect()
    }
    # HEADER/FOOTER appear in 4 docs -> dropped everywhere.
    assert out[1]["text"] == "alpha beta"
    assert out[2]["text"] == "gamma delta"
    # Surviving lines keep their original order.
    assert out[3]["text"] == "alpha beta\nepsilon"
    assert out[3]["n_lines_kept"] == 2
    assert out[3]["n_lines_removed"] == 2
    # A doc that was pure boilerplate survives as an empty row.
    assert out[4]["text"] == ""
    assert out[4]["n_lines_kept"] == 0
    assert out[4]["n_lines_removed"] == 2
    # "alpha beta" appears in only 2 docs (< min_docs) -> kept.
    assert out[5]["text"] == "unique one\nunique two"
    assert out[5]["n_lines_removed"] == 0


def test_boilerplate_shuffle_anti_join_matches_broadcast(spark):
    a = remove_boilerplate_lines(_docs(spark), min_docs=2)
    b = remove_boilerplate_lines(
        _docs(spark), min_docs=2, broadcast_frequent=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def _bm25_manual(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_manual_formula(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark shuffle pad pad pad"),
            Row(doc_id=2, text="spark pad pad pad pad pad"),
            Row(doc_id=3, text="pad pad pad pad pad pad"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in bm25_scores(df, ["spark", "shuffle"]).collect()
    }
    assert 3 not in out  # no query term -> no row
    n, avgdl = 3.0, 6.0
    exp1 = round(
        round(_bm25_manual(2, 2, n, 6.0, avgdl), 6)
        + round(_bm25_manual(1, 1, n, 6.0, avgdl), 6),
        6,
    )
    assert abs(out[1]["score"] - exp1) < 1e-9
    assert out[1]["n_terms_hit"] == 2
    exp2 = round(_bm25_manual(1, 2, n, 6.0, avgdl), 6)
    assert abs(out[2]["score"] - exp2) < 1e-9
    # More matching mass -> higher score.
    assert out[1]["score"] > out[2]["score"]


def test_dedup_lines_keep_first_global_rule(spark):
    """Repeated lines survive only at the globally-first (doc, pos);
    unique and blank lines always survive; counts reconcile."""
    from pyspark.sql import Row

    from lsdm_motogp_data_integration_spark.operators.boilerplate import (
        dedup_lines_keep_first,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a\nshared\nb"),
            Row(doc_id=2, text="shared\nc"),
            Row(doc_id=3, text="shared\nshared"),
            Row(doc_id=4, text="x\n\ny"),
            Row(doc_id=5, text="\nz"),
        ]
    )
    out = {r["doc_id"]: r for r in dedup_lines_keep_first(df).collect()}
    assert out[1]["text"] == "a\nshared\nb"  # keeper occurrence stays
    assert out[2]["text"] == "c"
    assert out[3]["text"] == ""  # both non-first copies dropped
    assert out[3]["n_lines_kept"] == 0
    assert out[3]["n_lines_removed"] == 2
    # blank lines are exempt (min_line_chars=1) in every document
    assert out[4]["text"] == "x\n\ny"
    assert out[5]["text"] == "\nz"
    total_kept = sum(r["n_lines_kept"] for r in out.values())
    total_removed = sum(r["n_lines_removed"] for r in out.values())
    assert total_kept + total_removed == 3 + 2 + 2 + 3 + 2

    # layout independence
    again = {
        r["doc_id"]: r
        for r in dedup_lines_keep_first(df.repartition(5)).collect()
    }
    assert {k: v["text"] for k, v in out.items()} == {
        k: v["text"] for k, v in again.items()
    }


def test_rrf_fuse_hand_computed(spark):
    """Fused score matches Σ floor(1e15/(k+rank))/1e15 by hand; an id
    in both lists outranks an id in one."""
    from lsdm_motogp_data_integration_spark.operators.ranking import (
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank bigint"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id bigint, rank bigint"
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([a, b], "doc_id", k=60).collect()
    }

    def h(*ranks):
        import math

        return sum(math.floor(1e15 / (60.0 + r)) for r in ranks) / 1e15

    assert got == {
        1: h(1),
        2: h(2, 1),
        3: h(3),
        4: h(2),
    }
    # doc 2 (in both) beats doc 1 (rank-1 in one list only)
    assert got[2] > got[1]


def test_dup_line_stats_hand_computed(spark):
    """4 lines, one repeated twice: dup frac = 1/4; char weighting
    follows line lengths; line-free docs report zeros."""
    from lsdm_motogp_data_integration_spark.operators.boilerplate import (
        dup_line_stats,
    )

    text = "aaaa\nbb\naaaa\ncccccc"  # 'aaaa' x2 (len 4), bb (2), cccccc (6)
    df = spark.createDataFrame(
        [(1, text), (2, "x\ny"), (3, "  \n ")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["dup_char_frac"])
        for r in dup_line_stats(df).collect()
    }
    # doc 1: 4 lines, 1 duplicate occurrence; chars = 4+4+2+6 = 16,
    # dup chars = 4 -> 0.25
    assert got[1] == (4, 0.25, 0.25)
    assert got[2] == (2, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0)


def test_dup_line_stats_triple_repeat_weighting(spark):
    """A line occurring 3x contributes 2 duplicate occurrences; the
    char fraction diverges from the line fraction when lengths vary."""
    from lsdm_motogp_data_integration_spark.operators.boilerplate import (
        dup_line_stats,
    )

    text = "longlongline\nlonglongline\nlonglongline\nab"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = dup_line_stats(df).first()
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.5  # 2 of 4
    # chars: 3*12 + 2 = 38; dup chars = 2*12 = 24
    assert r["dup_char_frac"] == round(24 / 38, 6)
