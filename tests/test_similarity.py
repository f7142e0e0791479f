"""Jaro-Winkler: golden values, DuckDB parity, UDF plumbing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.functions.similarity import (
    jaro_similarity,
    jaro_winkler_similarity,
    jaro_winkler_udf,
)

GOLDEN = [
    # classic textbook pairs
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
]


@pytest.mark.parametrize("a,b,expected", GOLDEN)
def test_golden_pairs(a, b, expected):
    assert jaro_winkler_similarity(a, b) == pytest.approx(expected, abs=1e-12)


def test_edges():
    assert jaro_winkler_similarity("", "") == 0.0  # DuckDB convention
    assert jaro_winkler_similarity("a", "") == 0.0
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert 0.0 <= jaro_similarity("ab", "ba") <= 1.0


def test_matches_duckdb_exhaustively():
    con = duckdb.connect()
    import random
    import string

    random.seed(123)
    pairs = [
        (
            "".join(random.choices(string.ascii_lowercase + " ", k=random.randint(0, 12))),
            "".join(random.choices(string.ascii_lowercase + " ", k=random.randint(0, 12))),
        )
        for _ in range(500)
    ]
    for a, b in pairs:
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_similarity(a, b) == pytest.approx(d, abs=1e-12), (a, b)


def test_udf(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), ("abc", None)], ["a", "b"]
    )
    rows = df.select(jaro_winkler_udf("a", "b").alias("s")).collect()
    assert rows[0]["s"] == pytest.approx(0.9611111111111111, abs=1e-12)
    assert rows[1]["s"] is None


def test_jvm_column_matches_python_reference(spark):
    """jaro_winkler_col (pure Column expression, no Python in the plan)
    must agree with the pure-Python reference — including empty-window
    edge cases (Spark's sequence() runs descending when lo > hi) and
    strings past any bitmask-friendly length."""
    import random

    from lsdm_motogp_data_integration_spark.functions.similarity import (
        jaro_winkler_col,
    )

    random.seed(7)
    pairs = []
    for alph, n, maxlen in [("abcde", 300, 12), ("abcdefghijklmnop", 150, 30)]:
        for _ in range(n):
            a = "".join(random.choice(alph) for _ in range(random.randint(0, maxlen)))
            b = "".join(random.choice(alph) for _ in range(random.randint(0, maxlen)))
            pairs.append((a, b))
    pairs += [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("deda", "ba"),          # empty-window regression pair
        ("", "x"),
        ("", ""),
        ("same", "same"),
        ("ARGENTINA", "argentin"),  # case-insensitive like FuzzyMatch
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(
        "a", "b", jaro_winkler_col(F.col("a"), F.col("b")).alias("jw")
    ).collect()
    for r in got:
        expected = jaro_winkler_similarity(r["a"].lower(), r["b"].lower())
        assert r["jw"] == pytest.approx(expected, abs=1e-12), (r["a"], r["b"])


def test_jvm_column_null_inputs(spark):
    from lsdm_motogp_data_integration_spark.functions.similarity import (
        jaro_winkler_col,
    )

    df = spark.createDataFrame(
        [("abc", None), (None, None)], "a string, b string"
    )
    rows = df.select(jaro_winkler_col("a", "b").alias("s")).collect()
    assert rows[0]["s"] is None and rows[1]["s"] is None


def test_jvm_column_rejects_long_strings(spark):
    """Past the 63-char bitmask width the Column scorer raises instead
    of scoring approximately (long corpora belong on the pandas UDF)."""
    from lsdm_motogp_data_integration_spark.functions.similarity import (
        jaro_winkler_col,
    )

    df = spark.createDataFrame([("x" * 70, "x" * 69 + "y")], ["a", "b"])
    with pytest.raises(Exception, match="63 chars"):
        df.select(jaro_winkler_col("a", "b").alias("s")).collect()
