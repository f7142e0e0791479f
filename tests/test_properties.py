"""Property-based tests (hypothesis) for the pure-Python similarity
kernel — the one piece of custom algorithmic code whose domain is all
of string-space."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from lsdm_motogp_data_integration_spark.functions.similarity import (
    jaro_similarity,
    jaro_winkler_similarity,
)

text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
)


@given(text, text)
@settings(max_examples=300, deadline=None)
def test_jw_range_and_symmetry(a, b):
    s = jaro_winkler_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro_winkler_similarity(b, a)
    j = jaro_similarity(a, b)
    assert 0.0 <= j <= 1.0
    assert s >= j or s == j  # winkler only boosts


@given(text)
@settings(max_examples=200, deadline=None)
def test_jw_identity(a):
    expected = 0.0 if len(a) == 0 else 1.0
    assert jaro_winkler_similarity(a, a) == expected


_con = duckdb.connect()


@given(
    st.text(alphabet="abcdefgh ", max_size=16),
    st.text(alphabet="abcdefgh ", max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_jw_matches_duckdb(a, b):
    ours = jaro_winkler_similarity(a, b)
    theirs = _con.execute(
        "select jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(ours - theirs) < 1e-12
