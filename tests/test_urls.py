"""URL canonicalization contracts (operators/urls)."""

import pytest
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.urls import (
    normalize_url,
    url_domain,
    url_host,
)


def _norm(spark, url, **kw):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(normalize_url(F.col("u"), **kw).alias("v"))
        .first()["v"]
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        # scheme+host case, default port, trailing slash
        ("HTTP://WWW.Example.COM:80/A/b/", "http://example.com/A/b"),
        ("https://example.com:443/x", "https://example.com/x"),
        # non-default port survives
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        # fragment dropped, utm_* dropped, params sorted
        ("https://ex.com/p?b=2&utm_s=1&a=1#frag", "https://ex.com/p?a=1&b=2"),
        # all params tracking → query dropped entirely
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        # bare host, with and without slash, collapse
        ("https://Ex.com/", "https://ex.com"),
        ("https://ex.com", "https://ex.com"),
        # path case preserved
        ("https://ex.com/CaseSensitive", "https://ex.com/CaseSensitive"),
        # no scheme → trimmed pass-through
        ("  /relative/path  ", "/relative/path"),
    ],
)
def test_normalize_url_cases(spark, raw, want):
    assert _norm(spark, raw) == want


def test_normalize_url_keep_www_and_custom_prefix(spark):
    assert (
        _norm(spark, "https://www.ex.com/a", strip_www=False)
        == "https://www.ex.com/a"
    )
    assert (
        _norm(spark, "https://ex.com/a?ref=x&b=1", strip_param_prefix="ref")
        == "https://ex.com/a?b=1"
    )


def test_url_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://Sub.News.Example.co:8080/x?y#z",), ("not a url",)],
        "u string",
    )
    rows = df.select(
        url_host("u").alias("h"), url_domain("u").alias("d")
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == (
        "sub.news.example.co:8080",
        "example.co",
    )
    assert (rows[1]["h"], rows[1]["d"]) == ("", "")


def test_normalize_url_idempotent_over_messy_corpus(spark):
    """normalize(normalize(u)) == normalize(u) — canonical forms are
    fixed points, over a combinatorial corpus of messy URLs."""
    import itertools

    schemes = ["http://", "HTTPS://", ""]
    hosts = ["Ex.com", "www.ex.com", "ex.com:443", "ex.com:8080"]
    paths = ["", "/", "/A/b/", "/p"]
    tails = ["", "?b=2&a=1", "?utm_x=1", "#f", "?a=1#f", "?utm_a=1&c=3"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, hosts, paths, tails)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(normalize_url(F.col("u")).alias("v"))
    rows = once.select(
        "v", normalize_url(F.col("v")).alias("vv")
    ).collect()
    bad = [(r["v"], r["vv"]) for r in rows if r["v"] != r["vv"]]
    assert not bad, bad[:5]


def test_corpus_diff_statuses(spark):
    from lsdm_motogp_data_integration_spark.operators.profile import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "id bigint, text string"
    )
    got = {r["id"]: r["status"] for r in corpus_diff(
        old, new, "id", "text"
    ).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_content_is_presence_not_absence(spark):
    """A row with NULL body still EXISTS: NULL→'x' is changed,
    NULL→NULL is unchanged, NULL-bodied removals report removed."""
    from lsdm_motogp_data_integration_spark.operators.profile import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None)], "id bigint, text string"
    )
    got = {r["id"]: r["status"] for r in corpus_diff(
        old, new, "id", "text"
    ).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "removed"}


def test_host_suffixes_ladder(spark):
    from lsdm_motogp_data_integration_spark.operators.urls import (
        host_suffixes,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://A.b.C.com:8080/x?y=1",), ("no-scheme",), ("https://solo/p",)],
        "u string",
    )
    got = [r[0] for r in df.select(host_suffixes("u")).collect()]
    assert got[0] == ["a.b.c.com", "b.c.com", "c.com"]
    assert got[1] == []     # not an absolute URL
    assert got[2] == []     # single-label host has no dotted suffix


def test_filter_blocked_urls_zone_and_exact(spark):
    """Pattern 'tracker.io' blocks the apex AND every subdomain; an
    unrelated host containing the string (nottracker.io... as a
    SUFFIX-ladder non-member like 'xtracker.io'? no — 'xtracker.io'
    IS its own registrable domain) survives; keep_blocked inverts."""
    from lsdm_motogp_data_integration_spark.operators.urls import (
        filter_blocked_urls,
    )

    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.io/pixel"),
            (2, "https://tracker.io/home"),
            (3, "https://xtracker.io/page"),     # NOT under tracker.io
            (4, "https://example.com/article"),
            (5, "https://spam.example.com/x"),   # blocked exact host
            (6, "https://deep.spam.example.com/x"),  # under blocked host
        ],
        "doc_id bigint, url string",
    )
    bl = spark.createDataFrame(
        [("tracker.io",), ("spam.example.com",)], "pattern string"
    )
    kept = sorted(
        r["doc_id"] for r in filter_blocked_urls(docs, "url", bl).collect()
    )
    assert kept == [3, 4]
    blocked = sorted(
        r["doc_id"]
        for r in filter_blocked_urls(
            docs, "url", bl, keep_blocked=True
        ).collect()
    )
    assert blocked == [1, 2, 5, 6]


def test_blocked_word_score_counts_case_insensitive(spark):
    from lsdm_motogp_data_integration_spark.operators.urls import (
        blocked_word_score,
    )

    df = spark.createDataFrame(
        [("https://example.com/CASINO-poker-bonus",), ("https://example.com/news",)],
        "u string",
    )
    got = [
        r[0]
        for r in df.select(
            blocked_word_score("u", ("casino", "poker", "crypto"))
        ).collect()
    ]
    assert got == [2, 0]
