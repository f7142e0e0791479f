"""Web-graph pipeline composition (pipelines/webgraph)."""

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.pipelines.webgraph import (
    dedup_pages,
    host_graph,
    host_ranks,
    parse_pages,
)


def _pages(spark):
    rows = [
        # two fetches of the SAME canonical page (trailing slash /
        # tracking param) — must dedup to one
        (
            "https://a.com/home/",
            '<p>A home</p><a href="https://b.com/x">b</a>'
            '<a href="https://c.com/y">c</a>',
        ),
        (
            "https://a.com/home?utm_source=f",
            '<p>A home v2</p><a href="https://b.com/x">b</a>',
        ),
        (
            "https://b.com/x",
            '<script>var z;</script><p>B &amp; page</p>'
            '<a href="https://a.com/home">a</a>'
            '<a href="/relative">rel</a>'
            '<a href="https://B.com/other">self</a>',
        ),
        ("https://c.com/y", "<p>C leaf</p>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_parse_pages_extracts_and_canonicalizes(spark):
    parsed = parse_pages(_pages(spark), "url", "html")
    rows = {r["canonical_url"]: r for r in parsed.collect()}
    assert set(rows) == {
        "https://a.com/home",
        "https://b.com/x",
        "https://c.com/y",
    }
    b = rows["https://b.com/x"]
    # anchor text IS visible text — it survives extraction
    assert b["text"] == "B & page a rel self"
    # relative link dropped, self-link canonicalized (host lowercased)
    assert b["outlinks"] == ["https://a.com/home", "https://b.com/other"]


def test_dedup_pages_one_row_per_canonical(spark):
    parsed = parse_pages(_pages(spark), "url", "html")
    d = dedup_pages(parsed)
    assert d.count() == 3
    a = d.filter(F.col("canonical_url") == "https://a.com/home").first()
    # deterministic survivor: lexicographically-smallest payload
    # ("A home b c" < "A home v2 b" — anchor text is part of text)
    assert a["text"] == "A home b c"
    assert (
        dedup_pages(parsed.repartition(7)).filter(
            F.col("canonical_url") == "https://a.com/home"
        ).first()["text"]
        == a["text"]
    )


def test_host_graph_weights_and_no_self_loops(spark):
    d = dedup_pages(parse_pages(_pages(spark), "url", "html"))
    edges = {
        (r["src"], r["dst"]): r["weight"] for r in host_graph(d).collect()
    }
    # b.com -> b.com self-loop dropped; a->b present
    assert ("b.com", "b.com") not in edges
    assert edges[("b.com", "a.com")] == 1
    assert ("a.com", "b.com") in edges


def test_host_ranks_cover_all_hosts_and_conserve_mass(spark):
    d = dedup_pages(parse_pages(_pages(spark), "url", "html"))
    pr = host_ranks(d, n_iters=6)
    rows = {r["host"]: r["rank"] for r in pr.collect()}
    assert set(rows) == {"a.com", "b.com", "c.com"}
    assert abs(sum(rows.values()) - 1.0) < 1e-9


def test_anchor_texts_aggregates_per_target(spark):
    """Anchors from several pages to one target aggregate: counts,
    distinct sources, sorted pipe-joined texts (inner markup stripped);
    relative hrefs are dropped; href-less anchors never appear."""
    from lsdm_motogp_data_integration_spark.pipelines.webgraph import (
        anchor_texts,
    )

    pages = spark.createDataFrame(
        [
            (
                "https://a.example/p1",
                '<p>x</p><a href="https://T.example/page">Good <b>Docs</b></a>'
                '<a href="/relative">skip me</a>'
                '<a name="no-href">skip too</a>',
            ),
            (
                "https://b.example/p2",
                '<a href="https://t.example/page">alpha</a>'
                '<a href="https://t.example/page">beta</a>',
            ),
        ],
        "url string, html string",
    )
    got = {
        r["target"]: (r["n_anchors"], r["n_sources"], r["texts"])
        for r in anchor_texts(pages, "url", "html").collect()
    }
    assert set(got) == {"https://t.example/page"}
    n_anchors, n_sources, texts = got["https://t.example/page"]
    assert n_anchors == 3 and n_sources == 2
    assert texts == "Good Docs|alpha|beta"


def test_anchor_texts_caps_hub_text_sample_counts_stay_exact(spark):
    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.pipelines.webgraph import (
        anchor_texts,
    )

    pages = spark.range(50).select(
        F.concat(F.lit("https://s"), F.col("id"), F.lit(".ex/p")).alias("url"),
        F.concat(
            F.lit('<a href="https://hub.ex/home">t'),
            F.col("id"),
            F.lit("</a>"),
        ).alias("html"),
    )
    got = anchor_texts(pages, "url", "html", max_texts=5).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_anchors"] == 50 and r["n_sources"] == 50  # exact
    texts = r["texts"].split("|")
    assert len(texts) == 5  # bounded sample
    assert texts == sorted(texts)
