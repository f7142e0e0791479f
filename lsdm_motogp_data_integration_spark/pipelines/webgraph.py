"""Web-graph ingestion pipeline: HTML pages → link graph → PageRank.

Composes the round-3 web operators into the flow a crawl-derived
corpus runs before curation:

    strip/parse HTML (``textops.strip_html`` / ``html_links``)
    → canonicalize link targets (``urls.normalize_url``)
    → URL-dedup pages (first fetch of a canonical URL wins)
    → project the host graph (``urls.url_host``, self-loops dropped,
      parallel host-pairs collapsed with multiplicity kept as weight)
    → host-level PageRank (``graph.pagerank``)

The output — a rank per host — is the quality prior large-scale
pipelines join back onto documents to set keep/crawl budgets
(Common Crawl ranks hosts exactly this way).

Scale shape: everything before the graph is per-row Column work (no
shuffle); URL-dedup is one canonical-key aggregate; the host-graph
projection is one (src,dst)-keyed aggregate; PageRank is the only
iterative part and inherits its per-round one-join-one-aggregate
shape. Every stage is an already-tested operator — this module only
wires them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.graph import pagerank
from lsdm_motogp_data_integration_spark.operators.textops import (
    html_links,
    strip_html,
)
from lsdm_motogp_data_integration_spark.operators.urls import (
    SCHEME_RE,
    normalize_url,
    url_host,
)


def parse_pages(
    pages: DataFrame, url_col: str, html_col: str
) -> DataFrame:
    """Per-page extraction: canonical URL, visible text, canonical
    outlinks (absolute links only — relative hrefs have no base here
    and are dropped by ``normalize_url``'s pass-through contract via
    the rlike filter below). Pure Column work, zero shuffles."""
    links = F.filter(
        F.transform(
            html_links(F.col(html_col)),
            lambda u: normalize_url(u),
        ),
        # the SAME grammar normalize_url's pass-through contract uses
        lambda u: u.rlike(SCHEME_RE),
    )
    return pages.select(
        normalize_url(F.col(url_col)).alias("canonical_url"),
        strip_html(F.col(html_col)).alias("text"),
        links.alias("outlinks"),
    )


def dedup_pages(parsed: DataFrame, order_col: str | None = None) -> DataFrame:
    """One row per canonical URL. Deterministic survivor: the row with
    the smallest ``order_col`` (e.g. fetch timestamp or doc id); with
    no order column the lexicographically-smallest (text, outlinks)
    struct — still deterministic, never partition-order dependent."""
    key = (
        F.col(order_col)
        if order_col
        else F.struct(F.col("text"), F.col("outlinks"))
    )
    payload = F.struct(
        key.alias("k"), F.col("text"), F.col("outlinks")
    )
    return (
        parsed.groupBy("canonical_url")
        .agg(F.min(payload).alias("p"))
        .select(
            "canonical_url",
            F.col("p.text").alias("text"),
            F.col("p.outlinks").alias("outlinks"),
        )
    )


def host_graph(deduped: DataFrame) -> DataFrame:
    """(src_host, dst_host, weight) edges: explode outlinks, project
    both sides to hosts, drop self-loops, collapse parallel edges into
    a weight. One explode + one edge-keyed aggregate."""
    e = deduped.select(
        url_host(F.col("canonical_url")).alias("src"),
        F.explode("outlinks").alias("link"),
    ).select("src", url_host(F.col("link")).alias("dst"))
    return (
        e.filter(
            (F.col("src") != F.col("dst"))
            & (F.col("dst") != "")
            # schemeless canonical URLs have no host — dropping only
            # the dst side would keep asymmetric ''-source edges
            & (F.col("src") != "")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def host_ranks(
    deduped: DataFrame, *, n_iters: int = 5, damping: float = 0.85
) -> DataFrame:
    """PageRank over the host graph. Nodes = every host that appears
    as a page's own host OR as a link target (so pure sinks keep their
    rank). Parallel-edge multiplicity flows through ``pagerank``'s
    ``weight_col`` — an edge of weight w contributes ``w/Σw`` of its
    source's rank (bit-identical to exploding w parallel rows, at
    O(distinct host pairs) per iteration)."""
    edges = host_graph(deduped)
    nodes = (
        deduped.select(url_host(F.col("canonical_url")).alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .filter(F.col("host") != "")
        .distinct()
    )
    return pagerank(
        nodes,
        edges,
        node_col="host",
        src_col="src",
        dst_col="dst",
        n_iters=n_iters,
        damping=damping,
        weight_col="weight",
    )


def anchor_texts(
    pages: DataFrame,
    url_col: str,
    html_col: str,
    *,
    max_texts: int = 100,
) -> DataFrame:
    """Anchor-text aggregation per link target — the classic web-corpus
    retrieval signal (anchor text describes the TARGET page better
    than the page describes itself; anchor corpora train retrievers).
    Returns one row per canonical target URL:
    ``(target, n_anchors, n_sources, texts)`` with ``texts`` the
    pipe-joined SORTED anchor texts (engine-agnostic comparison form,
    same convention as q49's posting lists), BOUNDED to the
    ``max_texts`` lexicographically-first texts per target — a hub
    page (a homepage with millions of inlinks) must not collapse into
    one unboundedly wide row; counts stay exact over ALL anchors.

    Scale shape: one anchor explode + one target-keyed aggregate for
    the exact counts — the same shuffle the host graph needs; anchor
    text is stripped of inner markup and whitespace-collapsed per row
    before the shuffle (constant-width keys, no document bodies
    move). The text sample adds one target-keyed window whose output
    is capped BEFORE the list aggregation, so no executor ever
    materializes a hub's full anchor list."""
    from lsdm_motogp_data_integration_spark.operators.textops import (
        html_anchors,
        strip_html,
    )
    from pyspark.sql import Window

    exploded = pages.select(
        normalize_url(F.col(url_col)).alias("__src"),
        F.explode(html_anchors(F.col(html_col))).alias("__a"),
    ).select(
        "__src",
        normalize_url(F.col("__a.href")).alias("target"),
        F.trim(strip_html(F.col("__a.text"))).alias("__text"),
    )
    absolute = exploded.filter(F.col("target").rlike(SCHEME_RE))
    counts = absolute.groupBy("target").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        F.countDistinct("__src").cast("bigint").alias("n_sources"),
    )
    w = Window.partitionBy("target").orderBy(
        F.col("__text").asc(), F.col("__src").asc()
    )
    sampled = (
        absolute.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_texts))
        .groupBy("target")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("__text")), "|"
            ).alias("texts")
        )
    )
    return counts.join(sampled, "target")
