"""PageRank contracts (operators/graph)."""

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.graph import pagerank


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id bigint")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src bigint, dst bigint"
    )


def test_pagerank_mass_conserved(spark):
    """With every node linked, total rank mass stays 1 (up to the
    1e-15 quantization)."""
    n = 10
    ring = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    pr = pagerank(_nodes(spark, range(n)), ring, n_iters=5)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_uniform_on_ring(spark):
    """A symmetric ring has the uniform stationary distribution —
    every node exactly 1/N at every iteration."""
    n = 8
    ring = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = pagerank(_nodes(spark, range(n)), ring, n_iters=4).collect()
    for r in rows:
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_pagerank_hub_ranks_highest(spark):
    """Everyone links node 0; node 0 links node 1. This graph is a
    2-cycle (rank mass sloshes between 0 and 1 with period 2), so the
    iteration-parity-stable claims are: {0, 1} are the top two, and
    after an ODD number of updates node 0 (which everyone feeds)
    leads."""
    n = 6
    edges = _edges(spark, [(i, 0) for i in range(1, n)] + [(0, 1)])
    rows = pagerank(_nodes(spark, range(n)), edges, n_iters=9).collect()
    ranked = sorted(rows, key=lambda r: -r["rank"])
    assert {ranked[0]["id"], ranked[1]["id"]} == {0, 1}
    assert ranked[0]["id"] == 0
    # the leaf nodes tie exactly (identical in-link structure)
    leaf = {r["rank"] for r in rows if r["id"] >= 2}
    assert len(leaf) == 1


def test_pagerank_all_dangling_stays_uniform(spark):
    """No edges at all: dangling mass redistributes uniformly, so the
    uniform start is a fixed point."""
    n = 5
    pr = pagerank(
        _nodes(spark, range(n)), _edges(spark, []), n_iters=3
    ).collect()
    for r in pr:
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_pagerank_deterministic_across_runs(spark):
    """Two runs produce bit-identical ranks (integer-quantized sums —
    no partition-order drift)."""
    n = 40
    edges = _edges(
        spark,
        [(i, (i * 3 + 1) % n) for i in range(n)]
        + [(i, (i * 7 + 2) % n) for i in range(n) if i % 4 != 3],
    )
    a = pagerank(_nodes(spark, range(n)), edges, n_iters=6)
    b = pagerank(
        _nodes(spark, range(n)).repartition(7), edges.repartition(5),
        n_iters=6,
    )
    ja = {r["id"]: r["rank"] for r in a.collect()}
    jb = {r["id"]: r["rank"] for r in b.collect()}
    assert ja == jb


def test_pagerank_weighted_equals_exploded(spark):
    """weight_col must be BIT-IDENTICAL to exploding each edge into
    weight parallel rows (the quantized per-copy contribution just
    multiplies)."""
    n = 12
    weighted = spark.createDataFrame(
        [(i, (i + 1) % n, (i % 3) + 1) for i in range(n)],
        "src bigint, dst bigint, w bigint",
    )
    exploded = weighted.select(
        "src",
        "dst",
        F.explode(F.sequence(F.lit(1), F.col("w").cast("int"))).alias("i"),
    ).select("src", "dst")
    a = pagerank(
        _nodes(spark, range(n)), weighted, n_iters=5, weight_col="w"
    )
    b = pagerank(_nodes(spark, range(n)), exploded, n_iters=5)
    ja = {r["id"]: r["rank"] for r in a.collect()}
    jb = {r["id"]: r["rank"] for r in b.collect()}
    assert ja == jb


def test_pagerank_open_graph_leaks_mass_as_documented(spark):
    """Edges pointing outside the node universe leak their share —
    total rank drops below 1 (the documented contract, not a bug)."""
    n = 4
    edges = _edges(spark, [(0, 1), (1, 99), (2, 3), (3, 0)])
    pr = pagerank(_nodes(spark, range(n)), edges, n_iters=3)
    total = pr.agg(F.sum("rank")).first()[0]
    assert total < 1.0 - 1e-6
