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


# ---------------------------------------------------------------------------
# Structural statistics (undirected_canonical / degrees / triangles)
# ---------------------------------------------------------------------------


def test_undirected_canonical_collapses_and_drops_loops(spark):
    from lsdm_motogp_data_integration_spark.operators.graph import (
        undirected_canonical,
    )

    e = _edges(spark, [(1, 2), (2, 1), (2, 2), (3, 1), (1, 3), (1, 3)])
    got = sorted(
        (r["u"], r["v"]) for r in undirected_canonical(e).collect()
    )
    assert got == [(1, 2), (1, 3)]


def test_degree_histogram_star(spark):
    """A 4-leaf star: hub degree 4 (1 node), leaves degree 1 (4)."""
    from lsdm_motogp_data_integration_spark.operators.graph import (
        degree_histogram,
        undirected_canonical,
    )

    e = _edges(spark, [(0, i) for i in range(1, 5)])
    got = {
        r["degree"]: r["n_nodes"]
        for r in degree_histogram(undirected_canonical(e)).collect()
    }
    assert got == {4: 1, 1: 4}


def test_triangle_counts_hand_graph(spark):
    """K4 minus edge (2,3): triangles {0,1,2} and {0,1,3} — nodes 0
    and 1 sit in both, 2 and 3 in one each; a pendant node (4) and an
    isolated edge (5,6) contribute nothing."""
    from lsdm_motogp_data_integration_spark.operators.graph import (
        triangle_counts,
        undirected_canonical,
    )

    e = _edges(
        spark,
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (0, 4), (5, 6)],
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(undirected_canonical(e)).collect()
    }
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}


def test_triangle_counts_match_bruteforce(spark):
    """Degree-ordered wedge closing equals the O(n^3) reference count
    on a 40-node deterministic graph (modular edges — same family as
    the q58 synthetic graph, including skewed degrees)."""
    from itertools import combinations

    from lsdm_motogp_data_integration_spark.operators.graph import (
        triangle_counts,
        undirected_canonical,
    )

    n = 40
    pairs = [(i, (i * k + k) % n) for i in range(n) for k in (1, 2, 3)]
    pairs += [(0, i) for i in range(1, 15)]  # hot hub
    e = _edges(spark, pairs)
    canon = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    expected: dict[int, int] = {}
    for x, y, z in combinations(range(n), 3):
        if (
            (x, y) in canon and (y, z) in canon and (x, z) in canon
        ):
            for v in (x, y, z):
                expected[v] = expected.get(v, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(undirected_canonical(e)).collect()
    }
    assert got == expected


def test_bipartite_project_hand_case(spark):
    """users u1:{a,b,c} u2:{a,b} u3:{b} (u2's duplicate a-edge must
    not inflate counts) -> a|b:2, a|c:1, b|c:1."""
    from lsdm_motogp_data_integration_spark.operators.graph import (
        bipartite_project,
    )

    e = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "a"), (2, "b"),
            (3, "b"),
        ],
        "user bigint, item string",
    )
    got = {
        (r["item_a"], r["item_b"]): r["n_common"]
        for r in bipartite_project(
            e, left_col="user", right_col="item"
        ).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
