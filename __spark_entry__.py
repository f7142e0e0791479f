"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(reference cites in the docstrings) against the driver's synthetic
TPC-H-ish tables; ``oracle_sql()`` holds the DuckDB-equivalent SQL.

Numeric-determinism convention used throughout: fractional aggregates
are computed per-row in float64 (identical in both engines), cast to
DECIMAL(18,6) per row (exact, associative addition — immune to
summation-order differences), summed, and cast back to DOUBLE. Window
ranks always carry an explicit deterministic tie-break, and Spark's
int-typed ``row_number`` is cast to BIGINT to match DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.functions.text import to_date_multi
from lsdm_motogp_data_integration_spark.operators.fuzzy import similarity_join
from lsdm_motogp_data_integration_spark.operators.keys import (
    add_surrogate_key_distributed,
)
from lsdm_motogp_data_integration_spark.sources import read_table


def _dec_sum(expr: str, alias: str) -> F.Column:
    """SUM(CAST(<per-row double expr> AS DECIMAL(18,6))) -> DOUBLE."""
    return (
        F.sum(F.expr(expr).cast("decimal(18,6)")).cast("double").alias(alias)
    )


# ---------------------------------------------------------------------------
# Scan / project / filter (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan+filter+group+multi-agg — the CsvInput →
    SelectValues → GroupBy spine of the reference (``motogp.ktr:1405``,
    ``:3542``) on the lineitem fact."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            _dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            _dec_sum(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_select_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SelectValues: ordered projection + rename + metadata re-type
    (``motogp.ktr:2145`` et al. — 30 instances)."""
    part = read_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_retailprice").cast("decimal(12,2)").alias("retail_dec"),
        F.col("p_size").cast("bigint").alias("size_long"),
    )


def q03_filter_route_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterRows true-branch: AND-conjunction predicate
    (``motogp.ktr:2650-2693``: ``category='MotoGP'``-style equality +
    range)."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def q04_filter_route_false(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterRows false-branch routing — the complement stream of the
    same predicate goes to a different consumer (``motogp.ktr:2891`` vs
    ``:2956``)."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        ~((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge join INNER (``motogp.ktr:3619-3652``): fact ⨝ dim equi-join.
    Catalyst broadcasts the dim — no user pre-sort, unlike the
    reference's 20 SortRows join prerequisites."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
    )


def q06_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge join LEFT OUTER (``motogp.ktr:3653-3690``): unmatched left
    rows survive with nulls."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def q07_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge join RIGHT OUTER (``motogp.ktr:3825-3858``)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def q08_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key equi-join (``Merge join 7`` on (year, category),
    ``motogp.ktr:3925-3960``): orders ⨝ per-(custkey,status) counts."""
    o = read_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_same_status")
    )
    return o.join(agg, ["o_custkey", "o_orderstatus"], "inner").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "n_same_status"
    )


def q09_position_counts_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal reference shape: FilterRows cascade (position = 1 / 2
    / 3 / other, ``motogp.ktr:2694-2890``) → 4 GroupBy COUNTs
    (``:3297-3480``) → 5-way MultiwayMergeJoin on the key
    (``:4109-4148``), with l_linenumber standing in for position and
    supplier for rider."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")

    def counted(pred, alias: str) -> DataFrame:
        return (
            li.filter(pred)
            .groupBy(F.col("l_suppkey").alias("s_suppkey"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    out = s.select("s_suppkey", "s_name")
    branches = [
        counted(F.col("l_linenumber") == 1, "pos1"),
        counted(F.col("l_linenumber") == 2, "pos2"),
        counted(F.col("l_linenumber") == 3, "pos3"),
        counted(~F.col("l_linenumber").isin(1, 2, 3), "other_pos"),
    ]
    for branch in branches:
        out = out.join(branch, "s_suppkey", "inner")
    return out


def q10_position_counts_conditional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark-first collapse of q09: one pass of conditional
    aggregation replaces filter-cascade + 4 group-bys + 5-way join
    (SURVEY §2.4 — same result, one shuffle instead of five)."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    counts = li.groupBy("l_suppkey").agg(
        F.count(F.when(F.col("l_linenumber") == 1, 1)).alias("pos1"),
        F.count(F.when(F.col("l_linenumber") == 2, 1)).alias("pos2"),
        F.count(F.when(F.col("l_linenumber") == 3, 1)).alias("pos3"),
        F.count(
            F.when(~F.col("l_linenumber").isin(1, 2, 3), 1)
        ).alias("other_pos"),
    )
    return (
        s.join(counts, s.s_suppkey == counts.l_suppkey, "inner")
        .select("s_suppkey", "s_name", "pos1", "pos2", "pos3", "other_pos")
    )


# ---------------------------------------------------------------------------
# Aggregation + window rank (SURVEY §2.4, §2.5) — the flagship
# ---------------------------------------------------------------------------


def q11_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the team-standings pipeline shape (``motogp.ktr:2021 →
    8426``) — join, SUM per (year, group), rank within year via
    ``row_number`` (the reference hand-rolls this rank in stateful
    JavaScript, ``motogp.ktr:4029-4108``; row_number-not-dense_rank
    semantics preserved)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    standings = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .withColumn("season", F.year("o_orderdate").cast("bigint"))
        .groupBy("season", "c_mktsegment")
        .agg(_dec_sum("o_totalprice", "total_points"))
    )
    w = Window.partitionBy("season").orderBy(
        F.col("total_points").desc(), F.col("c_mktsegment").asc()
    )
    return standings.withColumn(
        "final_position", F.row_number().over(w).cast("bigint")
    )


def q12_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupBy-with-no-aggregates deduplication (``Group by 3``,
    ``motogp.ktr:3481-3540``) → ``dropDuplicates``."""
    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


def q13_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kettle Sequence steps (``motogp.ktr:1203-1343``) as deterministic
    dense keys — the distributed two-phase variant (operators/keys.py),
    equal to ``row_number() OVER (ORDER BY c_custkey)``."""
    c = read_table(spark, sf_dir, "customer")
    return add_surrogate_key_distributed(
        c.select("c_custkey", "c_name"), "cust_seq", ["c_custkey"]
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------


def q14_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringOperations / ReplaceString / ConcatFields / FieldSplitter
    (``motogp.ktr:8265-8720``, ``:4809-4886``, ``:1677``, ``:8085``):
    trim+case ops, literal replace, split+concat."""
    c = read_table(spark, sf_dir, "customer")
    name_parts = F.split(F.col("c_name"), "#")
    return c.select(
        "c_custkey",
        F.upper(F.trim(F.col("c_mktsegment"))).alias("segment_upper"),
        F.lower(F.col("c_name")).alias("name_lower"),
        F.regexp_replace(F.col("c_name"), "Customer", "Rider").alias(
            "name_replaced"
        ),
        name_parts.getItem(1).cast("bigint").alias("name_number"),
        F.concat_ws(
            "-", F.col("c_mktsegment"), name_parts.getItem(1)
        ).alias("segment_code"),
    )


def q15_date_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parsing (``race_coord.py:50-79`` strptime
    attempts → ``coalesce(try_to_timestamp...)``): render o_orderdate in
    two alternating text formats, parse back, aggregate per month."""
    o = read_table(spark, sf_dir, "orders")
    as_text = o.withColumn(
        "date_text",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "yyyy/MM/dd"),
        ).otherwise(F.date_format("o_orderdate", "dd-MM-yyyy")),
    )
    parsed = as_text.withColumn(
        "parsed_date", to_date_multi("date_text", ["yyyy/MM/dd", "dd-MM-yyyy"])
    )
    return parsed.groupBy(
        F.date_format("parsed_date", "yyyy-MM").alias("order_month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


def q16_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append streams = UNION ALL (``motogp.ktr:1378-1404``), with a
    lineage tag per branch."""
    o = read_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit("open").alias("branch")
    )
    done_o = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("finished").alias("branch")
    )
    return open_o.unionByName(done_o)


# ---------------------------------------------------------------------------
# Fuzzy similarity join (SURVEY §2.3 FuzzyMatch)
# ---------------------------------------------------------------------------


def q17_fuzzy_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyMatch: Jaro-Winkler nearest-neighbor lookup, case-insensitive
    best match per probe row with deterministic tie-break
    (``motogp.ktr:3021-3152``). Probes are deterministically corrupted
    nation names (last char dropped, lowered) matched back against the
    nation dim."""
    n = read_table(spark, sf_dir, "nation")
    probe = n.select(
        F.col("n_nationkey").alias("probe_id"),
        F.lower(
            F.expr("substr(n_name, 1, length(n_name) - 1)")
        ).alias("probe_name"),
    )
    matched = similarity_join(
        probe,
        n.select("n_name"),
        "probe_name",
        "n_name",
        score_col="similarity",
        how="inner",
    )
    return matched.select(
        "probe_id",
        "probe_name",
        F.col("n_name").alias("matched_name"),
        F.round("similarity", 6).alias("similarity"),
    )


# ---------------------------------------------------------------------------
# Contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (standings rank) on /root/testdata/sf0.001."""
    return q11_standings(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_select_rename_cast": q02_select_rename_cast,
        "q03_filter_route_true": q03_filter_route_true,
        "q04_filter_route_false": q04_filter_route_false,
        "q05_join_inner": q05_join_inner,
        "q06_join_left": q06_join_left,
        "q07_join_right": q07_join_right,
        "q08_join_multikey": q08_join_multikey,
        "q09_position_counts_multiway": q09_position_counts_multiway,
        "q10_position_counts_conditional": q10_position_counts_conditional,
        "q11_standings": q11_standings,
        "q12_dedup_distinct": q12_dedup_distinct,
        "q13_surrogate_key": q13_surrogate_key,
        "q14_string_ops": q14_string_ops,
        "q15_date_multiformat": q15_date_multiformat,
        "q16_union_all": q16_union_all,
        "q17_fuzzy_best_match": q17_fuzzy_best_match,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_select_rename_cast": """
            SELECT p_partkey AS part_id,
                   p_name AS part_name,
                   CAST(p_retailprice AS DECIMAL(12,2)) AS retail_dec,
                   CAST(p_size AS BIGINT) AS size_long
            FROM part
        """,
        "q03_filter_route_true": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        """,
        "q04_filter_route_false": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE NOT (o_orderstatus = 'O' AND o_totalprice > 100000.0)
        """,
        "q05_join_inner": """
            SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "q06_join_left": """
            SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        """,
        "q07_join_right": """
            SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        """,
        "q09_position_counts_multiway": """
            WITH pos1 AS (
                SELECT l_suppkey AS s_suppkey, COUNT(*) AS pos1
                FROM lineitem WHERE l_linenumber = 1 GROUP BY 1
            ), pos2 AS (
                SELECT l_suppkey AS s_suppkey, COUNT(*) AS pos2
                FROM lineitem WHERE l_linenumber = 2 GROUP BY 1
            ), pos3 AS (
                SELECT l_suppkey AS s_suppkey, COUNT(*) AS pos3
                FROM lineitem WHERE l_linenumber = 3 GROUP BY 1
            ), other_p AS (
                SELECT l_suppkey AS s_suppkey, COUNT(*) AS other_pos
                FROM lineitem WHERE l_linenumber NOT IN (1, 2, 3) GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name, pos1.pos1, pos2.pos2, pos3.pos3, other_p.other_pos
            FROM supplier s
            JOIN pos1 USING (s_suppkey)
            JOIN pos2 USING (s_suppkey)
            JOIN pos3 USING (s_suppkey)
            JOIN other_p USING (s_suppkey)
        """,
        "q08_join_multikey": """
            WITH agg AS (
                SELECT o_custkey, o_orderstatus, COUNT(*) AS n_same_status
                FROM orders GROUP BY o_custkey, o_orderstatus
            )
            SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, agg.n_same_status
            FROM orders o JOIN agg
              ON o.o_custkey = agg.o_custkey AND o.o_orderstatus = agg.o_orderstatus
        """,
        "q10_position_counts_conditional": """
            WITH counts AS (
                SELECT l_suppkey,
                       COUNT(*) FILTER (WHERE l_linenumber = 1) AS pos1,
                       COUNT(*) FILTER (WHERE l_linenumber = 2) AS pos2,
                       COUNT(*) FILTER (WHERE l_linenumber = 3) AS pos3,
                       COUNT(*) FILTER (WHERE l_linenumber NOT IN (1, 2, 3)) AS other_pos
                FROM lineitem GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, pos1, pos2, pos3, other_pos
            FROM supplier JOIN counts ON s_suppkey = l_suppkey
        """,
        "q11_standings": """
            WITH standings AS (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS season,
                       c_mktsegment,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_points
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY 1, 2
            )
            SELECT season, c_mktsegment, total_points,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY season
                       ORDER BY total_points DESC, c_mktsegment ASC
                   ) AS BIGINT) AS final_position
            FROM standings
        """,
        "q12_dedup_distinct": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "q13_surrogate_key": """
            SELECT c_custkey, c_name,
                   CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS cust_seq
            FROM customer
        """,
        "q14_string_ops": """
            SELECT c_custkey,
                   UPPER(TRIM(c_mktsegment)) AS segment_upper,
                   LOWER(c_name) AS name_lower,
                   REGEXP_REPLACE(c_name, 'Customer', 'Rider') AS name_replaced,
                   CAST(string_split(c_name, '#')[2] AS BIGINT) AS name_number,
                   c_mktsegment || '-' || string_split(c_name, '#')[2] AS segment_code
            FROM customer
        """,
        "q15_date_multiformat": """
            WITH as_text AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 2 = 0
                            THEN strftime(o_orderdate, '%Y/%m/%d')
                            ELSE strftime(o_orderdate, '%d-%m-%Y')
                       END AS date_text
                FROM orders
            ), parsed AS (
                SELECT COALESCE(
                           CAST(try_strptime(date_text, '%Y/%m/%d') AS DATE),
                           CAST(try_strptime(date_text, '%d-%m-%Y') AS DATE)
                       ) AS parsed_date
                FROM as_text
            )
            SELECT strftime(parsed_date, '%Y-%m') AS order_month,
                   COUNT(*) AS n_orders
            FROM parsed GROUP BY 1
        """,
        "q16_union_all": """
            SELECT o_orderkey, 'open' AS branch FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey, 'finished' AS branch FROM orders WHERE o_orderstatus = 'F'
        """,
        "q17_fuzzy_best_match": """
            WITH probe AS (
                SELECT n_nationkey AS probe_id,
                       LOWER(substr(n_name, 1, length(n_name) - 1)) AS probe_name
                FROM nation
            ), cand AS (
                SELECT p.probe_id, p.probe_name, n.n_name,
                       jaro_winkler_similarity(
                           LOWER(TRIM(p.probe_name)), LOWER(TRIM(n.n_name))
                       ) AS sim
                FROM probe p CROSS JOIN nation n
            ), best AS (
                SELECT probe_id, probe_name, n_name, sim,
                       ROW_NUMBER() OVER (
                           PARTITION BY probe_id
                           ORDER BY sim DESC, n_name ASC
                       ) AS rn
                FROM cand
            )
            SELECT probe_id, probe_name, n_name AS matched_name,
                   ROUND(sim, 6) AS similarity
            FROM best WHERE rn = 1
        """,
    }
