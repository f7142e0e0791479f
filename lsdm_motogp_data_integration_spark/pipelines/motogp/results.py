"""Race-results fact: synthetic stand-in + assembly joins.

The reference's main fact input ``race_results_view.csv`` is a missing
large blob (``.MISSING_LARGE_BLOBS:2``); its schema is declared at
``motogp.ktr:4442-4648`` and reconstructed in FIXTURES.md §1.
:func:`synthesize_race_results` generates a deterministic stand-in from
the *real* reference dims (quali grid rows + hash-assigned teams/bikes,
including deliberate orphans to exercise inner-join drops) — pure
DataFrame ops, reproducible on any executor count.

:func:`build_results_enriched` then replays the reference join spine
(SURVEY.md §3.1 "Results fact"): results ⨝INNER bikes (after the
``bike_id <> 234`` filter, ``motogp.ktr:2759``) ⨝INNER teams on name
(``Merge join``/``Merge join 2``, ``:3619``, ``:3759``), then the
``year >= 2005`` fan-out filter (``:2891``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.pipelines.motogp.teams import (
    team_id_by_name,
)

from lsdm_motogp_data_integration_spark.operators.dedup import md5_60bit

POINTS_BY_POSITION = {
    1: 25.0, 2: 20.0, 3: 16.0, 4: 13.0, 5: 11.0, 6: 10.0, 7: 9.0, 8: 8.0,
    9: 7.0, 10: 6.0, 11: 5.0, 12: 4.0, 13: 3.0, 14: 2.0, 15: 1.0,
}


def _points_expr(pos_col: str) -> F.Column:
    expr = F.lit(0.0)
    for pos, pts in POINTS_BY_POSITION.items():
        expr = F.when(F.col(pos_col) == pos, F.lit(pts)).otherwise(expr)
    return expr


def synthesize_race_results(
    quali: DataFrame,
    riders_master: DataFrame,
    teams_raw: DataFrame,
    bikes_raw: DataFrame,
    *,
    orphan_every: int = 100,
) -> DataFrame:
    """Deterministic fact rows matching the declared schema
    (``motogp.ktr:4442-4648``): one row per quali-grid entry, enriched
    with hash-assigned team/bike names from the real dims. Every
    ``orphan_every``-th row gets a phantom team (FIXTURES.md: deliberate
    orphans — INNER joins must drop them silently)."""
    n_teams = teams_raw.count()
    n_bikes = bikes_raw.count()

    base = quali.select(
        F.col("Year").alias("year"),
        F.col("Class").alias("category"),
        F.dense_rank()
        .over(Window.partitionBy("Year").orderBy("OfficialName"))
        .alias("sequence"),
        F.col("OfficialName").alias("shortname"),
        F.col("OfficialName").alias("circuit_name"),
        F.col("RiderName").alias("rider_name_plain"),
        F.col("Position").alias("position"),
    )
    # portable md5-based hash (not xxhash64): DuckDB computes the
    # identical value, so the whole synthetic fact — and every table
    # derived from it — can be replayed by the SQL oracle
    h = md5_60bit(
        F.concat_ws(
            "|",
            F.col("rider_name_plain"),
            F.col("year").cast("string"),
            F.col("shortname"),
        )
    )
    # "Name Surname" -> "Name, Surname" (the fact file's comma format,
    # split back apart by the pipeline at motogp.ktr:8085); anchored
    # pattern replaces only the first name/surname boundary
    comma_name = F.regexp_replace(
        F.col("rider_name_plain"), r"^(\S+)\s+", "$1, "
    )

    # survivor rules are explicit (min id / min_by id), not
    # dropDuplicates-on-a-subset — dropDuplicates keeps a
    # partition-order-dependent arbitrary row when the key repeats,
    # which would make the golden fingerprints layout-fragile
    master_names = (
        riders_master.select(
            F.col("id").alias("rider"),
            F.upper(
                F.concat_ws(" ", F.col("first_name"), F.col("last_name"))
            ).alias("join_name"),
        )
        .groupBy("join_name")
        .agg(F.min("rider").alias("rider"))
    )

    # NB id % n assumes the dim's ids are dense enough that every
    # bucket 0..n-1 is populated — true for the reference CSVs (and the
    # q44/q45 oracle replays the identical formula, so the two sides
    # cannot drift). A sparse-id dim would leave empty buckets whose
    # fact rows drop at the enrichment join; this synthesizer is
    # parity-frozen stand-in data, not a general operator.
    team_idx = (
        teams_raw.select(
            F.col("name").alias("team_name"),
            F.col("id"),
            (F.col("id") % n_teams).alias("__tidx"),
        )
        .groupBy("__tidx")
        .agg(F.min_by("team_name", "id").alias("team_name"))
    )
    bike_idx = (
        bikes_raw.select(
            F.col("name").alias("bike_name"),
            F.col("id"),
            (F.col("id") % n_bikes).alias("__bidx"),
        )
        .groupBy("__bidx")
        .agg(F.min_by("bike_name", "id").alias("bike_name"))
    )

    with_ids = (
        base.withColumn("rider_name", comma_name)
        .withColumn("__join_name", F.upper(F.col("rider_name_plain")))
        .join(master_names, F.col("__join_name") == master_names.join_name, "left")
        .withColumn("rider", F.coalesce(F.col("rider"), F.lit(-1)))
        .withColumn("__tidx", F.pmod(h, F.lit(n_teams)))
        # independent hash for the bike pick (h * k would overflow long
        # under ANSI arithmetic)
        .withColumn(
            "__bidx",
            F.pmod(
                md5_60bit(
                    F.concat_ws(
                        "|",
                        F.lit("bike"),
                        F.col("rider_name_plain"),
                        F.col("year").cast("string"),
                        F.col("shortname"),
                    )
                ),
                F.lit(n_bikes),
            ),
        )
        .join(F.broadcast(team_idx), "__tidx", "left")
        .join(F.broadcast(bike_idx), "__bidx", "left")
        .withColumn(
            "team_name",
            F.when(h % orphan_every == 0, F.lit("__phantom team__")).otherwise(
                F.col("team_name")
            ),
        )
    )
    return with_ids.select(
        "year",
        "category",
        "sequence",
        "shortname",
        "circuit_name",
        "rider",
        "rider_name",
        "team_name",
        "bike_name",
        F.col("position").cast("long").alias("position"),
        _points_expr("position").alias("points"),
        (F.pmod(h, F.lit(99)) + 1).cast("decimal(5,1)").alias("number"),
        F.lit(None).cast("string").alias("country"),
        (F.pmod(h, F.lit(800)) / 10 + 120).cast("decimal(6,1)").alias("speed"),
        F.concat(F.lit("+"), (F.pmod(h, F.lit(90))).cast("string"), F.lit(".")
                 , F.pmod(h, F.lit(999)).cast("string")).alias("time"),
    )


def build_results_enriched(
    race_results: DataFrame,
    bikes_raw: DataFrame,
    teams_dim: DataFrame,
) -> DataFrame:
    """The reference's fact join spine: bikes filter+join, teams join,
    year filter. Both dims are small → broadcast; the reference instead
    sort-merge-joined with 6 hand-inserted SortRows steps."""
    bikes = (
        bikes_raw.filter(F.col("id") != 234)  # Filter rows 3 2, :2759
        .select(
            F.col("id").alias("bike_id"), F.col("name").alias("bike_name")
        )
        .groupBy("bike_name")
        .agg(F.min("bike_id").alias("bike_id"))
    )
    teams = team_id_by_name(teams_dim)
    return (
        race_results.join(F.broadcast(bikes), "bike_name", "inner")
        .join(F.broadcast(teams), "team_name", "inner")
        .filter(F.col("year") >= 2005)  # Filter rows 4 / 4 2, :2891/:2956
    )
