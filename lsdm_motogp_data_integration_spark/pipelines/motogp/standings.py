"""Team standings.

Reference branch (SURVEY.md §3.1 "Team standings"): ``Constructor WC``
→ ``Replace in string`` ×2 (strip ``™``/mojibake, ``motogp.ktr:
4809-4886``) ⨝INNER (year, category) (``Merge join 7``, ``:3925``) ←
team season rows ← results → ``Group by 3 2`` (SUM points, ``:3542``)
→ ``Sort rows 14 2`` (points desc) → ``Modified JavaScript value 2``
(stateful rank, ``:4029-4108``) → ⨝INNER team_name (``Merge join 9``,
``:3995``) ← teams → **Team Standings 2** (``:8426``).

The hand-rolled JS rank (reset on new year_category else increment) is
exactly ``row_number() OVER (PARTITION BY year, category ORDER BY
total_points DESC)`` — row_number, not dense_rank: ties get distinct
positions (SURVEY §2.5).

Output: team_standings(year, category, team_name, total_points,
final_position, team_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.functions.text import strip_trademark


def build_team_standings(
    constructors_wc: DataFrame,
    results_enriched: DataFrame,
) -> DataFrame:
    # only used as a season semi-join filter — keep just the key, so the
    # dedup is full-row and deterministic
    wc = constructors_wc.select(
        F.col("Season").alias("year"),
        strip_trademark(F.col("Class")).alias("category"),
    ).dropDuplicates()

    # team_id already rides on the fact spine (build_results_enriched's
    # team join) — carry it instead of re-joining teams_dim at the end
    season_rows = results_enriched.select(
        "year", "category", "team_name", "team_id", "points"
    )
    # INNER on (year, category): only seasons present in the world
    # championship list survive — reference semantics (Merge join 7)
    in_wc = season_rows.join(F.broadcast(wc), on=["year", "category"], how="inner")

    # team_id is functionally dependent on team_name (min-id survivor
    # rule) — adding it to the key changes nothing but keeps it around
    totals = in_wc.groupBy("year", "category", "team_name", "team_id").agg(
        F.sum(F.col("points").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_points")
    )
    w = Window.partitionBy("year", "category").orderBy(
        F.col("total_points").desc(), F.col("team_name").asc()
    )
    ranked = totals.withColumn(
        "final_position", F.row_number().over(w).cast("bigint")
    )
    return ranked.select(
        "year", "category", "team_name", "total_points", "final_position", "team_id"
    )
