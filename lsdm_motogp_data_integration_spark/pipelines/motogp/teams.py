"""Teams dimension.

Reference branch: ``Teams`` → ``Edit Name 8`` (rename name→team_name,
``motogp.ktr:2572``) → ``Add sequence`` (team_id, ``:1273``) →
``Sort rows 7`` (presentation) → **Teams Table** (``motogp.ktr:8525``).

Output: teams(team_id, team_name, country).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.keys import add_surrogate_key


def build_teams(teams_raw: DataFrame) -> DataFrame:
    renamed = teams_raw.select(
        F.col("name").alias("team_name"),
        F.col("country").alias("country"),
        F.col("id").alias("source_id"),
    )
    # key over the source id (unique, stable) → same 1..N the reference
    # sequence produced over its ordered file scan
    return add_surrogate_key(renamed, "team_id", ["source_id"]).drop(
        "source_id"
    )

def team_id_by_name(teams_dim: DataFrame) -> DataFrame:
    """Shared survivor rule for duplicate team names: the smallest
    team_id wins (deterministic). Used by BOTH the results join spine
    and the standings join so duplicate names always resolve to the
    same id."""
    return (
        teams_dim.select("team_id", "team_name")
        .groupBy("team_name")
        .agg(F.min("team_id").alias("team_id"))
    )
