"""Participation fact + Rider output table.

Reference branches (SURVEY.md §3.1 "Rider career aggregates" and
"Participation + quali"):

- rider position counts: ``Filter rows 3`` cascade (position = 1/2/3/
  other, ``motogp.ktr:2694-2890``) → 4× ``Group by`` COUNT
  (``:3297-3480``) → 5-way ``Multiway merge join`` on rider_id
  (``:4109-4148``). Here: ONE conditional aggregation — same result,
  one shuffle instead of five (equivalence tested in
  tests/test_motogp_pipelines.py).
- **Rider** table: master attrs + counts, deduped via the
  no-aggregate ``Group by 3`` (``:3481``) → dropDuplicates.
- participation: ``Filter rows`` category='MotoGP' (``:2650``) →
  rider-name normalization ("Name, Surname" → "Name Surname",
  ``:8085``/``:1763``) → ``Merge join 10`` LEFT with the quali grid on
  (year, circuit_name, rider_name) (``:3653``) → ``Merge join 11``
  INNER rider stats (``:3691``) → ``Fuzzy match 2`` against the Race
  table to recover id_race (``:3111-3152``) → **Partecipation**
  (``:4149``).

Outputs:
- rider_table(id_rider_seq, rider_name, country, number, pos_1st,
  pos_2nd, pos_3rd, other_pos)
- participation(year, category, race_name, circuit_name, id_rider_seq,
  position, points, number, country, speed, time, race_id, bike_id,
  team_id, rider_name, corrispondenza, id_race, grid_position)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.functions.text import (
    name_from_comma,
    normalize_name,
)
from lsdm_motogp_data_integration_spark.operators.fuzzy import similarity_join


def build_rider_position_counts(results_enriched: DataFrame) -> DataFrame:
    """Per-rider finishing-position counts — the collapsed form of the
    reference's filter-cascade + 4 group-bys + 5-way join."""
    return results_enriched.groupBy("rider").agg(
        F.count(F.when(F.col("position") == 1, 1)).alias("pos_1st"),
        F.count(F.when(F.col("position") == 2, 1)).alias("pos_2nd"),
        F.count(F.when(F.col("position") == 3, 1)).alias("pos_3rd"),
        F.count(
            F.when(
                ~F.col("position").isin(1, 2, 3) | F.col("position").isNull(), 1
            )
        ).alias("other_pos"),
    )


def build_rider_position_counts_literal(
    results_enriched: DataFrame,
) -> DataFrame:
    """The literal reference shape (4 filtered COUNT group-bys 5-way
    inner-joined on rider_id) — kept for the documented equivalence
    test; use :func:`build_rider_position_counts` in the pipeline."""
    def counted(pred, alias: str) -> DataFrame:
        return (
            results_enriched.filter(pred)
            .groupBy("rider")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    riders = results_enriched.select("rider").dropDuplicates()
    out = riders
    for branch in [
        counted(F.col("position") == 1, "pos_1st"),
        counted(F.col("position") == 2, "pos_2nd"),
        counted(F.col("position") == 3, "pos_3rd"),
        counted(
            ~F.col("position").isin(1, 2, 3) | F.col("position").isNull(),
            "other_pos",
        ),
    ]:
        out = out.join(branch, "rider", "inner")
    return out


def build_rider_table(
    riders_enriched: DataFrame, position_counts: DataFrame
) -> DataFrame:
    """**Rider** sink: master attrs ⨝ position counts, deduplicated on
    all attributes (``Group by 3`` with no aggregates, ``:3481``)."""
    joined = riders_enriched.join(
        position_counts,
        riders_enriched.rider_id == position_counts.rider,
        "inner",
    )
    return joined.select(
        "id_rider_seq",
        "rider_name",
        "country",
        "number",
        "pos_1st",
        "pos_2nd",
        "pos_3rd",
        "other_pos",
    ).dropDuplicates()


def build_participation(
    results_enriched: DataFrame,
    quali: DataFrame,
    riders_enriched: DataFrame,
    races: DataFrame,
) -> DataFrame:
    motogp = results_enriched.filter(F.col("category") == "MotoGP")
    named = motogp.withColumn(
        "rider_name_norm", normalize_name(name_from_comma("rider_name"))
    )

    # explicit survivor rule (best grid slot) — dropDuplicates on a key
    # subset keeps a partition-order-dependent row
    grid = (
        quali.select(
            F.col("Year").alias("year"),
            F.col("OfficialName").alias("circuit_name"),
            normalize_name("RiderName").alias("rider_name_norm"),
            F.col("Position").alias("grid_position"),
        )
        .groupBy("year", "circuit_name", "rider_name_norm")
        .agg(F.min("grid_position").alias("grid_position"))
    )
    with_grid = named.join(
        F.broadcast(grid), on=["year", "circuit_name", "rider_name_norm"], how="left"
    )

    rider_keys = riders_enriched.select(
        F.col("rider_id").alias("rider"), "id_rider_seq"
    )
    with_rider = with_grid.join(rider_keys, on="rider", how="inner")

    # reference-parity quirk, kept deliberately: the ktr's FuzzyMatch
    # recovers id_race by circuit NAME alone (motogp.ktr:3111-3152), so
    # every season's rows at a circuit point at that circuit's earliest
    # race id — YEAR-BLIND by design. min(id_race) per name is the
    # deterministic rendering of that semantics; a year-aware linkage
    # would diverge from the reference output.
    race_lookup = (
        races.select(
            "id_race", F.col("circuit_name3").alias("race_circuit_name")
        )
        .groupBy("race_circuit_name")
        .agg(F.min("id_race").alias("id_race"))
    )
    matched = similarity_join(
        with_rider,
        race_lookup,
        "circuit_name",
        "race_circuit_name",
        score_col="corrispondenza",
        how="left",
    )
    return matched.select(
        "year",
        "category",
        F.col("shortname").alias("race_name"),
        "circuit_name",
        "id_rider_seq",
        "position",
        "points",
        "number",
        "country",
        "speed",
        "time",
        F.col("sequence").alias("race_id"),
        "bike_id",
        "team_id",
        F.col("rider_name_norm").alias("rider_name"),
        "corrispondenza",
        "id_race",
        "grid_position",
    )
