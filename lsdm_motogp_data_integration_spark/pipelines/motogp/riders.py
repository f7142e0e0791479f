"""Enriched rider master.

Reference branch (SURVEY.md §3.1 "Riders enrichment"):

- ``Riders Positions`` (finishing positions, "Name Surname") →
  ``Trim 5`` (upper Rider/Country, ``motogp.ktr:8628``) →
  ``Select values`` (rename; drop 4th/5th/6th/country; cast 2nd/3rd).
- ``Riders Info`` ("SURNAME Name") → ``Trim 5 2`` (upper, ``:8681``) →
  ``Split fields 3`` + ``Concat fields 2 3`` (reorder to "Name
  SURNAME", ``:8205``, ``:1935``) → ``Select values 2`` (drop poles/
  fastest-lap/championships).
- ``Merge join 13`` LEFT OUTER on rider_name (``:8826-8858``).
- Riders master → ``Edit Name 7`` → ``Concat fields`` (first+last →
  rider_name1, ``:1677``) → ``String operations`` (upper, ``:8265``) →
  ``Merge join 4`` RIGHT OUTER (stats.rider_name = master.rider_name1,
  ``:3825``) → ``add id 3`` (id_rider_seq — the reference draws this
  from a Postgres sequence, ``:8756-8790``; replaced by a
  deterministic key) → rider master stream.

Output: riders_enriched(rider_id, rider_name, country, number,
career_victories, career_2nd, career_3rd, id_rider_seq) — every master
rider kept (right-outer), career stats null where no name match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.functions.text import (
    name_from_surname_first,
    normalize_name,
)
from lsdm_motogp_data_integration_spark.operators.keys import add_surrogate_key


def build_riders_enriched(
    riders_master: DataFrame,
    riders_info: DataFrame,
    finishing_positions: DataFrame,
) -> DataFrame:
    fp = finishing_positions.select(
        normalize_name("Rider").alias("rider_name"),
        F.col("Victories").alias("fp_victories"),
        F.col("NumberofSecond").cast("long").alias("fp_2nd"),
        F.col("NumberofThird").cast("long").alias("fp_3rd"),
    )
    info = riders_info.select(
        normalize_name(
            name_from_surname_first("Riders All Time in All Classes")
        ).alias("rider_name"),
        F.col("Victories").alias("info_victories"),
        F.col("2nd places").cast("long").alias("info_2nd"),
        F.col("3rd places").cast("long").alias("info_3rd"),
    )
    # LEFT: finishing-positions is the richer driver; info fills gaps
    stats = (
        fp.join(info, on="rider_name", how="left")
        .select(
            "rider_name",
            F.coalesce("fp_victories", "info_victories").alias(
                "career_victories"
            ),
            F.coalesce("fp_2nd", "info_2nd").alias("career_2nd"),
            F.coalesce("fp_3rd", "info_3rd").alias("career_3rd"),
        )
        # the same normalized name can appear twice in the career files;
        # collapse to one stats row per name so the master join stays
        # 1:1 — element-wise max (best recorded career stats) is an
        # explicit, partition-order-independent survivor rule
        .groupBy("rider_name")
        .agg(
            F.max("career_victories").alias("career_victories"),
            F.max("career_2nd").alias("career_2nd"),
            F.max("career_3rd").alias("career_3rd"),
        )
    )

    master = riders_master.select(
        F.col("id").alias("rider_id"),
        normalize_name(
            F.concat_ws(" ", F.col("first_name"), F.col("last_name"))
        ).alias("rider_name"),
        F.col("country"),
        F.col("number"),
    )
    # RIGHT OUTER: all master riders survive, stats where names matched
    enriched = stats.join(master, on="rider_name", how="right")
    return add_surrogate_key(enriched, "id_rider_seq", ["rider_id"])
