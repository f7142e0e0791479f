"""Races + weather integration (Race Table and Info Race).

Reference branch (SURVEY.md §3.1): ``Race Wheater`` JSON →
``Select values 3`` (it→en renames, date cast ``motogp.ktr:6338``)
⨝INNER on date (``Merge join 8``, ``:3961``) ← ``Select values 4`` ←
``Race & Date`` JSON → ``Select values 5`` → ``String operations 2``
(lower/trim) → ``Fuzzy match`` (Jaro-Winkler vs circuit dim, attaches
circuit_id + attrs, ``:3021-3110``) → ``ADD id 2`` (id_race, ``:1238``)
→ fan-out: **Race Table** (``:4649``) and **Info Race** (``:3595``).

Outputs:
- races(id_race, circuit_name, date, year, circuit_name3, off_name,
  country, circuit_id)
- race_info(id_race, temp_max, temp_min, rain, condition, date,
  circuit_name3, off_name, info, night_race, lat, long)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.fuzzy import similarity_join
from lsdm_motogp_data_integration_spark.operators.keys import add_surrogate_key


def build_races_and_info(
    races_json: DataFrame, weather_json: DataFrame, circuits_dim: DataFrame
) -> tuple[DataFrame, DataFrame]:
    races = races_json.select(
        F.col("Anno").alias("year"),
        # try_*: a malformed date string must null, not raise — ANSI
        # mode makes plain to_date an exception, at odds with the
        # PERMISSIVE readers (and the DuckDB oracle's TRY_CAST)
        F.try_to_timestamp("Data", F.lit("yyyy-MM-dd"))
        .cast("date")
        .alias("date"),
        F.lower(F.trim(F.col("Circuito"))).alias("circuit_name3"),
        F.col("Nome_Ufficiale").alias("off_name"),
        F.col("Percorso").alias("info"),
        F.col("Notturna").alias("night_race"),
        F.col("Latitudine").alias("lat_raw"),
        F.col("Longitudine").alias("long_raw"),
    )
    weather = weather_json.select(
        F.try_to_timestamp("Data", F.lit("yyyy-MM-dd"))
        .cast("date")
        .alias("date"),
        F.col("Circuito").alias("weather_place"),
        F.col("Temp_Max").alias("temp_max"),
        F.col("Temp_Min").alias("temp_min"),
        F.col("Precipitazione").alias("rain"),
        F.col("Condizione_Meteo").alias("condition"),
    )
    # date-only join — the reference's Merge join 8 key
    # (motogp.ktr:3961). Two events sharing a calendar date would fan
    # out here exactly as in Kettle; weather_place participates in the
    # id ordering below so even then the surrogate assignment stays
    # deterministic.
    joined = races.join(weather, on="date", how="inner")

    # fuzzy-recover the circuit dimension row for each race; the lookup
    # side is the 68-row dim → broadcast (operators/fuzzy.py)
    matched = similarity_join(
        joined,
        circuits_dim,
        "circuit_name3",
        "name_circuit",
        score_col="corrispondenza",
        how="left",
    )
    keyed = add_surrogate_key(
        matched, "id_race", ["date", "circuit_name3", "weather_place"]
    )

    races_out = keyed.select(
        "id_race",
        F.col("name_circuit").alias("circuit_name"),
        "date",
        "year",
        "circuit_name3",
        "off_name",
        "country",
        "circuit_id",
    )
    race_info_out = keyed.select(
        "id_race",
        "temp_max",
        "temp_min",
        "rain",
        "condition",
        "date",
        "circuit_name3",
        "off_name",
        "info",
        "night_race",
        # the reference's Info Race carries the RACE JSON's own
        # coordinates (Latitudine/Longitudine renamed lat/long,
        # motogp.ktr:6444-6448 -> :6533), NOT the fuzzy-matched circuit
        # dimension's — a race whose circuit match fails still has its
        # scraped coordinates
        F.col("lat_raw").alias("lat"),
        F.col("long_raw").alias("long"),
    )
    return races_out, race_info_out
