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
        F.to_date("Data", "yyyy-MM-dd").alias("date"),
        F.lower(F.trim(F.col("Circuito"))).alias("circuit_name3"),
        F.col("Nome_Ufficiale").alias("off_name"),
        F.col("Percorso").alias("info"),
        F.col("Notturna").alias("night_race"),
        F.col("Latitudine").alias("lat_raw"),
        F.col("Longitudine").alias("long_raw"),
    )
    weather = weather_json.select(
        F.to_date("Data", "yyyy-MM-dd").alias("date"),
        F.col("Circuito").alias("weather_place"),
        F.col("Temp_Max").alias("temp_max"),
        F.col("Temp_Min").alias("temp_min"),
        F.col("Precipitazione").alias("rain"),
        F.col("Condizione_Meteo").alias("condition"),
    )
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
    keyed = add_surrogate_key(matched, "id_race", ["date", "circuit_name3"])

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
