"""Readers for the 10 READABLE MotoGP pipeline sources (the 11th,
race_results_view.csv, is the reference repo's missing large blob —
its deterministic stand-in is synthesized in results.py).

Paths mirror the reference repo layout; schemas are the declared field
lists from SURVEY.md §1.3 (the ktr hand-declares every CSV/JSON field,
e.g. ``motogp.ktr:1405-1478``) — no inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lsdm_motogp_data_integration_spark import schemas
from lsdm_motogp_data_integration_spark.sources import read_csv, read_json_array

PATHS = {
    "bikes": "MotoGP_Results&Bikes/bikes.csv",
    "circuits": "MotoGP_Circuits/circuit_data.csv",
    "constructors_wc": "archive 1/constructure-world-championship.csv",
    "quali": "scraping/motogp_griglia.csv",
    "riders": "MotoGP_Results&Bikes/riders.csv",
    "riders_info": "archive 1/riders-info.csv",
    "riders_finishing_positions": "archive 1/riders-finishing-positions.csv",
    "teams": "MotoGP_Results&Bikes/teams.csv",
    "races_json": "scraping/motogp_gran_premi.json",
    "weather_json": "scraping/race_weather_data_final.json",
}

SCHEMAS = {
    "bikes": schemas.BIKES,
    "circuits": schemas.CIRCUITS,
    "constructors_wc": schemas.CONSTRUCTORS_WC,
    "quali": schemas.QUALI,
    "riders": schemas.RIDERS,
    "riders_info": schemas.RIDERS_INFO,
    "riders_finishing_positions": schemas.RIDERS_FINISHING_POSITIONS,
    "teams": schemas.TEAMS,
    "races_json": schemas.RACES_JSON,
    "weather_json": schemas.WEATHER_JSON,
}


def load(spark: SparkSession, name: str, base_dir: str) -> DataFrame:
    path = f"{base_dir}/{PATHS[name]}"
    if name.endswith("_json"):
        return read_json_array(spark, path, SCHEMAS[name])
    return read_csv(spark, path, SCHEMAS[name])


def load_all(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, name, base_dir) for name in PATHS}
