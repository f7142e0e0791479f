"""Declared schemas — the fixed contract of the engine.

Two families:

1. The reference's 11 pipeline inputs (SURVEY.md §1.3; field lists are
   hand-declared in the ktr, e.g. ``motogp.ktr:1405-1478`` for bikes).
   Schema-on-read with *declared* types, never inference — mirroring the
   reference's statically declared row metadata.
2. The driver's synthetic TPC-H-ish testdata tables (TESTDATA.md), used
   by the oracle-checked query suite.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MotoGP source schemas (reference cites in comments)
# ---------------------------------------------------------------------------

# MotoGP_Results&Bikes/bikes.csv — motogp.ktr:1405-1478
BIKES = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

# MotoGP_Circuits/circuit_data.csv — motogp.ktr:1479-1652
CIRCUITS = T.StructType(
    [
        T.StructField("Name", T.StringType()),
        T.StructField("Lat", T.DecimalType(9, 5)),
        T.StructField("Long", T.DecimalType(9, 5)),
        T.StructField("Country", T.StringType()),
        T.StructField("Pole Position", T.StringType()),
        T.StructField("Length in meters", T.LongType()),
        T.StructField("Width in meters", T.StringType()),
        T.StructField("Right Corners", T.LongType()),
        T.StructField("Left Corners", T.LongType()),
        T.StructField("Longest Straight", T.LongType()),
        T.StructField("Constructed", T.LongType()),
        T.StructField("Modified", T.LongType()),
    ]
)

# archive 1/constructure-world-championship.csv — motogp.ktr:2021-2095
CONSTRUCTORS_WC = T.StructType(
    [
        T.StructField("Season", T.LongType()),
        T.StructField("Constructor", T.StringType()),
        T.StructField("Class", T.StringType()),  # carries literal '™'
    ]
)

# scraping/motogp_griglia.csv — motogp.ktr:4173-4280
QUALI = T.StructType(
    [
        T.StructField("Year", T.LongType()),
        T.StructField("Circuit", T.StringType()),
        T.StructField("OfficialName", T.StringType()),
        T.StructField("Class", T.StringType()),
        T.StructField("RiderName", T.StringType()),
        T.StructField("Position", T.LongType()),
    ]
)

# MotoGP_Results&Bikes/race_results_view.csv (missing blob) — motogp.ktr:4442-4648
RACE_RESULTS = T.StructType(
    [
        T.StructField("year", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("shortname", T.StringType()),
        T.StructField("circuit_name", T.StringType()),
        T.StructField("rider", T.LongType()),
        T.StructField("rider_name", T.StringType()),
        T.StructField("team_name", T.StringType()),
        T.StructField("bike_name", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("points", T.DoubleType()),
        T.StructField("number", T.DecimalType(5, 1)),
        T.StructField("country", T.StringType()),
        T.StructField("speed", T.DecimalType(6, 1)),
        T.StructField("time", T.StringType()),
    ]
)

# MotoGP_Results&Bikes/riders.csv — motogp.ktr:4912-5007
RIDERS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("number", T.DecimalType(5, 1)),
    ]
)

# archive 1/riders-info.csv — motogp.ktr:5008-5125
RIDERS_INFO = T.StructType(
    [
        T.StructField("Riders All Time in All Classes", T.StringType()),
        T.StructField("Victories", T.LongType()),
        T.StructField("2nd places", T.DecimalType(6, 2)),
        T.StructField("3rd places", T.DecimalType(6, 2)),
        T.StructField("Pole positions from '74 to 2022", T.DecimalType(6, 2)),
        T.StructField("Race fastest lap to 2022", T.DecimalType(6, 2)),
        T.StructField("World Championships", T.DecimalType(6, 2)),
    ]
)

# archive 1/riders-finishing-positions.csv — motogp.ktr:5126-5254
RIDERS_FINISHING_POSITIONS = T.StructType(
    [
        T.StructField("Rider", T.StringType()),
        T.StructField("Victories", T.LongType()),
        T.StructField("NumberofSecond", T.LongType()),
        T.StructField("NumberofThird", T.LongType()),
        T.StructField("Numberof4th", T.LongType()),
        T.StructField("Numberof5th", T.LongType()),
        T.StructField("Numberof6th", T.LongType()),
        T.StructField("Country", T.StringType()),
    ]
)

# MotoGP_Results&Bikes/teams.csv — motogp.ktr:8450-8524
TEAMS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

# scraping/motogp_gran_premi.json — motogp.ktr:4281-4441 (flat array of objects)
RACES_JSON = T.StructType(
    [
        T.StructField("Anno", T.LongType()),
        T.StructField("Data", T.StringType()),
        T.StructField("Circuito", T.StringType()),
        T.StructField("Nome_Ufficiale", T.StringType()),
        T.StructField("Percorso", T.StringType()),
        T.StructField("Notturna", T.StringType()),
        T.StructField("Latitudine", T.StringType()),
        T.StructField("Longitudine", T.StringType()),
    ]
)

# scraping/race_weather_data_final.json — motogp.ktr:4673-4808
WEATHER_JSON = T.StructType(
    [
        T.StructField("Circuito", T.StringType()),
        T.StructField("Data", T.StringType()),
        T.StructField("Temp_Max", T.DoubleType()),
        T.StructField("Temp_Min", T.DoubleType()),
        T.StructField("Precipitazione", T.DoubleType()),
        T.StructField("Condizione_Meteo", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — names only; parquet carries its own schema.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
