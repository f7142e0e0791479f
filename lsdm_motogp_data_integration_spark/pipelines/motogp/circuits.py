"""Circuit dimension.

Reference branch (SURVEY.md §3.1): ``Circuit`` → ``Edit Name`` (rename/
cast 12 cols) → ``Trim`` (trim+lower circuit name; trim country/
pole_position/width, ``motogp.ktr:8549``) → ``ADD id`` (circuit_id
sequence, ``:1203``) → ``Select values 7 2`` → ``Sort rows 16``
(country) → **Circuit Table** (``motogp.ktr:1653``).

Output: circuits(circuit_id, name_circuit, lat, long, country,
pole_position, length, width, constructed, modifies) — ``modifies`` is
the reference's own column name (``motogp.ktr:6884``), kept for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.keys import add_surrogate_key


def build_circuits(circuits_raw: DataFrame) -> DataFrame:
    renamed = circuits_raw.select(
        F.lower(F.trim(F.col("Name"))).alias("name_circuit"),
        F.col("Lat").alias("lat"),
        F.col("Long").alias("long"),
        F.trim(F.col("Country")).alias("country"),
        F.trim(F.col("Pole Position")).alias("pole_position"),
        F.col("Length in meters").alias("length"),
        F.trim(F.col("Width in meters")).alias("width"),
        F.col("Constructed").alias("constructed"),
        F.col("Modified").alias("modifies"),
    )
    # sequence over the file order is not reproducible in a distributed
    # read; key over the (unique) circuit name instead — dense 1..N
    # (dimension-sized: the global window is the right trade, keys.py)
    return add_surrogate_key(renamed, "circuit_id", ["name_circuit"])
