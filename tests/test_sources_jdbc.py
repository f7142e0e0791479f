"""JDBC sink/source round trip.

The reference's PostgreSQL connection (motogp.ktr:481-535) maps to
write_jdbc/read_jdbc. No postgresql*.jar exists in this image (probed
round 2: find / -name 'postgresql*.jar' -> none), so the round trip
runs against Spark's bundled embedded Derby driver — the same
DataFrameWriter.jdbc code path, different dialect."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.sources import (
    read_jdbc,
    read_table,
    write_jdbc,
)

SF = "/root/testdata/sf0.001"


def test_jdbc_roundtrip_embedded_derby(spark):
    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='jdbc_rt_')}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    n = read_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(n, url, "nation_sink", mode="overwrite", properties=props)
    back = read_jdbc(spark, url, "nation_sink", properties=props)
    assert back.count() == n.count()
    assert (
        back.orderBy("n_nationkey").collect()
        == n.orderBy("n_nationkey").collect()
    )


def test_jdbc_missing_driver_raises_not_implemented(spark):
    n = read_table(spark, SF, "nation").limit(1)
    with pytest.raises(NotImplementedError):
        write_jdbc(
            n, "jdbc:postgresql://localhost/nope", "t",
            properties={},
        )
