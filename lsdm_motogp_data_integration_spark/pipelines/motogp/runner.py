"""Build the eight integrated MotoGP tables (the whole ``motogp.ktr``
DAG as one Spark program; one write action per sink).

Laziness caveat: the DAG is *mostly* lazy — the fuzzy-match steps pin
their probe ids with an eager checkpoint (operators/fuzzy.py: the
left-join-back references the probe twice), and the synthetic-fact and
fuzzy auto-blocker paths run small count jobs — so ``build_all``
executes a handful of bounded jobs before any sink is written; the
heavy fact-table work still runs once per sink write.

Usage::

    from lsdm_motogp_data_integration_spark.pipelines.motogp import runner
    tables = runner.build_all(spark, base_dir="/root/reference")
    runner.write_all(tables, out_dir="/tmp/motogp_out")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lsdm_motogp_data_integration_spark.pipelines.motogp import inputs
from lsdm_motogp_data_integration_spark.pipelines.motogp.circuits import (
    build_circuits,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.participation import (
    build_participation,
    build_rider_position_counts,
    build_rider_table,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.races_weather import (
    build_races_and_info,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.results import (
    build_results_enriched,
    synthesize_race_results,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.riders import (
    build_riders_enriched,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.standings import (
    build_team_standings,
)
from lsdm_motogp_data_integration_spark.pipelines.motogp.teams import build_teams
from lsdm_motogp_data_integration_spark.sources import write_table


def build_all(
    spark: SparkSession,
    base_dir: str = "/root/reference",
    race_results: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Assemble every output table lazily. ``race_results`` defaults to
    the deterministic synthetic stand-in for the missing blob."""
    src = inputs.load_all(spark, base_dir)

    circuits = build_circuits(src["circuits"])
    teams = build_teams(src["teams"])
    races, race_info = build_races_and_info(
        src["races_json"], src["weather_json"], circuits
    )
    riders_enriched = build_riders_enriched(
        src["riders"], src["riders_info"], src["riders_finishing_positions"]
    )
    if race_results is None:
        race_results = synthesize_race_results(
            src["quali"], src["riders"], src["teams"], src["bikes"]
        )
    results_enriched = build_results_enriched(
        race_results, src["bikes"], teams
    )
    position_counts = build_rider_position_counts(results_enriched)
    rider_table = build_rider_table(riders_enriched, position_counts)
    participation = build_participation(
        results_enriched, src["quali"], riders_enriched, races
    )
    team_standings = build_team_standings(
        src["constructors_wc"], results_enriched
    )
    return {
        "circuits": circuits,
        "teams": teams,
        "races": races,
        "race_info": race_info,
        "riders_enriched": riders_enriched,
        "rider_table": rider_table,
        "participation": participation,
        "team_standings": team_standings,
    }


# partition layout for the fact-sized sinks: year-partitioned scans
# prune to the requested seasons (at 100 TB the facts are the tables
# that matter; dims stay single-directory)
PARTITIONING: dict[str, list[str]] = {
    "participation": ["year"],
    "team_standings": ["year"],
}


def write_all(tables: dict[str, DataFrame], out_dir: str) -> None:
    for name, df in tables.items():
        write_table(
            df, f"{out_dir}/{name}", partition_by=PARTITIONING.get(name)
        )


def register_views(
    spark: SparkSession,
    tables: dict[str, DataFrame] | None = None,
    base_dir: str = "/root/reference",
) -> dict[str, DataFrame]:
    """Expose the integrated data model as temp views so users can
    query it with plain ``spark.sql`` — the ad-hoc surface the
    reference only had by loading Dummy-sink previews into its
    PostgreSQL ``MotoGP`` database (``motogp.ktr:481-535``). Builds the
    tables lazily when not supplied; each view carries the sink name
    from SINKS (§1.4 of SURVEY.md)."""
    if tables is None:
        tables = build_all(spark, base_dir=base_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
