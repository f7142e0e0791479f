"""Command-line entry point.

    python -m lsdm_motogp_data_integration_spark.cli run-all \
        [--base-dir /root/reference] [--out-dir /tmp/motogp_out]
    python -m lsdm_motogp_data_integration_spark.cli run-table circuits ...
    python -m lsdm_motogp_data_integration_spark.cli list-tables
    python -m lsdm_motogp_data_integration_spark.cli sql \
        "SELECT year, team_name FROM team_standings WHERE final_position = 1"
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="motogp-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_common(p: argparse.ArgumentParser) -> None:
        p.add_argument("--base-dir", default="/root/reference")
        p.add_argument("--out-dir", default="/tmp/motogp_out")

    add_common(sub.add_parser("run-all", help="build + write all 8 tables"))
    p_one = sub.add_parser("run-table", help="build + write one table")
    p_one.add_argument("table")
    add_common(p_one)
    sub.add_parser("list-tables", help="list output table names")
    p_sql = sub.add_parser(
        "sql", help="run a SQL query against the integrated model views"
    )
    p_sql.add_argument("query")
    p_sql.add_argument("--base-dir", default="/root/reference")
    p_sql.add_argument("--limit", type=int, default=50)

    args = parser.parse_args(argv)

    from lsdm_motogp_data_integration_spark.pipelines.motogp import runner

    if args.cmd == "list-tables":
        for name in runner.SINKS:
            print(name)
        return 0

    from lsdm_motogp_data_integration_spark.session import get_spark
    from lsdm_motogp_data_integration_spark.sources import write_table

    spark = get_spark("motogp_cli")
    t0 = time.time()
    if args.cmd == "sql":
        runner.register_views(spark, base_dir=args.base_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0
    tables = runner.build_all(spark, base_dir=args.base_dir)
    if args.cmd == "run-all":
        runner.write_all(tables, args.out_dir)
        written = list(tables)
    else:
        if args.table not in tables:
            print(
                f"unknown table {args.table!r}; one of {sorted(tables)}",
                file=sys.stderr,
            )
            return 2
        write_table(tables[args.table], f"{args.out_dir}/{args.table}")
        written = [args.table]
    print(
        f"wrote {len(written)} table(s) to {args.out_dir} "
        f"in {time.time() - t0:.1f}s: {', '.join(written)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
