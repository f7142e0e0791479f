"""Physical-plan inspection helpers.

The reference executes its DAG exactly as drawn (no optimizer —
SURVEY.md §4.1); this engine leans on Catalyst, and these helpers make
the *expected* physical properties assertable in tests: filters reaching
the parquet scan, projections pruning the read schema, dimension joins
going broadcast, whole-stage codegen covering the hot path. A plan
regression (e.g. a broadcast falling back to sort-merge-join at 100 TB)
then fails CI instead of surfacing as a cluster incident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The plan string of ``df.explain('formatted')``."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan node advertises PushedFilters containing every
    fragment (e.g. a column name that must reach the parquet reader)."""
    plan = formatted_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    joined = "\n".join(pushed)
    for fragment in fragments:
        assert fragment in joined, (
            f"filter on {fragment!r} not pushed to scan; pushed: {joined}"
        )


def assert_read_schema_pruned(
    df: DataFrame, table_fragment: str, max_columns: int
) -> None:
    """Assert the scan of the table whose path contains
    ``table_fragment`` reads at most ``max_columns`` columns (column
    pruning reached the reader)."""
    import re

    plan = formatted_plan(df)
    # formatted-mode detail sections start with "(<n>) <NodeName>"
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    for block in blocks:
        if table_fragment in block and "ReadSchema" in block:
            schema_line = next(
                line for line in block.splitlines() if "ReadSchema" in line
            )
            # column count = colons inside the struct<...> payload
            n_cols = schema_line.split("struct<", 1)[-1].count(":")
            assert n_cols <= max_columns, (
                f"scan of {table_fragment} reads {n_cols} columns "
                f"(max {max_columns}): {schema_line}"
            )
            return
    raise AssertionError(
        f"no scan with ReadSchema found for {table_fragment!r}:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    """Assert at least ``expected`` broadcast joins in the plan (small
    dims must not shuffle)."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expected, f"expected >= {expected} broadcast joins, got {n}:\n{plan}"


def assert_no_sort_merge_join(df: DataFrame) -> None:
    """Assert no sort-merge join — every join resolved broadcast/hash
    (the reference hand-sorted 20 SortRows for its merge joins; we
    require Catalyst to do better on dimension-sized sides)."""
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, f"SortMergeJoin present:\n{plan}"


def assert_partition_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan applies partition filters mentioning every
    fragment — i.e. partition pruning reached the reader and only
    matching directories are listed."""
    plan = formatted_plan(df)
    lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert lines, f"no PartitionFilters in plan:\n{plan}"
    joined = "\n".join(lines)
    for fragment in fragments:
        assert fragment in joined, (
            f"partition filter on {fragment!r} missing; got: {joined}"
        )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan.

    Counts only the detail headers (``(n) Exchange``) — a formatted
    plan lists every node twice (tree line + detail section), so a
    substring count is 2× the true number."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )
