"""Skew mitigation for joins on hot keys.

Spark's hash aggregation already combines map-side, so *aggregations*
rarely need manual salting; the pathological case is an equi-JOIN where
a handful of keys dominate — every row of a hot key lands on one task.
AQE's skew-join split (enabled in ``session.get_spark``) handles most of
it at runtime; :func:`salted_join` is the explicit fallback for engines/
modes where AQE can't kick in (e.g. streaming joins) or when the skew is
known up front.

Mechanics: the skewed (big) side gets a deterministic salt in
``[0, factor)`` hashed from its row; the small side is replicated
``factor`` times with every salt value; the join key becomes
(key, salt). Results are identical to the unsalted join — verified in
tests — while the hot key's rows spread over ``factor`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on columns ``on`` with the skewed
    side salted across ``factor`` sub-keys. ``small`` is replicated
    ``factor``× (keep it broadcast-sized × factor)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    if int(factor) < 1:
        # pmod(x, 0) is REMAINDER_BY_ZERO under ANSI (or a silent NULL
        # salt = empty join without it) — fail at call time instead
        raise ValueError(f"factor must be >= 1, got {factor}")
    if "__salt" in skewed.columns or "__salt" in small.columns:
        raise ValueError(
            "__salt collides with an existing column; rename it first"
        )
    # salt from the ROW POSITION, not row content: a hot key whose rows
    # are byte-identical (or share one low-cardinality payload) would
    # hash every row to the SAME content salt and stay on one task —
    # the exact pathology this function exists to fix. The join result
    # is salt-value independent (each row meets every key under its own
    # salt replica), so the id's nondeterminism under retries is fine.
    left = skewed.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(factor)).cast("int"),
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    out = left.join(right, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
