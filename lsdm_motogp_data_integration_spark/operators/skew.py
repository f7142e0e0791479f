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
    salt_src = [F.col(c) for c in on] + [
        F.coalesce(F.col(c).cast("string"), F.lit(""))
        for c in skewed.columns
        if c not in on
    ]
    left = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(factor)).cast("int")
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    out = left.join(right, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
