"""Jaro / Jaro-Winkler string similarity.

The reference's FuzzyMatch steps use Jaro-Winkler nearest-neighbor
lookup (``algorithm=jarowinkler``, ``motogp.ktr:3042`` and ``:3132``,
case-insensitive, ``closervalue=Y`` = return single best match). Spark
has no built-in Jaro-Winkler (only ``levenshtein``), so this module
provides:

- a pure-Python reference implementation (standard Winkler variant:
  prefix scale p=0.1, max prefix 4, boost threshold 0.7 — the same
  definition DuckDB's ``jaro_winkler_similarity`` implements, which the
  oracle tests verify), and
- an Arrow-vectorized Pandas UDF for use inside DataFrame plans.

Per SURVEY.md §4.2 this is one of the two genuinely custom operators the
engine needs; the join pattern built on it lives in
``operators/fuzzy.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity in [0, 1]."""
    len1, len2 = len(s1), len(s2)
    # empty strings score 0 even against each other (DuckDB convention)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    s1_matched = [False] * len1
    s2_matched = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not s2_matched[j] and s2[j] == c1:
                s1_matched[i] = True
                s2_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars, in order, that differ pairwise
    transpositions = 0
    j = 0
    for i in range(len1):
        if s1_matched[i]:
            while not s2_matched[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler_similarity(
    s1: str,
    s2: str,
    *,
    prefix_scale: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> float:
    """Jaro-Winkler: Jaro boosted by shared prefix when above threshold."""
    jaro = jaro_similarity(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_scale * (1.0 - jaro)


def _bit(mask, k):
    """mask & (1 << (k-1)) as a long — k is a 1-based position Column.
    call_function keeps the shift a single JVM expression node (the
    pyspark ``shiftleft`` wrapper only takes Python-int shift counts,
    and a literal powers-of-two array would inline 63 literal nodes at
    every use, bloating the tree Catalyst has to canonicalize)."""
    return mask.bitwiseAND(
        F.call_function("shiftleft", F.lit(1).cast("long"), (k - 1).cast("int"))
    )


def jaro_winkler_col(left, right):
    """Jaro-Winkler as a pure JVM-side Column expression (no Python).

    The greedy match loop folds over the 1..len(left) character
    positions with constant-size state — two LONG bitmasks of matched
    positions — so the whole computation stays JVM-side: no Arrow
    transfer, no Python worker in the plan. Values match the
    pure-Python reference (and DuckDB's ``jaro_winkler_similarity``)
    exactly; property-tested against both.

    Scope: strings up to 63 characters (the bitmask width); longer
    inputs raise at evaluation time rather than scoring approximately —
    use ``jaro_winkler_udf`` (Arrow-batched) for long-string corpora.
    Higher-order functions are CodegenFallback (interpreted), costing
    ~ms per pair: right for dimension×dimension matches (≲10⁴ pairs)
    or Python-free runtimes; the pandas UDF is the bulk path.
    Inputs are lowered here (the reference's FuzzyMatch is
    case-insensitive); pre-normalize for other case semantics.
    """
    s1 = F.lower(left)
    s2 = F.lower(right)
    len1 = F.length(s1)
    len2 = F.length(s2)
    # match window: max(len1, len2) // 2 - 1, floored at 0
    w = F.greatest(
        (F.floor(F.greatest(len1, len2) / 2) - 1).cast("int"), F.lit(0)
    )

    def bounded_seq(lo, hi):
        # Spark's sequence(lo, hi) runs DESCENDING when lo > hi (Python's
        # range is empty there) — guard empty windows explicitly
        return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<int>")
        )

    # fold state = (m1, m2) LONG bitmasks of matched s1 / s2 positions.
    # The matched-j lookup is bound ONCE per step via a 1-element
    # transform (HOF lambdas have no let-binding; inlining the search in
    # both struct fields would double the interpreted work and the tree)
    state = F.aggregate(
        bounded_seq(F.lit(1), len1),
        F.struct(
            F.lit(0).cast("long").alias("m1"),
            F.lit(0).cast("long").alias("m2"),
        ),
        lambda acc, i: F.element_at(
            F.transform(
                F.array(
                    F.array_min(
                        F.filter(
                            bounded_seq(
                                F.greatest(F.lit(1), i - w),
                                F.least(len2, i + w),
                            ),
                            lambda j: (
                                s2.substr(j, F.lit(1))
                                == s1.substr(i, F.lit(1))
                            )
                            & (_bit(acc["m2"], j) == F.lit(0).cast("long")),
                        )
                    )
                ),
                lambda j: F.struct(
                    F.when(j.isNull(), acc["m1"])
                    .otherwise(
                        acc["m1"].bitwiseOR(
                            F.call_function(
                                "shiftleft",
                                F.lit(1).cast("long"),
                                (i - 1).cast("int"),
                            )
                        )
                    )
                    .alias("m1"),
                    F.when(j.isNull(), acc["m2"])
                    .otherwise(
                        acc["m2"].bitwiseOR(
                            F.call_function(
                                "shiftleft",
                                F.lit(1).cast("long"),
                                (j - 1).cast("int"),
                            )
                        )
                    )
                    .alias("m2"),
                ),
            ),
            F.lit(1),
        ),
    )

    def chars_at_set_bits(s, length, mask):
        # ascending-position order: for s1 that IS match order (the
        # greedy loop walks i ascending); for s2 it is the Jaro spec
        return F.transform(
            F.filter(
                bounded_seq(F.lit(1), length),
                lambda k: _bit(mask, k) != F.lit(0).cast("long"),
            ),
            lambda k: s.substr(k, F.lit(1)),
        )

    m1 = chars_at_set_bits(s1, len1, state["m1"])
    m2 = chars_at_set_bits(s2, len2, state["m2"])
    matches = F.size(m1).cast("double")
    # pairwise-different matched chars, halved (integer division)
    half_transpositions = F.floor(
        F.size(F.filter(F.zip_with(m1, m2, lambda x, y: x != y), lambda b: b))
        / 2
    ).cast("double")
    jaro_core = (
        matches / len1.cast("double")
        + matches / len2.cast("double")
        + (matches - half_transpositions) / matches
    ) / F.lit(3.0)
    jaro = (
        F.when((len1 == 0) | (len2 == 0), F.lit(0.0))
        .when(s1 == s2, F.lit(1.0))
        .when(
            F.greatest(len1, len2) > F.lit(63),
            F.raise_error(
                F.lit(
                    "jaro_winkler_col supports strings up to 63 chars "
                    "(bitmask state); use jaro_winkler_udf for longer"
                )
            ).cast("double"),
        )
        .when(F.size(m1) == 0, F.lit(0.0))
        .otherwise(jaro_core)
    )
    # Winkler prefix boost above the 0.7 threshold (prefix cap 4):
    # count of i in 1..4 with all chars up to i equal == prefix length
    prefix = F.size(
        F.filter(
            bounded_seq(F.lit(1), F.least(F.least(len1, len2), F.lit(4))),
            lambda i: F.aggregate(
                F.sequence(F.lit(1), i),
                F.lit(True),
                lambda acc, k: acc
                & (s1.substr(k, F.lit(1)) == s2.substr(k, F.lit(1))),
            ),
        )
    ).cast("double")
    # null-in -> null-out (matches the pandas UDF); without the guard a
    # null length falls through the CaseWhen chain and would score 0.0
    return (
        F.when(s1.isNull() | s2.isNull(), F.lit(None).cast("double"))
        .when(jaro > F.lit(0.7), jaro + prefix * F.lit(0.1) * (F.lit(1.0) - jaro))
        .otherwise(jaro)
    )


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) Jaro-Winkler over two string columns.

    Python-looped per element but batched per Arrow chunk — the hot path
    stays off the row-at-a-time pickling path. At cluster scale a
    C-backed implementation can be swapped in here without changing any
    caller (the UDF signature is the contract).
    """
    out = [
        None
        if a is None or b is None
        else jaro_winkler_similarity(a, b)
        for a, b in zip(left, right)
    ]
    return pd.Series(out, dtype="float64")
