"""String / date / lookup scalar helpers.

Built-in-function compositions replacing the reference's Kettle scalar
steps (SURVEY.md §2.8): StringOperations trim/upper/lower
(``motogp.ktr:8265-8720``), ReplaceString trademark stripping
(``:4809-4886``), ConcatFields / FieldSplitter name plumbing
(``:1677-2003``, ``:8085-8205``), multi-format date parsing from the
ingestion scripts (``race_coord.py:50-79``, ``quali.py:21-37``), and the
weather-code → label dict map (``race_coord.py:29-48``).

Everything here is a Column expression (JVM-side, codegen'd) — no UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_name(col: Column | str) -> Column:
    """Canonical name key: trim, collapse inner whitespace, uppercase.

    Encapsulates the reference's brittle name-join pre-processing (upper
    + trim repeated before every name join, e.g. ``motogp.ktr:8265``,
    ``:8549``) so every join key is normalized the same way.
    """
    c = F.col(col) if isinstance(col, str) else col
    # include the common Unicode spaces (NBSP, figure/narrow NBSP) that
    # Java's ASCII-only \s misses — scraped names routinely carry
    # U+00A0 from HTML, and an unnormalized key silently fails the join
    # this helper exists to protect
    return F.upper(
        F.trim(F.regexp_replace(c, "[\\s\u00A0\u2007\u202F]+", " "))
    )


def name_from_comma(col: Column | str, sep: str = ",") -> Column:
    """``"Name, Surname" -> "Name Surname"`` (Split fields on ',' +
    Concat fields, ``motogp.ktr:8085-8144``). A separator-less input
    passes through unchanged — first and last element of a 1-element
    split are the same token, so the naive concat would double it
    ('Rossi' -> 'Rossi Rossi'); Kettle's splitter leaves field2 null
    and the concat yields the bare name."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a REGEX: escape the separator so '.' or '|' split
    # literally, and treat a trailing separator ('Rossi,') as
    # separator-less instead of emitting a trailing space
    parts = F.filter(F.split(c, _re.escape(sep)), lambda x: F.trim(x) != "")
    return F.when(
        F.size(parts) >= 2,
        F.concat_ws(
            " ", F.trim(parts.getItem(0)), F.trim(F.element_at(parts, -1))
        ),
    ).otherwise(F.trim(c))


def name_from_surname_first(col: Column | str) -> Column:
    """``"SURNAME Name" -> "Name SURNAME"`` (Split fields 3 + Concat
    fields 2 3, ``motogp.ktr:8205``, ``:1935``): move the first token to
    the end."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.split(F.trim(c), r"\s+")
    head = t.getItem(0)
    rest = F.array_join(F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))), " ")
    # NULL stays NULL (size(NULL) is NULL, so the when-chain would fall
    # through to concat_ws's ''-on-null otherwise) — a null name must
    # not become the '' join key and spuriously match other empties
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.size(t) <= 1, F.trim(c)).otherwise(
            F.concat_ws(" ", rest, head)
        )
    )


def strip_trademark(col: Column | str) -> Column:
    """Remove the literal ``™`` and its UTF-8-as-latin1 mojibake
    ``â„¢`` (ReplaceString steps, ``motogp.ktr:4809-4886``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(™|â„¢)", "")


def to_date_multi(col: Column | str, formats: Iterable[str]) -> Column:
    """First-successful multi-format date parse
    (``coalesce(to_date(c, f1), to_date(c, f2), ...)``), mirroring the
    ingestion scripts' strptime-attempt loops (``race_coord.py:67-77``).
    """
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(f)).cast("date") for f in formats]
    if not attempts:
        # coalesce() with zero args is an opaque WRONG_NUM_ARGS at plan
        # time with no mention of date formats
        raise ValueError("to_date_multi needs at least one format")
    return F.coalesce(*attempts)


def code_map_expr(mapping: Mapping, col: Column | str, default=None) -> Column:
    """Literal code → label lookup (the weather-code dict,
    ``race_coord.py:29-48``) as a ``create_map`` expression. For large
    maps, prefer a broadcast-joined dimension table instead."""
    c = F.col(col) if isinstance(col, str) else col
    kv = []
    for k, v in mapping.items():
        kv.append(F.lit(k))
        kv.append(F.lit(v))
    expr = F.create_map(*kv)[c]
    if default is not None:
        expr = F.coalesce(expr, F.lit(default))
    return expr


DMS_PATTERN = (
    "(\\d+)°(\\d+)[′'](\\d+)[″\"]([NS])\\s+"
    "(\\d+)°(\\d+)[′'](\\d+)[″\"]([EW])"
)


def dms_to_decimal(col: Column | str) -> Column:
    """DMS coordinate text → ``struct(lat, lon)`` decimal degrees.

    The ingestion-layer conversion from the reference's circuit scraper
    (``race_date_script.py:63-74``): extract 8 regex groups
    (deg/min/sec/hemisphere × lat/lon), compute
    ``deg + min/60 + sec/3600``, negate for S/W. Pure Column
    expression; unparseable text → null struct fields (the reference
    falls back to its previous value — callers coalesce)."""
    c = F.col(col) if isinstance(col, str) else col

    def grp(i: int) -> Column:
        return F.regexp_extract(c, DMS_PATTERN, i)

    def angle(deg: Column, mins: Column, secs: Column) -> Column:
        return (
            deg.cast("double")
            + mins.cast("double") / 60
            + secs.cast("double") / 3600
        )

    ok = c.rlike(DMS_PATTERN)
    lat = F.when(
        ok,
        F.when(grp(4) == "S", -angle(grp(1), grp(2), grp(3))).otherwise(
            angle(grp(1), grp(2), grp(3))
        ),
    )
    lon = F.when(
        ok,
        F.when(grp(8) == "W", -angle(grp(5), grp(6), grp(7))).otherwise(
            angle(grp(5), grp(6), grp(7))
        ),
    )
    return F.struct(lat.alias("lat"), lon.alias("lon"))
