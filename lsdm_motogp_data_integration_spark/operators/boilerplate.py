"""Corpus-level boilerplate line removal (CCNet / RefinedWeb style).

The reference pipeline (``motogp.ktr``) has no corpus-level text-hygiene
step; this operator belongs to the engine's training-data-curation
extension. It follows the public CCNet idea (Wenzek et al., 2020):
a line occurring in ``>= min_docs`` *distinct* documents is template
boilerplate (headers, nav bars, license banners) and is dropped from
every document it appears in, preserving the order of surviving lines.

Scale shape (100 TB):

- one wide aggregation keyed on the line text to find the frequent set
  (the only shuffle that moves line text);
- the frequent set is, by definition, small — only lines repeated
  across ``min_docs``+ documents — so the anti-join broadcasts it
  (``broadcast_frequent=False`` opts into a shuffle anti-join for
  adversarial corpora where the boilerplate set is huge);
- one ``groupBy(id)`` to reassemble documents.

No all-pairs work, no driver-side iteration, no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 3,
    broadcast_frequent: bool = True,
    persist_lines: bool = False,
) -> DataFrame:
    """Drop every line appearing in ``>= min_docs`` distinct documents.

    ``sep`` is a literal separator (regex-escaped internally). Returns
    one row per input document with the cleaned ``text_col`` (empty
    string when every line was boilerplate), ``n_lines_kept`` and
    ``n_lines_removed``.

    The exploded line relation feeds three consumers (frequency agg,
    anti-join probe, per-doc totals); ``persist_lines=True`` evaluates
    the input — and any expensive upstream — exactly once (the
    persist_sets/persist_sketch convention of the dedup operators).
    """
    split_expr = F.split(F.col(text_col), re.escape(sep))
    lines = df.select(
        F.col(id_col),
        F.posexplode(split_expr).alias("pos", "line"),
    )
    if persist_lines:
        lines = lines.persist()
    # split() always yields >= 1 element, so every input doc appears in
    # `lines` and per-doc totals can come from it — no second pass over
    # the (possibly expensive) input plan
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_total")
    )
    frequent = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_docs))
        .select("line")
    )
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    kept = lines.join(frequent, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("__cleaned"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__cleaned"), F.lit("")).alias(text_col),
            F.coalesce(F.col("__n_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_lines_kept"),
            (
                F.col("__n_total")
                - F.coalesce(F.col("__n_kept"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_lines_removed"),
        )
    )


def dedup_lines_keep_first(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_line_chars: int = 1,
    persist_lines: bool = False,
) -> DataFrame:
    """Corpus-wide exact line dedup, keep-first (the RefinedWeb /
    MassiveText line-level rule): every repeated line survives ONLY at
    its globally first occurrence — smallest ``(id_col, position)`` —
    and is dropped everywhere else, preserving the order of surviving
    lines. Complements :func:`remove_boilerplate_lines` (which drops
    frequent lines from EVERY document, first occurrence included) and
    ``textops.cross_doc_span_dedup`` (same keep-first rule at word
    k-gram granularity).

    Lines shorter than ``min_line_chars`` (after trim) are exempt —
    one-word lines ("yes", list bullets) repeat naturally and mass-
    deleting them is noise, not dedup; ``0`` disables the exemption.

    Scale shape: one aggregation keyed by line text (min-struct keeper
    — map-side combinable), one shuffle join back on the line, one
    per-document reassembly. Linear in corpus size; same heavy-hitter
    caveat as the k-gram variant (a line shared by half the corpus
    skews its key — that is boilerplate, remove it first).

    ``persist_lines=True`` evaluates the input exactly once (the
    persist_sets convention). Returns (id_col, text_col cleaned,
    n_lines_kept, n_lines_removed)."""
    split_expr = F.split(F.col(text_col), re.escape(sep))
    lines = df.select(
        F.col(id_col),
        F.posexplode(split_expr).alias("pos", "line"),
    )
    if persist_lines:
        lines = lines.persist()
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_total")
    )
    eligible = F.length(F.trim(F.col("line"))) >= int(min_line_chars)
    keepers = (
        lines.filter(eligible)
        .groupBy("line")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__keep"),
            F.count(F.lit(1)).alias("__occ"),
        )
        .filter(F.col("__occ") >= 2)
        .select(
            "line",
            F.col(f"__keep.{id_col}").alias("__kdoc"),
            F.col("__keep.pos").alias("__kpos"),
        )
    )
    kept = (
        lines.join(keepers, "line", "left")
        .filter(
            F.col("__kdoc").isNull()
            | (
                (F.col(id_col) == F.col("__kdoc"))
                & (F.col("pos") == F.col("__kpos"))
            )
        )
        .select(id_col, "pos", "line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("__cleaned"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__cleaned"), F.lit("")).alias(text_col),
            F.coalesce(F.col("__n_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_lines_kept"),
            (
                F.col("__n_total")
                - F.coalesce(F.col("__n_kept"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_lines_removed"),
        )
    )


def dup_line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style intra-document duplicate-line signals (Rae et al.
    2021, Table A1 repetition rules): per document,

    - ``n_lines``: non-empty lines;
    - ``dup_line_frac``: occurrences beyond the first of any repeated
      line, over all lines (the "fraction of duplicate lines" rule —
      Gopher drops docs above 0.30);
    - ``dup_char_frac``: the same fraction weighted by line length
      (the "fraction of characters in duplicate lines" rule, 0.20).

    Both 6dp-rounded; documents with no non-empty lines report
    (0, 0.0, 0.0).

    Scale shape: one explode + ONE doc-and-line-keyed aggregate +
    one doc-keyed rollup — all shuffle keys carry the doc id, so
    work never leaves the document (contrast
    :func:`remove_boilerplate_lines`, whose frequency table is
    corpus-global). Exact integer counts until the final division."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    ).filter(F.trim(F.col("__line")) != "")
    per_line = lines.groupBy(id_col, "__line").agg(
        F.count(F.lit(1)).alias("__c"),
        F.length(F.col("__line")).alias("__len"),
    )
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("__c").cast("bigint").alias("n_lines"),
        F.sum(F.col("__c") - 1).cast("bigint").alias("__dup"),
        F.sum(F.col("__c") * F.col("__len")).cast("bigint").alias("__chars"),
        F.sum((F.col("__c") - 1) * F.col("__len"))
        .cast("bigint")
        .alias("__dupchars"),
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.round(
            F.coalesce(F.col("__dup") / F.col("n_lines"), F.lit(0.0)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(
                F.col("__dupchars") / F.col("__chars"), F.lit(0.0)
            ),
            6,
        ).alias("dup_char_frac"),
    )
