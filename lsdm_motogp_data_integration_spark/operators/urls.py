"""URL canonicalization for crawl/web-corpus ingestion.

Before any content-level dedup, web pipelines collapse URL-level
duplicates: the same page reached as ``http://WWW.Ex.com:80/a/``,
``http://ex.com/a?utm_source=feed`` and ``http://ex.com/a#top`` must
map to ONE canonical key, or every downstream stage (fetch dedup,
per-domain quotas, outlink graphs) multiplies work. All pure Column
expressions — regexp + array higher-order functions, JVM-side, zero
shuffles — and restricted to the Java/RE2-shared regex subset so the
q18 oracle replays normalization verbatim in DuckDB.

No reference equivalent (the reference ingests curated CSVs);
training-data-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The absolute-URL scheme grammar — PUBLIC because consumers (e.g.
#: pipelines/webgraph's absolute-link filter) must use the SAME
#: grammar as normalize_url's pass-through contract.
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(
    col: Column | str,
    *,
    strip_www: bool = True,
    strip_param_prefix: str = "utm_",
) -> Column:
    """Canonical form of an absolute URL:

    - scheme and host lowercased (path/query case is preserved —
      paths are case-sensitive on most origins),
    - fragment dropped,
    - default port stripped (``:80`` for http, ``:443`` for https),
    - leading ``www.`` stripped (``strip_www=False`` to keep),
    - single trailing ``/`` on the path dropped (so ``/a/`` ≡ ``/a``
      and ``host/`` ≡ ``host``),
    - query parameters with the tracking prefix (default ``utm_``)
      removed, the survivors SORTED and re-joined (param order never
      distinguishes pages), an emptied query dropped entirely.

    Strings without a ``scheme://`` prefix are returned trimmed but
    otherwise untouched (relative URLs have no canonical absolute
    form without a base)."""
    t = F.trim(_c(col))
    has_scheme = t.rlike(SCHEME_RE)
    nofrag = F.regexp_replace(t, r"#.*$", "")
    base = F.regexp_extract(nofrag, r"^([^?]*)", 1)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & (~x.startswith(strip_param_prefix)),
    )
    q2 = F.array_join(F.array_sort(kept), "&")
    scheme = F.lower(F.regexp_extract(base, SCHEME_RE, 1))
    rest = F.regexp_replace(base, SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^/]*)", 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_replace(rest, r"^[^/]*", ""), "/$", "")
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when(has_scheme, out).otherwise(t)


def url_host(col: Column | str) -> Column:
    """Lowercased host (with port if present) of an absolute URL;
    empty string when there is no ``scheme://``."""
    rest = F.regexp_replace(F.trim(_c(col)), SCHEME_RE, "")
    return F.when(
        F.trim(_c(col)).rlike(SCHEME_RE),
        F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)),
    ).otherwise(F.lit(""))


def url_domain(col: Column | str) -> Column:
    """Naive registrable domain: the last two dot-labels of the host
    (no public-suffix list in this environment — documented
    approximation; ``co.uk``-style suffixes collapse a level)."""
    host = F.regexp_replace(url_host(col), r":\d+$", "")
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def host_suffixes_of_host(col: Column | str) -> Column:
    """All dot-suffixes of a bare host (port stripped) down to the
    registrable pair: ``a.b.c.com`` → ``[a.b.c.com, b.c.com, c.com]``.
    O(#labels) per row — the device that turns "is this host under any
    blocked zone" into an EQUI-join key instead of an endswith scan."""
    host = F.regexp_replace(F.lower(_c(col)), r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # suffix i = join of labels[i..n]; generate for i = 1..n-1 (skip
    # the bare TLD — blocking '.com' outright is never the intent)
    return F.when(host == "", F.array().cast("array<string>")).otherwise(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.array_join(F.slice(labels, i, n), "."),
            ),
            lambda s: s.contains("."),
        )
    )


def host_suffixes(col: Column | str) -> Column:
    """:func:`host_suffixes_of_host` applied to a full URL's host."""
    return host_suffixes_of_host(url_host(_c(col)))


def filter_blocked_urls(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    *,
    pattern_col: str = "pattern",
    keep_blocked: bool = False,
) -> DataFrame:
    """Crawl-corpus URL screen (the RefinedWeb/C4-style blocklist
    stage): drop every row whose URL's host equals a blocked zone or
    sits under it (``spam.example.com`` matches pattern
    ``example.com``). ``keep_blocked=True`` inverts (audit mode).

    Scale shape — the verdict is a function of the HOST, so the match
    runs once per distinct host, never per row:

    1. distinct corpus hosts (narrow strings) explode their
       O(#labels) dot-suffixes and equi-join the BROADCAST blocklist
       (blocklists are dimension-sized — UT1 is ~4M rows, still
       broadcastable) — "host under any blocked zone" as an equi-join,
       no substring scan, no nested loop;
    2. the surviving BLOCKED-host relation (≤ distinct matched hosts,
       narrow) broadcasts back for the per-row left-anti/semi probe —
       the full-width document rows never shuffle."""
    host = url_host(F.col(url_col))
    hosts = df.select(host.alias("__host")).where(F.col("__host") != "").distinct()
    pat = F.broadcast(
        blocklist.select(F.col(pattern_col).alias("__sfx")).distinct()
    )
    blocked_hosts = (
        hosts.withColumn("__sfx", F.explode(host_suffixes_of_host("__host")))
        .join(pat, "__sfx", "left_semi")
        .select("__host")
        .distinct()
    )
    probe = df.withColumn("__host", host)
    how = "left_semi" if keep_blocked else "left_anti"
    return probe.join(F.broadcast(blocked_hosts), "__host", how).drop(
        "__host"
    )


def blocked_word_score(col: Column | str, words: tuple[str, ...]) -> Column:
    """Number of blocklisted words occurring in the lowercased URL —
    the soft scoring companion to the hard zone blocklist (RefinedWeb
    scores URLs by blocked-word content where the domain list is
    silent). Pure Column fold over a literal word set; O(#words) per
    row, no shuffle."""
    low = F.lower(_c(col))
    out: Column = F.lit(0)
    for w in words:
        out = out + F.when(low.contains(w.lower()), 1).otherwise(0)
    return out.cast("int")
