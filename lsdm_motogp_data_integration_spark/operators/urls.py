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

from pyspark.sql import Column
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
