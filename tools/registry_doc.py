"""Generate REGISTRY.md: every driver-window query, its suite scopes,
and its docstring headline. Usage: python tools/registry_doc.py > REGISTRY.md"""

import re
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

q = entry.queries()
o = entry.oracle_sql()
tags = getattr(entry, "_SUITE_TAG_COLS", {})

print(f"# REGISTRY — the {len(q)} driver-window queries\n")
print("Every entry is oracle-backed (DuckDB twin in `oracle_sql()`); "
      "suites pack several operators behind one tagged driver row. Scopes are enumerated from the "
      "oracle SQL.\n")
print("| # | query | tag col | scopes | headline |")
print("|---|---|---|---|---|")
for i, (name, fn) in enumerate(q.items(), 1):
    doc = (fn.__doc__ or "").strip().splitlines()
    head = doc[0].rstrip() if doc else ""
    head = head.replace("|", "\\|")
    tag = tags.get(name, "")
    scopes = ""
    if tag:
        sql = o[name]
        found = set(
            re.findall(
                r"SELECT\s+(?:DISTINCT\s+)?'([^']+)'\s+AS\s+" + tag, sql
            )
        )
        # UNION branches that lead with the bare literal (no AS — the
        # column name is inherited from the first branch); anchored to
        # UNION ALL so scalar literals inside subqueries don't match
        found |= set(
            re.findall(
                r"UNION ALL\s*(?:--[^\n]*\n\s*)*SELECT\s+'(\w+)'\s*,(?!\s*')",
                sql,
            )
        )
        scopes = ", ".join(
            sorted(x for x in found if not x.startswith("__"))
        )
    print(f"| {i} | `{name}` | {tag} | {scopes} | {head} |")
