#!/usr/bin/env python
"""Regenerate docs/QUERIES.md: one line per registry query, grouped by
module, with its docstring summary and oracle status."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entry
    from bench import HEADLINE

    qs = entry.queries()
    oracles = entry.oracle_sql()
    benched = set(HEADLINE)

    by_module: dict[str, list[tuple[str, str]]] = {}
    for name, fn in qs.items():
        doc = " ".join((fn.__doc__ or "").split())
        # ". " inside "et al. 2022" is not a sentence boundary — shield
        # citation dots before splitting, restore after
        shielded = doc.replace("et al. ", "et al.\x00")
        if ". " in shielded:
            shielded = shielded.split(". ")[0]
        doc = shielded.replace("\x00", " ").rstrip(".")
        mod = fn.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append((name, doc))

    lines = [
        "# Query index",
        "",
        f"{len(qs)} registry queries, {len(oracles)} with exact DuckDB oracles",
        "(the rest are rows-only checks).  Regenerate with",
        "`python scripts/gen_query_index.py`.",
        "",
    ]
    for mod in sorted(by_module):
        lines.append(f"## {mod}")
        lines.append("")
        for name, doc in sorted(by_module[mod]):
            mark = "" if name in oracles else " *(rows-only)*"
            if name in benched:
                mark += " *(bench)*"
            lines.append(f"- **{name}**{mark} — {doc}")
        lines.append("")

    out = os.path.join(REPO, "docs", "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(qs)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
