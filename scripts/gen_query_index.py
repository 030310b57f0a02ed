"""Regenerate QUERIES.md — the flat index of every driver query:
name, one-line description (from the query callable's docstring),
and whether it carries a DuckDB hash oracle or is rows-only (with
the declared reason living in the docstring).

Run after adding queries: python scripts/gen_query_index.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    lines = [
        "# Driver query index",
        "",
        f"{len(qs)} queries, {len(oracles)} with DuckDB hash oracles "
        "(rows-only entries declare why SQL cannot express them in "
        "their docstrings). Regenerate with "
        "`python scripts/gen_query_index.py`.",
        "",
        "| query | oracle | summary |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        doc = (qs[name].__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        mark = "hash" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first} |")
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
