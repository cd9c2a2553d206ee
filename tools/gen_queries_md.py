"""Regenerate QUERIES.md from the live query registry.

Run from the repo root (`python tools/gen_queries_md.py`); pass --stdout
to print instead of writing (used by tests/test_registry_docs.py to diff
the checked-in file against the live registry).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcp_map_reduce_spark.plans import registry


def main() -> None:
    registry.load_catalog()
    lines = [
        "# Query index (auto-generated)",
        "",
        "Regenerate with: `python tools/gen_queries_md.py` (this file is the",
        "rendered registry — every entry is a `queries()` key the driver runs).",
        "",
        "`sql-oracle` = full DuckDB value-hash comparison at sf0.01;",
        "`rows-only` = genuinely non-SQL-expressible (sketches, iterative,",
        "binary transforms) — row-count check only, rationale in the docstring.",
        "",
        "| Query | Check | Module | Summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        tag = "sql-oracle" if name in registry.ORACLES else "rows-only"
        lines.append(f"| `{name}` | {tag} | {mod} | {doc} |")
    lines.append("")
    text = "\n".join(lines)
    if "--stdout" in sys.argv:
        sys.stdout.write(text)
        return
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text(text)
    print(f"{len(registry.QUERIES)} queries written to {out}")


if __name__ == "__main__":
    main()
