"""Regenerate QUERIES.md from the live query registry."""

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
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines))
    print(f"{len(registry.QUERIES)} queries written to QUERIES.md")


if __name__ == "__main__":
    main()
