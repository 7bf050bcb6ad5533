"""Docs catalog — the `dbt docs generate` analog (SURVEY §2.1 S7).

The reference renders Jinja `{% docs %}` blocks
(/root/reference/models/docs.md:1-14, models/overview.md:1-11) into a
browsable catalog. Here the registry itself is the metadata source:
model name, materialization, dependencies, description, column docs,
and — once built — the Catalyst-derived output schema.
"""

from __future__ import annotations

import json

from ..plans.registry import Project


def generate_catalog(project: Project, built: dict | None = None) -> dict:
    built = built or {}
    nodes = {}
    for name, spec in project.models.items():
        node = {
            "name": name,
            "materialized": spec.materialized,
            "depends_on": list(spec.deps),
            "description": spec.description,
            "columns": dict(spec.columns),
        }
        if spec.contract:
            node["contract"] = dict(spec.contract)
        if spec.materialized == "incremental" and spec.on_schema_change != "ignore":
            node["on_schema_change"] = spec.on_schema_change
        if name in built:
            node["schema"] = [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in built[name].schema.fields
            ]
        nodes[name] = node
    return {"sources": sorted(project.sources), "models": nodes}


def render_markdown(catalog: dict) -> str:
    lines = ["# Project catalog", "", "## Sources", ""]
    lines += [f"- `{s}`" for s in catalog["sources"]]
    lines += ["", "## Models", ""]
    for name, node in catalog["models"].items():
        lines.append(f"### {name} ({node['materialized']})")
        if node["depends_on"]:
            lines.append(f"*depends on: {', '.join(node['depends_on'])}*")
        if node["description"]:
            lines.append(node["description"])
        if "schema" in node:
            lines.append("")
            lines.append("| column | type | nullable | doc |")
            lines.append("|---|---|---|---|")
            for f in node["schema"]:
                doc = node["columns"].get(f["name"], "")
                lines.append(f"| {f['name']} | {f['type']} | {f['nullable']} | {doc} |")
        lines.append("")
    return "\n".join(lines)


def write_catalog(project: Project, built: dict | None, out_path: str) -> None:
    catalog = generate_catalog(project, built)
    with open(out_path, "w") as fh:
        json.dump(catalog, fh, indent=2, default=str)


def generate_query_catalog() -> dict:
    """Docs for the OPERATOR catalog (the engine's extension surface):
    every registered query with its description and whether it is
    value-hash-verified against the DuckDB oracle or rows-only."""
    from ..operators.catalog import load_catalog

    return {
        name: {
            "description": " ".join(spec.doc.split()),
            "oracle": "value-hash" if spec.oracle else "rows-only",
        }
        for name, spec in load_catalog().items()
    }
