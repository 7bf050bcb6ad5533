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


def render_html(catalog: dict, query_catalog: dict | None = None) -> str:
    """Self-contained static HTML — the `dbt docs serve` artifact
    (/root/reference/README.md:63-71) without the server: one file,
    stdlib-only, browsable offline. Left nav lists sources + models +
    (optionally) the operator catalog; each model section carries its
    materialization, dependency edges, description, and the
    Catalyst-derived schema table with per-column docs."""
    from html import escape as e

    def anchor(name: str) -> str:
        return "m-" + "".join(c if c.isalnum() or c == "_" else "-" for c in name)

    nav = ['<nav><h2>Sources</h2><ul>']
    nav += [f"<li><code>{e(s)}</code></li>" for s in catalog["sources"]]
    nav.append("</ul><h2>Models</h2><ul>")
    nav += [
        f'<li><a href="#{anchor(n)}">{e(n)}</a></li>'
        for n in catalog["models"]
    ]
    nav.append("</ul>")
    if query_catalog:
        nav.append(f'<h2><a href="#operators">Operators ({len(query_catalog)})</a></h2>')
    nav.append("</nav>")

    body = ["<main><h1>Project catalog</h1>"]
    for name, node in catalog["models"].items():
        body.append(f'<section id="{anchor(name)}"><h2>{e(name)} '
                    f'<small>({e(node["materialized"])})</small></h2>')
        if node["depends_on"]:
            deps = ", ".join(
                f'<a href="#{anchor(d)}"><code>{e(d)}</code></a>'
                for d in node["depends_on"]
            )
            body.append(f"<p>depends on: {deps}</p>")
        if node["description"]:
            body.append(f"<p>{e(node['description'])}</p>")
        if "schema" in node:
            body.append(
                "<table><tr><th>column</th><th>type</th>"
                "<th>nullable</th><th>doc</th></tr>"
            )
            for f in node["schema"]:
                doc = node["columns"].get(f["name"], "")
                body.append(
                    f"<tr><td><code>{e(f['name'])}</code></td>"
                    f"<td>{e(f['type'])}</td><td>{f['nullable']}</td>"
                    f"<td>{e(doc)}</td></tr>"
                )
            body.append("</table>")
        body.append("</section>")
    if query_catalog:
        body.append('<section id="operators"><h2>Operator catalog</h2><ul>')
        for name, node in query_catalog.items():
            body.append(
                f"<li><code>{e(name)}</code> [{e(node['oracle'])}] — "
                f"{e(node['description'][:200])}</li>"
            )
        body.append("</ul></section>")
    body.append("</main>")

    style = (
        "<style>body{font-family:system-ui,sans-serif;display:flex;margin:0}"
        "nav{min-width:220px;max-width:280px;padding:1em;background:#f6f6f6;"
        "height:100vh;overflow-y:auto;position:sticky;top:0}"
        "nav ul{list-style:none;padding-left:0}"
        "main{padding:1em 2em;max-width:60em}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:.3em .6em;text-align:left}"
        "section{border-top:1px solid #eee;padding-top:.5em}</style>"
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>Project catalog</title>" + style + "</head><body>"
        + "".join(nav) + "".join(body) + "</body></html>"
    )


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
