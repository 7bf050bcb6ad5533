"""dbt-style YAML project loader — the reference's authoring surface.

The reference ships its pipeline as SQL files plus YAML schema files
(/root/reference/models/schema.yml, models/staging/schema.yml,
dbt_project.yml): models carry per-column docs and declarative tests
(`unique`, `not_null`, `accepted_values: {values: [...]}`,
`relationships: {to: ref('x'), field: y}`). This module accepts that
YAML dialect so a reference user can port a project by:

1. pasting each model's compiled SQL under a `sql:` key (dbt keeps SQL
   in sibling .sql files; we inline it — no Jinja, `{{ ref('x') }}`
   becomes the bare relation name plus a `deps:` entry, exactly the
   `Project.sql_model` contract), or omitting `sql:` to attach tests
   and docs to a model already registered in Python;
2. keeping `columns:`/`tests:` blocks AS THEY ARE — including dbt's
   `ref('customers')` strings in relationships targets.

Execution stays Spark-native: models register into the same
`plans.registry.Project` (view/table/incremental/snapshot
materializations, contracts, topological `run()`), and every test
compiles to the scale-shaped violation frames in `testing/checks.py`
(hash aggregate / scan filter / broadcast anti-join — never a
driver-side loop), so a 100 TB table's `unique` test is one keys-only
aggregate, not a collect.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from dataclasses import dataclass, field

import yaml
from pyspark.sql import DataFrame, SparkSession

from ..testing import checks
from .registry import Project

_REF_RE = re.compile(r"^\s*ref\(\s*['\"]([^'\"]+)['\"]\s*\)\s*$")

#: test kinds accepted in ``tests:`` blocks -> checks.py implementations
KNOWN_TESTS = (
    "unique",
    "not_null",
    "accepted_values",
    "relationships",
    "accepted_range",
    "unique_combination",
    "expression_is_true",
)


def parse_ref(target: str) -> str:
    """``ref('customers')`` -> ``customers``; bare names pass through."""
    m = _REF_RE.match(target)
    return m.group(1) if m else target


@dataclass(frozen=True)
class SchemaTest:
    model: str
    column: str | None  # None for model-level tests
    kind: str
    params: Mapping = field(default_factory=dict)

    @property
    def name(self) -> str:
        col = f"_{self.column}" if self.column else ""
        return f"{self.kind}_{self.model}{col}"


def _parse_tests(raw, model: str, column: str | None) -> list[SchemaTest]:
    out: list[SchemaTest] = []
    for t in raw or ():
        if isinstance(t, str):
            kind, params = t, {}
        elif isinstance(t, Mapping) and len(t) == 1:
            kind, params = next(iter(t.items()))
            params = dict(params or {})
        else:
            raise ValueError(
                f"{model}: malformed test entry {t!r} (string or "
                "single-key mapping expected)"
            )
        if kind not in KNOWN_TESTS:
            # an unknown kind must fail at LOAD time — dbt compiles the
            # test away silently only when a macro exists; here a typo
            # ('uniqe') would otherwise mean a test that never runs
            raise ValueError(
                f"{model}: unknown test kind {kind!r} "
                f"(supported: {', '.join(KNOWN_TESTS)})"
            )
        out.append(SchemaTest(model=model, column=column, kind=kind, params=params))
    return out


def load_project_yaml(
    text: str,
    *,
    project: Project | None = None,
    sources: Mapping[str, DataFrame] | None = None,
    warehouse_dir: str | None = None,
) -> tuple[Project, list[SchemaTest]]:
    """Parse a dbt-style YAML document into a (Project, tests) pair.

    ``models:`` entries with a ``sql:`` key register through
    ``Project.sql_model`` (deps resolved by name via temp views —
    registry.py:149); entries without one must already exist in the
    passed ``project`` (the schema.yml-overlay case) and only attach
    docs and tests. ``sources:`` names are looked up in the ``sources``
    mapping — the loader never reads data itself.
    """
    doc = yaml.safe_load(text) or {}
    project = project if project is not None else Project(warehouse_dir=warehouse_dir)
    for src in doc.get("sources") or ():
        name = src["name"] if isinstance(src, Mapping) else src
        if sources is None or name not in sources:
            raise KeyError(
                f"source {name!r} declared in YAML but not provided "
                "in the sources mapping"
            )
        project.add_source(name, sources[name])
    tests: list[SchemaTest] = []
    for m in doc.get("models") or ():
        name = m["name"]
        if "sql" in m:
            project.sql_model(
                name,
                m["sql"],
                deps=tuple(m.get("deps") or ()),
                materialized=m.get("materialized", "view"),
                description=m.get("description", ""),
            )
        elif name not in project.models:
            raise KeyError(
                f"model {name!r} has no sql: and is not already "
                "registered — schema.yml overlays need the model first"
            )
        spec = project.models[name]
        if m.get("description") and not spec.description:
            project.models[name] = spec = _with_description(
                spec, m["description"]
            )
        tests.extend(_parse_tests(m.get("tests"), name, None))
        for col in m.get("columns") or ():
            cname = col["name"]
            if col.get("description"):
                spec.columns[cname] = col["description"]
            tests.extend(_parse_tests(col.get("tests"), name, cname))
    return project, tests


def _with_description(spec, description: str):
    from dataclasses import replace

    return replace(spec, description=description)


def compile_schema_tests(
    project: Project, spark: SparkSession, tests: list[SchemaTest]
) -> dict[str, DataFrame]:
    """Each SchemaTest -> a named violation frame (empty == pass), the
    exact contract ``testing.checks.run_checks`` consumes. Relationship
    targets accept dbt's ``ref('x')`` strings."""
    out: dict[str, DataFrame] = {}
    for t in tests:
        df = project.resolve(t.model, spark)
        if t.kind == "unique":
            v = checks.unique(df, t.column)
        elif t.kind == "not_null":
            v = checks.not_null(df, t.column)
        elif t.kind == "accepted_values":
            v = checks.accepted_values(df, t.column, t.params["values"])
        elif t.kind == "relationships":
            parent = project.resolve(parse_ref(t.params["to"]), spark)
            v = checks.relationships(df, t.column, parent, t.params["field"])
        elif t.kind == "accepted_range":
            v = checks.accepted_range(
                df,
                t.column,
                min_value=t.params.get("min_value"),
                max_value=t.params.get("max_value"),
                inclusive=t.params.get("inclusive", True),
            )
        elif t.kind == "unique_combination":
            v = checks.unique_combination(df, t.params["columns"])
        else:  # expression_is_true — KNOWN_TESTS gates anything else
            v = checks.expression_is_true(df, t.params["expression"])
        key = t.name
        i = 2
        while key in out:  # two same-kind tests on one column
            key = f"{t.name}_{i}"
            i += 1
        out[key] = v
    return out
