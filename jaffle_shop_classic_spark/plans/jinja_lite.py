"""Minimal dbt-Jinja renderer: run the reference's model FILES verbatim.

The engine's native authoring paths (``Project.model`` DataFrame
functions, ``Project.sql_model`` plain-SQL text, ``plans/yaml_project``)
deliberately skip Jinja (SURVEY §7 "no Jinja") — but a reference user
migrating a real dbt project still holds ``.sql`` files containing
``{{ ref('...') }}`` and the compile-time pivot loop
(/root/reference/models/orders.sql:1,20-22; customers.sql:3,9,15;
staging/stg_payments.sql:3-6).  This module closes that last migration
gap with a ~100-line renderer for exactly the Jinja subset those files
use — dbt's COMPILE-time templating, not its runtime:

- ``{# ... #}`` / ``{#- ... #}`` comments (stripped);
- ``{% set name = [...] %}`` — a Python-literal assignment
  (``ast.literal_eval``, so only lists/strings/numbers — no code);
- ``{% for x in xs %}`` ... ``{% endfor %}`` — loop over a set-bound
  list, body repeated with ``{{ x }}`` substituted; whitespace-control
  dashes (``{%- … -%}``) are accepted and treated as plain tags, since
  SQL is whitespace-insensitive;
- ``{{ ref('model') }}`` — replaced by the bare relation name and
  collected as a dependency edge (dbt's DAG extraction);
- ``{% if cond %}`` ... ``{% else %}`` ... ``{% endif %}`` — cond must
  be a ``{% set %}``-bound name or a Python literal (optionally
  ``not``-negated), judged by Python truthiness.  No comparisons, no
  calls, no ``var()``, no nesting — the first conditional shape a
  real dbt user hits beyond the reference subset, nothing more.

Anything outside this subset (macros, filters, ``var()``,
``source()``, computed conditions) raises ``UnsupportedJinja`` loudly
instead of emitting broken SQL.  That is a documented design boundary,
not an accident: the reference project — and the long tail of dbt-core
starter projects it represents — uses only this subset.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass


class UnsupportedJinja(ValueError):
    """A Jinja construct outside the supported compile-time subset."""


# Jinja spells booleans/none in lowercase; Python's literal_eval doesn't
_JINJA_LITERALS = {"true": True, "false": False, "none": None}


def _literal(src: str):
    key = src.strip().lower()
    if key in _JINJA_LITERALS:
        return _JINJA_LITERALS[key]
    return ast.literal_eval(src)


_COMMENT = re.compile(r"\{#.*?#\}", re.S)
_SET = re.compile(r"\{%-?\s*set\s+(\w+)\s*=\s*(.*?)\s*-?%\}", re.S)
_FOR = re.compile(
    r"\{%-?\s*for\s+(\w+)\s+in\s+(\w+)\s*-?%\}(.*?)\{%-?\s*endfor\s*-?%\}",
    re.S,
)
_IF = re.compile(
    r"\{%-?\s*if\s+(.+?)\s*-?%\}(.*?)"
    r"(?:\{%-?\s*else\s*-?%\}(.*?))?"
    r"\{%-?\s*endif\s*-?%\}",
    re.S,
)
_REF = re.compile(r"\{\{\s*ref\(\s*(['\"])([\w.]+)\1\s*\)\s*\}\}")
_VAR = re.compile(r"\{\{\s*(\w+)\s*\}\}")
_ANY_TAG = re.compile(r"\{%.*?%\}|\{\{.*?\}\}", re.S)


@dataclass(frozen=True)
class RenderedModel:
    sql: str
    deps: tuple[str, ...]


def render_model_source(text: str) -> RenderedModel:
    """Render one dbt model file body to executable SQL + its ref edges."""
    text = _COMMENT.sub("", text)

    env: dict[str, object] = {}

    def take_set(m: re.Match) -> str:
        try:
            env[m.group(1)] = _literal(m.group(2))
        except (ValueError, SyntaxError) as exc:
            raise UnsupportedJinja(
                f"{{% set {m.group(1)} = ... %}} value is not a Python "
                f"literal: {m.group(2)!r}"
            ) from exc
        return ""

    text = _SET.sub(take_set, text)

    def eval_cond(cond: str) -> bool:
        neg = False
        while cond.startswith("not "):
            neg, cond = not neg, cond[4:].strip()
        if re.fullmatch(r"\w+", cond) and cond in env:
            val = env[cond]
        else:
            try:
                val = _literal(cond)
            except (ValueError, SyntaxError) as exc:
                raise UnsupportedJinja(
                    f"{{% if %}} condition must be a set-bound name or a "
                    f"Python literal (optionally not-negated), got {cond!r}"
                ) from exc
        return bool(val) ^ neg

    def expand_if(m: re.Match) -> str:
        body, alt = m.group(2), m.group(3) or ""
        # guard BOTH branches: an {% if %} inside the {% else %} branch
        # would otherwise pair the wrong {% endif %} and surface as a
        # misleading generic 'unsupported construct' error downstream
        if any(t in seg for seg in (body, alt) for t in ("{% if", "{%- if")):
            raise UnsupportedJinja("nested {% if %} blocks are unsupported")
        return body if eval_cond(m.group(1)) else alt

    while _IF.search(text):
        text = _IF.sub(expand_if, text)

    def expand_for(m: re.Match) -> str:
        var, seq_name, body = m.group(1), m.group(2), m.group(3)
        if seq_name not in env:
            raise UnsupportedJinja(f"loop over unbound name {seq_name!r}")
        seq = env[seq_name]
        if not isinstance(seq, (list, tuple)):
            raise UnsupportedJinja(f"{seq_name!r} is not a list")
        one = re.compile(r"\{\{\s*" + re.escape(var) + r"\s*\}\}")
        return "".join(one.sub(str(item), body) for item in seq)

    # innermost-first expansion; the subset forbids nesting but a
    # sequential pair of loops (orders.sql has two) needs the loop
    while _FOR.search(text):
        text = _FOR.sub(expand_for, text)

    deps: list[str] = []

    def take_ref(m: re.Match) -> str:
        name = m.group(2)
        if name not in deps:
            deps.append(name)
        return name

    text = _REF.sub(take_ref, text)

    # bare {{ scalar }} substitutions from {% set %} (none in the
    # reference outside loops, but cheap to honor)
    def sub_var(m: re.Match) -> str:
        if m.group(1) in env and not isinstance(env[m.group(1)], (list, tuple)):
            return str(env[m.group(1)])
        raise UnsupportedJinja(f"unbound template variable {m.group(0)!r}")

    text = _VAR.sub(sub_var, text)

    leftover = _ANY_TAG.search(text)
    if leftover:
        raise UnsupportedJinja(
            f"unsupported Jinja construct: {leftover.group(0)[:60]!r}"
        )
    return RenderedModel(sql=text, deps=tuple(deps))
