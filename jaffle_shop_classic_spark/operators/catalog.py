"""Central query catalog: one named entry per engine capability.

The driver contract (``__spark_entry__.py``) exposes this registry:
``queries()`` maps name -> (spark, sf_dir) -> DataFrame and
``oracle_sql()`` maps name -> equivalent DuckDB SQL. Registration
happens at import time via the ``@register`` decorator; modules listed
in ``_MODULES`` are imported lazily by ``load_catalog()``.

Parity rules (SURVEY §5 Tier 2):
- alias every computed column identically in Spark and SQL;
- round every floating-point output (non-associative double sums differ
  in last bits between engines) — ``round(x, 2)`` for money-scale sums,
  more digits for unit-scale values;
- deterministic LIMIT requires a unique tiebreaker in the ORDER BY.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> driver does rows-only check
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}

_MODULES = (
    "jaffle_shop_classic_spark.operators.relational",
    "jaffle_shop_classic_spark.operators.tests_as_queries",
    "jaffle_shop_classic_spark.operators.extensions",
    "jaffle_shop_classic_spark.operators.text",
    "jaffle_shop_classic_spark.operators.dedup",
    "jaffle_shop_classic_spark.operators.similarity",
    "jaffle_shop_classic_spark.operators.multimodal",
    "jaffle_shop_classic_spark.operators.udfs",
)

_loaded = False


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_catalog() -> dict[str, QuerySpec]:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True
    return CATALOG
