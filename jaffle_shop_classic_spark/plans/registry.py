"""Model registry + DAG runner — the `dbt run` analog (SURVEY §3.2).

dbt's pipeline is: Jinja-render SQL text, extract `{{ ref() }}` edges,
topo-sort, ship CREATE VIEW/TABLE statements to a warehouse. Here the
same contract is native Python: a model is a function
``(ModelContext) -> DataFrame`` registered with ``@model``; ``ctx.ref``
is the edge; materialization mirrors /root/reference/dbt_project.yml:22-27:

  view  -> ``createOrReplaceTempView``: the logical plan is inlined into
           every consumer, so Catalyst optimizes across model boundaries
           (cross-model predicate pushdown / column pruning) — exactly
           what a warehouse does with SQL views.
  table -> eager Parquet write + re-read: cuts lineage, precomputes for
           reuse, and gives AQE fresh size stats; at cluster scale this
           is also the unit of incremental scheduling.

Cycles are rejected at run time; independent nodes could run
concurrently (the scheduler walks levels), though Spark's own task
parallelism usually saturates the cluster from a single node.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ModelSpec:
    name: str
    fn: Callable[["ModelContext"], DataFrame]
    materialized: str = "view"  # "view" | "table" | "ephemeral"
    deps: tuple[str, ...] = ()
    description: str = ""
    columns: dict[str, str] = field(default_factory=dict)  # name -> doc


class ModelContext:
    """What a model function sees: ``ref()`` + the session."""

    def __init__(self, project: "Project", spark: SparkSession):
        self.project = project
        self.spark = spark

    def ref(self, name: str) -> DataFrame:
        return self.project.resolve(name, self.spark)


class Project:
    """A collection of sources + models with dbt-run semantics."""

    def __init__(self, warehouse_dir: str | None = None):
        self.models: dict[str, ModelSpec] = {}
        self.sources: dict[str, DataFrame] = {}
        self.warehouse_dir = warehouse_dir
        self._built: dict[str, DataFrame] = {}

    # -- registration -----------------------------------------------------
    def model(
        self,
        name: str | None = None,
        materialized: str = "view",
        deps: Sequence[str] = (),
        description: str = "",
        columns: dict[str, str] | None = None,
    ):
        def deco(fn):
            mname = name or fn.__name__
            if mname in self.models:
                raise ValueError(f"duplicate model {mname}")
            self.models[mname] = ModelSpec(
                name=mname,
                fn=fn,
                materialized=materialized,
                deps=tuple(deps),
                description=description or (fn.__doc__ or "").strip(),
                columns=dict(columns or {}),
            )
            return fn

        return deco

    def sql_model(
        self,
        name: str,
        sql: str,
        deps: Sequence[str] = (),
        materialized: str = "view",
        description: str = "",
    ) -> None:
        """Register a model authored as a SQL SELECT — the migration path
        for users of the reference, whose models are SQL files.

        No Jinja and no SQL parser (SURVEY §7 'not over-building'):
        upstream relations are referenced by NAME in the SQL text, and
        resolution happens through Spark's own analyzer — the runner
        materializes each dependency as a temp view before this model
        executes, so `select ... from stg_orders` just works. A dbt
        model migrates by deleting the `{{ ref('x') }}` braces and
        declaring x in `deps`.
        """

        def fn(ctx: "ModelContext") -> DataFrame:
            for dep in deps:
                df = ctx.ref(dep)  # builds + registers the temp view
                if dep in self.sources:
                    df.createOrReplaceTempView(dep)
            return ctx.spark.sql(sql)

        self.model(
            name=name, materialized=materialized, deps=deps, description=description
        )(fn)

    def add_source(self, name: str, df: DataFrame) -> None:
        self.sources[name] = df

    # -- resolution / execution ------------------------------------------
    def resolve(self, name: str, spark: SparkSession) -> DataFrame:
        if name in self._built:
            return self._built[name]
        if name in self.sources:
            return self.sources[name]
        if name in self.models:
            # lazily build an upstream model outside a full run()
            return self._materialize(self.models[name], spark)
        raise KeyError(f"unknown relation: {name}")

    def _materialize(self, spec: ModelSpec, spark: SparkSession) -> DataFrame:
        df = spec.fn(ModelContext(self, spark))
        if spec.materialized == "table":
            if self.warehouse_dir is not None:
                path = f"{self.warehouse_dir}/{spec.name}"
                df.write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
            else:  # no warehouse: emulate eagerness via cache
                df = df.cache()
        if spec.materialized != "ephemeral":
            df.createOrReplaceTempView(spec.name)
        self._built[spec.name] = df
        return df

    def topo_order(self) -> list[str]:
        ts = TopologicalSorter(
            {name: [d for d in spec.deps if d in self.models] for name, spec in self.models.items()}
        )
        return list(ts.static_order())  # raises CycleError on cycles

    def run(self, spark: SparkSession, select: Sequence[str] | None = None) -> dict[str, DataFrame]:
        """Materialize all (or selected) models in dependency order."""
        self._built.clear()
        order = self.topo_order()
        wanted = set(select) if select else None
        for name in order:
            if wanted is None or name in wanted or self._needed_by(name, wanted):
                self._materialize(self.models[name], spark)
        return dict(self._built)

    def _needed_by(self, name: str, wanted: set[str]) -> bool:
        # a node is needed if any selected model transitively depends on it
        frontier = set(wanted)
        seen = set()
        while frontier:
            n = frontier.pop()
            if n in seen or n not in self.models:
                continue
            seen.add(n)
            if name in self.models[n].deps:
                return True
            frontier.update(self.models[n].deps)
        return False


# module-level default project for the jaffle models
_default_project: Project | None = None


def default_project() -> Project:
    global _default_project
    if _default_project is None:
        _default_project = Project()
    return _default_project


def model(**kwargs):
    """Register on the default project (convenience decorator)."""
    return default_project().model(**kwargs)
