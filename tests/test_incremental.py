"""Incremental + snapshot materializations (the dbt `incremental` model
and `snapshot` SCD2 features, re-expressed Python-native).

Both rely on versioned parquet state under warehouse_dir: each refresh
writes v{N+1} and readers take the highest version, so a build never
overwrites files it just lazily read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.plans.registry import Project


def _mk_source(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, updated long")


def test_incremental_first_build_then_merge(spark, tmp_path):
    project = Project(warehouse_dir=str(tmp_path))

    @project.model(
        name="inc_state", materialized="incremental", deps=("src",), unique_key=("id",)
    )
    def inc_state(ctx):
        src = ctx.ref("src")
        if ctx.is_incremental:
            # high-water-mark scan cut: only rows newer than what's built
            hwm = ctx.this.agg(F.max("updated")).collect()[0][0]
            src = src.filter(F.col("updated") > hwm)
        return src

    # run 1: full build
    project.add_source("src", _mk_source(spark, [(1, "a", 10), (2, "b", 10)]))
    built = project.run(spark)["inc_state"]
    assert sorted((r["id"], r["val"]) for r in built.collect()) == [(1, "a"), (2, "b")]

    # run 2: id=2 updated, id=3 new — delete+insert on the key
    project.add_source(
        "src",
        _mk_source(spark, [(1, "a", 10), (2, "B", 20), (3, "c", 20)]),
    )
    built = project.run(spark)["inc_state"]
    got = sorted((r["id"], r["val"], r["updated"]) for r in built.collect())
    assert got == [(1, "a", 10), (2, "B", 20), (3, "c", 20)]

    # two versions on disk; latest wins
    assert project._versions("inc_state") == [1, 2]


def test_incremental_requires_unique_key(spark):
    project = Project()
    try:
        project.model(name="bad", materialized="incremental")(lambda ctx: None)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "unique_key" in str(e)


def test_snapshot_cli_verb(spark, tmp_path):
    """`python -m jaffle_shop_classic_spark snapshot` — dbt's fifth verb:
    first run opens one SCD2 row per order; a re-run on unchanged seeds
    is a fixpoint that still writes a new state version."""
    from jaffle_shop_classic_spark.__main__ import main

    wh = str(tmp_path / "wh")
    assert main(["snapshot", "--warehouse", wh]) == 0
    assert main(["snapshot", "--warehouse", wh]) == 0
    snap = spark.read.parquet(f"{wh}/orders_status_snapshot/v2")
    assert snap.count() == 99  # one open row per seeded order, no churn
    assert snap.filter(F.col("valid_to").isNotNull()).count() == 0
    assert main(["snapshot"]) == 2  # refuses to run without --warehouse


def test_snapshot_scd2_check_strategy(spark, tmp_path):
    project = Project(warehouse_dir=str(tmp_path))

    @project.model(
        name="snap_cust",
        materialized="snapshot",
        deps=("src",),
        unique_key=("id",),
        check_cols=("val",),
    )
    def snap_cust(ctx):
        return ctx.ref("src").select("id", "val")

    # snapshot 1: two entities
    project.snapshot_at = 100
    project.add_source("src", _mk_source(spark, [(1, "a", 0), (2, "b", 0)]))
    s1 = project.run(spark)["snap_cust"]
    rows = sorted((r["id"], r["val"], r["valid_from"], r["valid_to"]) for r in s1.collect())
    assert rows == [(1, "a", 100, None), (2, "b", 100, None)]

    # snapshot 2: id=1 changes, id=3 appears, id=2 unchanged
    project.snapshot_at = 200
    project.add_source("src", _mk_source(spark, [(1, "A", 0), (2, "b", 0), (3, "c", 0)]))
    s2 = project.run(spark)["snap_cust"]
    rows = sorted(
        (r["id"], r["val"], r["valid_from"], r["valid_to"]) for r in s2.collect()
    )
    assert rows == [
        (1, "A", 200, None),  # new open version
        (1, "a", 100, 200),  # closed old version
        (2, "b", 100, None),  # untouched
        (3, "c", 200, None),  # brand-new entity
    ]

    # snapshot 3: nothing changed -> state is a fixpoint
    project.snapshot_at = 300
    s3 = project.run(spark)["snap_cust"]
    rows3 = sorted(
        (r["id"], r["val"], r["valid_from"], r["valid_to"]) for r in s3.collect()
    )
    assert rows3 == rows


def test_incremental_on_schema_change_strategies(spark, tmp_path):
    """dbt on_schema_change: 'ignore' drops new columns to the stored
    schema, 'append_new_columns' widens stored state with NULLs, 'fail'
    raises on drift."""
    import pytest
    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.plans.registry import ContractViolation, Project

    def make(strategy, subdir):
        project = Project(warehouse_dir=str(tmp_path / subdir))
        batch = {"n": 1}

        @project.model(
            name="m", materialized="incremental", unique_key=("id",),
            on_schema_change=strategy,
        )
        def m(ctx):
            base = ctx.spark.range(3).select("id", F.lit(batch["n"]).alias("v"))
            if batch["n"] == 2:
                base = base.withColumn("extra", F.lit("x"))
            return base

        return project, batch

    # ignore: second build's 'extra' column is dropped
    p, b = make("ignore", "ig")
    p.run(spark, select=["m"]); b["n"] = 2; p._built.clear()
    out = p._materialize(p.models["m"], spark)
    assert sorted(out.columns) == ["id", "v"]

    # append_new_columns: old rows get NULL extra
    p, b = make("append_new_columns", "ap")
    p.run(spark, select=["m"]); b["n"] = 2; p._built.clear()
    out = p._materialize(p.models["m"], spark)
    assert "extra" in out.columns
    assert out.filter(F.col("extra").isNull()).count() == 0  # delete+insert replaced all ids
    b["n"] = 3  # third batch WITHOUT extra -> new rows get NULL extra
    p._built.clear()
    # batch 3 emits no 'extra'; stored schema has it -> new rows NULL-filled
    out = p._materialize(p.models["m"], spark)
    assert out.filter(F.col("extra").isNull()).count() == out.count()

    # fail: drift raises
    p, b = make("fail", "fa")
    p.run(spark, select=["m"]); b["n"] = 2; p._built.clear()
    with pytest.raises(ContractViolation, match="on_schema_change"):
        p._materialize(p.models["m"], spark)


def test_curate_cli_verb(spark, tmp_path, sf_dir):
    """`python -m jaffle_shop_classic_spark curate` — the dbt-run analog
    for the LLM-pipeline half: curated corpus equals the semi-join of
    documents with the certified curation survivors, lang-partitioned."""
    from jaffle_shop_classic_spark.__main__ import main
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.sources.parquet import load_table

    out = str(tmp_path / "corpus_out")
    assert main(["curate", "--sf-dir", sf_dir, "--out", out]) == 0
    back = spark.read.parquet(f"{out}/corpus")
    keep = load_catalog()["pipeline_corpus_curation"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    expect = docs.join(keep, "doc_id", "left_semi")
    assert back.count() == expect.count() > 0
    # partition column survives the round trip and covers every language
    assert {r["lang"] for r in back.select("lang").distinct().collect()} == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
    # identical id sets (curation decisions preserved by the write)
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in expect.select("doc_id").collect()
    }
    assert main(["curate", "--sf-dir", sf_dir]) == 2  # --out required


def test_cli_query_and_sql_verbs(spark, sf_dir, capsys):
    from jaffle_shop_classic_spark.__main__ import main

    assert main(["query", "--name", "k_anonymity_audit", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "k_anonymity_audit:" in out and "rows" in out

    assert main(["query", "--name", "no_such_query"]) == 2

    assert (
        main(["sql", "-e", "SELECT count(*) AS n FROM orders", "--sf-dir", sf_dir]) == 0
    )
    out = capsys.readouterr().out
    assert "1 rows" in out

    assert main(["sql"]) == 2  # --expr required

    assert main(["explain", "--name", "tpch_q1_style", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "PushedFilters" in out

    assert main(["explain"]) == 2  # --name required


def test_cli_run_select_builds_only_subgraph(spark, capsys):
    from jaffle_shop_classic_spark.__main__ import main

    assert main(["run", "--select", "+stg_customers"]) == 0
    out = capsys.readouterr().out
    assert "stg_customers" in out
    assert "customers" not in out.replace("stg_customers", "")  # mart not built
    assert main(["run", "--select", "no_such_model"]) == 2


def test_expire_versions_keeps_newest_and_latest_reads(spark, tmp_path):
    """VACUUM analog: after 5 incremental refreshes, expiring to
    keep_last=2 deletes v1..v3, keeps v4/v5, never touches the latest,
    and both _read_latest and read_version(kept) still resolve while
    read_version(expired) raises."""
    import pytest as _pytest

    project = Project(warehouse_dir=str(tmp_path))

    @project.model(name="inc_exp", materialized="incremental", unique_key=("k",))
    def inc_exp(ctx):
        return ctx.spark.createDataFrame([(1, "a")], "k long, v string")

    for _ in range(5):
        project.run(spark, select=["inc_exp"])
    assert project._versions("inc_exp") == [1, 2, 3, 4, 5]

    with _pytest.raises(ValueError):
        project.expire_versions("inc_exp", keep_last=0)
    assert project.expire_versions("inc_exp", keep_last=2) == [1, 2, 3]
    assert project._versions("inc_exp") == [4, 5]
    assert project._read_latest("inc_exp", spark).count() == 1
    assert project.read_version("inc_exp", spark, 4).count() == 1
    with _pytest.raises(ValueError):
        project.read_version("inc_exp", spark, 2)
    # idempotent: nothing more to expire at the same retention
    assert project.expire_versions("inc_exp", keep_last=2) == []
