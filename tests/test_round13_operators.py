"""Round-13 scale guards: the entity-resolution hot-block cap and the
star-contraction edge generation (VERDICT r12 'Next round' #5)."""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.operators.extensions import MAX_ER_BLOCK


def _write_parts(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")


def test_er_degenerate_block_stays_bounded(spark, tmp_path):
    """Plant a single (brand, first-letter) block covering the whole
    table with MAX_ER_BLOCK+44 distinct near-identical names: without
    the cap this is a ~(cap+44)^2 levenshtein quadratic and one giant
    cluster; with it the fuzzy stage sits out and only exact-duplicate
    star edges remain — 2-member components, nothing else."""
    n = MAX_ER_BLOCK + 44
    rows = []
    for i in range(n):
        name = f"zz part {i:04d}"  # pairwise distance <= 3 within a block
        rows.append((2 * i, name, "Brand#00"))
        rows.append((2 * i + 1, name, "Brand#00"))  # one exact duplicate
    _write_parts(spark, tmp_path, rows)
    out = (
        load_catalog()["entity_resolution_clusters"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    # every row is an exact-dup pair component: entity = even partkey,
    # exactly its duplicate sibling beside it, never a fuzzy merge
    assert len(out) == 2 * n
    assert all(r.n_members == 2 for r in out)
    assert all(r.entity_id % 2 == 0 for r in out)


def test_er_cap_does_not_bind_below_threshold(spark, tmp_path):
    """Same planted shape but under the cap: the fuzzy quadratic runs
    and the near-identical names all merge into one component."""
    rows = [(i, f"zz part {i % 3}", "Brand#00") for i in range(12)]
    _write_parts(spark, tmp_path, rows)
    out = (
        load_catalog()["entity_resolution_clusters"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert len(out) == 12
    assert all(r.entity_id == 0 and r.n_members == 12 for r in out)


def test_er_singletons_emit_no_row(spark, tmp_path):
    """A part with a unique name and no fuzzy neighbor must not appear
    (star edges never create self-loops for 1-member groups)."""
    rows = [
        (1, "completely different alpha", "Brand#00"),
        (2, "unrelated beta widget", "Brand#11"),
        (3, "matching gamma", "Brand#22"),
        (4, "matching gamma", "Brand#22"),
    ]
    _write_parts(spark, tmp_path, rows)
    out = (
        load_catalog()["entity_resolution_clusters"]
        .fn(spark, str(tmp_path))
        .orderBy("p_partkey")
        .collect()
    )
    assert [r.p_partkey for r in out] == [3, 4]
    assert all(r.entity_id == 3 and r.n_members == 2 for r in out)


def test_er_star_contraction_matches_duckdb_on_planted_blocks(spark, tmp_path):
    """Cross-check the star-contracted edges against the oracle's full
    all-pairs closure on data with BOTH fuzzy merges and heavy exact
    duplication — the two shapes must produce identical components."""
    import duckdb

    rows = []
    pk = 0
    for g in range(4):  # 4 fuzzy families, 3 spellings, 5 dups each
        for s in range(3):
            for _ in range(5):
                rows.append((pk, f"fam{g} item {s}", "Brand#77"))
                pk += 1
    _write_parts(spark, tmp_path, rows)
    spec = load_catalog()["entity_resolution_clusters"]
    got = sorted(
        (r.p_partkey, r.entity_id, r.n_members)
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
    assert got == want
