"""CLI: seed / run / test / docs — mirrors the reference's entry points
(/root/reference/README.md:46-71: `dbt seed`, `dbt run`, `dbt test`,
`dbt docs generate`).

    python -m jaffle_shop_classic_spark run --warehouse /tmp/wh
    python -m jaffle_shop_classic_spark test
    python -m jaffle_shop_classic_spark docs --out catalog.json
"""

from __future__ import annotations

import argparse
import sys

from .models.jaffle import build_project, build_snapshots, jaffle_checks, load_jaffle_sources
from .plans.docs import generate_catalog, render_markdown, write_catalog
from .session import get_spark
from .sources.seeds import DEFAULT_SEED_DIR
from .testing.checks import run_checks


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jaffle_shop_classic_spark")
    ap.add_argument("command", choices=["seed", "run", "test", "docs", "snapshot"])
    ap.add_argument("--seed-dir", default=DEFAULT_SEED_DIR)
    ap.add_argument("--warehouse", default=None, help="parquet output dir for table models")
    ap.add_argument("--out", default=None, help="docs: output JSON path")
    ap.add_argument(
        "--at",
        type=int,
        default=None,
        help="snapshot: logical clock for valid_from/valid_to (default: next version number)",
    )
    args = ap.parse_args(argv)

    import os

    if not os.path.isdir(args.seed_dir):
        print(f"error: seed dir not found: {args.seed_dir}", file=sys.stderr)
        return 2

    spark = get_spark("jaffle_cli")
    project = build_project(warehouse_dir=args.warehouse)
    load_jaffle_sources(project, spark, args.seed_dir)

    if args.command == "seed":
        for name, df in project.sources.items():
            print(f"{name}: {df.count()} rows")
        return 0

    if args.command == "snapshot":
        if args.warehouse is None:
            print("error: snapshot needs --warehouse (versioned SCD2 state)", file=sys.stderr)
            return 2
        build_snapshots(project)
        snaps = [n for n, s in project.models.items() if s.materialized == "snapshot"]
        latest = max((project._latest_version(n) or 0) for n in snaps)
        if args.at is not None and args.at <= latest:
            # a snapshot clock at or before the persisted one would write
            # SCD2 rows with valid_to <= valid_from and non-monotonic
            # history — refuse instead of silently corrupting state
            print(
                f"error: --at {args.at} is not after the latest persisted "
                f"snapshot version {latest}; pick --at >= {latest + 1}",
                file=sys.stderr,
            )
            return 2
        project.snapshot_at = args.at if args.at is not None else latest + 1
        built = project.run(spark, select=snaps)
        for name in snaps:
            df = built[name]
            open_rows = df.filter(df.valid_to.isNull()).count()
            print(f"{name} [snapshot @ {project.snapshot_at}]: {df.count()} rows, {open_rows} open")
        return 0

    built = project.run(spark)
    if args.command == "run":
        for name in project.topo_order():
            spec = project.models[name]
            print(f"{name} [{spec.materialized}]: {built[name].count()} rows")
        return 0

    if args.command == "test":
        results = run_checks(jaffle_checks(built))
        failed = [r for r in results if not r.passed]
        for r in results:
            print(r)
            if not r.passed:
                for row in r.sample:
                    print(f"    {row}")
        print(f"\n{len(results) - len(failed)}/{len(results)} tests passed")
        return 1 if failed else 0

    if args.command == "docs":
        catalog = generate_catalog(project, built)
        if args.out:
            write_catalog(project, built, args.out)
            print(f"wrote {args.out}")
        else:
            print(render_markdown(catalog))
            from .plans.docs import generate_query_catalog

            qcat = generate_query_catalog()
            print(f"\n## Operator catalog ({len(qcat)} queries)\n")
            for name, node in qcat.items():
                print(f"- `{name}` [{node['oracle']}] — {node['description'][:120]}")
        return 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
