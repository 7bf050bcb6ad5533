"""Dump .explain('formatted') for named catalog queries to files.

Usage: python tools/explain_dump.py <repo_root> <out_dir> <suffix> q1 [q2 ...]
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cat = load_catalog()
    spark = get_spark("explain_dump", shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = cat[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('BatchEvalPython') + txt.count('ArrowEvalPython')} PyEval "
              f"-> {path}")


if __name__ == "__main__":
    main()
