"""Round-end preflight: fail loudly before the driver does.

The round-4 postmortem (VERDICT.md r4): a testdata encoding change broke
two queries + the bench, and nothing in the default workflow surfaced it.
Analysis alone (no execution) catches that class of break in seconds —
every catalog query is built against the CURRENT testdata and run
through Catalyst analysis via .explain(), so schema drift, type
mismatches, and unresolved columns all throw here.

Usage:
    python tools/preflight.py            # analysis pass + pytest
    python tools/preflight.py --fast     # analysis pass only (~60 s)

Exit 0 = safe to end the round. Anything else = fix before the driver
snapshots.
"""

from __future__ import annotations

import io
import contextlib
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def analysis_pass() -> int:
    """Build + analyze every catalog query against every sf dir.

    .explain() forces analysis and optimization but launches no jobs, so
    the whole 123-query × 3-sf sweep is driver-side only. Streaming
    queries execute on .fn() (they drain a memory sink), which is the
    point — a broken stream source fails here too.
    """
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.session import get_spark

    spark = get_spark("preflight", shuffle_partitions=4)
    catalog = load_catalog()
    failures = []
    t0 = time.time()
    for sf_dir in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"preflight: SKIP missing {sf_dir}")
            continue
        for name, spec in catalog.items():
            try:
                df = spec.fn(spark, sf_dir)
                with contextlib.redirect_stdout(io.StringIO()):
                    df.explain(extended=False)
            except Exception as e:  # noqa: BLE001 — report every break
                failures.append((sf_dir, name, f"{type(e).__name__}: {e}"))
                print(f"preflight: FAIL {sf_dir} {name}: {type(e).__name__}: {e}")
        print(f"preflight: analyzed {len(catalog)} queries against {sf_dir}")
    print(f"preflight: analysis pass done in {time.time() - t0:.1f}s, "
          f"{len(failures)} failure(s)")
    return len(failures)


def main() -> None:
    failures = analysis_pass()
    if failures:
        print("preflight: RED (analysis)")
        sys.exit(1)
    if "--fast" in sys.argv:
        print("preflight: GREEN (analysis only; pytest skipped via --fast)")
        return
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], cwd=REPO
    )
    if rc:
        print("preflight: RED (pytest)")
        sys.exit(rc)
    print("preflight: GREEN")


if __name__ == "__main__":
    main()
