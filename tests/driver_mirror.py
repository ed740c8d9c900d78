"""Run the driver's correctness comparison locally at the driver's own
scale (sf0.01) over the first N registered queries — the exact window the
driver hash-checks. Usage:

    python tests/driver_mirror.py [N] [sf_dir]

Prints one line per query (ok / MISMATCH / no_oracle / ERROR) and a
summary. This is the pre-flight for CORRECTNESS_r{N}.json: every head
query must be ok here before the round ends.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, run_oracle  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    registry.load_all()
    names = list(registry.QUERIES)[:n]
    spark = get_spark()
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            if name not in registry.ORACLES:
                rows = df.count()
                print(f"{name}: no_oracle rows={rows} ({time.perf_counter()-t0:.1f}s)")
                continue
            oracle = run_oracle(registry.ORACLES[name], sf_dir)
            problems = compare(df, oracle, name)
            if problems:
                bad += 1
                print(f"{name}: MISMATCH ({time.perf_counter()-t0:.1f}s)")
                for p in problems[:5]:
                    print(f"    {p}")
            else:
                print(f"{name}: ok ({time.perf_counter()-t0:.1f}s)")
        except Exception:
            bad += 1
            print(f"{name}: ERROR")
            traceback.print_exc(limit=3)
    print(f"\n{len(names) - bad}/{len(names)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
