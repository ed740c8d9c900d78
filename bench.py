"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Each query is executed twice conceptually: a cheap count() warms nothing
special — we time a full materialization (collect of the aggregated,
report-sized result) per query, after one untimed warm-up of the session
(JVM + first parquet footer reads are not what we're measuring).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

# Queries that represent the engine's headline workload; grown as operators
# land. Anything registered but not listed still runs in correctness, just
# not in the benchmark.
HEADLINE: list[str] = [
    "flagship_price_band_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]
    extra = [n for n in registry.QUERIES if n not in names]
    names += extra

    spark = get_spark("bench")
    # Warm-up: JVM classloading + parquet footer read, untimed.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
