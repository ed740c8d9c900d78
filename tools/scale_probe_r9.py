"""Round-9 scale probe (VERDICT r8 ask #1): re-price the SRP gates at
10x data after the one-exchange restructure.

The r8 shape pinned the banded table (eager count job + persist churn
per call), rejoined a groupBy size filter, and unioned the scored
subtree with a column-swapped copy — per-call scheduler round-trips
that made the gates contention-fragile (BENCH_r08: adaptive warm 26.9s
> cold 10.4s; ~11x cold swings under host load; 7.52x at 10x). The r9
shape runs ALL adaptive tables through ONE banding exchange: explode
every band in one pass, bucket-cap via a window count riding that same
exchange, self-join reusing the window's partitioning, hamming + screen
before the 3-long dedup, score once per unordered pair, explode both
directions, top-k window on the doc side.

Pass bars (from VERDICT r8 "Done ="): tight adaptive profile <= ~5x
warm at 10x, cheap production profile <= ~3x warm at 10x, cold >= warm
at both SFs.

Prereq: /tmp/scaleprobe/sf1.0 from tools/make_scale_data.py.
Writes BENCH_SCALE_r09.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

PROBES = [
    (
        "srp_knn_join_adaptive_gate",
        "tight (0.94, 1e-4) contract after the r9 one-exchange"
        " restructure; bar <= ~5x (r8 shipped 7.52x)",
    ),
    (
        "srp_knn_join_production_gate",
        "cheap (0.94, 1e-2) profile, half the tables; bar <= ~3x"
        " (r8 shipped 4.59x)",
    ),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r9")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name, posture in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {"posture": posture})[f"sf{sf}"] = ts
            print(f"sf{sf} {name}: {ts}", flush=True)
    for name, rec in out.items():
        if "sf0.1" in rec and "sf1.0" in rec:
            # warm = best of the non-cold reps (scheduler noise floor)
            rec["ratio_warm_10x"] = round(
                min(rec["sf1.0"][1:]) / min(rec["sf0.1"][1:]), 2
            )
            rec["ratio_cold_10x"] = round(rec["sf1.0"][0] / rec["sf0.1"][0], 2)
    artifact = {
        "probe": "r9 SRP one-exchange restructure at 10x",
        "results": out,
    }
    Path("/root/repo/BENCH_SCALE_r09.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )
    print(json.dumps(artifact, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
