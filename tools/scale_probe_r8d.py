"""Round-8 fourth probe batch: the KMV distinct-union sketch at 10×.

The sketch's corpus-grain work is one explode→distinct over (scope,
shingle-hash) pairs followed by a per-scope rank window on a table
that is already ≪ corpus grain; the estimator itself is O(scopes).
Expectation: growth tracks the distinct-vocabulary table, not the
document count — pass bar <= ~3x at 10x data.

(`semantic_dedup_prune_stats` is deliberately NOT probed at 10×: its
pair graph reuses the pooled blocked-BLAS EXACT join — the documented
quadratic ground-truth path (SCALE.md "Known trade-offs"); at scale
the same accounting runs off the banded/bucketed candidate path.)

Prereq: /tmp/scaleprobe/sf1.0 (tools/make_scale_data.py).
Writes BENCH_SCALE_r08d.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

PROBES = [
    (
        "kmv_distinct_union_calibration",
        "explode->distinct (scope, hash) then per-scope rank window on"
        " the distinct-vocab table; mergeable min-k at cluster scale",
    ),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r8d")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name, posture in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {"posture": posture})[f"sf{sf}"] = ts
            print(f"sf{sf} {name}: {ts}", flush=True)
    for rec in out.values():
        rec["ratio_warm_10x"] = round(rec["sf1.0"][1] / rec["sf0.1"][1], 2)
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r08d.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
