"""Round-8 third probe batch: the three heaviest STATS queries that
never had a BENCH_SCALE row — Theil–Sen (day-grain-bounded pairwise
slopes + distributed median), Anderson–Darling k-sample (pooled-rank
windows), and the 200-resample bootstrap SE (Poisson-multinomial
resampling inside one aggregate). All were plan-audited as scale-safe
in earlier verdicts; this measures it. Pass bar <= ~3x at 10x.

Prereq: /tmp/scaleprobe/sf1.0. Writes BENCH_SCALE_r08c.json.
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
        "theil_sen_revenue_trend",
        "day-grain pairwise slopes (bounded by calendar^2, not rows^2)"
        " + buffer-free distributed median",
    ),
    (
        "anderson_darling_k_sample",
        "pooled ranks via range-partitioned two-pass cumsum",
    ),
    (
        "bootstrap_mean_se_order_value",
        "200 Poisson resamples folded into ONE aggregate pass",
    ),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r8c")
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
        "BENCH_SCALE_r08c.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
