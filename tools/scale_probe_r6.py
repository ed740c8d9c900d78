"""Round-6 new-family scale probe: the graph traversal / skyline /
attribution / kNN-vote / streaming-replay additions at sf0.1 vs the 10x
clone corpus (/tmp/scaleprobe/sf1.0 from tools/make_scale_data.py).

Question (same as the round-5 probes): do observed time ratios track the
data ratio, or does a new operator hide a superlinear term bench-SF
timing can't see? Known-quadratic oracle gates are probed anyway and
LABELED — their production swap is recorded next to the number.

Each query runs twice per SF in one session (cold incl. pool builds,
then warm steady state); driver-side JVM GC between SFs. Writes
BENCH_SCALE_r06b.json.
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
    ("copurchase_kcore_peel_trace", "iterative peel; linear per round"),
    ("copurchase_bfs_hop_histogram", "iterative expansion; linear per hop"),
    ("part_skyline_pareto", "local prune + broadcast candidate anti-join"),
    ("position_weighted_attribution", "user-key range join + purchase windows"),
    (
        "ann_knn_label_vote",
        "FIXED query batch (vec_id%25==0 AND vec_id<5000) x linear "
        "reference scan; the uncapped form measured 110x at 10x data "
        "before the cap; production swap = ivf/srp kNN-join scoring",
    ),
    ("streaming_dedup_hourly_replay", "watermarked stream drain; linear"),
    ("streaming_sessionization_replay", "session_window drain; linear"),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r6")
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
    for name, rec in out.items():
        if "sf0.1" in rec and "sf1.0" in rec:
            rec["ratio_warm_10x"] = round(rec["sf1.0"][1] / rec["sf0.1"][1], 2)
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r06b.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
