"""Full-HEADLINE 10x perf sweep (round 7): every benched query timed
warm at sf0.1 and at the 10x clone corpus (/tmp/scaleprobe/sf1.0), with
the warm ratio per query — the comprehensive version of the per-family
spot probes in BENCH_SCALE_r0{5,6,7}.json. Queries whose ratio exceeds
FLAG_RATIO are listed at the end; known-quadratic oracle GATES (the
pinned-parameter recall gates whose production paths are the adaptive
variants) are annotated, not excluded — the point is a table with no
silent gaps.

Writes BENCH_SCALE_r07_full.json. Run after bench.py (same HEADLINE).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

FLAG_RATIO = 3.0
# pinned-parameter oracle gates, deliberately quadratic — SKIPPED at
# sf1.0 (already measured: lsh_knn_join_top1 >900s killed, ivf 131.8s
# at sf1.0, SCALE.md round-5 table; production paths = the adaptive
# variants, probed separately). Re-timing a documented quadratic burns
# the sweep's wall budget to confirm a number we already recorded.
KNOWN_QUADRATIC_GATES = {
    "lsh_knn_join_top1",
    "ivf_knn_join_top1",
    "embedding_near_dup_recall",
}
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_sweep_perf_r7")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        for name in HEADLINE:
            if sf == "1.0" and name in KNOWN_QUADRATIC_GATES:
                out.setdefault(name, {})["sf1.0_skipped"] = (
                    "known-quadratic pinned gate; see SCALE.md round-5 table"
                )
                continue
            fn = registry.QUERIES[name]
            try:
                fn(spark, sf_dir).collect()  # untimed: pools + compile
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                warm = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # record, don't hide
                out.setdefault(name, {})[f"sf{sf}_error"] = repr(exc)[:200]
                print(f"sf{sf} {name}: ERROR {exc!r}", flush=True)
                continue
            out.setdefault(name, {})[f"sf{sf}"] = warm
            print(f"sf{sf} {name}: {warm}", flush=True)
    flagged = []
    for name, rec in out.items():
        if "sf0.1" in rec and "sf1.0" in rec and rec["sf0.1"] > 0:
            rec["ratio_warm_10x"] = round(rec["sf1.0"] / rec["sf0.1"], 2)
            rec["known_quadratic_gate"] = name in KNOWN_QUADRATIC_GATES
            if rec["ratio_warm_10x"] > FLAG_RATIO and rec["sf1.0"] > 1.0:
                flagged.append((name, rec["ratio_warm_10x"], rec["sf1.0"]))
    summary = {
        "n_queries": len(out),
        "flag_ratio": FLAG_RATIO,
        "flagged_over_ratio": sorted(flagged, key=lambda t: -t[1]),
    }
    artifact = {"summary": summary, "queries": out}
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r07_full.json"
    ).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
