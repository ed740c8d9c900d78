"""Round-10 graph skew probe (VERDICT r9 ask #7): PageRank + triangle
census at 10x edges under POWER-LAW degree (one celebrity vertex with
~30% of edges) vs a uniform-degree graph of the SAME edge count.

What the shapes defend: the triangle census orients edges by
(degree, id) so the celebrity ends up with near-zero OUT-degree — the
wedge self-join's work is sum(outdeg^2), which degree ordering keeps
O(E^1.5) regardless of in-degree skew. PageRank's per-round
contribution aggregate groups by dst; a celebrity dst key is absorbed
by map-side partial aggregation (the combine halves per-partition
before the exchange). If either claim is wrong, the zipf/uniform warm
ratio blows past ~2x and the operator needs a salting pass.

Prereq: python tools/make_graph_skew_data.py
Writes BENCH_SCALE_r10b.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

PROBES = ["copurchase_pagerank_top20", "copurchase_triangle_count"]
SFS = [
    ("uni10x", "/tmp/scaleprobe/graphuni10x"),
    ("zipf10x", "/tmp/scaleprobe/graphzipf10x"),
]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r10b")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {})[f"{sf}"] = ts
            out[name][f"{sf}_rows"] = len(rows)
            print(f"{sf} {name}: {ts}", flush=True)
    for name, rec in out.items():
        rec["ratio_zipf_vs_uniform_warm"] = round(
            min(rec["zipf10x"][1:]) / min(rec["uni10x"][1:]), 2
        )
        rec["ratio_zipf_vs_uniform_cold"] = round(
            rec["zipf10x"][0] / rec["uni10x"][0], 2
        )
    artifact = {
        "probe": "r10 graph family at 10x edges (2.12M), zipf vs uniform"
        " degree, celebrity vertex ~30% of edges",
        "corpus": "tools/make_graph_skew_data.py (same edge count both"
        " shapes; degree distribution is the only variable)",
        "results": out,
        "bar": "zipf/uniform warm <= ~2x, else the operator needs a"
        " salting pass (VERDICT r9 Next #7)",
    }
    Path("/root/repo/BENCH_SCALE_r10b.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
