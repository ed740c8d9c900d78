"""Round-8 fifth probe batch: keyed-WINDOW operators under key skew.

The streaming session probe (r7) showed keyed session state absorbs a
30%-hot-key; this batch asks the same adversarial question of the two
BATCH window shapes that sort a key's full history inside one task:

1. ``asof_last_event_before_order`` — the union-tag as-of join: one
   window partitioned by user, ordered by time. A user owning 30% of
   all events means ONE task sorts 30% of the corpus.
2. ``position_weighted_attribution`` — per-user ordered credit frames,
   same single-task-per-key hazard.

Corpus: tools/scale_probe_r7.make_skew_corpus (sf0.1 clone, a
deterministic 30% of events reassigned to user 1, timestamps kept).
Pass bar: <= ~2x the uniform corpus at the same size; above that the
operator needs a range-partition + boundary-carry rewrite at scale.
Writes BENCH_SCALE_r08e.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402
from tools.scale_probe_r7 import SKEW_DIR, make_skew_corpus  # noqa: E402

PROBES = [
    (
        "asof_last_event_before_order",
        "union-tag as-of join; per-user time-ordered window",
    ),
    (
        "position_weighted_attribution",
        "per-user ordered credit frames (DECIMAL sums)",
    ),
]

CORPORA = [("uniform", "/root/testdata/sf0.1"), ("skew30", SKEW_DIR)]


def main() -> None:
    make_skew_corpus()
    registry.load_all()
    spark = get_spark("scale_probe_r8e")
    out: dict[str, dict] = {}
    for label, sf_dir in CORPORA:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name, posture in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {"posture": posture})[label] = ts
            print(f"{label} {name}: {ts}", flush=True)
    for rec in out.values():
        rec["ratio_skew_vs_uniform_warm"] = round(
            rec["skew30"][1] / rec["uniform"][1], 2
        )
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r08e.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
