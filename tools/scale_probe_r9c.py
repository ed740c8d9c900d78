"""Round-9 skew re-probe (VERDICT r8, Next #4): position-weighted
attribution after the hour-chunk equi-key mitigation.

BENCH_SCALE_r08e measured the query at 2.06x vs uniform under a 30%
hot user: the pair join equi-keyed on user_id alone, so the whale's
quadratic click x purchase work landed on one task. The r9 shape joins
on (user_id, HOUR CHUNK) with purchases probing their own and the
previous chunk — the whale's work now splits across its active hours.
Pass bar (VERDICT r8 "Done ="): skew30 <= ~1.3x uniform, oracle still
hash-green (verified separately at sf0.001/0.01).

Writes BENCH_SCALE_r09c.json.
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

CORPORA = [("uniform", "/root/testdata/sf0.1"), ("skew30", SKEW_DIR)]


def main() -> None:
    make_skew_corpus()
    registry.load_all()
    spark = get_spark("scale_probe_r9c")
    fn = registry.QUERIES["position_weighted_attribution"]
    out: dict[str, dict] = {
        "position_weighted_attribution": {
            "posture": "pair join equi-keyed (user, hour chunk); purchases"
            " probe own + previous chunk — whale work splits across hours"
        }
    }
    rec = out["position_weighted_attribution"]
    for label, sf_dir in CORPORA:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        rec[label] = ts
        print(f"{label}: {ts}", flush=True)
    rec["ratio_skew_vs_uniform_warm"] = round(
        min(rec["skew30"][1:]) / min(rec["uniform"][1:]), 2
    )
    Path("/root/repo/BENCH_SCALE_r09c.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
