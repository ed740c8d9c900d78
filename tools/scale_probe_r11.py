"""Round-11 skew probe (VERDICT r10 Next #3): the two attribution
queries that gained the (user_id, hour-chunk) equi-key in r9/r10 —
`click_purchase_attribution` and `attribution_lag_percentiles` — get
their OWN skew30 probe rows instead of riding the sibling shape's r9c
measurement (`position_weighted_attribution`, 0.96x).

Corpus: the r7 generator's 30%-hot-user clone of sf0.1 (a
deterministic 30% of events move to user 1, timestamps unchanged — the
whale's click x purchase pair work is quadratic on the bare user key).
Pass bar (r9's done-criterion, applied to these two): skew30 warm
<= ~1.3x uniform; oracles separately re-verified at sf0.001/0.01 this
round (hour-chunk derivation switched to the casted-microsecond
expression, ADVICE r10).

Writes BENCH_SCALE_r11.json.
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

PROBES = [
    (
        "click_purchase_attribution",
        "pair join equi-keyed (user, hour chunk); purchases probe own +"
        " previous chunk — whale pair work splits across its active hours",
    ),
    (
        "attribution_lag_percentiles",
        "same chunked pair join feeding the buffer-free distributed"
        " exact-percentile path",
    ),
]


def main() -> None:
    make_skew_corpus()
    registry.load_all()
    spark = get_spark("scale_probe_r11")
    out: dict[str, dict] = {}
    for name, posture in PROBES:
        fn = registry.QUERIES[name]
        rec = out.setdefault(name, {"posture": posture})
        for label, sf_dir in CORPORA:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            rec[label] = ts
            print(f"{name} {label}: {ts}", flush=True)
        rec["ratio_skew_vs_uniform_warm"] = round(
            min(rec["skew30"][1:]) / min(rec["uniform"][1:]), 2
        )
    Path("/root/repo/BENCH_SCALE_r11.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
