"""Round-7 scale probes (VERDICT r6 asks #5 and #7):

1. The two heaviest round-6 plans at 10x data —
   ``nn_matching_att_urgent_lag`` (month-partitioned sorted-merge
   windows: partition count grows with the calendar, not data, so the
   per-month task grows 10x) and ``order_value_qq_period_drift`` (two
   global exact-percentile sets over the value column — the documented
   single-buffer caveat). Pass bar: <= ~3x at 10x data.
2. An adversarial-skew replay of ``streaming_sessionization_replay``:
   a corpus where ONE user owns 30% of events (keyed-state hotspot).
   Pass bar: <= 2x the uniform corpus at the same size.
3. The round-7 sketch additions (HLL, Count-Min) at 10x — fixed-state
   aggregates, expected ~flat.

Prereq: /tmp/scaleprobe/sf1.0 from tools/make_scale_data.py. The skew
corpus is generated here (sf0.1 clone with 30% of events reassigned to
one hot user, timestamps kept so session windows stay realistic).
Writes BENCH_SCALE_r07.json.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

SKEW_DIR = "/tmp/scaleprobe/sf0.1skew"


def make_skew_corpus() -> None:
    """sf0.1 clone, but a deterministic 30% of events move to user 1
    (hash-chosen rows, timestamps unchanged — the hot key therefore has
    events spread across the whole time range: many concurrent session
    windows on one grouping key, the worst case for keyed state)."""
    import duckdb

    os.makedirs(SKEW_DIR, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]:
        dst = f"{SKEW_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    con.execute(
        f"""COPY (
  SELECT event_id, ts,
         CASE WHEN ('0x' || substr(md5('skew:' || event_id::VARCHAR), 1, 15))
                   ::BIGINT % 10 < 3
              THEN 1 ELSE user_id END AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet')
) TO '{SKEW_DIR}/events.parquet' (FORMAT PARQUET)"""
    )


PROBES_10X = [
    (
        "nn_matching_att_urgent_lag",
        "month-blocked sorted-merge windows; per-month task grows with data",
    ),
    (
        "order_value_qq_period_drift",
        "two grouped exact-percentile sets; single-buffer caveat documented",
    ),
    ("hll_distinct_calibration", "fixed 256-register state; expected flat"),
    ("countmin_heavy_hitters_check", "fixed 1024-cell state; expected flat"),
    ("minhash_near_dup_documents", "banded LSH after r7 trims; re-baseline"),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def main() -> None:
    registry.load_all()
    make_skew_corpus()
    spark = get_spark("scale_probe_r7")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name, posture in PROBES_10X:
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

    # streaming keyed-state skew probe: uniform vs 30%-hot-key corpus at
    # the SAME size — measures state hotspotting, not data growth
    skew: dict[str, dict] = {}
    for label, sf_dir in [("uniform", "/root/testdata/sf0.1"), ("skew30", SKEW_DIR)]:
        fn = registry.QUERIES["streaming_sessionization_replay"]
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        skew[label] = {"times": ts}
        print(f"sessionization {label}: {ts}", flush=True)
    skew["ratio_skew_vs_uniform_warm"] = round(
        skew["skew30"]["times"][1] / skew["uniform"]["times"][1], 2
    )
    out["streaming_sessionization_skew_probe"] = {
        "posture": "session_window keyed state; one user owns 30% of events",
        **skew,
    }

    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r07.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
