"""Round-8 scale probes (VERDICT r7 asks #2, #6, #8):

1. The two heaviest graph plans at 10x data — copurchase PageRank (10
   Pregel rounds, one shuffle pair per round) and the degree-oriented
   triangle census (work bounded by sum(outdeg^2) ~ E^1.5). The clone
   corpus replicates the graph as 10 disjoint copies (keys shift per
   copy), so edges grow exactly 10x and near-linear time is the pass
   bar (<= ~3x). Edge counts are recorded alongside the times so a
   superlinear blowup can be attributed to data shape vs plan.
2. The CHEAP SRP production profile (design_cos 0.94, miss 1e-2 —
   half the LSH tables) at 10x, next to the tight adaptive gate
   re-baselined after the round-8 hamming-screen rederivation. Pass
   bar for the cheap profile: <= ~3x warm (the tight contract paid
   7.07x in r7).
3. Adversarial CMS data shape: lineitem.l_partkey redistributed
   zipf(1.5) so the hottest key owns ~38% of all rows (overestimate
   mass concentrates in the hot cells). Records the measured
   estimate-vs-exact gaps against the eps = e/w one-sided bound and
   the runtime vs the uniform corpus.

Prereq: /tmp/scaleprobe/sf1.0 from tools/make_scale_data.py.
Writes BENCH_SCALE_r08.json.
"""

from __future__ import annotations

import json
import math
import os
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

ZIPF_DIR = "/tmp/scaleprobe/sf0.1zipf"
ZIPF_KEYS = 5_000
ZIPF_S = 1.5


def make_zipf_corpus() -> None:
    """sf0.1 clone with lineitem.l_partkey reassigned by a deterministic
    zipf(1.5) draw over 5000 keys (md5 of (orderkey, linenumber) ->
    uniform -> inverse CDF): p(1) ~ 1/zeta(1.5) ~ 0.387 of ALL rows."""
    import duckdb
    import numpy as np
    import pandas as pd

    os.makedirs(ZIPF_DIR, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "events", "documents", "embeddings",
    ]:
        dst = f"{ZIPF_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    dst = f"{ZIPF_DIR}/lineitem.parquet"
    if os.path.exists(dst):
        return
    w = 1.0 / np.arange(1, ZIPF_KEYS + 1, dtype=float) ** ZIPF_S
    cum = np.cumsum(w) / w.sum()
    li = con.execute(
        f"""SELECT *, ('0x' || substr(md5('zipf:' || l_orderkey::VARCHAR ||
            ':' || l_linenumber::VARCHAR), 1, 15))::BIGINT % 1000000 AS _u
            FROM read_parquet('{src}/lineitem.parquet')"""
    ).df()
    u = li.pop("_u").to_numpy(float) / 1_000_000.0
    li["l_partkey"] = (np.searchsorted(cum, u, side="right") + 1).astype(
        li["l_partkey"].dtype
    )
    con.register("li_zipf", li)
    con.execute(f"COPY (SELECT * FROM li_zipf) TO '{dst}' (FORMAT PARQUET)")


PROBES_10X = [
    (
        "copurchase_pagerank_top20",
        "10 Pregel rounds, one shuffle pair per round, localCheckpoint"
        " truncation; clone corpus = 10 disjoint graph copies",
    ),
    (
        "copurchase_triangle_count",
        "degree-oriented wedge join, work ~ sum(outdeg^2) = O(E^1.5)",
    ),
    (
        "srp_knn_join_production_gate",
        "cheap (0.94, 1e-2) profile: half the LSH tables; bar <= ~3x",
    ),
    (
        "srp_knn_join_adaptive_gate",
        "tight (0.94, 1e-4) contract, re-baselined after the round-8"
        " screen_cos=0.85 rederivation (r7: 7.07x)",
    ),
]

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]


def edge_count(sf_dir: str) -> int:
    import duckdb

    return duckdb.connect().execute(
        f"""WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM read_parquet('{sf_dir}/lineitem.parquet') WHERE l_quantity >= 30
)
SELECT count(*) FROM (
  SELECT DISTINCT a.p, b.p FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
)"""
    ).fetchone()[0]


def main() -> None:
    registry.load_all()
    make_zipf_corpus()
    spark = get_spark("scale_probe_r8")
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
    for sf, sf_dir in SFS:
        key = f"edges_sf{sf}"
        out["copurchase_pagerank_top20"][key] = edge_count(sf_dir)
        out["copurchase_triangle_count"][key] = out[
            "copurchase_pagerank_top20"
        ][key]

    # CMS adversarial shape: zipf(1.5) partkeys vs the uniform corpus
    cms: dict[str, dict] = {}
    for label, sf_dir in [
        ("uniform", "/root/testdata/sf0.1"),
        ("zipf15", ZIPF_DIR),
    ]:
        fn = registry.QUERIES["countmin_heavy_hitters_check"]
        ts = []
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        import duckdb

        n_rows = duckdb.connect().execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/lineitem.parquet')"
        ).fetchone()[0]
        over = [r["overestimate"] for r in rows]
        top_share = max(r["exact_count"] for r in rows) / n_rows
        eps_bound = math.e / 256 * n_rows
        cms[label] = {
            "times": ts,
            "n_stream": n_rows,
            "top_key_share": round(top_share, 4),
            "max_overestimate": max(over),
            "mean_overestimate": round(sum(over) / len(over), 1),
            "eps_e_over_w_bound": round(eps_bound, 1),
            "max_over_vs_bound": round(max(over) / eps_bound, 4),
        }
        print(f"cms {label}: {cms[label]}", flush=True)
    cms["ratio_zipf_vs_uniform_warm"] = round(
        cms["zipf15"]["times"][1] / cms["uniform"]["times"][1], 2
    )
    out["countmin_zipf15_adversarial_probe"] = {
        "posture": "d=4 x w=256 sketch under zipf(1.5) keys: hot key owns"
        " ~38% of rows; one-sided error must stay inside eps=e/w",
        **cms,
    }

    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r08.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
