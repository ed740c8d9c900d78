"""Round-9 vocab-growth probe (VERDICT r8, Next #7): the KMV sketch and
the Zipf dictionary under REAL vocabulary growth.

The round-8 10x probe used the clone corpus — 10x rows, ZERO new
vocabulary — so its "shuffle carries vocab-grain only" claim was never
stressed. This probe uses /tmp/scaleprobe/sf1.0vocab (from
tools/make_vocab_scale_data.py): 10x rows AND ~10x distinct shingles
(per-clone token suffixes; token counts identical to the clone corpus).

Stage decomposition for the KMV query: the linear tokenize+hash scan is
re-priced separately from the sketch stage (distinct + rank window at
vocab grain), so a blowup can be attributed to the scan vs the
vocab-grain exchange.

Writes BENCH_SCALE_r09b.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

PROBES = ["kmv_distinct_union_calibration", "vocab_zipf_top20"]
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0vocab", "/tmp/scaleprobe/sf1.0vocab")]


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r9b")
    out: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        # stage decomposition: price the pooled tokenize+shingle scan
        # (the shared linear prefix) on its own first
        from bigdata_carprice_assignment_spark.queries.llmdata import (
            _doc_shingles,
        )
        t0 = time.perf_counter()
        _doc_shingles(spark, sf_dir).count()
        scan = round(time.perf_counter() - t0, 3)
        out.setdefault("_tokenize_scan", {})[f"sf{sf}"] = scan
        print(f"sf{sf} tokenize_scan: {scan}", flush=True)
        for name in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {})[f"sf{sf}"] = ts
            print(f"sf{sf} {name}: {ts}", flush=True)
        # distinct-shingle count: proves the vocab actually grew
        import duckdb

        nv = duckdb.connect().execute(
            rf"""SELECT count(DISTINCT g) FROM (
  SELECT unnest(
    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
     for i in range(1, greatest(len(w) - 2, 0) + 1)]
  ) AS g
  FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE trim(text) <> '')
)"""
        ).fetchone()[0]
        out.setdefault("_distinct_shingles", {})[f"sf{sf}"] = int(nv)
        print(f"sf{sf} distinct_shingles: {nv}", flush=True)
    for name in PROBES + ["_tokenize_scan"]:
        rec = out[name]
        a, b = rec.get("sf0.1"), rec.get("sf1.0vocab")
        if a and b:
            if isinstance(a, list):
                rec["ratio_warm_10x"] = round(min(b[1:]) / min(a[1:]), 2)
            else:
                rec["ratio_10x"] = round(b / a, 2)
    artifact = {"probe": "r9 vocab-growth (10x rows AND ~10x shingles)", "results": out}
    Path("/root/repo/BENCH_SCALE_r09b.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )
    print(json.dumps(artifact, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
