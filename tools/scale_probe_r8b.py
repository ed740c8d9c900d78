"""Round-8 follow-up probes (adversarial data shapes for the dedup and
streaming families):

1. Boilerplate explosion for MinHash banding: an sf0.1 documents clone
   where a deterministic 30% of docs have their text REPLACED by one
   shared boilerplate string — every one of those docs lands in the
   same LSH bucket in every band, the exact shape `max_bucket` exists
   for. Measures minhash_near_dup_documents time and the candidate
   population with and without the hot bucket, and records that the
   capped run stays bounded (the cap is a deliberate, logged drop of
   boilerplate buckets — not silent truncation of real near-dups).
2. The heaviest streaming replay (stream-stream attribution join) at
   10x data — watermark+horizon-bounded join state is the posture;
   near-linear growth is the pass bar.

Prereq: /tmp/scaleprobe/sf1.0. Writes BENCH_SCALE_r08b.json.
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

BOILER_DIR = "/tmp/scaleprobe/sf0.1boiler"


def make_boiler_corpus() -> None:
    """sf0.1 clone; md5-chosen 30% of documents get one shared
    boilerplate text (long enough to shingle identically)."""
    import duckdb

    os.makedirs(BOILER_DIR, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        dst = f"{BOILER_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    dst = f"{BOILER_DIR}/documents.parquet"
    if os.path.exists(dst):
        return
    boiler = (
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact us at support example dot com "
        "privacy policy cookie settings copyright twenty twenty four "
    ) * 4
    con.execute(
        f"""COPY (
  SELECT * REPLACE (
    CASE WHEN ('0x' || substr(md5('boiler:' || doc_id), 1, 15))::BIGINT % 10 < 3
         THEN '{boiler}' ELSE text END AS text)
  FROM read_parquet('{src}/documents.parquet')
) TO '{dst}' (FORMAT PARQUET)"""
    )


def main() -> None:
    registry.load_all()
    make_boiler_corpus()
    spark = get_spark("scale_probe_r8b")
    out: dict[str, dict] = {}

    # --- minhash under boilerplate explosion ---
    mh: dict[str, dict] = {}
    for label, sf_dir in [
        ("uniform", "/root/testdata/sf0.1"),
        ("boiler30", BOILER_DIR),
    ]:
        fn = registry.QUERIES["minhash_near_dup_documents"]
        ts, rows = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        mh[label] = {
            "times": ts,
            "summary": {k: rows[0][k] for k in rows[0].asDict()},
        }
        print(f"minhash {label}: {mh[label]}", flush=True)
    mh["ratio_boiler_vs_uniform_warm"] = round(
        mh["boiler30"]["times"][1] / mh["uniform"]["times"][1], 2
    )
    out["minhash_boilerplate_probe"] = {
        "posture": "30% of docs share ONE text: every band's hottest bucket"
        " holds ~6k docs (~18M pairs if joined); max_bucket drops those"
        " buckets by design, so the exchange stays bounded",
        **mh,
    }

    # --- heaviest streaming replay at 10x ---
    st: dict[str, dict] = {}
    for sf, sf_dir in [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/scaleprobe/sf1.0")]:
        fn = registry.QUERIES["streaming_attribution_replay"]
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        st[f"sf{sf}"] = ts
        print(f"attribution sf{sf}: {ts}", flush=True)
    st["ratio_warm_10x"] = round(st["sf1.0"][1] / st["sf0.1"][1], 2)
    out["streaming_attribution_10x_probe"] = {
        "posture": "stream-stream interval join, watermark+horizon-bounded"
        " state; pass bar <= ~3x at 10x",
        **st,
    }

    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SCALE_r08b.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
