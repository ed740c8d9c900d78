"""Skewed-key probe for ``exact_percentiles_distributed_grouped``
(round-5 VERDICT ask #7): does the per-group cumulative hotspot when one
group holds 50% of all rows?

Setup: lineitem@sf0.1 l_extendedprice (~600k rows, near-unique values —
the adversarial case: per-group distinct-value cardinality tracks row
count). Two synthetic groupings of the SAME rows:
  uniform — 32 equal hash groups;
  skewed  — group 0 holds ~50% of rows, the rest spread over 31 groups.
Gate: skewed time ≤ 2× uniform time (both after one untimed warm run).

Writes/updates BENCH_SCALE_r06.json with the probe rows.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_carprice_assignment_spark.operators.aggregates import (  # noqa: E402
    exact_percentiles_distributed_grouped,
)
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

PROBS = [0.25, 0.5, 0.75, 0.95]


def timed(df) -> float:
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew_probe")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    h = F.pmod(F.xxhash64("l_orderkey"), F.lit(64))
    uniform = li.withColumn("grp", F.pmod(h, F.lit(32)))
    skewed = li.withColumn(
        "grp", F.when(h < 32, F.lit(0)).otherwise(F.pmod(h, F.lit(31)) + 1)
    )
    n = li.count()
    results: dict[str, float] = {}
    for label, df in [("uniform", uniform), ("skewed", skewed)]:
        q = exact_percentiles_distributed_grouped(
            df, "l_extendedprice", "grp", PROBS
        )
        timed(q)  # untimed warm (scan cache, codegen)
        results[label] = timed(
            exact_percentiles_distributed_grouped(
                df, "l_extendedprice", "grp", PROBS
            )
        )
        print(label, results[label], "sec", flush=True)
    ratio = round(results["skewed"] / results["uniform"], 3)
    print("skew/uniform ratio:", ratio, "(gate: <=2.0)")
    out = Path(__file__).resolve().parent.parent / "BENCH_SCALE_r06.json"
    payload = json.loads(out.read_text()) if out.exists() else {}
    payload["grouped_quantiles_skew_probe"] = {
        "sf_dir": sf_dir,
        "n_rows": n,
        "uniform_sec": results["uniform"],
        "skewed_sec": results["skewed"],
        "ratio": ratio,
        "gate": "skewed <= 2x uniform",
        "pass": ratio <= 2.0,
    }
    out.write_text(json.dumps(payload, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
