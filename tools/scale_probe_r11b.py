"""Round-11 SRP contract-vs-cost curve (VERDICT r10 Next #4): the r10
probe priced the TIGHT (design_cos 0.94, miss 1e-4) adaptive contract
at 4.36x warm per 10x docs on the constant-20%-salted-near-dup corpus
(bar was ~4x) and the cheap (0.94, 1e-2) profile at 1.88x, with the
buy-down knob documented but unmeasured. This probe measures the knob:
three contract points on the SAME corpora, each with its candidate
volume, adaptive band count, 10x warm ratio, and an sf0.01 recall
check against the brute-force DuckDB top-1 oracle — so a 100 TB
operator picks a point on a MEASURED (contract, candidates, wall)
curve instead of a claimed one.

Prereq: python tools/make_dupfrac_scale_data.py
Writes BENCH_SCALE_r11b.json.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402
from bigdata_carprice_assignment_spark.llm import similarity as S  # noqa: E402

CONTRACTS = [
    ("tight", 0.94, 1e-4),
    ("mid", 0.94, 1e-3),
    ("cheap", 0.94, 1e-2),
]

SFS = [("1x", "/tmp/scaleprobe/dupfrac1x"), ("10x", "/tmp/scaleprobe/dupfrac10x")]


def gate_df(spark, sf_dir: str, design_cos: float, miss: float):
    """The adaptive-gate pipeline at an explicit (design_cos, miss)
    contract — identical shape to srp_knn_join_adaptive_gate /
    _production_gate, which pin the tight and cheap points."""
    from bigdata_carprice_assignment_spark.queries import llmdata as L

    feats = L._hashed_doc_features(spark, sf_dir)
    stats = L._corpus_vec_stats(spark, sf_dir)
    top1 = S.srp_knn_join(
        feats, "feat", "doc_id", k=1, band_bits=None,
        design_cos=design_cos, miss=miss,
        n_docs_stat=stats["n_docs"], n_distinct_stat=stats["n_distinct"],
    )
    return (
        top1.filter(F.col("cosine") >= 0.85)
        .select("doc_id", "nn_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("doc_id")
    )


def candidate_count(spark, sf_dir: str, design_cos: float, miss: float) -> dict:
    """Candidate pairs this contract feeds its rerank at this corpus
    size — mirrors srp_knn_join's adaptive wide path (bits from n,
    bands from (bits, contract), 6-sigma hamming screen at
    screen_cos=0.85), ungrouped (no identical vectors by construction)."""
    from bigdata_carprice_assignment_spark.queries import llmdata as L

    feats = L._hashed_doc_features(spark, sf_dir)
    n = L._corpus_vec_stats(spark, sf_dir)["n_docs"]
    band_bits = S.srp_adaptive_band_bits(n)
    n_bands = S.srp_adaptive_bands(band_bits, design_cos=design_cos, miss=miss)
    per_word = max(1, 60 // band_bits)
    n_words = max(1, -(-n_bands // per_word))
    wide_bits = n_words * 60
    p_screen = math.acos(0.85) / math.pi
    thr = math.ceil(
        wide_bits * p_screen
        + 6.0 * math.sqrt(wide_bits * p_screen * (1.0 - p_screen))
    )
    sigs = S.srp_signatures_wide(feats, "feat", "doc_id", wide_bits)
    cands = S.srp_band_pairs_wide(
        sigs, "doc_id", wide_bits, band_bits, max_bucket=2000, max_hamming=thr
    ).count()
    return {
        "n_docs": n,
        "band_bits": band_bits,
        "n_bands": n_bands,
        "candidates": cands,
    }


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r11b")

    # recall check first (sf0.01 driver corpus): every contract point on
    # the curve must still reproduce the brute-force top-1 — a cheap row
    # that sheds recall is not a point on the same curve
    sys.path.insert(0, "/root/repo/tests")
    from oracle_harness import compare, run_oracle  # noqa: E402
    from bigdata_carprice_assignment_spark.queries.llmdata import (  # noqa: E402
        _KNN_TOP1_ORACLE,
    )

    recall: dict[str, str] = {}
    oracle = run_oracle(_KNN_TOP1_ORACLE, "/root/testdata/sf0.01")
    for label, dc, miss in CONTRACTS:
        probs = compare(
            gate_df(spark, "/root/testdata/sf0.01", dc, miss), oracle, label
        )
        recall[label] = "green" if not probs else f"RED: {probs[:2]}"
        print(f"recall sf0.01 {label}: {recall[label]}", flush=True)

    out: dict[str, dict] = {}
    for label, dc, miss in CONTRACTS:
        rec = out.setdefault(
            label, {"design_cos": dc, "miss": miss, "oracle_sf0.01": recall[label]}
        )
        for sf, sf_dir in SFS:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                gate_df(spark, sf_dir, dc, miss).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            rec[f"sf{sf}"] = ts
            print(f"{label} {sf}: {ts}", flush=True)
            rec[f"cand_{sf}"] = candidate_count(spark, sf_dir, dc, miss)
            print(f"{label} {sf} candidates: {rec[f'cand_{sf}']}", flush=True)
        rec["ratio_warm_10x"] = round(
            min(rec["sf10x"][1:]) / min(rec["sf1x"][1:]), 2
        )
        rec["candidate_growth_10x"] = round(
            rec["cand_10x"]["candidates"] / max(rec["cand_1x"]["candidates"], 1), 2
        )
    artifact = {
        "probe": "r11 SRP contract-vs-cost curve at 10x, constant 20%"
        " salted-near-dup fraction (same corpora as BENCH_SCALE_r10)",
        "corpus": "tools/make_dupfrac_scale_data.py",
        "contracts": out,
        "reading": "each row: (design_cos, miss) -> bands, candidates,"
        " 10x warm ratio, sf0.01 recall — the documented buy-down knob"
        " (VERDICT r10 watch item) as a measured curve",
    }
    Path("/root/repo/BENCH_SCALE_r11b.json").write_text(
        json.dumps(artifact, indent=1) + "\n"
    )
    print(json.dumps(artifact, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
