"""Round-10 scale probe (VERDICT r9 ask #1): re-price the SRP gates at
10x on a CONSTANT-DUP-FRACTION corpus with salted near-dups.

The r9 closure (1.62x tight / 2.41x cheap, BENCH_SCALE_r09) ran on ten
verbatim clones — the dedup-before-ANN path collapsed the probe to
4,992 distinct vectors, so the banding stage never saw the 10x. This
probe's corpora (tools/make_dupfrac_scale_data.py) hold the duplication
RATE fixed at 20% while dups are near-identical (cosine ~0.97+, one
junk token appended), so the grouped path cannot collapse anything and
every near-dup pair is a real banding candidate at both scales. This
is the corpus family the ~n^1.15 candidate-growth claim (SCALE.md r9
addendum) is about; the probe measures that exponent directly by
counting the candidate pairs the tight adaptive profile emits.

Pass bars (VERDICT r9 "Done ="): tight <= ~4x warm at 10x; gates stay
hash-green at the driver SFs (driver window re-checks them in r10).

Prereq: python tools/make_dupfrac_scale_data.py
Writes BENCH_SCALE_r10.json.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402
from bigdata_carprice_assignment_spark.llm import similarity as S  # noqa: E402

PROBES = [
    (
        "srp_knn_join_adaptive_gate",
        "tight (0.94, 1e-4) contract on 20%-salted-dup data; bar <= ~4x"
        " (r9 clone-corpus probe: 1.62x, flattered by the grouped"
        " collapse; one-exchange restructure alone: 5.69x)",
    ),
    (
        "srp_knn_join_production_gate",
        "cheap (0.94, 1e-2) profile, half the tables, same corpus",
    ),
]

SFS = [("1x", "/tmp/scaleprobe/dupfrac1x"), ("10x", "/tmp/scaleprobe/dupfrac10x")]


def tight_candidate_count(spark, sf_dir: str) -> dict:
    """Candidate pairs the tight adaptive profile feeds its rerank at
    this corpus size — the quantity the ~n^1.15 claim bounds. Mirrors
    srp_knn_join's adaptive wide path (bits from n, bands from bits,
    6-sigma hamming screen at screen_cos=0.85), ungrouped (the corpus
    has no identical vectors by construction)."""
    from bigdata_carprice_assignment_spark.queries import llmdata as L

    feats = L._hashed_doc_features(spark, sf_dir)
    n = feats.count()
    band_bits = S.srp_adaptive_band_bits(n)
    n_bands = S.srp_adaptive_bands(band_bits, design_cos=0.94, miss=1e-4)
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
    spark = get_spark("scale_probe_r10")
    out: dict[str, dict] = {}
    cand: dict[str, dict] = {}
    for sf, sf_dir in SFS:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name, posture in PROBES:
            fn = registry.QUERIES[name]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(round(time.perf_counter() - t0, 3))
            out.setdefault(name, {"posture": posture})[f"sf{sf}"] = ts
            print(f"{sf} {name}: {ts}", flush=True)
        cand[sf] = tight_candidate_count(spark, sf_dir)
        print(f"{sf} tight candidates: {cand[sf]}", flush=True)
    for name, rec in out.items():
        rec["ratio_warm_10x"] = round(
            min(rec["sf10x"][1:]) / min(rec["sf1x"][1:]), 2
        )
        rec["ratio_cold_10x"] = round(rec["sf10x"][0] / rec["sf1x"][0], 2)
    growth = cand["10x"]["candidates"] / max(cand["1x"]["candidates"], 1)
    exponent = math.log10(max(growth, 1e-12))  # per 10x data
    artifact = {
        "probe": "r10 SRP at 10x, constant 20% salted-near-dup fraction",
        "corpus": "tools/make_dupfrac_scale_data.py (no identical vectors;"
        " dup cosine >= ~0.97; 80% mutually-distinct docs)",
        "results": out,
        "tight_candidates": cand,
        "candidate_growth_10x": round(growth, 2),
        "candidate_growth_exponent": round(exponent, 3),
        "claim": "SCALE.md r9 addendum: candidates ~ n^1.15 on a"
        " constant-dup-fraction corpus",
    }
    Path("/root/repo/BENCH_SCALE_r10.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
