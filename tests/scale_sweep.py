"""Oracle sweep at sf0.1 — 10× the driver's correctness scale.

The driver hash-checks at sf0.01; some bug classes only express at
larger data (this sweep caught two in round 3: nondeterministic range-
exchange boundary sampling corrupting `range_partitioned_cumsum`, and a
reassociation-noise flip on a 4-dp rounded average). Run before ending
a round:

    python tests/scale_sweep.py [sf_dir]

Skips the oracles whose DuckDB side is quadratic in the corpus (all-
pairs Jaccard/cosine ground truth — hours at sf0.1 document counts);
those pipelines' logic is scale-free and stays verified at sf0.01.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, run_oracle  # noqa: E402

QUADRATIC_ORACLES = {
    "minhash_lsh_recall_pairs",
    "simhash_hamming_pairs_exact",
    "embedding_near_dup_recall",
    "lsh_knn_join_top1",
    "ivf_knn_join_top1",
    "near_dup_keep_best",
    "exact_cosine_pairs_blocked",
    "semantic_dedup_prune_stats",
    "eval_contamination_check",
    "boilerplate_ngram_stats",
    "char_ngram_jaccard_pairs",
    "prefix_filter_jaccard_pairs",
    "cross_source_dup_matrix",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark()
    bad = 0
    for name in registry.ORACLES:
        if name in QUADRATIC_ORACLES:
            continue
        t0 = time.perf_counter()
        try:
            problems = compare(
                registry.QUERIES[name](spark, sf_dir),
                run_oracle(registry.ORACLES[name], sf_dir),
                name,
            )
            if problems:
                bad += 1
                print(f"{name}: MISMATCH")
                for p in problems[:4]:
                    print(f"    {p}")
            else:
                print(f"{name}: ok ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"\nbad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
