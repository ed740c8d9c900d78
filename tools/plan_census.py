"""Shuffle/codegen census over the HEADLINE workload: EXECUTES each
benched query at the probe SF and counts, in the final adaptive plan,
the operators that decide 100 TB behavior — shuffle exchanges,
broadcast exchanges, whole-stage-codegen spans, sort-merge vs broadcast
hash joins, and any row-at-a-time Python eval (must be zero outside the
Arrow batch paths).

Writes PLAN_CENSUS_r11.json: per-query counts plus distribution
summaries. Usage: python tools/plan_census.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402

def _count_executed(jplan) -> dict:
    """Walk the executed JVM plan tree counting the operators that run:
    AdaptiveSparkPlan descends into its FINAL plan, QueryStage wrappers
    descend into their materialized subplan, and InMemoryTableScan is a
    LEAF (the cached relation's lineage does not re-execute — the
    printed form inlines it recursively, which is why string-counting
    measured 1442 'exchanges' on a 6-stage plan)."""
    from collections import Counter

    counts: Counter = Counter()
    stack = [jplan]
    while stack:
        n = stack.pop()
        name = n.nodeName()
        counts[name.split(" ")[0]] += 1
        if name.startswith("InMemoryTableScan"):
            continue
        if name.startswith("AdaptiveSparkPlan"):
            stack.append(n.executedPlan())
            continue
        if "QueryStage" in name:
            try:
                stack.append(n.plan())
                continue
            except Exception:
                pass
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return dict(counts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import bench

    registry.load_all()
    spark = get_spark("plan_census")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    per: dict[str, dict] = {}
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            # EXECUTE first so AQE finalizes and pooled persists
            # materialize, then walk the tree (see _count_executed).
            df.collect()
            nodes = _count_executed(df._jdf.queryExecution().executedPlan())
        except Exception as e:
            per[name] = {"error": str(e)[:120]}
            continue
        per[name] = {
            "shuffle_exchanges": nodes.get("Exchange", 0),
            "broadcast_exchanges": nodes.get("BroadcastExchange", 0),
            "codegen_spans": nodes.get("WholeStageCodegen", 0),
            "sort_merge_joins": nodes.get("SortMergeJoin", 0),
            "broadcast_hash_joins": nodes.get("BroadcastHashJoin", 0)
            + nodes.get("BroadcastNestedLoopJoin", 0),
            "python_row_eval": nodes.get("BatchEvalPython", 0),
            "arrow_eval": nodes.get("ArrowEvalPython", 0)
            + nodes.get("MapInPandas", 0)
            + nodes.get("FlatMapGroupsInPandas", 0),
            "cached_scans": nodes.get("InMemoryTableScan", 0),
        }
    ok = {n: c for n, c in per.items() if "error" not in c}
    dist = Counter(c["shuffle_exchanges"] for c in ok.values())
    summary = {
        "n_queries": len(ok),
        "shuffle_exchange_distribution": dict(sorted(dist.items())),
        "total_python_row_eval": sum(c["python_row_eval"] for c in ok.values()),
        "queries_with_row_eval": [
            n for n, c in ok.items() if c["python_row_eval"]
        ],
        "arrow_eval_queries": sum(1 for c in ok.values() if c["arrow_eval"]),
        "max_shuffles": max(
            ok.items(), key=lambda kv: kv[1]["shuffle_exchanges"]
        )[0],
        "errors": [n for n, c in per.items() if "error" in c],
    }
    out = {"summary": summary, "per_query": per}
    Path(__file__).resolve().parent.parent.joinpath(
        "PLAN_CENSUS_r11.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
