"""Capture `.explain('formatted')` for the named queries into
plans/r12/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans_r12.py before q1,q2,...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_carprice_assignment_spark import registry  # noqa: E402
from bigdata_carprice_assignment_spark.plans.explain import formatted_plan  # noqa: E402
from bigdata_carprice_assignment_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    registry.load_all()
    spark = get_spark("capture_plans_r12")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        (out_dir / f"{name}_{tag}.txt").write_text(formatted_plan(df))
        print("wrote", name, tag, flush=True)


if __name__ == "__main__":
    main()
