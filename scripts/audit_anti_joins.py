#!/usr/bin/env python
"""Registry-wide SortMergeJoin LeftAnti/LeftSemi audit (round-7 finding,
made mechanical and re-runnable for the standing plan-shape test).

A drop-list anti join that sort-merges shuffles its PROBE side by the
join key — fatal when the probe side carries document text at 100 TB and
the drop list is small by nature (broadcast-eligible). The round-7 audit
fixed the two text-carrying offenders (curation v8, training-data
pipeline) and adjudicated the remaining SMJ anti/semi joins as correctly
big-big (graph peeling rounds join 8-byte ids whose survivor sets can be
graph-sized; TPC-H Q21 is lineitem-vs-lineitem by construction).

This script rebuilds every gate's physical plan and prints the gates
whose plans carry an SMJ anti/semi join. tests/test_plan_shapes.py pins
the output against the adjudicated allowlist so a Catalyst/AQE change
that flips a join either way fails loudly.

Usage: python scripts/audit_anti_joins.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMJ_ANTI_SEMI = re.compile(r"SortMergeJoin.*(LeftAnti|LeftSemi)")


def smj_anti_semi_lines(plan: str) -> list[str]:
    return [ln.strip() for ln in plan.splitlines() if SMJ_ANTI_SEMI.search(ln)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from csv2db_spark import get_spark
    from csv2db_spark.registry import load_all_queries

    spark = get_spark("anti-join-audit")
    spark.sparkContext.setLogLevel("ERROR")

    hits: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, qd in load_all_queries().items():
        try:
            plan = (
                qd.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001
            errs[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
            continue
        lines = smj_anti_semi_lines(plan)
        if lines:
            hits[name] = lines
            print(f"{name}: {len(lines)} SMJ anti/semi", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "hits": hits, "errors": errs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
