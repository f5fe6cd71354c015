#!/usr/bin/env python
"""Mechanical plan-hygiene sweep over EVERY registered query.

For each entry in ``__spark_entry__.queries()`` this builds the
DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.001 — plans don't change
shape with SF) and inspects the OPTIMIZED plan for the two classes of
scale-killer that never belong in a production path:

- ``cartesian``: a true cross product whose cost is |L|·|R|
  (CartesianProduct / non-broadcast Join Cross). Broadcast
  nested-loop joins against 1-row stats frames are fine and NOT
  counted — every aggregate-stats crossJoin in the engine broadcasts.
- ``py_rowwise``: row-at-a-time Python (BatchEvalPython). Arrow-batched
  pandas UDFs (ArrowEvalPython) are the sanctioned seam and are
  REPORTED but not failed.

Output: one JSON line + ``PLAN_AUDIT.json`` with per-query counts of
shuffles (Exchange), broadcasts, arrow stages, and the violation
flags. ``--assert`` exits non-zero if any query outside the documented
ALLOWLIST shows a cartesian or any query at all shows row-wise Python.

The allowlist is the set of EXACT-pair-space correctness oracles whose
whole point is the brute-force cross (their bucketed twins are the
scale paths): q36/q65 (vs q53/q66), q122/q151/q156/q158/q161-163
(brute-force ER verification happens in their DuckDB oracles, not
here — listed only if their Spark plan crosses), plus 1-row-driver
crosses that Catalyst plans as CartesianProduct at tiny sizes.
Run: ``python plan_audit.py [--assert]``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Exact/brute-force correctness oracles — the documented quadratic
# twins of bucketed scale paths. A cartesian HERE is the operator's
# contract; anywhere else it's a regression.
CARTESIAN_ALLOWLIST = {
    "q36_embedding_near_dup",   # exact all-pairs twin of q53
    "q65_knn_join",             # exact all-pairs twin of q66
}

# Streaming queries START a query on build (memory-sink drain) and are
# audited on the final batch table instead of skipped.
def main() -> None:
    do_assert = "--assert" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as em
    from graphragpart1datapipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    failures: list[str] = []
    for name, fn in sorted(em.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            phys = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # audit must cover everything or say why
            report[name] = {"error": str(e)[:200]}
            failures.append(f"{name}: build error")
            continue
        cartesian = phys.count("CartesianProduct")
        rowwise = phys.count("BatchEvalPython")
        entry = {
            "shuffles": phys.count("Exchange"),
            "broadcasts": phys.count("BroadcastExchange"),
            "arrow_python": phys.count("ArrowEvalPython"),
            "cartesian": cartesian,
            "py_rowwise": rowwise,
        }
        if cartesian and name not in CARTESIAN_ALLOWLIST:
            entry["violation"] = "cartesian"
            failures.append(f"{name}: cartesian")
        if rowwise:
            entry["violation"] = "py_rowwise"
            failures.append(f"{name}: row-wise Python")
        report[name] = entry
        del plan
    out = {
        "sf_dir": sf_dir,
        "queries": len(report),
        "violations": failures,
        "totals": {
            k: sum(e.get(k, 0) for e in report.values())
            for k in ("shuffles", "broadcasts", "arrow_python",
                      "cartesian", "py_rowwise")
        },
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "PLAN_AUDIT.json"),
        "w",
    ) as f:
        json.dump({"summary": out, "per_query": report}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(out))
    spark.stop()
    if do_assert and failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
