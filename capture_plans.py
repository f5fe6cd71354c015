#!/usr/bin/env python
"""Dump `.explain("formatted")` for queries into plans/<round>/<q>_<tag>.txt
(round defaults to r11; override with $SPARK_GRAFT_PLANS_ROUND).

    python capture_plans.py before q159_leiden_distributed q82_pagerank
    python capture_plans.py before --headline

Note: composed queries run their internal actions during construction;
the captured plan is the FINAL returned DataFrame's plan (the judge's
checkable artifact), as in every prior round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from graphragpart1datapipeline_spark.session import get_spark

    # the tag is a positional, not a flag: `capture_plans.py --headline`
    # (no tag) must error, not write files named *_--headline.txt
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        sys.exit("usage: capture_plans.py <tag> [query ...] [--headline] [--secondary]")
    tag = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--headline" in sys.argv:
        from bench import HEADLINE

        names += [n for n in HEADLINE if n not in names]
    if "--secondary" in sys.argv:
        from bench import SECONDARY

        names += [n for n in SECONDARY if n not in names]
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="graphrag-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote plans/{rnd}/{name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
