#!/usr/bin/env python
"""Idle-box A/B helper: time a list of queries with the bench
methodology (noop sink, q01 + per-query warm-up, min over reps) in THIS
checkout and print one JSON line. Run it alternately from two
checkouts (e.g. a pristine HEAD worktree vs the working tree) to get
interleaved A/B/A/B process reps whose mins are comparable.

    python ab_bench.py q105_triangle_counts q80_kmeans_clustering
    python ab_bench.py --reps 3 --tag new q105_triangle_counts

Used for the round-11 before/after evidence and the q78/q124/q140
noise adjudication (round-10 VERDICT #7); tooling only, nothing in any
query path changes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from graphragpart1datapipeline_spark.session import get_spark

    args = sys.argv[1:]
    reps = 3
    tag = os.path.basename(os.path.dirname(os.path.abspath(__file__)))
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"graphrag-ab-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["q01_pricing_summary"](spark, sf_dir))
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        run(queries[name](spark, sf_dir))
        best = time.perf_counter() - t0  # warm run is a valid sample
        for _ in range(reps):
            t0 = time.perf_counter()
            run(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
