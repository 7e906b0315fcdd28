"""Supplementary per-query benchmark (guide §1.4): noop-sink isolation
for individual registry queries plus .explain("formatted") capture.

The driver contract lives in bench.py (FROZEN); this file exists so the
optimization rounds can cite per-query before/after numbers and commit
plan files without touching the measured harness.

Usage:
    python bench_extra.py [query ...]              # time listed queries
    python bench_extra.py --plans [query ...]      # dump plans only
    python bench_extra.py --reps 3 [query ...]     # min-of-N (default 2)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "")


def main():
    from headson_spark.session import get_spark
    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:]]
    plans_only = "--plans" in args
    args = [a for a in args if a != "--plans"]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]

    spark = get_spark("headson_spark_bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("WARN")

    queries = entrymod.queries()
    names = args or list(queries)
    timings: dict[str, float] = {}
    for name in names:
        df = queries[name](spark, SF_DIR)
        if PLAN_DIR:
            os.makedirs(PLAN_DIR, exist_ok=True)
            with open(os.path.join(PLAN_DIR, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if plans_only:
            continue
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[name] = min(runs)
        print(f"## {name}: min={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "reps": reps,
                      "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
