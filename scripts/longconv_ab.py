"""Pushdown-vs-full preview A/B on the workload the pushdown plan exists
for: long conversations (default 2000 convs x 2000 turns, synthesized
in-Spark, deterministic). Prints one JSON line with best-of-3 wall times
for both plans after asserting byte-equality on a sample.

Measured 2026-08-16 (local[32], shared host): full 5.3 s best,
pushdown 3.9 s best — the exchange carries cap/len = 250/2000 of the
turns. At bench scale (16-turn conversations) the two plans are equal;
see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from headson_spark.session import get_spark
    from headson_spark.operators.preview import (
        conversation_previews, conversation_previews_full,
        conversation_previews_pushdown, conversation_previews_tail_pushdown)

    spark = get_spark("longconv_ab", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/longconv_{n_convs}x{turns}.parquet"
    if not os.path.exists(path):
        (spark.range(n_convs).selectExpr("concat('mega_', id) conv_id")
         .selectExpr("conv_id",
                     f"explode(sequence(0, {turns - 1})) turn_idx")
         .selectExpr("conv_id", "cast(turn_idx as int) turn_idx",
                     "case when turn_idx % 2 = 0 then 'user' "
                     "else 'assistant' end role",
                     "concat('line', turn_idx, ': ', repeat('word ', 12))"
                     " text",
                     "'' tool",
                     "timestamp_millis(1700000000000 + turn_idx * 1000)"
                     " ts")
         .repartition(cpus * 2).write.mode("overwrite").parquet(path))
    tdf = spark.read.parquet(path)
    n = tdf.count()

    sample = tdf.filter("conv_id in ('mega_0', 'mega_7')")
    a = {r["conv_id"]: r["preview"]
         for r in conversation_previews_full(sample, budget=500).collect()}
    b = {r["conv_id"]: r["preview"]
         for r in conversation_previews_pushdown(sample,
                                                 budget=500).collect()}
    assert a == b, "pushdown output diverged from full pipeline"
    at = {r["conv_id"]: r["preview"]
          for r in conversation_previews_full(sample, budget=500,
                                              skew="tail").collect()}
    bt = {r["conv_id"]: r["preview"]
          for r in conversation_previews_tail_pushdown(
              sample, budget=500).collect()}
    assert at == bt, "tail pushdown output diverged from full pipeline"

    def tail_full(d, **k):
        return conversation_previews_full(d, skew="tail", **k)

    result = {"metric": "longconv_pushdown_ab", "turns": n,
              "convs": n_convs, "turns_per_conv": turns, "cpus": cpus}
    # auto_sec includes the dispatcher's stats scan — on this shape it
    # must choose the pushdown plan and land within noise of pushdown_sec
    for name, f in (("full_sec", conversation_previews_full),
                    ("pushdown_sec", conversation_previews_pushdown),
                    ("auto_sec", conversation_previews),
                    ("tail_full_sec", tail_full),
                    ("tail_pushdown_sec",
                     conversation_previews_tail_pushdown)):
        runs = []
        for _ in range(3):
            t0 = time.time()
            f(tdf, budget=500).write.format("noop").mode(
                "overwrite").save()
            runs.append(time.time() - t0)
        result[name] = round(min(runs), 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
