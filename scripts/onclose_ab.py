"""A/B harness for the streaming_500k bench rows: replicates bench.py's
exact protocol (500k head of the sf0.1 bench fixture, fresh
checkpoint/sink per rep, availableNow) with tunable knobs, so bucket
count / files-per-trigger / emit-policy levers are measured under the
same conditions the driver records.

Usage: python scripts/onclose_ab.py "label:nb:mfpt:policy" ... -> JSON
e.g. python scripts/onclose_ab.py base:512:1:on_close big:512:2:on_close
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))


def main():
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    from headson_spark.session import get_spark
    from headson_spark.sources.transcripts import ensure_transcripts
    from headson_spark.streaming.engine import KeyedParquetSink, run_stream

    spark = get_spark("onclose_ab", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    tpath = ensure_transcripts(sf=0.1, bulk_turns=1_000_000)
    stmp = tempfile.mkdtemp(prefix="onclose_ab_")
    sn = 500_000
    head = ds.dataset(tpath).head(sn)

    configs = []
    for arg in sys.argv[1:]:
        label, nb, mfpt, policy = arg.split(":")
        configs.append((label, int(nb) or None, int(mfpt) or None, policy))
    if not configs:
        configs = [("base", 512, 1, "on_close")]

    out = {}
    for label, nb, mfpt, policy in configs:
        # chunk layout: MFPT consumes files per micro-batch; always write
        # 2 files (the bench layout) so mfpt=1 -> 2 batches, 2 -> 1 batch
        ssrc = os.path.join(stmp, f"src_{label}")
        os.makedirs(ssrc, exist_ok=True)
        chunk = (sn + 1) // 2
        for i in range(2):
            c = head.slice(i * chunk, chunk)
            if c.num_rows:
                pq.write_table(c, os.path.join(ssrc, f"c{i}.parquet"))
        runs = []
        for attempt in range(REPS):
            sink = KeyedParquetSink(
                os.path.join(stmp, f"sink_{label}_{attempt}"))
            t0 = time.time()
            q = run_stream(spark, ssrc, sink,
                           os.path.join(stmp, f"ckpt_{label}_{attempt}"),
                           budget=500, available_now=True,
                           session_gap_ms=7 * 24 * 3600 * 1000,
                           watermark="2 days",
                           max_files_per_trigger=mfpt,
                           n_buckets=nb, emit_policy=policy)
            q.awaitTermination(1200)
            runs.append(round(time.time() - t0, 3))
        best = min(runs)
        out[label] = {"sec": best, "tps": round(sn / best, 1),
                      "runs": runs}
        print(json.dumps({label: out[label]}), flush=True)
    shutil.rmtree(stmp, ignore_errors=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
