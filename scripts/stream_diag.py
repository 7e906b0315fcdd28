"""Diagnose the streaming on_change row: run the exact bench shape and
dump per-micro-batch durationMs / stateOperators metrics from
StreamingQueryProgress.

Usage: python scripts/stream_diag.py [n_buckets] [emit_policy] [mfpt]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nb = (None if len(sys.argv) > 1 and sys.argv[1] in ("none", "0")
      else int(sys.argv[1]) if len(sys.argv) > 1 else 512)
    policy = sys.argv[2] if len(sys.argv) > 2 else "on_change"
    mfpt = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    from headson_spark.session import get_spark
    from headson_spark.streaming.engine import KeyedParquetSink, run_stream

    spark = get_spark("stream_diag", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("WARN")

    tpath = "data/transcripts_sf1.0_b1000000_f32.parquet"
    stmp = tempfile.mkdtemp(prefix="stream_diag_")
    ssrc = os.path.join(stmp, "src")
    os.makedirs(ssrc)
    sn = 500_000
    chunk = (sn + 1) // 2
    tbl = ds.dataset(tpath).head(sn)
    for i in range(2):
        c = tbl.slice(i * chunk, chunk)
        if c.num_rows:
            pq.write_table(c, os.path.join(ssrc, f"c{i}.parquet"))

    for rep in range(2):
        sink = KeyedParquetSink(os.path.join(stmp, f"sink{rep}"))
        t0 = time.time()
        q = run_stream(spark, ssrc, sink, os.path.join(stmp, f"ckpt{rep}"),
                       budget=500, available_now=True,
                       session_gap_ms=7 * 24 * 3600 * 1000,
                       watermark="2 days", max_files_per_trigger=mfpt,
                       n_buckets=nb, emit_policy=policy)
        q.awaitTermination(1200)
        wall = time.time() - t0
        print(f"rep={rep} nb={nb} policy={policy} wall={wall:.2f}s "
              f"tps={sn / wall / 1000:.1f}k")
        for p in q.recentProgress:
            dur = p.get("durationMs", {})
            so = p.get("stateOperators", [{}])
            so0 = so[0] if so else {}
            print("  batch", p.get("batchId"),
                  "rows", p.get("numInputRows"),
                  json.dumps(dur),
                  "| state: commit", so0.get("commitTimeMs"),
                  "rows", so0.get("numRowsTotal"),
                  "updated", so0.get("numRowsUpdated"),
                  "mem", so0.get("memoryUsedBytes"))
    shutil.rmtree(stmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
