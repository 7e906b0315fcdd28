"""Streaming ingestion-time deduplication.

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus are duplicates"; an INGESTION pipeline wants the stream-side
complement: drop a document the moment it arrives if its content was
already seen, with bounded state. That is exactly Spark's
`dropDuplicatesWithinWatermark` shape (state = one row per distinct key,
expired once the watermark passes the key's event time + delay), so the
operator composes built-ins — no custom stateful code, and the state
store bounds memory by the watermark horizon rather than corpus size.

Scale notes (100 TB ingest):
- state holds one (16-byte md5, timestamp) row per DISTINCT content
  key inside the dedup horizon — a day-long horizon over a 1B-doc/day
  feed is ~50 GB of state across the cluster, the standard RocksDB
  state-store regime; the horizon knob trades memory for recall of
  slow duplicates.
- the content hash is computed scan-side (one md5 per doc, same digest
  the batch path uses), so exact-duplicate detection costs one narrow
  shuffle on the hash key.
- this drops EXACT (normalized) duplicates only; near-dup streaming
  requires the LSH bucket join against a materialized index (the batch
  lsh_candidate_pairs path run incrementally), deliberately out of
  scope for the ingest-time primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import normalized


def streaming_dedup_exact(stream_df: DataFrame, *,
                          watermark: str = "1 day",
                          text_col: str = "text",
                          ts_col: str = "ts",
                          keep_hash: bool = False) -> DataFrame:
    """Drop rows whose normalized content was already seen within the
    watermark horizon. First arrival wins (arrival order within a
    micro-batch is engine-chosen for same-batch duplicates — exactly the
    dropDuplicatesWithinWatermark contract); later duplicates are
    filtered before they reach downstream operators/sinks.

    Returns the input columns (plus `content_hash` when keep_hash) with
    duplicate rows removed."""
    hashed = stream_df.withColumn(
        "content_hash", F.md5(normalized(text_col)))
    out = (hashed
           .withWatermark(ts_col, watermark)
           .dropDuplicatesWithinWatermark(["content_hash"]))
    return out if keep_hash else out.drop("content_hash")
