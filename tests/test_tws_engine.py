"""transformWithStateInPandas engine — gated on protobuf availability
(TWS's Python control channel needs it; absent in this sandbox)."""

from __future__ import annotations

import os

import pytest

try:
    from google.protobuf import descriptor  # noqa: F401
    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not HAVE_PROTOBUF,
    reason="transformWithStateInPandas requires protobuf "
           "(pyspark.sql.streaming.proto); not installed in this sandbox")


def test_tws_stream_matches_batch(spark, tmp_path):
    import pyarrow.parquet as pq
    from headson_spark.operators.preview import conversation_previews
    from headson_spark.sources.transcripts import generate_rows, to_arrow
    from headson_spark.streaming.engine import KeyedParquetSink
    from headson_spark.streaming.tws_engine import run_stream_tws

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    pq.write_table(to_arrow(generate_rows(0.01, tags=["late", "plain"])),
                   str(src / "a.parquet"))
    sink = KeyedParquetSink(str(tmp_path / "sink"))
    q = run_stream_tws(spark, str(src), sink, str(tmp_path / "ckpt"),
                       session_gap_ms=7 * 24 * 3600 * 1000,
                       watermark="2 days")
    q.awaitTermination(300)
    got = {r["conv_id"]: r["preview"]
           for r in sink.read_latest(spark).collect()}
    exp = {r["conv_id"]: r["preview"]
           for r in conversation_previews(
               spark.read.parquet(str(src)), budget=500).collect()}
    assert got == exp
