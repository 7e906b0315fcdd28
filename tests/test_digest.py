"""Corpus digest operator: one budgeted preview across conversations."""

from __future__ import annotations

from headson_spark.operators.digest import corpus_digest


def test_corpus_digest_budget_and_sections(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path).filter(
        "conv_id like 'cplain%' or conv_id like 'cesc%'")
    out = corpus_digest(df, global_budget=1500, max_conversations=6)
    assert len(out.encode("utf-8")) <= 1500
    assert out.count("==> ") >= 2, out[:200]


def test_corpus_digest_omitted_conversations_marker(spark,
                                                    transcripts_path):
    df = spark.read.parquet(transcripts_path).filter(
        "conv_id like 'cplain%'")
    n = df.select("conv_id").distinct().count()
    out = corpus_digest(df, global_budget=800, max_conversations=3,
                        style="default")
    assert len(out.encode("utf-8")) <= 800
    if n > 3:
        # conversations beyond max_conversations aren't in the fileset:
        # sections only for the included ones
        assert out.count("==> ") <= 3 + 1


def test_corpus_digest_empty(spark):
    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")
    assert corpus_digest(df) == ""
