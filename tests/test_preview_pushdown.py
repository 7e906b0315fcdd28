"""Pushdown preview pipeline == full-shuffle pipeline, byte-for-byte,
while shipping only the sampler keep-set through the shuffle. As of round
2 `conversation_previews` dispatches to the pushdown plan for
balanced/head skew, so the A/B here is explicit full vs pushdown."""

from __future__ import annotations

import pytest

from headson_spark.operators.preview import (conversation_previews,
                                             conversation_previews_full,
                                             conversation_previews_pushdown)


@pytest.fixture(scope="module")
def tdf(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


@pytest.mark.parametrize("skew", ["balanced", "head"])
@pytest.mark.parametrize("budget", [120, 500])
def test_pushdown_equals_full(spark, tdf, skew, budget):
    a = {r["conv_id"]: (r["preview"], r["n_turns"])
         for r in conversation_previews_full(
             tdf, budget=budget, skew=skew).collect()}
    b = {r["conv_id"]: (r["preview"], r["n_turns"])
         for r in conversation_previews_pushdown(
             tdf, budget=budget, skew=skew).collect()}
    assert set(a) == set(b)
    diffs = [k for k in a if a[k] != b[k]]
    assert not diffs, (diffs[:3], a[diffs[0]], b[diffs[0]]) if diffs else ""


def test_default_dispatch_is_pushdown(spark, tdf):
    """The default entry point must produce the pushdown result (and the
    same bytes as the full pipeline)."""
    a = {r["conv_id"]: r["preview"]
         for r in conversation_previews(tdf, budget=300).collect()}
    b = {r["conv_id"]: r["preview"]
         for r in conversation_previews_pushdown(
             tdf, budget=300).collect()}
    assert a == b


def test_pushdown_tail_falls_back(spark, tdf):
    a = {r["conv_id"]: r["preview"]
         for r in conversation_previews_full(
             tdf, budget=300, skew="tail").collect()}
    b = {r["conv_id"]: r["preview"]
         for r in conversation_previews_pushdown(
             tdf, budget=300, skew="tail").collect()}
    assert a == b


def test_pushdown_reduces_shuffle_rows(spark, tdf):
    # the hot conversation (50k turns) must ship at most cap + dup rows
    from pyspark.sql import functions as F
    budget = 500
    cap = max(budget // 2, 1)
    hot = tdf.filter("conv_id = 'cskewhot_000000'")
    n_full = hot.count()
    from headson_spark.operators.sampling import default_kept_positions
    kept = hot.filter(F.col("turn_idx").isin(
        default_kept_positions(cap))).count()
    assert n_full == 50_000
    assert kept <= cap


def test_mega_conversation_spans_arrow_batches(spark, tdf):
    """A conversation larger than one Arrow batch must round-trip both
    pipelines identically: the full path's carry buffer has to stitch the
    conversation across batches, the pushdown path must bound what ever
    reaches pandas. Forces tiny batches so 50k turns span ~50 of them."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "1024")
    try:
        hot = tdf.filter(
            "conv_id in ('cskewhot_000000', 'cplain_000001')")
        a = {r["conv_id"]: (r["preview"], r["n_turns"])
             for r in conversation_previews_full(
                 hot, budget=500).collect()}
        b = {r["conv_id"]: (r["preview"], r["n_turns"])
             for r in conversation_previews_pushdown(
                 hot, budget=500).collect()}
    finally:
        spark.conf.set(key, old)
    assert a == b
    assert a["cskewhot_000000"][1] == 50_000
