"""Pushdown preview pipeline == standard pipeline, byte-for-byte, while
shipping only the sampler keep-set through the shuffle."""

from __future__ import annotations

import pytest

from headson_spark.operators.preview import (conversation_previews,
                                             conversation_previews_pushdown)


@pytest.fixture(scope="module")
def tdf(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


@pytest.mark.parametrize("skew", ["balanced", "head"])
@pytest.mark.parametrize("budget", [120, 500])
def test_pushdown_equals_standard(spark, tdf, skew, budget):
    a = {r["conv_id"]: (r["preview"], r["n_turns"])
         for r in conversation_previews(
             tdf, budget=budget, skew=skew).collect()}
    b = {r["conv_id"]: (r["preview"], r["n_turns"])
         for r in conversation_previews_pushdown(
             tdf, budget=budget, skew=skew).collect()}
    assert set(a) == set(b)
    diffs = [k for k in a if a[k] != b[k]]
    assert not diffs, (diffs[:3], a[diffs[0]], b[diffs[0]]) if diffs else ""


def test_pushdown_tail_falls_back(spark, tdf):
    a = {r["conv_id"]: r["preview"]
         for r in conversation_previews(
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
