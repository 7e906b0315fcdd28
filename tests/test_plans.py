"""Physical-plan shape assertions: the scale properties we designed for
must be visible in the plan, not just hoped for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from headson_spark.operators.preview import conversation_previews
from headson_spark.plans.inspect import (count_exchanges,
                                         formatted_plan,
                                         has_broadcast_join,
                                         has_pushed_filters)
from headson_spark.plans.salting import (salted_head_prereduce,
                                         salted_tail_prereduce)
from headson_spark.operators.sampling import head_cap, tail_cap


@pytest.fixture(scope="module")
def tdf(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


def test_full_preview_pipeline_is_single_shuffle(spark, tdf):
    from headson_spark.operators.preview import conversation_previews_full
    df = conversation_previews_full(tdf, budget=300)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_pushdown_preview_filters_before_shuffle(spark, tdf):
    """Pushdown pipeline: the sampler keep-set must reach the parquet scan
    (PushedFilters on turn_idx), so the exchange carries O(cap) turns per
    conversation instead of all of them."""
    df = conversation_previews(tdf, budget=300, pushdown=True)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "turn_idx" in plan.split(
        "PushedFilters")[1].split("\n")[0], plan


def test_filter_pushdown_reaches_scan(spark, transcripts_path):
    df = (spark.read.parquet(transcripts_path)
          .filter(F.col("conv_id") == "cplain_000001")
          .select("conv_id", "turn_idx"))
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id" in plan
    # column pruning: only the 2 projected columns in ReadSchema
    assert "text" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_broadcast_join_for_small_dim(spark):
    import __spark_entry__ as em
    df = em.queries()["join_top_customers"](spark, "/root/testdata/sf0.001")
    assert has_broadcast_join(df)


def test_salted_head_prereduce_equivalent(spark, tdf):
    cap = 7
    hot = tdf.filter("conv_id like 'cskewhot%' or conv_id like 'cbig%'")
    direct = {(r["conv_id"], r["turn_idx"])
              for r in head_cap(hot, cap).select(
                  "conv_id", "turn_idx").collect()}
    pre = salted_head_prereduce(hot, cap, n_salts=8)
    merged = {(r["conv_id"], r["turn_idx"])
              for r in head_cap(pre, cap).select(
                  "conv_id", "turn_idx").collect()}
    assert merged == direct


def test_salted_tail_prereduce_equivalent(spark, tdf):
    cap = 7
    hot = tdf.filter("conv_id like 'cskewhot%' or conv_id like 'cbig%'")
    direct = {(r["conv_id"], r["turn_idx"])
              for r in tail_cap(hot, cap).select(
                  "conv_id", "turn_idx").collect()}
    pre = salted_tail_prereduce(hot, cap, n_salts=8)
    merged = {(r["conv_id"], r["turn_idx"])
              for r in tail_cap(pre, cap).select(
                  "conv_id", "turn_idx").collect()}
    assert merged == direct


def test_ivf_assign_plan_broadcasts_centroids(spark):
    """IVF assignment: the k-row centroid table must broadcast (no wide
    shuffle for the cross join) and the arg-min aggregation must partial-
    aggregate map-side — the exchange carries one row per vector."""
    from headson_spark.operators.similarity import ivf_assign
    # the shared-session suite may have pinned an identical ivf_assign
    # plan via __spark_entry__._ivf_index's .cache(); Spark would then
    # substitute the InMemoryRelation and this test would read the cached
    # build's exchanges instead of the operator's own plan shape
    spark.catalog.clearCache()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ivf_assign(emb, stride=32)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan
    # exactly one wide exchange (the final agg); broadcast doesn't count
    assert count_exchanges(df) <= 1, plan
