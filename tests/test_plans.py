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


def test_ivf_assign_plan_is_shuffle_free_map(spark):
    """IVF assignment (round-6 form): the k-row centroid table rides
    inside a mapInArrow closure and each Arrow batch computes its
    distance matrix with BLAS, so the plan must contain NO exchange at
    all (the old crossJoin's broadcast and the arg-min aggregation's
    shuffle both disappear) and exactly one Python boundary node."""
    from headson_spark.operators.similarity import ivf_assign
    # the shared-session suite may have pinned an identical ivf_assign
    # plan via __spark_entry__._ivf_index's .cache(); Spark would then
    # substitute the InMemoryRelation and this test would read the cached
    # build's exchanges instead of the operator's own plan shape
    spark.catalog.clearCache()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ivf_assign(emb, stride=32)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0, plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    # column pruning must reach the scan: only (vec_id, embedding) read
    assert "label" not in plan.split("ReadSchema")[1].split("\n")[0], plan


def test_ivf_assign_numpy_matches_catalyst_fold(spark):
    """The BLAS + exact-margin-recheck assignment must reproduce the old
    crossJoin + Catalyst left-fold arg-min bit-for-bit (same arg-min,
    same (d2, centroid_id) tie-break)."""
    from pyspark.sql import functions as F
    from headson_spark.operators.similarity import (_l2sq_expr, ivf_assign,
                                                    ivf_centroids)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {r["vec_id"]: r["centroid_id"]
           for r in ivf_assign(emb, stride=32).collect()}
    cents = F.broadcast(ivf_centroids(emb, 32))
    d2 = _l2sq_expr("embedding", "_cvec")
    ref = (emb.crossJoin(cents)
           .withColumn("_d2", F.expr(d2))
           .groupBy("vec_id")
           .agg(F.min(F.struct(F.col("_d2").alias("d"),
                               F.col("centroid_id").alias("c")))
                .alias("_m"))
           .select("vec_id", F.col("_m.c").alias("centroid_id")))
    exp = {r["vec_id"]: r["centroid_id"] for r in ref.collect()}
    assert got == exp
