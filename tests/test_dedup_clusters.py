"""Invariants for near-dup clustering and stratified sampling beyond the
DuckDB oracle equality (tests/test_entry_correctness.py)."""

from __future__ import annotations

import pytest

from headson_spark.operators.dedup import (lsh_candidate_pairs,
                                           near_dup_clusters)
from headson_spark.operators.sampling import stratified_sample

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_clusters_cover_all_docs_with_min_label(spark, docs):
    cl = {r["doc_id"]: r["cluster_id"]
          for r in near_dup_clusters(docs).collect()}
    assert len(cl) == docs.count()
    # HashMin: every cluster id is the smallest member id
    assert all(cid <= d for d, cid in cl.items())
    members = {}
    for d, cid in cl.items():
        members.setdefault(cid, []).append(d)
    assert all(min(ms) == cid for cid, ms in members.items())


def test_cluster_endpoints_of_every_candidate_pair_agree(spark, docs):
    cl = {r["doc_id"]: r["cluster_id"]
          for r in near_dup_clusters(docs).collect()}
    pairs = lsh_candidate_pairs(docs).collect()
    assert pairs, "fixture must produce candidate pairs"
    bad = [(p["id_a"], p["id_b"]) for p in pairs
           if cl[p["id_a"]] != cl[p["id_b"]]]
    assert not bad, bad[:5]


def test_stratified_sample_deterministic_and_bounded(spark, docs):
    fr = {"en": 0.3, "zh": 1.0}
    a = {r["doc_id"] for r in
         stratified_sample(docs, fr, default_frac=0.0).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, fr, default_frac=0.0).collect()}
    assert a == b, "hash-threshold sampling must be deterministic"
    by_lang = {r["doc_id"]: r["lang"] for r in docs.collect()}
    zh_total = sum(1 for v in by_lang.values() if v == "zh")
    zh_kept = sum(1 for d in a if by_lang[d] == "zh")
    assert zh_kept == zh_total, "fraction 1.0 keeps the whole stratum"
    assert all(by_lang[d] in fr for d in a), "default 0.0 drops the rest"
    en_total = sum(1 for v in by_lang.values() if v == "en")
    en_kept = sum(1 for d in a if by_lang[d] == "en")
    # 0.3 +- a generous tolerance (binomial-ish, deterministic hash)
    assert 0.15 * en_total < en_kept < 0.45 * en_total


def test_hashmin_components_on_arbitrary_pairs(spark):
    """Public CC primitive: path + triangle + singleton-free output."""
    from headson_spark.operators.dedup import hashmin_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a int, id_b int")
    lbl = {r["node"]: r["lbl"]
           for r in hashmin_components(pairs).collect()}
    assert lbl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_hashmin_warns_when_not_converged(spark):
    """A path graph with diameter > max_iter must raise the documented
    RuntimeWarning instead of silently returning non-minimal labels."""
    import warnings
    from headson_spark.operators.dedup import hashmin_components
    # path 0-1-2-...-9: min label needs ~9 rounds to reach node 9.
    # driver_gate_edges=0 forces the distributed HashMin loop (the
    # round-6 driver union-find gate would otherwise solve this small
    # graph exactly with no iteration at all).
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)],
                                  "id_a int, id_b int")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hashmin_components(pairs, max_iter=2, driver_gate_edges=0).collect()
    assert any("did not converge" in str(x.message) for x in w), \
        [str(x.message) for x in w]
    # and with enough rounds it converges warning-free to the min label
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        lbl = {r["node"]: r["lbl"]
               for r in hashmin_components(
                   pairs, max_iter=30, driver_gate_edges=0).collect()}
    assert not any("did not converge" in str(x.message) for x in w2)
    assert set(lbl.values()) == {0}


def test_hashmin_driver_gate_matches_distributed(spark):
    """The round-6 union-find fast path must produce the identical
    (node, lbl) rows as the distributed HashMin loop, including on
    multi-component graphs with chains and cliques."""
    from headson_spark.operators.dedup import hashmin_components
    edges = ([(i, i + 1) for i in range(5, 12)]          # chain 5..12
             + [(20, 21), (21, 22), (20, 22)]            # triangle
             + [(40, 41)]                                # pair
             + [(3, 50), (50, 2)])                       # min via hub
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {(r["node"], r["lbl"])
            for r in hashmin_components(pairs).collect()}
    slow = {(r["node"], r["lbl"])
            for r in hashmin_components(
                pairs, driver_gate_edges=0).collect()}
    assert fast == slow
    assert fast  # non-empty


def test_contamination_check_semantics(spark):
    """Planted contamination: a training doc embedding a verbatim eval
    passage is flagged with the right overlap count; paraphrase with
    different word order is NOT flagged (n-grams are order-sensitive)."""
    from headson_spark.operators.dedup import contamination_check
    eval_text = ("the capital of france is paris and the capital of "
                 "italy is rome according to the atlas")
    docs = spark.createDataFrame(
        [(1, "some intro text then " + eval_text + " and a conclusion"),
         (2, "paris is the capital town of the french republic while "
             "rome leads italy says the atlas"),
         (3, "entirely unrelated content about machine learning "
             "pipelines and distributed shuffle strategies at scale")],
        "doc_id int, text string")
    ev = spark.createDataFrame([(100, eval_text)], "doc_id int, text string")
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in contamination_check(docs, ev, n=8).collect()}
    assert out[1][1] is True and out[1][0] >= 9  # all 16-8+1 eval grams
    assert out[2] == (0, False)
    assert out[3] == (0, False)
