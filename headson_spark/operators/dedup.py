"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side column expressions (md5 / transform / aggregate
inside whole-stage codegen) — no Python UDFs. Hash functions are md5-based
so the DuckDB oracle can evaluate bit-identical logic.

Scale notes (100 TB):
- exact dedup is one hash-shuffle on a 32-byte digest (map-side partial agg)
- MinHash/LSH replaces the quadratic all-pairs comparison with a band-bucket
  self-join; bucket sizes are bounded in practice, and AQE skew-join splits
  pathological buckets
- SimHash is a doc-local aggregate (zero shuffle until the grouping)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalized(col: str = "text"):
    """Lowercase, collapse non-alphanumerics — shared by dedup + stats."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", " "))


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents (after normalization)."""
    h = F.md5(normalized(text_col)).alias("content_hash")
    return (df.select(h, F.col(id_col))
              .groupBy("content_hash")
              .agg(F.count("*").alias("n_docs"),
                   F.min(id_col).alias("keep_id"))
              .filter(F.col("n_docs") > 1))


def _shingles_expr(text_col: str, k: int) -> str:
    """Distinct character k-shingles of the normalized text (SQL expr)."""
    norm = (f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '))")
    return (f"array_distinct(transform("
            f"sequence(1, greatest(length({norm}) - {k - 1}, 1)), "
            f"i -> substring({norm}, i, {k})))")


def _word_shingles_expr(text_col: str, w: int) -> str:
    """Distinct w-word shingles — the standard document MinHash unit
    (~10x fewer shingles than char shingles at the same recall)."""
    toks = (f"filter(split(lower({text_col}), '[^a-z0-9]+'), "
            f"x -> x != '')")
    return (f"array_distinct(transform("
            f"sequence(1, greatest(size({toks}) - {w - 1}, 1)), "
            f"i -> array_join(slice({toks}, i, {w}), ' ')))")


# 2^31 - 1: keeps (x % P) * a + b < 2^62, safe under ANSI bigint overflow
MINHASH_P = 2147483647


def minhash_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    from ..kernel.arena import mix64
    return [(mix64((seed << 20) ^ (2 * j)) % (MINHASH_P - 1) + 1,
             mix64((seed << 20) ^ (2 * j + 1)) % MINHASH_P)
            for j in range(n_hashes)]


def _shingle_int_expr(shingles: str) -> str:
    """One md5 per shingle -> 60-bit integer; the (a*x+b) mod P family
    derives every hash from this single digest."""
    return (f"transform({shingles}, s -> "
            f"cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) "
            f"% {MINHASH_P})")


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_hashes: int = 12,
                       shingle_k: int = 3) -> DataFrame:
    """MinHash signature per document: sig_j = min over shingles of
    (a_j * x + b_j) mod P, x = md5-derived shingle integer. One md5 per
    shingle total (not per hash function) — the dominant cost at scale.

    Round 6 (guide §4.2): computed in a mapInPandas kernel — hashlib's
    C md5 per shingle plus one numpy (n_shingles x n_hashes) modular
    broadcast per document replaces the staged Catalyst
    transform/array_min chain, which was ~60% of the lsh_pairs row at
    sf1.0. Every value is an EXACT integer (md5 is md5 everywhere;
    int(hex[:15], 16) % P and (a*x + b) % P are exact int64 — products
    < P^2 ~ 4.6e18 < 2^63), so any correct evaluation is bit-identical;
    the tokenization mirrors the Catalyst expression on the same
    grounds as ngram_jaccard_pairs (tokens are pure ASCII [a-z0-9]+
    after lower + split; empty-token docs produce the single ''
    shingle exactly like array_join(slice([], ..), ' ')). Min over the
    DISTINCT shingle set equals min over the multiset, so a Python set
    stands in for array_distinct. Oracle-verified (lsh_pairs /
    near_dup_clusters) at sf0.001/0.01/0.1."""
    import hashlib
    import re as _re

    import numpy as np

    params = minhash_params(n_hashes)
    A = np.asarray([a for a, _ in params], dtype=np.int64)
    Bv = np.asarray([b for _, b in params], dtype=np.int64)
    P = MINHASH_P
    w = shingle_k
    split_re = _re.compile("[^a-z0-9]+")
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = ", ".join([f"{id_col} {id_t}"]
                           + [f"mh{j} bigint" for j in range(n_hashes)])

    def sig_batches(pdfs):
        import pandas as pd
        for pdf in pdfs:
            ids = pdf[id_col].tolist()
            out = np.empty((len(ids), n_hashes), dtype=np.int64)
            for r, t in enumerate(pdf[text_col]):
                toks = [x for x in split_re.split((t or "").lower())
                        if x != ""]
                n = len(toks)
                sh = {" ".join(toks[i:i + w])
                      for i in range(max(n - w + 1, 1))}
                xs = np.fromiter(
                    (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                     % P for s in sh),
                    dtype=np.int64, count=len(sh))
                out[r] = ((xs[:, None] * A[None, :] + Bv[None, :]) % P
                          ).min(axis=0)
            data = {id_col: ids}
            for j in range(n_hashes):
                data[f"mh{j}"] = out[:, j]
            yield pd.DataFrame(data)

    return df.select(id_col, text_col).mapInPandas(sig_batches,
                                                   out_schema)


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 12,
                        bands: int = 4, shingle_k: int = 3) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding: documents agree
    on any band of rows => candidate pair. One self-join keyed by
    (band_idx, band_hash) — the scale-path replacement for all-pairs."""
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        parts = [f"mh{b * rows + r}" for r in range(rows)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    banded = sig.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     F.col(f"band{b}").alias("band_hash"))
            for b in range(bands)])).alias("bb")
    ).select(id_col, "bb.band_idx", "bb.band_hash")
    a = stacked.alias("a")
    b_ = stacked.alias("b")
    return (a.join(b_, ["band_idx", "band_hash"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 5) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (verification
    stage after LSH).

    The shingle set is computed only for documents that actually appear
    in a pair (semi-join prune before the O(len) shingling + the wide
    array shuffle): verification cost scales with the CANDIDATE set, not
    the corpus — at sf1.0 (55k docs / 7k pairs) this cut the query from
    11.7 s to the pair-side cost alone, and at 100 TB it is the
    difference between shingling the corpus and shingling the survivors
    of LSH. Join results are unchanged (the equi-joins below only ever
    consume pair participants)."""
    members = (pairs.select(F.col("id_a").alias(id_col))
               .union(pairs.select(F.col("id_b").alias(id_col)))
               .distinct())
    pruned = df.join(members, id_col, "left_semi")
    texts = pruned.select(F.col(id_col), F.col(text_col).alias("_t"))
    j = (pairs
         .join(texts.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed("_t", "_ta"), "id_a")
         .join(texts.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed("_t", "_tb"), "id_b"))

    # Set sizes are exact INTEGERS, so they can be computed with Python
    # set ops in a mapInPandas kernel (guide §4.2) instead of the
    # per-pair Catalyst array_intersect/array_union over ~len(norm)
    # element arrays, and the final double — round(inter / union, 6) —
    # is still produced by the ORIGINAL Spark expression below, so the
    # emitted values are bit-identical by construction. The Python
    # shingling mirrors _shingles_expr exactly: after
    # lower + [^a-z0-9]+ -> ' ' + trim, the normalized text is pure
    # ASCII [a-z0-9 ], where Python slicing == Java substring; the
    # index set range(0, max(len-k+1, 1)) == sequence(1,
    # greatest(len-k+1, 1)) including the short-string (whole-text
    # shingle) and empty-string cases. 5.0 s -> sub-second at sf1.0
    # (55k docs / 7.9k pairs).
    import re as _re

    k = shingle_k
    id_a_t = pairs.schema["id_a"].dataType.simpleString()
    id_b_t = pairs.schema["id_b"].dataType.simpleString()
    out_schema = (f"id_a {id_a_t}, id_b {id_b_t}, "
                  f"_inter int, _union int")
    strip = _re.compile("[^a-z0-9]+")

    def shingle_set(text):
        norm = strip.sub(" ", (text or "").lower()).strip()
        return {norm[i:i + k]
                for i in range(max(len(norm) - k + 1, 1))}

    def counts(pdfs):
        import pandas as pd
        for pdf in pdfs:
            cache: dict = {}

            def sset(doc_id, text):
                s = cache.get(doc_id)
                if s is None:
                    s = cache[doc_id] = shingle_set(text)
                return s

            inter, union = [], []
            for a, b, ta, tb in zip(pdf["id_a"], pdf["id_b"],
                                    pdf["_ta"], pdf["_tb"]):
                sa, sb = sset(a, ta), sset(b, tb)
                inter.append(len(sa & sb))
                union.append(len(sa | sb))
            yield pd.DataFrame({"id_a": pdf["id_a"],
                                "id_b": pdf["id_b"],
                                "_inter": inter, "_union": union})

    c = j.select("id_a", "id_b", "_ta", "_tb").mapInPandas(counts,
                                                           out_schema)
    return c.select(
        "id_a", "id_b",
        F.round(F.col("_inter").cast("double") / F.col("_union"), 6)
         .alias("jaccard"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """SimHash over word tokens; bit p of md5(token) votes +/-1.

    Doc-local (no shuffle): tokens -> per-bit vote sums via aggregate() ->
    packed integer. md5 nibble math keeps the DuckDB oracle bit-identical.
    """
    # Stage ONE md5-derived integer per token (the first ceil(bits/4) hex
    # nibbles, MSB-first); every bit then comes from shiftright on the
    # staged value. Round 1 evaluated md5(t) once per bit (16x per token)
    # because the digest lived inside the per-bit lambda — Spark does not
    # CSE across higher-order-function lambda instantiations.
    nhex = (bits + 3) // 4
    toks = (f"filter(split(lower({text_col}), '[^a-z0-9]+'), "
            f"x -> x != '')")
    staged = (df.select(F.col(id_col), F.col(text_col))
                .withColumn("_th", F.expr(
                    f"transform({toks}, t -> cast(conv(substring(md5(t), "
                    f"1, {nhex}), 16, 10) as bigint))")))
    # bit p (old nibble-wise order) == bit (4*nhex - 1 - p) of the staged
    # integer, so the packed simhash value is unchanged vs round 1.
    votes = (f"aggregate(_th, array_repeat(0L, {bits}), "
             f"(acc, h) -> zip_with(acc, "
             f"transform(sequence(0, {bits - 1}), "
             f"p -> cast(2 * (shiftright(h, {4 * nhex - 1} - p) % 2) - 1 "
             f"as bigint)), "
             f"(a, b) -> a + b))")
    packed = (f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
              f"(v, p) -> case when v > 0 then shiftleft(1L, p) "
              f"else 0L end), 0L, (a, b) -> a + b)")
    return staged.select(F.col(id_col), F.expr(packed).alias("simhash"))


def near_dup_clusters(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 12,
                      bands: int = 4, shingle_k: int = 3,
                      max_iter: int = 30) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the LSH
    candidate-pair graph (HashMin label propagation — every document
    converges to the smallest doc id reachable from it). The canonical
    "keep one per duplicate group" primitive: keep rows where
    cluster_id == doc_id.

    Scale notes (100 TB): the edge set is the *post-LSH* candidate graph
    (bounded, never all-pairs); each iteration is one shuffle join on it
    and converges in O(component diameter) rounds — near-dup components
    are shallow in practice (dup clusters are quasi-cliques), so 3-5
    rounds typical. localCheckpoint() truncates the lineage so the plan
    does not grow with iterations. Singleton documents never enter the
    loop; they are restored by the final left join.
    """
    pairs = lsh_candidate_pairs(df, id_col, text_col, n_hashes, bands,
                                shingle_k)
    labels = hashmin_components(pairs, max_iter=max_iter)
    return (df.select(F.col(id_col))
            .join(labels.withColumnRenamed("node", id_col), id_col,
                  "left")
            .select(F.col(id_col),
                    F.coalesce("lbl", F.col(id_col))
                     .alias("cluster_id")))


def contamination_check(docs: DataFrame, eval_docs: DataFrame,
                        n: int = 8, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Pre-training decontamination: word n-gram overlap between corpus
    documents and an evaluation/benchmark set — the standard check that
    training data does not contain eval content (verbatim or lightly
    reflowed; n-grams are order-sensitive so real overlap, not topical
    similarity). Returns one row per corpus document with the count of
    DISTINCT eval n-grams it contains and a contaminated flag.

    Scale shape (100 TB): the eval side is small by construction
    (benchmarks are thousands of documents), so its distinct-gram table
    broadcasts under AQE; the corpus side explodes ~tokens-per-doc grams
    and semi-joins — no all-pairs, per-doc work is linear, and the only
    wide exchange is the per-doc overlap count aggregate."""
    from .text_stats import tokens_expr

    def grams(df):
        toks = tokens_expr(text_col)
        g = (f"array_distinct(transform(sequence(1, "
             f"greatest(size({toks}) - {n - 1}, 1)), "
             f"i -> array_join(slice({toks}, i, {n}), ' ')))")
        return (df.select(F.col(id_col), F.explode(F.expr(g))
                          .alias("gram"))
                  .where(F.col("gram") != ""))

    eval_grams = grams(eval_docs).select("gram").distinct()
    hits = (grams(docs).join(eval_grams, "gram")
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_overlap")))
    return (docs.select(F.col(id_col))
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_overlap", F.lit(0)).cast("bigint")
                     .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) > 0)
                     .alias("contaminated")))


# hashmin_components small-graph gate: below this many edges the
# candidate graph is collected and solved with union-find on the driver
# (exact same min-label result); above it the distributed HashMin loop
# runs. 1M edge rows ~ a few hundred MB of driver heap — the same order
# as a broadcast join build side.
HASHMIN_DRIVER_GATE_EDGES = 1_000_000


def _unionfind_min_labels(edge_rows) -> dict:
    """Union-find with the component-minimum id as every root: returns
    {node: min reachable id} — exactly HashMin's converged labels."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # smaller id becomes the root, so a root is always the
            # minimum id of its component
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent}


def hashmin_components(pairs: DataFrame, left: str = "id_a",
                       right: str = "id_b",
                       max_iter: int = 30,
                       driver_gate_edges: int = HASHMIN_DRIVER_GATE_EDGES
                       ) -> DataFrame:
    """Connected components over an arbitrary pair DataFrame via HashMin
    label propagation: DataFrame[left, right] -> DataFrame[node, lbl]
    where lbl is the smallest id reachable from node. Only nodes that
    appear in a pair are returned (callers restore singletons with a
    left join + coalesce). One shuffle join per round, O(component
    diameter) rounds; the same engine serves text near-dup clusters
    (MinHash/LSH pairs) and embedding near-dup clusters (banded
    hyperplane pairs).

    Small-graph fast path (round 6): each HashMin round is 3 Spark jobs
    of fixed overhead, which dominated wall time on post-LSH candidate
    graphs (they are tiny relative to the corpus — 12.3 s at sf1.0 for
    a graph of a few thousand edges). Below `driver_gate_edges` the edge
    list is collected (bounded by construction via limit()) and solved
    with min-root union-find — the identical {node: min reachable id}
    labeling — in one pass. Above the gate the distributed loop runs
    unchanged, so the 100 TB posture is preserved: the driver never
    holds an unbounded graph."""
    if driver_gate_edges and driver_gate_edges > 0:
        head = (pairs.select(left, right)
                .limit(driver_gate_edges + 1).collect())
        if len(head) <= driver_gate_edges:
            labels = _unionfind_min_labels(head)
            from pyspark.sql.types import StructField, StructType
            t = pairs.schema[left].dataType
            schema = StructType([StructField("node", t),
                                 StructField("lbl", t)])
            return pairs.sparkSession.createDataFrame(
                sorted(labels.items()), schema)
    # undirected edges, both directions
    edges = (pairs.select(F.col(left).alias("src"),
                          F.col(right).alias("dst"))
             .union(pairs.select(F.col(right).alias("src"),
                                 F.col(left).alias("dst")))).cache()
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("lbl", F.col("node"))).localCheckpoint()
    changed = 0
    for _ in range(max_iter):
        # smallest label among self + neighbors
        nbr = (edges.join(labels.withColumnRenamed("node", "dst")
                          .withColumnRenamed("lbl", "nbr_lbl"), "dst")
               .groupBy("src").agg(F.min("nbr_lbl").alias("nbr_min")))
        new = (labels.join(nbr.withColumnRenamed("src", "node"),
                           "node", "left")
               .select("node",
                       F.least("lbl", F.coalesce("nbr_min", "lbl"))
                        .alias("lbl"))).localCheckpoint()
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new
        if changed == 0:
            break
    if changed > 0:
        # a component with diameter > max_iter would return non-minimal
        # labels: loud, because callers treat cluster_id as canonical
        import warnings
        warnings.warn(
            f"hashmin_components: did not converge within "
            f"{max_iter} iterations ({changed} labels still changing); "
            f"cluster ids may be non-minimal — raise max_iter",
            RuntimeWarning, stacklevel=2)
    # labels is localCheckpoint()ed (no lineage back to edges), so the
    # cached edge set can be released before the caller consumes labels
    edges.unpersist()
    return labels
