"""Similarity search over embedding columns (array<float>).

- brute_force_cosine_topk: exact baseline — one pass, JVM-side
  zip_with/aggregate dot products, no shuffle until the final top-k.
- lsh_bucket_topk: random-hyperplane LSH scale path — deterministic
  hyperplanes from mix64, candidates restricted to the query's bucket
  (and optional multi-probe neighbors), exact re-rank inside the bucket.

At 100 TB the brute force path is a full scan per query; the LSH path
prunes to one bucket via a partition-pruned lookup when the bucket id is
written as a partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.arena import mix64


def _dot_expr(vec_col: str, lit_vec: list[float]) -> str:
    arr = "array(" + ",".join(f"cast({x!r} as double)" for x in lit_vec) + ")"
    return (f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> "
            f"cast(a as double) * b), 0D, (acc, x) -> acc + x)")


def _norm_expr(vec_col: str) -> str:
    return (f"sqrt(aggregate({vec_col}, 0D, (acc, x) -> "
            f"acc + cast(x as double) * cast(x as double)))")


def cosine_scores(df: DataFrame, query_vec: list[float],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    qnorm = sum(float(x) * float(x) for x in query_vec) ** 0.5
    dot = _dot_expr(vec_col, query_vec)
    return df.select(
        F.col(id_col),
        F.round(F.expr(f"({dot}) / ({_norm_expr(vec_col)} * {qnorm!r})"), 4)
         .alias("cosine"))


def brute_force_cosine_topk(df: DataFrame, query_vec: list[float],
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    return (cosine_scores(df, query_vec, id_col, vec_col)
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from mix64 — reproducible anywhere."""
    return [[1 if mix64((seed << 32) ^ (j << 16) ^ i) % 2 == 0 else -1
             for i in range(dim)]
            for j in range(n_planes)]


def lsh_signature_expr(vec_col: str, planes: list[list[int]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        dot = _dot_expr(vec_col, [float(x) for x in plane])
        terms.append(f"(case when ({dot}) > 0D then {1 << p}L else 0L end)")
    return " + ".join(terms)


def lsh_buckets(df: DataFrame, dim: int = 64, n_planes: int = 8,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    planes = hyperplanes(dim, n_planes)
    return df.select(
        F.col(id_col),
        F.expr(lsh_signature_expr(vec_col, planes)).alias("bucket"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             dim: int = 64, n_planes: int = 8,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_bands: int = 1) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: banded
    random-hyperplane blocking followed by exact cosine verification —
    the all-pairs O(n^2) comparison never materializes.

    Bucket-size bound: each band hashes into 2^n_planes buckets, so a
    uniformly-spread corpus of n vectors has E[bucket width] = n /
    2^n_planes and the per-band self-join does ~n^2 / 2^n_planes
    comparisons. Choose n_planes ≈ log2(n / target_bucket_rows) — e.g.
    n=10^9 and 4k-row buckets -> 18 planes — and the comparison count
    stays ~n * target_bucket_rows regardless of corpus size; this is the
    knob that keeps bucket width bounded BY DESIGN as n grows (the
    round-2 default of a single coarse band grew ~(n/2^planes)^2).
    Raising n_planes lowers per-band recall (collision prob p^n_planes,
    p = 1 - theta/pi); n_bands > 1 compensates the MinHash way — a pair
    is a candidate if it collides in ANY band (recall
    1 - (1 - p^n_planes)^n_bands), with verification still exact and
    each candidate verified once (the band-distinct is on the pair key,
    not the vectors)."""
    total = n_planes * n_bands
    planes = hyperplanes(dim, total)
    b = df.select(F.col(id_col), F.col(vec_col))
    for band in range(n_bands):
        band_planes = planes[band * n_planes:(band + 1) * n_planes]
        b = b.withColumn(f"_band{band}",
                         F.expr(lsh_signature_expr(vec_col, band_planes)))
    # one row per (vector, band): candidates collide on (band, bucket)
    bands_arr = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.col(f"_band{i}").alias("bucket"))
        for i in range(n_bands)])
    e = (b.withColumn("_bb", F.explode(bands_arr))
          .select(id_col, vec_col,
                  F.col("_bb.band").alias("band"),
                  F.col("_bb.bucket").alias("bucket")))
    # Round-6 plan (guide §4.2): the within-bucket comparison runs as a
    # per-bucket BLAS gram matrix inside applyInPandas, but ONLY to
    # NOMINATE candidate pairs — the margin-widened threshold
    # (threshold - half an output-rounding step - float slack) can admit
    # a borderline pair but never drop a qualifying one, and the kept
    # rows' cosine is then recomputed by the ORIGINAL Catalyst
    # fold + round on the (tiny) nominated set, so emitted values and
    # the threshold decision are bit-identical to the old per-pair plan
    # by construction. The old plan evaluated the interpreted 64-element
    # fold O(sum of bucket-width^2) times — 57 s at sf1.0 vs ~2 s for
    # the BLAS nomination. Bucket width stays bounded by the n_planes
    # knob exactly as documented above, so per-group work is
    # ~width^2 * dim native flops.
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    cand_schema = f"id_a {id_t}, id_b {id_t}"
    margin = float(threshold) - 0.5e-4 - 1e-9

    def bucket_candidates(pdf):
        import pandas as pd
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ids = pdf[id_col].tolist()
        V = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf[vec_col]])
        nv = np.sqrt(np.einsum("ij,ij->i", V, V))
        with np.errstate(divide="ignore", invalid="ignore"):
            C = (V @ V.T) / np.outer(nv, nv)
        ii, jj = np.nonzero(np.triu(C >= margin, 1))
        out_a, out_b = [], []
        for i, j in zip(ii.tolist(), jj.tolist()):
            a, bb = ids[i], ids[j]
            if a == bb:
                continue  # the old a.id < b.id join dropped equal ids
            if bb < a:
                a, bb = bb, a
            out_a.append(a)
            out_b.append(bb)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = (e.groupBy("band", "bucket")
            .applyInPandas(bucket_candidates, cand_schema)
            .distinct())
    av = df.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("_va"))
    bv = df.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("_vb"))
    dot = ("aggregate(zip_with(_va, _vb, (x, y) -> "
           "cast(x as double) * cast(y as double)), 0D, "
           "(acc, v) -> acc + v)")
    na = _norm_expr("_va")
    nb = _norm_expr("_vb")
    out = (cand.join(av, "id_a").join(bv, "id_b")
           .withColumn("cosine",
                       F.round(F.expr(f"({dot}) / (({na}) * ({nb}))"), 4))
           .where(F.col("cosine") >= threshold)
           .select("id_a", "id_b", "cosine"))
    return out


def _l2sq_expr(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(cast(x as double) - cast(y as double)) * "
            f"(cast(x as double) - cast(y as double))), 0D, "
            f"(acc, v) -> acc + v)")


def derive_ivf_stride(df: DataFrame, k_target: int = 4096,
                      id_col: str = "vec_id") -> int:
    """stride = max(n // k_target, 1): holds k_centroids at ~k_target
    regardless of corpus size. One count() at index-build time — noise
    next to the O(n * k) assignment it sizes."""
    n = df.select(id_col).count()
    return max(n // max(k_target, 1), 1)


def ivf_centroids(df: DataFrame, stride: int | None = 32,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  k_target: int = 4096) -> DataFrame:
    """Deterministic sampled centroids for the IVF coarse quantizer:
    every stride-th vector by id (the standard sampled-centroid IVF
    baseline — engine-independent and reproducible anywhere, unlike a
    seeded k-means; Lloyd refinement is an optional deployment step that
    only moves the centroids, not the algorithm).

    SCALING CONTRACT: k_centroids = n / stride, so a FIXED stride grows
    k linearly with the corpus and eventually breaks the broadcast in
    ivf_assign (the same hazard class as force-broadcasting a growing
    dim table). stride=None (the scale-safe default posture) derives
    stride from the corpus size via derive_ivf_stride, holding k at the
    IVF sweet spot (~sqrt(n), or a fixed few thousand — 4k centroids
    x 64 dims x 8 B = 2 MB broadcast, safe anywhere). An explicit stride
    keeps results reproducible without a count() (tests/oracles) but
    forfeits the boundedness proof — ivf_assign then leaves the join
    strategy to AQE instead of forcing a broadcast. Assignment cost is
    O(n * k) distance evaluations either way — another reason k must
    not track n."""
    if stride is None:
        stride = derive_ivf_stride(df, k_target, id_col)
    return (df.filter((F.col(id_col) % stride) == 0)
              .select(F.col(id_col).alias("centroid_id"),
                      F.col(vec_col).alias("_cvec")))


def lloyd_refine(df: DataFrame, stride: int | None = 32,
                 n_iters: int = 1,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 k_target: int = 4096,
                 broadcast_ok: bool | None = None) -> DataFrame:
    """Optional Lloyd (k-means) refinement of the strided-sample IVF
    centroids: n_iters rounds of assign-to-nearest + recompute-as-mean.
    Improves inverted-list balance (hence recall at a given n_probe) at
    the same downstream plan shape — the refined table drops into
    ivf_assign via its `centroids` parameter (ivf_topk has no such
    parameter: it ranks probes against the deterministic sampled
    centroids, so pass a refined ASSIGNMENT only together with probe
    selection you computed against the same refined centroids, or the
    probe ranking and the inverted lists disagree and recall silently
    degrades).

    Plan per iteration: the assignment crossJoin (same broadcast
    discipline as ivf_assign) -> posexplode the vector (one narrow
    (centroid, dim_pos, value) stream, partial-aggregated map-side to
    k x dim rows per task) -> groupBy(centroid_id, pos) mean -> regroup
    to arrays. Shuffle volume is O(tasks * k * dim), independent of n.
    Empty clusters keep their previous centroid (standard Lloyd
    posture), so k never shrinks.

    Determinism caveat: cluster means are distributed float sums, so the
    exact bit pattern depends on aggregation order; vectors whose two
    nearest refined centroids are within float-rounding distance could
    flip lists between runs. Fine for ANN (recall changes by at most the
    boundary set); the oracled queries keep the UNREFINED deterministic
    centroids — refinement is an opt-in quality step.
    """
    if stride is None:
        stride = derive_ivf_stride(df, k_target, id_col)
        if broadcast_ok is None:
            broadcast_ok = True
    cents = ivf_centroids(df, stride, id_col, vec_col)
    for _ in range(max(n_iters, 0)):
        assigned = ivf_assign(df, stride, id_col, vec_col,
                              broadcast_ok=broadcast_ok, centroids=cents)
        means = (df.join(assigned, id_col)
                 .select("centroid_id",
                         F.posexplode(vec_col).alias("_pos", "_v"))
                 .groupBy("centroid_id", "_pos")
                 .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
                 .groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("_pos", "_m"))).alias("_pm"))
                 .select("centroid_id",
                         F.expr("transform(_pm, x -> x._m)")
                         .alias("_newvec")))
        # empty clusters: keep the previous centroid
        cents = (cents.join(means, "centroid_id", "left")
                 .select("centroid_id",
                         F.coalesce("_newvec", F.col("_cvec").cast(
                             "array<double>")).alias("_cvec")))
    return cents


# ivf_assign refuses to collect more centroid rows than this: 2^20 rows
# x 64 dims x 8 B ~ 512 MB on the driver — past the point where the
# caller should have used stride=None (k <= k_target) instead.
MAX_COLLECTED_CENTROIDS = 1 << 20


def _arrow_list_matrix(arr):
    """pyarrow List/LargeList column of equal-length float lists ->
    (n, dim) float64 matrix. Offset-aware (handles sliced batches);
    float32 -> float64 promotion is exact, matching Spark's
    cast(x as double) on array<float> elements."""
    import numpy as np
    import pyarrow as pa
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy()
    values = arr.values.to_numpy(zero_copy_only=False)
    widths = offsets[1:] - offsets[:-1]
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged embedding column in ivf_assign")
    flat = values[int(offsets[0]):int(offsets[-1])]
    return flat.reshape(len(widths), dim).astype(np.float64, copy=False)


def _exact_l2sq(v, c) -> float:
    """The Spark/DuckDB left-fold L2^2: acc = acc + (x-y)*(x-y), one
    IEEE-double rounding per op in dimension order — bit-identical to
    aggregate(zip_with(...)) and DuckDB list_reduce."""
    acc = 0.0
    for x, y in zip(v.tolist(), c.tolist()):
        t = x - y
        acc = acc + t * t
    return acc


def ivf_assign(df: DataFrame, stride: int | None = 32,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               k_target: int = 4096,
               broadcast_ok: bool | None = None,
               centroids: DataFrame | None = None) -> DataFrame:
    """IVF indexing step: assign every vector to its nearest centroid
    (arg-min L2, ties broken by centroid id — deterministic).

    Implementation (round 6, guide §4.2): the k-row centroid table is
    collected to the driver — the same O(k) boundedness contract as the
    broadcast it replaces (a broadcast hash relation is also built on
    the driver) — and shipped inside a mapInArrow closure; each Arrow
    batch computes the full n_batch x k distance matrix in one BLAS
    matmul (||v||^2 - 2 v.C^T + ||c||^2). That replaces the previous
    crossJoin + per-pair Catalyst fold, which evaluated an interpreted
    64-element lambda O(n*k) times (147 s at 20k vectors / 625
    centroids in the round-5 driver record; the BLAS form is the same
    flop count at native throughput). Plan shape: ZERO exchanges — the
    old plan's broadcast + final min-aggregation exchange both
    disappear; output is one narrow (id, centroid) row per vector,
    computed where the vector already lives.

    Exactness contract (the oracle hashes these results): BLAS sums in
    a different order than the Catalyst/DuckDB left fold, so the matmul
    distances are only used to NOMINATE candidates — every centroid
    within a per-row margin that provably over-covers the float64
    error bound (see below). Rows with a single nominee are decided (the
    true arg-min is always nominated); rows with several recompute the
    exact left-fold distance per nominee and take the lexicographic
    (d2, centroid_id) min — bit-identical tie-breaks to the old plan.

    Margin bound: each of the three dot products errs by at most
    64 * eps * sum|terms| <= 64 * eps * 2(|v|^2 + |c|^2_max); the margin
    1e-10 * (1 + |v|^2 + |c|^2_max) exceeds twice that by ~3 orders of
    magnitude, and an over-wide margin only costs extra exact rechecks,
    never a wrong answer.

    Scale shape (100 TB): per-task work is (rows-in-task x k x dim)
    BLAS; no shuffle at all. In deployment the assignment is then
    materialized partitioned BY centroid_id for partition-pruned probe
    reads. k stays bounded by the stride contract (stride=None derives
    k <= k_target); a fixed stride on a growing corpus is capped loudly
    at MAX_COLLECTED_CENTROIDS instead of OOMing the driver.
    broadcast_ok is retained for API compatibility (the join it hinted
    no longer exists).

    Pass `centroids` (a precomputed/refined ivf_centroids-shaped table,
    e.g. from lloyd_refine) to assign against those instead of the
    sampled ones."""
    import numpy as np

    if stride is None:
        stride = derive_ivf_stride(df, k_target, id_col)
    cents_df = (centroids if centroids is not None
                else ivf_centroids(df, stride, id_col, vec_col))
    # limit() bounds the driver-side collect by construction; it is the
    # identity whenever k is within the documented cap
    rows = (cents_df.select("centroid_id", "_cvec")
            .limit(MAX_COLLECTED_CENTROIDS + 1).collect())
    if len(rows) > MAX_COLLECTED_CENTROIDS:
        raise ValueError(
            f"ivf_assign: > {MAX_COLLECTED_CENTROIDS} centroids; use "
            f"stride=None (k_target bounds k) for corpora this large")
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, centroid_id {id_t}"
    narrow = df.select(id_col, vec_col)
    if not rows:
        # no centroids -> empty result (the old crossJoin semantics)
        return narrow.mapInArrow(lambda it: iter(()), out_schema)
    order = sorted(range(len(rows)), key=lambda i: rows[i][0])
    cids = np.asarray([rows[i][0] for i in order])
    C = np.asarray([list(rows[i][1]) for i in order], dtype=np.float64)
    CT = np.ascontiguousarray(C.T)
    nc = np.einsum("ij,ij->i", C, C)
    nc_max = float(nc.max())

    def assign_batches(batches):
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0)
            V = _arrow_list_matrix(batch.column(1))
            nv = np.einsum("ij,ij->i", V, V)
            D = nv[:, None] + nc[None, :] - 2.0 * (V @ CT)
            best = D.argmin(axis=1)
            m = D[np.arange(len(D)), best]
            margin = 1e-10 * (1.0 + np.abs(nv) + nc_max)
            cand = D <= (m + margin)[:, None]
            multi = np.flatnonzero(cand.sum(axis=1) > 1)
            for i in multi:
                js = np.flatnonzero(cand[i])
                best_key = None
                for j in js:
                    key = (_exact_l2sq(V[i], C[j]), cids[j])
                    if best_key is None or key < best_key:
                        best_key, best[i] = key, j
            out_c = pa.array(cids[best], type=ids.type)
            yield pa.RecordBatch.from_arrays([ids, out_c],
                                             [id_col, "centroid_id"])

    return narrow.mapInArrow(assign_batches, out_schema)


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 4, stride: int | None = 32,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             assignment: DataFrame | None = None,
             k_target: int = 4096,
             broadcast_ok: bool | None = None) -> DataFrame:
    """IVF ANN query: rank centroids by distance to the query, probe the
    n_probe nearest inverted lists, exact cosine re-rank inside them.
    Recall/latency knob = n_probe (n_probe = k_centroids degrades to the
    exact brute force). Everything stays in-plan — no driver collect.

    Pass `assignment` (a materialized ivf_assign result — THE deployment
    pattern: index once, query many) to skip re-running the O(n * k)
    indexing pass per query; without it the full assignment is computed
    inline, which dominates the single-query wall time."""
    arr = ("array(" + ",".join(f"cast({float(x)!r} as double)"
                               for x in query_vec) + ")")
    if stride is None:
        stride = derive_ivf_stride(df, k_target, id_col)
    cents = ivf_centroids(df, stride, id_col, vec_col)
    probes = (cents.withColumn("_qd", F.expr(_l2sq_expr("_cvec", arr)))
              .orderBy("_qd", "centroid_id")
              .limit(n_probe)
              .select("centroid_id"))
    if assignment is None:
        assignment = ivf_assign(df, stride, id_col, vec_col,
                                broadcast_ok=broadcast_ok)
    cand_ids = (assignment
                .join(F.broadcast(probes), "centroid_id")
                .select(id_col))
    cand = df.join(cand_ids, id_col, "semi")
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN: restrict to the query's hyperplane bucket, exact re-rank."""
    planes = hyperplanes(len(query_vec), n_planes)
    qsig = 0
    for p, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(query_vec, plane)) > 0:
            qsig |= 1 << p
    sig = F.expr(lsh_signature_expr(vec_col, planes))
    cand = df.where(sig == F.lit(qsig))
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)
