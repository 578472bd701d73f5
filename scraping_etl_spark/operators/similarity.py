"""Similarity search over embedding columns (``array<float>``).

North-star extension: the driver ships an ``embeddings`` scale table
(vec_id, embedding float[64], label) and a 100 TB pipeline needs
nearest-neighbor machinery over it. Two tiers:

- :func:`cosine_topk` — exact brute-force top-k. The probe set is
  broadcast (BroadcastNestedLoopJoin — all-pairs is the *definition* of
  exact search, so the nested-loop is the right plan as long as the
  probe side is small); ranking is a per-probe window (partitioned, so
  it scales with corpus size, not a global sort).
- :func:`ann_hyperplane_topk` — approximate variant for big probe sets:
  sign-random-projection (SimHash-style) buckets on both sides, then
  exact cosine only *within* a bucket — the join is a hash join on the
  bucket id, never a cross join. Recall is tunable with ``planes``
  (fewer planes → bigger buckets → higher recall, more compute).

Determinism: all arithmetic is a sequential left-fold (``F.aggregate``)
over ``double``-cast elements, which any engine reproduces bit-for-bit
(the DuckDB oracle mirrors the same fold); hyperplane coefficients are
±1 derived from md5 at plan-build time — no RNG state.

Everything is JVM-side built-ins (zip_with/aggregate); no Python UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two float arrays in double
    precision — deterministic summation order, mirrorable in SQL."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, null-safe for zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    probe_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors of each probe vector by cosine similarity.

    Output: (probe_id, rank, neighbor id, cosine). Ties broken by
    neighbor id for a total deterministic order. Self-matches (same id)
    are excluded. Scale: probes broadcast; corpus streamed once; the
    rank window is partitioned by probe, so per-partition state is k.
    """
    # norms hoisted to the per-row projections: every probe pairs with
    # every corpus row, so the per-pair work must be the dot fold alone
    # (identical sqrt(dot) arithmetic — oracle-exact; see _sem_side)
    p = probes.select(
        F.col(probe_id_col).alias("_pid"),
        F.col(probe_vec_col).alias("_pvec"),
        l2_norm(F.col(probe_vec_col)).alias("_pnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    den = F.col("_pnrm") * F.col("_cnrm")
    cos = F.when(den > 0, dot(F.col("_pvec"), F.col("_cvec")) / den).otherwise(
        F.lit(0.0)
    )
    scored = (
        c.join(F.broadcast(p), F.col("_pid") != F.col("_cid"))
        .withColumn("_cos", cos)
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(probe_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.round("_cos", 6).alias("cos_sim"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "anchor_id",
    anchor_vec_col: str = "anchor_vec",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training data:
    for each anchor, the ``k`` MOST similar corpus vectors whose
    cosine lies in the band ``[lo, hi)`` — similar enough to be
    informative negatives, but below the near-duplicate ceiling that
    would make them false negatives (the in-batch-negatives failure
    mode; cf. dense-retrieval hard-negative mining, Karpukhin et al.
    EMNLP 2020 §3.2, Xiong et al. ICLR 2021 ANCE). The upper bound is
    the same role SemDeDup's threshold plays: above ``hi`` a pair is
    a semantic duplicate, not a negative.

    Output ``(anchor_id, rank, neighbor_id, cos_sim)`` — rank 1 = the
    hardest in-band negative, ties broken by neighbor id, self-pairs
    excluded, ``cos_sim`` rounded to 6 AFTER ranking (the oracle-hash
    convention; ranking uses the exact fold value, which the
    sequential-fold arithmetic makes engine-reproducible).

    Plan: identical shape to :func:`cosine_topk` — anchors broadcast,
    corpus streamed once, the band filter applied BEFORE the rank
    window so per-anchor window state holds only in-band rows. Scale:
    exact brute tier; for large anchor sets compose with the IVF tier
    exactly as ``ivf_topk`` does (assign both sides, score within
    probed cells) — the band filter commutes with any candidate
    pruning because it only ever REMOVES rows ranked downstream.
    """
    if not (0.0 <= lo < hi <= 1.0 + 1e-12):
        raise ValueError(f"need 0 <= lo < hi <= 1, got [{lo}, {hi})")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a = anchors.select(
        F.col(anchor_id_col).alias("_pid"),
        F.col(anchor_vec_col).alias("_pvec"),
        l2_norm(F.col(anchor_vec_col)).alias("_pnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    den = F.col("_pnrm") * F.col("_cnrm")
    cos = F.when(den > 0, dot(F.col("_pvec"), F.col("_cvec")) / den).otherwise(
        F.lit(0.0)
    )
    scored = (
        c.join(F.broadcast(a), F.col("_pid") != F.col("_cid"))
        .withColumn("_cos", cos)
        .filter((F.col("_cos") >= lo) & (F.col("_cos") < hi))
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(anchor_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.round("_cos", 6).alias("cos_sim"),
        )
    )


def quantize_embedding(vec: Column, bits: int = 8) -> Column:
    """Per-vector symmetric integer quantization — the memory-bandwidth
    tier of the similarity stack: at 100 TB an ``array<float>`` corpus
    streamed for brute-force or in-bucket scoring is bandwidth-bound,
    and int8 cuts the bytes 4× while cosine is (nearly) invariant to
    the per-vector scale (scale cancels in the normalization; only the
    rounding error remains, ~1/254 per element).

    ``q_i = round(x_i · (qmax / max|x|))`` with ``qmax = 2^(bits-1)-1``
    (127 for int8); the all-zero vector quantizes to all zeros. Pure
    deterministic arithmetic (half-away-from-zero rounding in both
    Spark and DuckDB), so the quantized search path is fully
    hash-gateable — no float-fuzz exemptions. The input array is bound
    once, and the scale is double-bound as a struct field (the
    ``normalize_embedding`` hazard: a raw ``array_max`` EXPRESSION
    referenced inside the per-element lambda would re-run the O(dim)
    scan per element — O(dim²) per row)."""
    from scraping_etl_spark.operators.dedup import _bind

    qmax = float(2 ** (bits - 1) - 1)

    def _with_scale(v: Column) -> Column:
        mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        return F.struct(
            v.alias("v"),
            F.when(mx > 0, F.lit(qmax) / mx).otherwise(F.lit(0.0)).alias("s"),
        )

    def _quantize(s: Column) -> Column:
        return F.transform(
            s["v"],
            lambda x: F.round(x.cast("double") * s["s"], 0).cast("int"),
        )

    return _bind(_bind(vec, _with_scale), _quantize)


def _hyperplane(dim: int, plane: int) -> list[int]:
    """Deterministic ±1 hyperplane: one md5-derived bit per dimension
    (seeded by plane and dimension index). Plan-time constants."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"plane:{plane}:dim:{i}".encode()).digest()
        out.append(1 if h[0] & 1 else -1)
    return out


def hyperplane_bucket(vec_col: Column, dim: int, planes: int = 8) -> Column:
    """Sign-random-projection bucket id in [0, 2^planes): bit j is the
    sign of <vec, w_j> for the deterministic ±1 hyperplane w_j. Cosine-
    close vectors agree on most signs and land in the same bucket."""
    bucket = F.lit(0)
    for j in range(planes):
        w = F.array(*[F.lit(float(x)) for x in _hyperplane(dim, j)])
        bit = F.when(dot(vec_col, w) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def ann_hyperplane_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    probe_vec_col: str = "query_vec",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket both sides by :func:`hyperplane_bucket`,
    hash-join on the bucket id, rank within bucket. At 100 TB this is
    the scale path: the join shuffles on bucket (2^planes distinct keys
    — keep ``planes`` ≥ log2(cluster parallelism); skewed buckets are
    split by AQE), and exact cosine runs only inside buckets.

    ``multiprobe=1`` (default) also probes every bucket at Hamming
    distance 1 from the query's bucket — the standard LSH multi-probe
    trade: ``planes+1`` probe rows per query (corpus side untouched, a
    vector lives in exactly one bucket, so no pair dedup is needed) for
    a ~3x recall jump (measured 0.12 → 0.35-0.40 on the driver's
    *random* embeddings at planes=6 — near-orthogonal vectors are LSH's
    worst case; clustered real-world embeddings bucket far better).
    ``multiprobe=0`` is single-bucket. Recall < 1 remains by design;
    the exact path is :func:`cosine_topk`."""
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("_bucket"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("_pid"),
        F.col(probe_vec_col).alias("_pvec"),
        hyperplane_bucket(F.col(probe_vec_col), dim, planes).alias("_home"),
        l2_norm(F.col(probe_vec_col)).alias("_pnrm"),
    )
    if multiprobe >= 1:
        # home bucket + each single-bit flip (Hamming radius 1)
        variants = F.array(
            F.col("_home"),
            *[
                F.col("_home").bitwiseXOR(F.lit(1 << j)).cast("int")
                for j in range(planes)
            ],
        )
        p = p.select(
            "_pid", "_pvec", F.explode(variants).alias("_bucket"), "_pnrm"
        )
    else:
        p = p.withColumnRenamed("_home", "_bucket")
    # norm folds hoisted out of the bucket pair loop (same arithmetic,
    # oracle-exact — see _sem_side)
    den = F.col("_pnrm") * F.col("_cnrm")
    cos = F.when(den > 0, dot(F.col("_pvec"), F.col("_cvec")) / den).otherwise(
        F.lit(0.0)
    )
    scored = (
        c.join(p, "_bucket")
        .filter(F.col("_pid") != F.col("_cid"))
        .withColumn("_cos", cos)
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(probe_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.round("_cos", 6).alias("cos_sim"),
            F.col("_bucket").alias("bucket"),
        )
    )


def embedding_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.999,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space face of
    near-dedup (dedup.py holds the text faces): candidates are pairs
    whose vectors agree on every sign projection (the full
    ``planes``-bit hyperplane signature as an exact blocking key —
    same-direction vectors ALWAYS collide, near-misses almost always
    do at high cosine), verified by exact cosine ≥ ``threshold``.

    Plan: one signature projection per side, hash equi-join on the
    signature, exact cosine only inside blocks — no cross join, and at
    100 TB the signature join shuffles uniformly (md5-derived planes).
    Recall caveat: a near-dup pair split by one hyperplane is missed;
    raise recall by lowering ``planes`` or unioning rotated signature
    sets (the text-side analogue is MinHash banding)."""
    sig = hyperplane_bucket(F.col(vec_col), dim, planes)
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        sig.alias("_sig"), l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        sig.alias("_sig"), l2_norm(F.col(vec_col)).alias("_nb"),
    )
    # norm folds hoisted out of the block pair loop (same arithmetic,
    # oracle-exact — see _sem_side)
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den > 0, dot(F.col("_va"), F.col("_vb")) / den).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(b, "_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_train(
    corpus: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 5,
) -> list[list[float]]:
    """Train the IVF index: k-means centroids over the corpus (the
    one eager step — run once, reuse). Few iterations by default: the
    index needs balanced-ish lists, not converged centroids — recall is
    governed by ``n_probe``, and each extra iteration is a full job."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(train)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def centroid_sq_dist(center: list[float], vec: Column) -> Column:
    """Squared L2 distance to one centroid — identical fold order on
    every engine: ``(a-b)*(a-b)`` left-summed, mirrored by the DuckDB
    oracles (plans/ml_ops.py)."""
    w = F.array(*[F.lit(x) for x in center])
    diffs = F.zip_with(vec, w, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _scored_centroids_mat(vec: Column, mat: Column, k: int) -> Column:
    """``(sq_dist, cid)`` structs over a centroid MATRIX column of
    ``k`` rows — the shared arithmetic core of :func:`scored_centroids`
    (left-fold ``(a-b)*(a-b)`` per centroid, ``(d, cid)`` structs), so
    callers that index one matrix out of a higher-rank literal (the
    fused PQ encoders) build the exact same expression."""
    return F.zip_with(
        mat,
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    c,
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("cid"),
        ),
    )


def scored_centroids(vec: Column, centroids: list[list[float]]) -> Column:
    """``(sq_dist, cid)`` structs for every centroid, built from ONE
    nested-array literal + three lambdas — NOT a Python loop of
    per-centroid expression structs. Arithmetic is bit-identical to
    the loop form (left-fold ``(a-b)*(a-b)``), but the Column tree is
    O(1) in the centroid count: the loop form's m*k literal arrays and
    folds cost seconds of DRIVER-side py4j construction per query at
    real codebook budgets (see PLANS.md "PQ plan-construction
    finding")."""
    mat = F.lit([[float(x) for x in c] for c in centroids])
    return _scored_centroids_mat(vec, mat, len(centroids))


def nearest_centroids(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Ids of the ``n`` nearest centroids, (distance, cid)-lexicographic
    — a per-row expression over centroid plan constants, no join, no
    shuffle."""
    scored = scored_centroids(vec, centroids)
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["cid"]), 1, n)


def cluster_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic clustering of a corpus: assign every vector to its
    nearest trained centroid (the IVF index's assignment stage as a
    first-class output — domain discovery, mixture balancing, and
    per-cluster corpus stats all start here). Pure map-side: centroids
    are plan constants, the argmin is a per-row expression — zero
    shuffle at any scale. Returns ``(id, cluster, sq_dist)`` with the
    squared distance to the winning centroid (rounded 6 for the exact
    oracle compare)."""
    v = F.col(vec_col)
    scored = scored_centroids(v, centroids)
    best = F.element_at(F.array_sort(scored), 1)
    return corpus.select(
        F.col(id_col),
        best["cid"].cast("int").alias("cluster"),
        F.round(best["d"], 6).alias("sq_dist"),
    )


def normalize_embedding(vec: Column) -> Column:
    """Unit-normalize (x / ||x||; the zero vector passes through) —
    deterministic: the norm is the same left-fold ``sqrt(dot)`` the
    oracles mirror, and each element division is a single IEEE op.
    On the unit sphere squared-L2 ranking ≡ cosine ranking, which is
    what lets :func:`semantic_dedup_pairs` use L2 centroids for a
    cosine criterion.

    The norm is bound as a struct FIELD alongside the vector, and the
    struct itself is DOUBLE-bound so every reference to it is a
    lambda-variable field access: referencing the raw ``l2_norm``
    EXPRESSION inside ``transform`` would re-run the O(dim) fold per
    element — O(dim²) per row, measured 12x slower at 20k × dim-64."""
    from scraping_etl_spark.operators.dedup import _bind

    def _with_norm(v: Column) -> Column:
        return F.struct(v.alias("v"), l2_norm(v).alias("n"))

    def _divide(s: Column) -> Column:
        return F.when(
            s["n"] > 0,
            F.transform(s["v"], lambda x: x.cast("double") / s["n"]),
        ).otherwise(F.transform(s["v"], lambda x: x.cast("double")))

    return _bind(_bind(vec, _with_norm), _divide)


def cluster_assign_arrow(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
    normalize: bool = True,
) -> DataFrame:
    """Large-k nearest-centroid assignment via an Arrow-batched
    ``mapInPandas`` (numpy matrix product per batch) — the scale path
    when the cluster count makes the plan-constant expression of
    :func:`cluster_assign` impractical: that expression is O(k·dim)
    literals per row and falls out of whole-stage codegen around
    k ≈ 50-100 (measured: at 20k vectors, dim 64, the k=64 expression
    assignment is SLOWER than k=8 despite 8× fewer downstream pairs —
    PLANS.md round-8 audit), whereas SemDeDup at web scale wants
    thousands of clusters. Here each Arrow batch computes all
    distances as one BLAS ``X @ C.T`` — per-row cost O(k·dim) flops at
    matrix-multiply throughput, still zero shuffle.

    Ties break to the lowest centroid id (numpy argmin = first
    minimum), matching the expression path's (d, cid) order; float
    summation order differs from the sequential fold, so assignments
    can differ on exact-tie boundaries — measure-zero for real
    embeddings (the equivalence test asserts full agreement on the
    driver corpus). This is the documented Python-on-the-hot-path
    exception: vectorized Arrow batches, never per-row Python."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    out_schema = f"{id_col} long, cluster int"
    if keep_vec:
        out_schema = f"{id_col} long, {vec_col} array<float>, cluster int, _nrm double"

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm = np.sqrt((X * X).sum(axis=1))
            if normalize:
                safe = np.where(nrm > 0, nrm, 1.0)
                U = X / safe[:, None]
            else:
                U = X
            # argmin_k ||u - c_k||² = argmin_k (||c_k||² - 2 u·c_k)
            d = cn[None, :] - 2.0 * (U @ C.T)
            cl = np.argmin(d, axis=1).astype("int32")
            cols = {id_col: pdf[id_col].to_numpy(), "cluster": cl}
            if keep_vec:
                cols[vec_col] = pdf[vec_col]
                cols["_nrm"] = nrm
            yield pd.DataFrame(cols)

    return corpus.select(id_col, vec_col).mapInPandas(_assign, out_schema)


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_assign: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — cluster the embedding space, then threshold
    pairwise cosine *within* clusters only): assign every vector to its
    nearest trained centroid (map-side, centroids are plan constants —
    :func:`cluster_assign`), self-join on the cluster id, keep pairs
    with cosine ≥ ``threshold``.

    This is the published algorithm's scale contract: pairwise cost is
    sum of squared *cluster* sizes, not corpus², and the cluster count
    is chosen so each cluster's pairwise block is task-sized (the
    paper runs 50k clusters over 5B embeddings for the same reason).
    The join is a hash equi-join on cluster id; cross-cluster near-dups
    are missed by design (the recall/cost trade the paper measures).

    Assignment runs on UNIT-NORMALIZED vectors (the paper's setting:
    on the unit sphere L2-nearest ≡ cosine-nearest, so same-direction
    vectors always share a cluster regardless of magnitude) — pass
    ``centroids`` trained on normalized vectors. The cosine itself is
    computed on the original arrays (scale cancels).

    Returns ``(id_a, id_b, cluster, cos_sim)`` with ``id_a < id_b``;
    cosine rounded to 6 before the threshold compare so engines agree
    at the boundary. ``arrow_assign=True`` swaps the plan-constant
    assignment expression for :func:`cluster_assign_arrow` — use it
    when the cluster count is production-sized (see that function's
    codegen-ceiling note); the exact-oracle gate keeps the expression
    path."""
    side = _sem_side(corpus, centroids, id_col, vec_col, arrow_assign)
    return _sem_pairs_from_side(side, threshold, id_col)


def _sem_side(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    arrow_assign: bool = False,
) -> DataFrame:
    """Materialized SemDeDup working set ``(id, vec, cluster, ‖v‖)``.

    Two deliberate eager choices: the per-vector norm is hoisted
    BEFORE the pair join (inside a cluster of size m each vector sits
    in m-1 pairs; recomputing ‖v‖ per pair wastes m-2 norm folds per
    vector — at cluster sizes in the thousands that was the dominant
    cost), and the whole projection is ``localCheckpoint``-ed so the
    k-centroid assignment expression — O(k·dim) literals per row,
    large enough to defeat whole-stage codegen at production cluster
    counts — is evaluated ONCE per vector instead of once per join
    side per consumer. The hoisted norm is the identical sqrt(dot)
    fold, so pair cosines stay bit-identical to the oracle."""
    if arrow_assign:
        return cluster_assign_arrow(
            corpus, centroids, id_col=id_col, vec_col=vec_col, keep_vec=True
        ).localCheckpoint()
    unit = normalize_embedding(F.col(vec_col))
    cl = F.element_at(nearest_centroids(unit, centroids, 1), 1)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        cl.alias("cluster"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
    ).localCheckpoint()


def _sem_pairs_from_side(
    side: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    vec_col = side.columns[1]
    a = side.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        "cluster", F.col("_nrm").alias("_na"),
    )
    b = side.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        "cluster", F.col("_nrm").alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den > 0, dot(F.col("_va"), F.col("_vb")) / den).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.col("cluster").cast("int").alias("cluster"), "cos_sim")
    )


def semantic_dedup_survivors(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_assign: bool = False,
) -> DataFrame:
    """Greedy SemDeDup keep-set: within each cluster, drop any vector
    that has a near-duplicate (cosine ≥ ``threshold``) with a SMALLER
    id — the deterministic analogue of the paper's keep-one-per-
    ε-neighborhood sweep (greedy by id order; no transitive closure,
    exactly like the published method). One left-anti join of the
    corpus against the pair list's ``id_b`` side. Returns the
    surviving ``(id, cluster)`` rows."""
    side = _sem_side(corpus, centroids, id_col, vec_col, arrow_assign)
    pairs = _sem_pairs_from_side(side, threshold, id_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    assigned = side.select(F.col(id_col), F.col("cluster").cast("int").alias("cluster"))
    return assigned.join(dropped, id_col, "left_anti").select(
        F.col(id_col), "cluster"
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    probe_vec_col: str = "query_vec",
    seed: int = 7,
    max_iter: int = 5,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k — the cluster-pruned alternative to
    the hyperplane LSH path: k-means partitions the corpus into
    ``n_clusters`` inverted lists, each probe searches only its
    ``n_probe`` nearest centroids, exact cosine runs inside those lists.

    Plan shape at 100 TB: training samples the corpus (``pyspark.ml``
    KMeans, one-time cost, centroids broadcast as plan constants);
    assignment is a per-row expression; the probe→candidate join is a
    hash equi-join on cluster id (n_probe rows per probe — same
    no-cross-join contract as the LSH path). Recall rises with
    ``n_probe`` (= brute force at n_probe = n_clusters).

    Uses ``pyspark.ml.clustering.KMeans`` with a fixed seed; training
    is an action (the one eager step), so build the index once with
    :func:`ivf_train` and pass ``centroids`` to amortize it across
    queries — exactly what a production deployment does."""
    if centroids is None:
        centroids = ivf_train(
            corpus, n_clusters=n_clusters, vec_col=vec_col,
            seed=seed, max_iter=max_iter,
        )

    def _nearest(vec: Column, n: int) -> Column:
        return nearest_centroids(vec, centroids, n)

    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.element_at(_nearest(F.col(vec_col), 1), 1).alias("_cluster"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("_pid"),
        F.col(probe_vec_col).alias("_pvec"),
        F.explode(_nearest(F.col(probe_vec_col), n_probe)).alias("_cluster"),
        l2_norm(F.col(probe_vec_col)).alias("_pnrm"),
    )
    # norm folds hoisted out of the candidate loop (same arithmetic,
    # oracle-exact — see _sem_side)
    den = F.col("_pnrm") * F.col("_cnrm")
    cos = F.when(den > 0, dot(F.col("_pvec"), F.col("_cvec")) / den).otherwise(
        F.lit(0.0)
    )
    scored = (
        c.join(p, "_cluster")
        .filter(F.col("_pid") != F.col("_cid"))
        .withColumn("_cos", cos)
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(probe_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.round("_cos", 6).alias("cos_sim"),
        )
    )

def hard_negatives_ivf(
    corpus: DataFrame,
    anchors: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.8,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "anchor_id",
    anchor_vec_col: str = "anchor_vec",
) -> DataFrame:
    """IVF scale tier of :func:`hard_negatives` — the variant for
    LARGE anchor sets, where broadcasting anchors against the full
    corpus (the brute tier's plan) stops being one cheap map-side
    pass: corpus vectors live in their nearest-centroid inverted list
    (:func:`ivf_topk`'s layout, trained once via :func:`ivf_train`),
    each anchor probes only its ``n_probe`` nearest cells, and the
    band + rank run inside the probed lists. The candidate join is a
    hash equi-join on cluster id — never a cross join — and the band
    filter commutes with cell pruning (it only removes rows ranked
    downstream), so at ``n_probe = n_clusters`` the output EQUALS the
    brute tier exactly (the recall contract the unit suite pins);
    below that it is the standard IVF recall trade."""
    if not (0.0 <= lo < hi <= 1.0 + 1e-12):
        raise ValueError(f"need 0 <= lo < hi <= 1, got [{lo}, {hi})")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.element_at(nearest_centroids(F.col(vec_col), centroids, 1), 1)
        .alias("_cluster"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    a = anchors.select(
        F.col(anchor_id_col).alias("_pid"),
        F.col(anchor_vec_col).alias("_pvec"),
        F.explode(
            nearest_centroids(F.col(anchor_vec_col), centroids, n_probe)
        ).alias("_cluster"),
        l2_norm(F.col(anchor_vec_col)).alias("_pnrm"),
    )
    den = F.col("_pnrm") * F.col("_cnrm")
    cos = F.when(den > 0, dot(F.col("_pvec"), F.col("_cvec")) / den).otherwise(
        F.lit(0.0)
    )
    scored = (
        c.join(a, "_cluster")
        .filter(F.col("_pid") != F.col("_cid"))
        .withColumn("_cos", cos)
        .filter((F.col("_cos") >= lo) & (F.col("_cos") < hi))
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(anchor_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.round("_cos", 6).alias("cos_sim"),
        )
    )


#: Broadcast the benchmark embedding set only below this many vectors —
#: same measured-guard pattern as corpus_prep.MAX_BROADCAST_GRAMS.
#: Benchmark suites are small by construction (10^4-10^6 items even for
#: a large eval battery), so the broadcast path is the expected one;
#: past the cap the hint is dropped and Spark falls back to a
#: shuffle-backed nested-loop — still correct, just no longer the
#: map-side screen.
MAX_BROADCAST_BENCH_VECS = 500_000


def embedding_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    max_broadcast_vecs: int = MAX_BROADCAST_BENCH_VECS,
    exclude_same_id: bool = True,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic sibling
    of the k-gram ``corpus_prep.decontaminate`` screen: flag corpus
    vectors whose cosine similarity to ANY benchmark vector reaches
    ``threshold`` (paraphrased eval items that share no exact n-gram
    still sit next to the benchmark in embedding space).

    Output: one row per contaminated corpus vector —
    ``(id, bench_id, cos_sim, n_bench_hits)`` where ``bench_id`` is the
    closest benchmark item (ties → smallest id) and ``n_bench_hits``
    counts benchmark items at/above the threshold.

    Plan shape at 100 TB: the benchmark side is SMALL by definition, so
    it broadcasts (measured, not assumed — a bounded ``limit(n+1)
    .count()`` probe, the same guard as the k-gram screen) and the scan
    over the 100 TB corpus is one map-side pass: cosine against the
    broadcast set, filter, then a rank window over the FLAGGED rows
    only (contamination rates are ~1e-3, so the window input is tiny).
    The threshold compares against the ROUNDED cosine (6 dp, house
    convention) so the boundary is engine-portable.

    ``exclude_same_id`` (default True) drops (corpus, bench) pairs
    whose ids coincide — right when the two relations can overlap
    (the benchmark carved out of the corpus itself). Pass False when
    corpus and bench are DISTINCT relations that may legitimately
    reuse an id — e.g. the streaming ingest screen, where a record
    re-delivered under its original id in a later batch must still be
    screened against its own lake copy (r14 ADVICE).

    Past ``max_broadcast_vecs`` the broadcast hint is dropped and the
    all-pairs comparison plans as a shuffle-backed nested loop — with
    ``exclude_same_id=False`` the join condition is literal-true, so
    Spark plans a CartesianProduct rather than a BNLJ-with-predicate
    (same asymptotics, different node). Either way the over-cap regime
    is the documented scale cliff: callers whose reference side
    outgrows the cap should move to
    :func:`embedding_decontaminate_ivf`, whose candidate join is a
    cell-id hash equi-join at any scale (the streaming screen's
    ``ivf_centroids`` escalation; plan shapes pinned in
    tests/test_plan_shapes.py)."""
    b = bench.select(
        F.col(bench_id_col).alias("_bid"),
        F.col(bench_vec_col).alias("_bvec"),
        l2_norm(F.col(bench_vec_col)).alias("_bnrm"),
    )
    fits = (
        max_broadcast_vecs > 0
        and b.limit(max_broadcast_vecs + 1).count() <= max_broadcast_vecs
    )
    b_side = F.broadcast(b) if fits else b
    # norms hoisted to the per-row projections (the SemDeDup lesson —
    # _sem_side): each corpus vector sits in |bench| pairs, so the
    # per-pair work must be the dot fold alone. Identical sqrt(dot)
    # arithmetic, so pair cosines stay bit-identical to the oracle.
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    den = F.col("_cnrm") * F.col("_bnrm")
    cos = F.when(den > 0, dot(F.col("_cvec"), F.col("_bvec")) / den).otherwise(
        F.lit(0.0)
    )
    pair_cond = (
        F.col("_cid") != F.col("_bid") if exclude_same_id else F.lit(True)
    )
    flagged = (
        c.join(b_side, pair_cond)
        .withColumn("_cos", F.round(cos, 6))
        .filter(F.col("_cos") >= threshold)
    )
    w = Window.partitionBy("_cid").orderBy(F.desc("_cos"), F.asc("_bid"))
    wn = Window.partitionBy("_cid")
    return (
        flagged.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_bench_hits", F.count(F.lit(1)).over(wn))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_cid").alias(id_col),
            F.col("_bid").alias("bench_id"),
            F.col("_cos").alias("cos_sim"),
            F.col("n_bench_hits").cast("long").alias("n_bench_hits"),
        )
    )


def embedding_decontaminate_ivf(
    corpus: DataFrame,
    bench: DataFrame,
    centroids: "list[list[float]]",
    threshold: float = 0.95,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    exclude_same_id: bool = True,
    bench_cell_col: "str | None" = None,
) -> DataFrame:
    """IVF scale tier of :func:`embedding_decontaminate` — for when
    the reference side is NOT small: the streaming ingest screen's
    vector lake grows without bound, and past the broadcast cap the
    expression tier's fallback is a shuffle-backed all-pairs join.
    Here the lake/bench side lives in its nearest-centroid inverted
    list (one cell per vector, :func:`ivf_train`'s layout) and each
    corpus/batch vector probes only its ``n_probe`` nearest cells, so
    the candidate join is a hash EQUI-join on cell id — never
    all-pairs — and per-corpus-row work is bounded by the probed
    lists' size.

    ``bench_cell_col`` names a column on ``bench`` that already holds
    each row's nearest-centroid cell id (the value
    ``nearest_centroids(vec, centroids, 1)[0]`` would compute). When
    the bench side is a persistent lake re-screened every micro-batch,
    assigning the cell ONCE at land time and passing the stored column
    here keeps the per-trigger cost proportional to the batch, not
    O(|lake| x |centroids| x dim) — the streaming ingest screen's
    deployment shape. Rows whose stored cell is null (e.g. lake
    partitions landed before cells were stored, read under
    mergeSchema) fall back to the on-the-fly assignment per row.

    Output schema and every convention match the expression tier
    (rounded-cosine threshold, closest-bench argmax with smallest-id
    ties, ``n_bench_hits`` over the threshold set — here counted
    within the probed cells, the standard IVF recall trade). At
    ``n_probe = len(centroids)`` every (corpus, bench) pair is
    compared and the output EQUALS the expression tier exactly (the
    contract the unit suite pins). Exact duplicates are caught at ANY
    ``n_probe``: an identical vector assigns to the same nearest cell
    as its copy, and the probe list starts with the vector's own
    cell."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    bench_cell = F.element_at(
        nearest_centroids(F.col(bench_vec_col), centroids, 1), 1
    )
    if bench_cell_col is not None:
        # stored-cell fast path: coalesce evaluates the on-the-fly
        # assignment only for rows where the stored cell is null
        bench_cell = F.coalesce(
            F.col(bench_cell_col).cast("int"), bench_cell
        )
    b = bench.select(
        F.col(bench_id_col).alias("_bid"),
        F.col(bench_vec_col).alias("_bvec"),
        bench_cell.alias("_cell"),
        l2_norm(F.col(bench_vec_col)).alias("_bnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.explode(
            nearest_centroids(F.col(vec_col), centroids, n_probe)
        ).alias("_cell"),
        l2_norm(F.col(vec_col)).alias("_cnrm"),
    )
    den = F.col("_cnrm") * F.col("_bnrm")
    cos = F.when(den > 0, dot(F.col("_cvec"), F.col("_bvec")) / den).otherwise(
        F.lit(0.0)
    )
    flagged = c.join(b, "_cell")
    if exclude_same_id:
        flagged = flagged.filter(F.col("_cid") != F.col("_bid"))
    flagged = flagged.withColumn("_cos", F.round(cos, 6)).filter(
        F.col("_cos") >= threshold
    )
    w = Window.partitionBy("_cid").orderBy(F.desc("_cos"), F.asc("_bid"))
    wn = Window.partitionBy("_cid")
    return (
        flagged.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_bench_hits", F.count(F.lit(1)).over(wn))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_cid").alias(id_col),
            F.col("_bid").alias("bench_id"),
            F.col("_cos").alias("cos_sim"),
            F.col("n_bench_hits").cast("long").alias("n_bench_hits"),
        )
    )


def embedding_decontaminate_arrow(
    corpus: DataFrame,
    bench_matrix: "list[tuple[int, list[float]]]",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/BLAS tier of :func:`embedding_decontaminate` — the same
    production-scale escape hatch as :func:`cluster_assign_arrow`: the
    expression tier pays an interpreted dot-fold per (corpus, bench)
    pair (measured 12 s for 19k x 1k at dim 64 — PLANS.md round-8
    audit), where one BLAS ``X @ B.T`` per Arrow batch does the same
    flops at matmul throughput. Use when the benchmark set is
    thousands+ of vectors; the expression tier remains the
    oracle-exact gate.

    ``bench_matrix`` is the collected benchmark as ``[(bench_id,
    vector), ...]`` — benchmarks are small by definition (the same
    rationale as the broadcast in the expression tier); collect once
    via ``prepare_bench_matrix`` and reuse across corpora/batches.

    Output schema matches the expression tier: ``(id, bench_id,
    cos_sim, n_bench_hits)`` for flagged rows, cos rounded to 6,
    threshold applied to the rounded value, argmax ties to the
    smallest bench id. BLAS summation order differs from the
    sequential fold by ulps, so rows at the exact rounding boundary
    can differ — the documented Arrow-tier trade (equivalence asserted
    on the driver corpus by the unit suite)."""
    import numpy as np
    import pandas as pd

    ids = np.asarray([i for i, _ in bench_matrix], dtype=np.int64)
    B = np.asarray([v for _, v in bench_matrix], dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, B = ids[order], B[order]  # argmax ties -> smallest bench id
    bn = np.sqrt((B * B).sum(axis=1))
    out_schema = f"{id_col} long, bench_id long, cos_sim double, n_bench_hits long"

    def _screen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xn = np.sqrt((X * X).sum(axis=1))
            den = xn[:, None] * bn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den > 0, (X @ B.T) / den, 0.0)
            # self-pairs excluded like the expression tier
            cid = pdf[id_col].to_numpy()
            cos[cid[:, None] == ids[None, :]] = -np.inf
            cos = np.round(cos, 6)
            hits = cos >= threshold
            n_hits = hits.sum(axis=1)
            flagged = n_hits > 0
            if not flagged.any():
                continue
            best = np.argmax(cos[flagged], axis=1)
            yield pd.DataFrame({
                id_col: cid[flagged],
                "bench_id": ids[best],
                "cos_sim": cos[flagged, best],
                "n_bench_hits": n_hits[flagged].astype(np.int64),
            })

    return corpus.select(id_col, vec_col).mapInPandas(_screen, out_schema)


def prepare_bench_matrix(
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_vecs: int = MAX_BROADCAST_BENCH_VECS,
) -> "list[tuple[int, list[float]]]":
    """Collect the benchmark side once for
    :func:`embedding_decontaminate_arrow` — bounded by the same cap as
    the expression tier's broadcast (raises past it: a benchmark that
    large should ride the shuffle path of the expression tier)."""
    rows = bench.select(id_col, vec_col).limit(max_vecs + 1).collect()
    if len(rows) > max_vecs:
        raise ValueError(
            f"benchmark exceeds {max_vecs} vectors; use the expression "
            "tier's shuffle fallback instead"
        )
    return [(r[0], list(r[1])) for r in rows]


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid 2011, "Product
# quantization for nearest neighbor search")
# ---------------------------------------------------------------------------

def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 5,
) -> list[list[list[float]]]:
    """Train the PQ codebooks: split the ``dim`` dimensions into ``m``
    contiguous subspaces and k-means each subspace independently
    (``m`` small train-once jobs, the ``ivf_train`` convention).
    Returns ``codebooks[j] = k x (dim/m)`` centroid lists — plan
    constants for encode/query, embeddable in a DuckDB oracle.

    PQ's scale contract (the paper's): the corpus is stored as
    ``m`` one-byte-ish codes per vector instead of ``dim`` floats
    (here 8 ints vs 64 floats — 32x less scan bandwidth), and query
    distance becomes ``m`` table lookups instead of ``dim`` multiplies.
    """
    if m < 1 or k < 2:
        raise ValueError(f"need m >= 1 and k >= 2, got m={m} k={k}")
    first = corpus.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError("pq_train: empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m

    # The m subspace fits are INDEPENDENT jobs (disjoint column slices,
    # own seeds): submit them from a small thread pool so each fit's
    # straggler tail back-fills with the next subspace's tasks instead
    # of idling the cluster (guide §2.6 — overlap independent jobs).
    # Results are identical to the sequential loop: every fit is
    # deterministic in (data, seed) and shares nothing mutable.
    def _fit(j: int) -> list[list[float]]:
        sliced = corpus.select(
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("v")
        )
        return ivf_train(sliced, n_clusters=k, vec_col="v", seed=seed + j,
                         max_iter=max_iter)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, m)) as pool:
        return list(pool.map(_fit, range(m)))


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-subcentroid codes —
    pure map-side expressions over codebook plan constants (the
    ``cluster_assign`` argmin per subspace; ties (d, cid)-lexicographic
    so both engines agree). Zero shuffle. For codebook budgets beyond
    expression reach (m*k in the thousands) the ``cluster_assign_arrow``
    convention applies per subspace — this expression tier is the
    oracle-mirrorable gate path. Returns ``(id, pq_code array<int>)``.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    k = len(codebooks[0])
    if any(len(b) != k for b in codebooks):
        raise ValueError("pq_encode: codebooks must share one size")
    # ONE rank-3 literal (m x k x sub) + a transform over the subspace
    # index: the per-subspace tree construction (m separate literal +
    # lambda trees, hundreds of py4j round-trips) still dominated plan
    # construction after the r14 nested-literal fix — fusing the m
    # subspaces into one indexed expression is O(1) in m (measured r17:
    # 1.47 -> 0.81 s build, codes bit-identical — same left-fold
    # squared distance and (d, cid)-lexicographic argmin per subspace)
    allb = F.lit([[[float(x) for x in c] for c in b] for b in codebooks])

    def _code(j: Column) -> Column:
        mat = F.element_at(allb, j + 1)

        def _nearest(sv):
            scored = _scored_centroids_mat(sv, mat, k)
            return F.element_at(F.array_sort(scored), 1)["cid"]

        # bind the sliced subvector once (single-evaluation hazard)
        return F.element_at(
            F.transform(
                F.array(F.slice(F.col(vec_col), j * sub + 1, sub)), _nearest
            ),
            1,
        )

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _code)
    return corpus.select(
        F.col(id_col), codes.cast("array<int>").alias("pq_code")
    )


def pq_adc_tables(
    codebooks: list[list[list[float]]], query: list[float]
) -> list[list[float]]:
    """The query's asymmetric-distance lookup tables:
    ``T[j][c] = ||q_j - codebook_j[c]||^2`` — computed ONCE driver-side
    in float64 and embedded as identical literals in the Spark plan and
    the DuckDB oracle (no cross-engine float derivation to disagree
    on)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    tables: list[list[float]] = []
    for j in range(m):
        qj = query[j * sub: (j + 1) * sub]
        tables.append(
            [
                sum((float(a) - float(b)) * (float(a) - float(b))
                    for a, b in zip(qj, c))
                for c in codebooks[j]
            ]
        )
    return tables


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    probes: list[tuple[int, list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-``k`` per probe over the ENCODED corpus: approximate
    distance = sum of ``m`` table lookups
    (``T_j[code_j]``, left-to-right double adds — bit-identical on any
    engine given identical codes and tables), ordered
    (distance, neighbor id) with ``TakeOrderedAndProject`` per probe.
    The corpus side reads only the ``m``-int code column — PQ's whole
    point at 100 TB: the scan is code-bandwidth, not vector-bandwidth,
    and no shuffle touches anything but the k survivors per probe.
    Returns ``(query_id, neighbor_id, adc_dist, rank)`` with the
    distance rounded to 6 for the cross-engine gate."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not probes:
        raise ValueError("probes must be non-empty")
    # every probe branch scans the code relation; without a cut the
    # per-row argmin ENCODE expression upstream re-evaluates once per
    # probe (the emb_ivfpq_topk audit's finding — m x k x dim work
    # times n_probes). Materialize the m-int codes once; the branches
    # then read code bandwidth, which is PQ's whole point.
    encoded = encoded.select(F.col(id_col), "pq_code").localCheckpoint()
    parts = []
    for qid, qvec in probes:
        tables = pq_adc_tables(codebooks, list(qvec))
        dist = None
        for j, tj in enumerate(tables):
            term = F.element_at(
                F.array(*[F.lit(float(t)) for t in tj]),
                F.element_at("pq_code", j + 1) + 1,
            )
            dist = term if dist is None else (dist + term)
        scored = encoded.select(
            F.lit(qid).cast("long").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(dist, 6).alias("adc_dist"),
        )
        parts.append(scored.orderBy("adc_dist", "neighbor_id").limit(k))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC): coarse quantizer + product quantization on residuals
# ---------------------------------------------------------------------------

def centroid_matrix(centroids: list[list[float]]) -> Column:
    """The centroid table as one array-of-arrays plan constant."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def with_residual(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-assign every vector and attach its residual
    ``v - centroid[cluster]`` — the quantity IVFADC product-quantizes
    (Jégou et al. 2011 §IV: residuals are far more compressible than
    raw vectors, so the same code budget buys much lower distortion).
    Two chained projections keep every derived quantity
    single-evaluated (the PLANS.md outer-ref hazard): the cluster
    argmin lands as a REAL column first, then the residual reads it.
    Pure map-side — centroids are plan constants. Returns
    ``(id, cluster, residual array<double>)``."""
    v = F.col(vec_col)
    scored = scored_centroids(v, centroids)
    assigned = corpus.select(
        F.col(id_col),
        v.alias("_v"),
        F.element_at(F.array_sort(scored), 1)["cid"].cast("int").alias("cluster"),
    )
    cent = F.element_at(centroid_matrix(centroids), F.col("cluster") + 1)
    return assigned.select(
        id_col,
        "cluster",
        F.zip_with(
            F.col("_v"), cent, lambda a, b: a.cast("double") - b
        ).alias("residual"),
    )


def ivfpq_train(
    corpus: DataFrame,
    n_clusters: int = 8,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVFADC index: coarse k-means centroids, then PQ
    codebooks over the RESIDUALS (train-once eager step, the
    ``ivf_train`` convention — both artifacts are plan constants).
    Returns ``(centroids, codebooks)``."""
    centroids = ivf_train(corpus, n_clusters=n_clusters, vec_col=vec_col,
                          seed=seed)
    res = with_residual(corpus, centroids, vec_col=vec_col)
    books = pq_train(res, m=m, k=k, vec_col="residual", seed=seed)
    return centroids, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus for IVFADC: coarse cluster + ``m`` residual
    subspace codes per vector — all map-side expression work over plan
    constants, zero shuffle. In production the encoded table is
    WRITTEN PARTITIONED BY ``cluster`` so a query's scan touches only
    its ``n_probe`` inverted lists (partition pruning does the list
    selection); the in-memory form here filters on the cluster column
    instead — same plan semantics, file skipping aside. Returns
    ``(id, cluster, pq_code array<int>)``."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    k = len(codebooks[0])
    if any(len(b) != k for b in codebooks):
        raise ValueError("ivfpq_encode: codebooks must share one size")
    res = with_residual(corpus, centroids, id_col, vec_col)
    # same m-subspace fusion as pq_encode (one rank-3 literal, O(1)
    # plan in m); the per-subspace argmin mirrors nearest_centroids'
    # (distance, cid)-lexicographic pick exactly
    allb = F.lit([[[float(x) for x in c] for c in b] for b in codebooks])

    def _code(j: Column) -> Column:
        mat = F.element_at(allb, j + 1)

        def _nearest(sv):
            scored = _scored_centroids_mat(sv, mat, k)
            return F.element_at(F.array_sort(scored), 1)["cid"]

        return F.element_at(
            F.transform(
                F.array(F.slice(F.col("residual"), j * sub + 1, sub)),
                _nearest,
            ),
            1,
        )

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _code)
    return res.select(
        F.col(id_col), "cluster",
        codes.cast("array<int>").alias("pq_code"),
    )


def ivfpq_topk(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    probes: list[tuple[int, list[float]]],
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC top-``k``: per probe, rank the coarse centroids
    DRIVER-SIDE (centroids are plan constants — the ranking is
    arithmetic on literals, not a job), visit the ``n_probe`` nearest
    inverted lists, and within each list estimate
    ``||q - (centroid + residual)||^2`` as the ADC sum over tables
    built from ``q - centroid_c`` — m lookups per candidate, the
    partition-pruned code-bandwidth scan that makes IVFADC the
    standard billion-scale layout.

    Plan: ONE pass — the ``(query, probed cluster, lookup tables)``
    relation (``probes × n_probe`` rows of driver-computed literals)
    broadcast-joins the code table on ``cluster``, so a code row is
    read once and scored only for the queries that probed its list;
    then one rank window per query. An earlier shape built a
    ``TakeOrderedAndProject`` branch per (probe, list) — plan width
    (and local wall-clock) grew linearly in ``probes × n_probe`` for
    the same rows read. The window shuffles only probed-list
    candidates (|list| × n_probe per query — exactly the rows IVFADC
    scans by contract). Returns
    ``(query_id, neighbor_id, cluster, adc_dist, rank)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 1 <= n_probe <= len(centroids):
        raise ValueError(
            f"n_probe must be in [1, {len(centroids)}], got {n_probe}"
        )
    if not probes:
        raise ValueError("probes must be non-empty")
    m = len(codebooks)
    rows = []
    for qid, qvec in probes:
        coarse = sorted(
            (
                sum((float(a) - float(b)) ** 2 for a, b in zip(qvec, c)),
                cid,
            )
            for cid, c in enumerate(centroids)
        )[:n_probe]
        for _, cid in coarse:
            resq = [
                float(a) - float(b) for a, b in zip(qvec, centroids[cid])
            ]
            rows.append((qid, cid, pq_adc_tables(codebooks, resq)))
    probe_rel = encoded.sparkSession.createDataFrame(
        rows, "query_id long, cluster int, tabs array<array<double>>"
    )
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at("tabs", j + 1), F.element_at("pq_code", j + 1) + 1
        )
        dist = term if dist is None else (dist + term)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        encoded.join(F.broadcast(probe_rel), "cluster")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "cluster",
            F.round(dist, 6).alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


#: Fixed-point grid of the distributed k-means centroid updates:
#: coordinate sums ride an integer lattice so any partial-aggregation
#: order gives the bit-same centroid on every engine (the
#: ``token_divergence`` / ``host_pagerank`` convention).
KMEANS_FX_SCALE = 10**6


def kmeans_train_fx(
    corpus: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 4,
    fx_scale: int = KMEANS_FX_SCALE,
) -> list[list[float]]:
    """DISTRIBUTED Lloyd's k-means with exactly-reproducible arithmetic
    — the in-cluster alternative to :func:`ivf_train`'s MLlib call
    when the training corpus itself is lake-scale (MLlib's k-means||
    init samples fine, but its float centroid sums are
    partitioning-dependent; an exactness gate can't hash them).

    - **Init**: the ``n_clusters`` rows with the smallest
      ``(md5(id), id)`` — a deterministic scatter (md5 is a uniform
      hash, so seeds are corpus-spread), one TakeOrdered, k vectors
      collected (model-scale).
    - **Assignment**: centroids ride as plan constants; the argmin is
      the per-row ``(distance, cid)``-lexicographic expression of
      :func:`nearest_centroids` — pure map, zero shuffle.
    - **Update**: per (cluster, coordinate) sums on the
      :data:`KMEANS_FX_SCALE` integer lattice — ``posexplode`` +
      partial agg, k x d longs + counts to the driver per iteration
      (model state, not data; the ``ivf_train`` convention). Integer
      sums are associative, so the new centroids are bit-identical
      under any partitioning, which is what lets the DuckDB oracle
      replay the ENTIRE training fixpoint (plans/ml_ops.py
      ``ORACLE_EMB_KMEANS_TRAIN``). Empty clusters keep their previous
      centroid.

    At 100 TB: per iteration one corpus scan, one (k x d)-bounded
    partial-agg shuffle; int64 headroom is ``|x| * fx_scale * rows``
    per (cluster, coordinate) — at |x| <= 8, fx 1e6, that allows ~1e12
    member rows per cluster before overflow; raise the grid coarser or
    split the sum hierarchically beyond that.
    """
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    seeds = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    if len(seeds) < n_clusters:
        raise ValueError(
            f"kmeans_train_fx: corpus has {len(seeds)} rows < k={n_clusters}"
        )
    cents = [[float(x) for x in r[vec_col]] for r in seeds]
    d = len(cents[0])
    v = F.col(vec_col)
    # AQE off for the update loop only (the train_logreg convention,
    # r17): the per-iteration aggregate lands on k x d bounded rows —
    # nothing for AQE to re-plan — but under AQE every iteration
    # schedules TWO jobs (shuffle materialization + final stage)
    # instead of one. The integer-lattice sums are associative, so the
    # collected model state is bit-identical under any post-shuffle
    # partitioning. Restored in ``finally``.
    spark = corpus.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(iters):
            scored = scored_centroids(v, cents)
            best = F.element_at(F.array_sort(scored), 1)["cid"].cast("int")
            xfx = F.round(
                F.col("_x").cast("double") * F.lit(float(fx_scale)), 0
            ).cast("long")
            sums = (
                # two-step projection: a lambda-bearing struct
                # expression and a generator in ONE select trips the
                # analyzer (struct field names degrade to col1/col2);
                # assigning the cluster first keeps the plan identical
                # after collapse
                corpus.select(best.alias("_cid"), v.alias("_v"))
                .select("_cid", F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_cid", "_pos")
                .agg(F.sum(xfx).alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            new = [c[:] for c in cents]
            for r in sums:
                new[r["_cid"]][r["_pos"]] = float(r["_s"]) / (
                    float(fx_scale) * float(r["_n"])
                )
            cents = new
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return cents


def top_pc_fx(
    corpus: DataFrame,
    iters: int = 3,
    fx_scale: int = KMEANS_FX_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pc",
) -> "tuple[list[float], list[float], int]":
    """Top principal component of the embedding corpus by DISTRIBUTED
    fixed-point power iteration (von Mises iteration over the centered
    second moment) — the model behind all-but-the-top embedding
    postprocessing (Mu & Viswanath, ICLR 2018: isotropy improves after
    removing the common mean + dominant direction), anisotropy
    diagnostics, and spectral corpus profiling. Returns ``(mu, v, n)``
    — the per-coordinate mean, the unit top-PC direction, and the row
    count — as plan constants for map-side serving.

    Never materializes the d×d covariance: each iteration computes the
    per-row projection ``d_i = (x_i − μ)·v_t`` (one double fold) and
    accumulates ``Σ_i d_i (x_i − μ)`` per coordinate on the
    :data:`KMEANS_FX_SCALE` integer lattice (``posexplode`` + partial
    agg — associative, so bit-identical under any partitioning, the
    :func:`kmeans_train_fx` recipe), then renormalizes driver-side in
    fixed coordinate order. Init is the centered vector of the
    ``(md5(salt:id), id)``-smallest row, unit-normalized — fully
    deterministic, so the DuckDB oracle replays the ENTIRE run
    (plans/ml_ops.py ``ORACLE_EMB_TOP_PC``); the sign of ``v`` is the
    deterministic sign the init's projection fixes (power iteration
    never flips it).

    At 100 TB: per iteration one corpus scan + one d-bounded partial
    agg; state to the driver is d longs per round (model-scale).
    int64 headroom per coordinate is ``|d_i (x_ij − μ_j)| * fx_scale *
    rows`` — at unit-scale embeddings and fx 1e6 that allows ~1e9
    rows per partial sum; coarsen the grid or sum hierarchically past
    that."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    v = F.col(vec_col)
    xfx = F.round(
        F.col("_x").cast("double") * F.lit(float(fx_scale)), 0
    ).cast("long")
    msum = (
        corpus.select(F.posexplode(v).alias("_p", "_x"))
        .groupBy("_p")
        .agg(F.sum(xfx).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    if not msum:
        raise ValueError("top_pc_fx: empty corpus")
    n = int(msum[0]["_n"])
    mu = [0.0] * len(msum)
    for r in msum:
        mu[r["_p"]] = float(r["_s"]) / (float(fx_scale) * float(r["_n"]))
    mu_arr = F.array(*[F.lit(m) for m in mu])
    cen = F.zip_with(v, mu_arr, lambda a, b: a.cast("double") - b)
    base = corpus.select(
        F.col(id_col).alias("_id"), cen.alias("_c")
    ).localCheckpoint()  # consumed once per iteration + the seed pick

    seed = (
        base.orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col("_id").cast("string"))),
            F.col("_id"),
        )
        .limit(1)
        .collect()[0]
    )
    cur = [float(x) for x in seed["_c"]]
    nrm = _host_l2(cur)
    if nrm == 0.0:
        raise ValueError(
            "top_pc_fx: the md5-seed row equals the corpus mean — "
            "degenerate init (pass a different salt)"
        )
    cur = [x / nrm for x in cur]
    for _ in range(iters):
        vlit = F.array(*[F.lit(x) for x in cur])
        proj = F.aggregate(
            F.zip_with(F.col("_c"), vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sums = (
            base.select(proj.alias("_d"), F.col("_c"))
            .select("_d", F.posexplode("_c").alias("_p", "_x"))
            .groupBy("_p")
            .agg(
                F.sum(
                    F.round(
                        F.col("_d") * F.col("_x") * F.lit(float(fx_scale)), 0
                    ).cast("long")
                ).alias("_s")
            )
            .collect()
        )
        raw = [0.0] * len(cur)
        for r in sums:
            raw[r["_p"]] = float(r["_s"]) / float(fx_scale)
        nrm = _host_l2(raw)
        if nrm == 0.0:  # centered corpus annihilated the iterate
            break
        cur = [x / nrm for x in raw]
    return mu, cur, n


def _host_l2(xs: "list[float]") -> float:
    """Driver-side L2 norm in FIXED ascending-coordinate order — the
    exact left fold the DuckDB oracles replay with ``list_reduce``
    (``0.0 + a ≡ a`` under IEEE, so the init-vs-first-element
    difference is exact)."""
    import math

    s = 0.0
    for x in xs:
        s += x * x
    return math.sqrt(s)


def kcenter_select(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kc",
) -> "list[tuple[int, int, float | None, list[float]]]":
    """Greedy k-center / farthest-point DIVERSITY selection (Gonzalez,
    TCS 1985 — the 2-approximation for minimax-radius cover; the
    core-set data-selection recipe of Sener & Savarese, ICLR 2018):
    pick a deterministic md5-seeded start, then ``k - 1`` times the
    point FARTHEST (max-min squared L2) from everything selected so
    far — the maximally diverse training-data subset, the opposite
    knob from SemDeDup's redundancy removal.

    Returns ``[(sel_rank, id, radius, vector), ...]`` where ``radius``
    is the selected point's min squared distance to all earlier picks
    at selection time (round-6, the engine-parity convention; ``None``
    for the seed) — a non-increasing sequence, and the cover radius of
    the first ``r`` picks is row ``r + 1``'s value. Feed the vectors
    to :func:`cluster_assign` to materialize the cover assignment.

    Determinism: the seed is the smallest ``(md5(salt:id), id)``; each
    round's argmax breaks ties on the smallest id; every pairwise
    distance goes through :func:`centroid_sq_dist`'s left fold and is
    rounded to 6 before the min/argmax, so the DuckDB oracle replays
    the whole greedy run CTE-for-CTE (plans/ml_ops.py
    ``ORACLE_EMB_KCENTER_SELECT``). Selected ids leave the pool, so
    exact-duplicate vectors can never re-select a center.

    At 100 TB: per round one map (update the single running ``_mind``
    column against the new center, a plan constant) + one TakeOrdered
    — k scans total, k model-scale collects, state is one double per
    row localCheckpointed per round (the ``neardup_clusters``
    convention, keeping the plan linear instead of k-deep)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pool = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    seed_rows = (
        pool.orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col("_id").cast("string"))),
            F.col("_id"),
        )
        .limit(1)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kcenter_select: empty corpus")
    seed = seed_rows[0]
    seed_vec = [float(x) for x in seed["_v"]]
    selected: list[tuple[int, int, float | None, list[float]]] = [
        (1, seed["_id"], None, seed_vec)
    ]
    cur = (
        pool.filter(F.col("_id") != seed["_id"])
        .withColumn(
            "_mind", F.round(centroid_sq_dist(seed_vec, F.col("_v")), 6)
        )
        .localCheckpoint()
    )
    for rank in range(2, k + 1):
        top_rows = (
            cur.orderBy(F.desc("_mind"), F.asc("_id")).limit(1).collect()
        )
        if not top_rows:  # pool exhausted (k > |corpus|)
            break
        top = top_rows[0]
        vec = [float(x) for x in top["_v"]]
        selected.append((rank, top["_id"], float(top["_mind"]), vec))
        cur = (
            cur.filter(F.col("_id") != top["_id"])
            .withColumn(
                "_mind",
                F.least(
                    F.col("_mind"),
                    F.round(centroid_sq_dist(vec, F.col("_v")), 6),
                ),
            )
            .localCheckpoint()
        )
    return selected


def matryoshka_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dims: "tuple[int, ...]" = (16, 32, 64),
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    probe_vec_col: str = "query_vec",
) -> DataFrame:
    """Matryoshka prefix-dimension retrieval (Kusupati et al.,
    "Matryoshka Representation Learning", NeurIPS 2022): serve exact
    cosine top-k at each PREFIX truncation of the embedding — the
    adaptive-deployment trade MRL-trained encoders exist for (coarse
    dims for cheap shortlist, full dims for final ranking), quantified
    the same way :func:`quantize_embedding`'s int8 tier is: per-tier
    ranks side by side plus an ``in_full_topk`` agreement flag against
    the largest-dim tier.

    Output: ``(tier, probe_id, rank, neighbor_id, cos_sim,
    in_full_topk)`` with ``tier = 'd<dim>'`` — one :func:`cosine_topk`
    run per dim over ``slice(vec, 1, d)``; the flag marks whether the
    row's neighbor also appears in the reference (largest-dim) top-k
    for its query.

    Scale shape: truncation is a map-side ``slice`` (at 100 TB the
    real win is scanning d/D of the vector bytes — with a columnar
    layout storing prefix blocks separately, the narrow tiers read
    proportionally less); each tier is the brute generator's
    broadcast-probes shape; the agreement join broadcasts the
    (|probes|·k)-row reference relation. Every tier is rounded-6 /
    smallest-id deterministic, so the whole union hashes against one
    static oracle."""
    ds = sorted({int(d) for d in dims})
    if not ds or ds[0] < 1:
        raise ValueError(f"dims must be positive, got {dims!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = None
    for d in ds:
        c = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        p = probes.select(
            F.col(probe_id_col),
            F.slice(F.col(probe_vec_col), 1, d).alias(probe_vec_col),
        )
        t = cosine_topk(
            c, p, k=k, id_col=id_col, vec_col=vec_col,
            probe_id_col=probe_id_col, probe_vec_col=probe_vec_col,
        ).select(F.lit(f"d{d}").alias("tier"), "*")
        out = t if out is None else out.unionByName(t)
    ref = (
        out.filter(F.col("tier") == f"d{ds[-1]}")
        .select(
            F.col(probe_id_col),
            "neighbor_id",
            F.lit(True).alias("in_full_topk"),
        )
    )
    return (
        out.join(F.broadcast(ref), [probe_id_col, "neighbor_id"], "left")
        .select(
            "tier", probe_id_col, "rank", "neighbor_id", "cos_sim",
            F.coalesce(F.col("in_full_topk"), F.lit(False)).alias(
                "in_full_topk"
            ),
        )
    )


def mmr_rerank(
    cands: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "cand_id",
    rel_col: str = "rel",
    vec_col: str = "cand_vec",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the retrieval-DIVERSITY pass downstream of any of
    the ANN/topk generators: per query, greedily select ``k``
    candidates maximizing ``lam·rel(d) − (1−lam)·max_{s∈S} sim(d, s)``
    so the result list trades relevance against redundancy (the
    per-query sibling of :func:`kcenter_select`'s corpus-global
    diversity pick; with an empty selected set the second term is 0,
    so round one is the pure-relevance argmax and one formula covers
    every round).

    Input: one row per (query, candidate) — a BOUNDED candidate list
    per query (top-c from a prior retrieval stage; c is a constant,
    never corpus-scale) with a relevance score and the candidate's
    embedding. Output: ``(query, mmr_rank, candidate, mmr_score)``,
    ranks 1..k per query (fewer when the list exhausts).

    Determinism: relevances and every pairwise candidate cosine are
    rounded to 6 before any comparison; each round's argmax breaks
    ties on the smallest candidate id — so the DuckDB oracle replays
    the greedy round-for-round (plans/ml_ops.py
    ``ORACLE_EMB_MMR_RERANK`` unrolls it CTE-for-CTE).

    Scale shape: unlike :func:`kcenter_select` (k global picks,
    model-scale collects), MMR picks one candidate PER QUERY per
    round, so picks stay a DataFrame — NOTHING is collected. The
    pairwise-sim relation is one query-keyed equi-self-join (|Q|·c²
    rows, quadratic only in the bounded c), built ONCE with hoisted
    norms and localCheckpointed; each of the k rounds is one window
    argmax + two query-keyed equi-joins on checkpointed state (the
    ``neardup_clusters`` linear-lineage convention). Every shuffle
    key is the query id — the natural partitioning a 100 TB query
    log already has."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    base = cands.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_id"),
        F.round(F.col(rel_col).cast("double"), 6).alias("_rel"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    a = base.select(
        "_q",
        F.col("_id").alias("_a"),
        F.col("_v").alias("_av"),
        F.col("_n").alias("_an"),
    )
    b = base.select(
        "_q",
        F.col("_id").alias("_b"),
        F.col("_v").alias("_bv"),
        F.col("_n").alias("_bn"),
    )
    den = F.col("_an") * F.col("_bn")
    sim = F.round(
        F.when(den > 0, dot(F.col("_av"), F.col("_bv")) / den).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    sims = (
        a.join(b, "_q")
        .filter(F.col("_a") != F.col("_b"))
        .select(
            F.col("_q").alias("_sq"), "_a", "_b", sim.alias("_sim")
        )
        .localCheckpoint()
    )
    pool = base.select(
        "_q", "_id", "_rel", F.lit(0.0).alias("_ms")
    ).localCheckpoint()
    w = Window.partitionBy("_q").orderBy(F.desc("_score"), F.asc("_id"))
    out = None
    for r in range(1, k + 1):
        scored = pool.withColumn(
            "_score",
            F.lit(lam) * F.col("_rel") - F.lit(1.0 - lam) * F.col("_ms"),
        )
        picks = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(
                "_q",
                F.col("_id").alias("_pid"),
                F.round(F.col("_score"), 6).alias("_pscore"),
            )
        )
        out_r = picks.select(
            F.col("_q").alias(query_col),
            F.lit(r).cast("int").alias("mmr_rank"),
            F.col("_pid").alias(id_col),
            F.col("_pscore").alias("mmr_score"),
        )
        out = out_r if out is None else out.unionByName(out_r)
        if r < k:
            pool = (
                pool.join(picks.select("_q", "_pid"), "_q")
                .filter(F.col("_id") != F.col("_pid"))
                .join(
                    sims,
                    (F.col("_sq") == F.col("_q"))
                    & (F.col("_a") == F.col("_id"))
                    & (F.col("_b") == F.col("_pid")),
                    "left",
                )
                .select(
                    "_q",
                    "_id",
                    "_rel",
                    F.greatest(
                        F.col("_ms"), F.coalesce(F.col("_sim"), F.lit(0.0))
                    ).alias("_ms"),
                )
                .localCheckpoint()
            )
    return out


def jl_matrix(k: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix
    (Achlioptas 2003: Rademacher entries satisfy the JL lemma with the
    same guarantees as gaussians) — one md5-derived sign per cell, a
    plan-time constant like :func:`_hyperplane`."""
    out = []
    for j in range(k):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"jl:{j}:dim:{i}".encode()).digest()
            row.append(1.0 if h[0] & 1 else -1.0)
        out.append(row)
    return out


def jl_project(
    corpus: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL random projection ``R^dim -> R^out_dim``: ``y = R v /
    sqrt(out_dim)`` with the deterministic ±1 matrix of
    :func:`jl_matrix` — the cheap-ANN / sketching primitive (pairwise
    distances preserved within ``1 ± eps``, eps ~ sqrt(ln n / k)).
    Pure map-side: ONE nested-array literal + three lambdas (the
    ``scored_centroids`` construction discipline), zero shuffle at any
    scale. Output coordinates are rounded to 6 for the cross-engine
    gate. Returns ``(id, proj array<double>)``."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    mat = F.lit(jl_matrix(out_dim, dim))
    scale = F.sqrt(F.lit(float(out_dim)))

    def _proj(v: Column) -> Column:
        return F.transform(
            mat,
            lambda r: F.round(
                F.aggregate(
                    F.zip_with(v, r, lambda a, b: a.cast("double") * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / scale,
                6,
            ),
        )

    from scraping_etl_spark.operators.dedup import _bind

    return corpus.select(
        F.col(id_col), _bind(F.col(vec_col), _proj).alias("proj")
    )
