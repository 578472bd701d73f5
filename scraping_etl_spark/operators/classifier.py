"""Trainable linear quality classifier over text features.

The GPT-3 / CCNet corpus builds filter raw text with a lightweight
linear classifier trained to separate curated from raw documents
(GPT-3 appendix A: logistic regression over tf-idf-ish features;
CCNet: a fastText linear model). This module is that shape on Spark:

- :func:`quality_features` — per-document feature vector from pure
  built-ins (zero shuffle, zero UDFs).
- :func:`train_logreg` — full-batch gradient-descent logistic
  regression as DataFrame aggregations: each iteration is ONE job
  computing the d+1 gradient sums map-side (d is the feature count, a
  handful — the per-iteration collect is O(d) scalars of the MODEL,
  not data; the ``ivf_train`` convention). Train on a curated+bounded
  labeled set — classifier training data is small by construction; at
  100 TB you train on a sample and SCORE the lake.
- :func:`score_logreg` — sigmoid(w·x) with the learned weights as
  plan constants: pure map, zero shuffle at any scale, and exactly
  mirrorable in the DuckDB oracle (same left-to-right dot fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scraping_etl_spark.operators.textstats import (
    stopword_ratio,
    tokens,
)

#: Feature names, in vector order (index 0 is the bias term).
FEATURE_NAMES = (
    "bias",
    "log_tokens",
    "distinct_ratio",
    "stopword_ratio",
    "mean_token_len",
    "nonalpha_ratio",
)


def quality_features(
    df: DataFrame, text_col: str = "text", out_col: str = "features"
) -> DataFrame:
    """Append ``out_col`` (array<double>, :data:`FEATURE_NAMES` order):
    bias 1.0, ln(1+tokens), distinct-token ratio, English stopword
    ratio, mean token length, non-[a-z0-9 ] character ratio — each a
    bounded built-in expression (no UDF, no shuffle)."""
    toks = tokens(text_col)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    text = F.col(text_col)
    nonalpha = F.length(F.regexp_replace(F.lower(text), "[a-z0-9 ]", ""))
    feats = F.array(
        F.lit(1.0),
        F.log(F.lit(1.0) + n),
        (F.size(F.array_distinct(toks)) / n1).cast("double"),
        stopword_ratio(text_col).cast("double"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / n1
        ).cast("double"),
        (nonalpha / F.greatest(F.length(text), F.lit(1))).cast("double"),
    )
    return df.withColumn(out_col, feats)


def _dot_const(weights: list[float], vec: Column) -> Column:
    """w·x with the weights as literals, associated left-to-right —
    the same fold order the SQL oracle writes out explicitly."""
    acc = F.lit(0.0)
    for i, w in enumerate(weights):
        acc = acc + F.lit(float(w)) * F.element_at(vec, i + 1)
    return acc


def train_logreg(
    labeled: DataFrame,
    dim: int,
    features_col: str = "features",
    label_col: str = "label",
    lr: float = 0.5,
    iters: int = 40,
    l2: float = 0.0,
) -> list[float]:
    """Batch-GD logistic regression; returns the learned weights.

    Each iteration computes ``grad_j = avg((sigmoid(w·x) - y)·x_j)``
    for all j in ONE aggregation (d static sum columns + a count —
    map-side partial agg, no explode, no shuffle beyond the final
    1-row combine) and updates driver-side: the per-iteration driver
    traffic is d+1 scalars of model state. ``iters`` is bounded; the
    labeled set should be the bounded curated sample, not the lake."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    base = labeled.select(
        F.col(features_col).alias("_x"),
        F.col(label_col).cast("double").alias("_y"),
    ).localCheckpoint()
    # The gradient expressions are built ONCE, against a `_w` weight
    # column attached per iteration as a single array literal: complex
    # literals ride the generated code as reference objects, so every
    # iteration reuses one compiled plan instead of re-deriving (and
    # re-compiling) a fresh d-term expression tree — measured 382 ->
    # 125 ms fixed cost per iteration at d=6 (r16 optimization round).
    # Arithmetic is unchanged: the dot is the same left-to-right
    # `acc + w_j * x_j` double fold (`_dot_const`'s order) with w_j
    # read from the array instead of inlined, so the learned weights
    # are bit-identical (pinned by tests/test_classifier.py).
    z = F.lit(0.0)
    for i in range(dim):
        z = z + F.element_at(F.col("_w"), i + 1) * F.element_at(
            F.col("_x"), i + 1
        )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # err is PROJECTED once per row and the d gradient sums multiply
    # the materialized value — inlining it into every sum would hand
    # the analyzer/optimizer a d²-node tree per iteration (measured
    # ~0.6 s/iteration of pure driver time at d=33). Same doubles:
    # one evaluation of the same expression feeds the same products.
    err = (p - F.col("_y")).alias("_e")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.col("_e") * F.element_at(F.col("_x"), j + 1)).alias(f"_g{j}")
        for j in range(dim)
    ]
    w = [0.0] * dim
    # AQE off for the loop only: a keyless aggregation to ONE row has
    # nothing for AQE to re-plan, but under AQE every iteration costs
    # TWO scheduled jobs (shuffle-stage materialization + final stage)
    # instead of one — 40 iterations = 40 extra scheduling barriers at
    # any scale (measured r17: 80 -> 40 jobs, weights bit-identical;
    # the physical aggregation, its partitioning and its combine order
    # are unchanged, so this is a pure job-count cut, not a plan
    # change). Restored in ``finally`` so serve paths keep AQE.
    spark = base.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(iters):
            sums = (
                base.withColumn("_w", F.lit([float(v) for v in w]))
                .select(err, "_x")
                .agg(*aggs)
                .first()
            )
            n = float(sums["_n"])
            if n == 0:
                raise ValueError("train_logreg: empty labeled set")
            w = [
                w[j] - lr * (float(sums[f"_g{j}"]) / n + l2 * w[j])
                for j in range(dim)
            ]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return w


def score_logreg(
    df: DataFrame,
    weights: list[float],
    features_col: str = "features",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``sigmoid(w·x)`` (rounded 6) with ``weights`` as plan
    constants — pure map-side scoring, the deployment path."""
    z = _dot_const(weights, F.col(features_col))
    return df.withColumn(
        out_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    )


# ---------------------------------------------------------------------------
# Hashing-trick TF-IDF featurization (Weinberger et al. 2009)
# ---------------------------------------------------------------------------

#: Default feature-space width — the idf side-table is bounded at this
#: many rows REGARDLESS of vocabulary size, which is the whole point.
HASH_FEATURES = 1024


def hashing_tfidf(
    df: DataFrame,
    n_features: int = HASH_FEATURES,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_idf: bool = False,
    materialize_tf: bool = False,
    n_docs: int | None = None,
):
    """Sparse TF-IDF document features via the hashing trick
    (Weinberger et al. 2009, "Feature Hashing for Large Scale
    Multitask Learning"): each token hashes to a fixed slot in
    ``[0, n_features)``; tf is the per-(doc, slot) count, idf is the
    smoothed slot document-frequency ``ln((N+1)/(df+1)) + 1``
    (scikit-learn's convention) computed over SLOTS.

    Why this shape at 100 TB: a real vocabulary is unbounded, so an
    exact tf-idf needs a vocabulary-sized dictionary join; hashing
    fixes the feature space up front, making the idf side-table at
    most ``n_features`` rows — always broadcastable, independent of
    corpus size. Slot collisions are the documented trade (two rare
    tokens sharing a slot add their counts); at the default width the
    collision mass is negligible for classifier features, and the
    downstream consumer (:func:`train_logreg` on exploded features,
    or cosine similarity over the sparse rows) is collision-agnostic.

    The slot hash is the md5-prefix convention (portable to the
    DuckDB oracle bit-for-bit), not xxhash64. Output is the SPARSE
    relation ``(id, slot, tf, tfidf)`` — join-ready and explode-free
    downstream; assemble a dense array only at the model boundary.

    Plan: explode -> partial-agg groupBy (doc, slot) -> slot df agg
    (bounded at n_features rows) broadcast back. Two bounded
    exchanges, no UDFs.

    ``materialize_tf`` localCheckpoints the (doc, slot, tf) relation:
    a TRAINER that eagerly consumes both outputs (collects the idf AND
    materializes the features) would otherwise execute the tf
    aggregation twice — pass True there, leave False on lazy serve
    paths. ``n_docs`` lets a caller that already knows the distinct
    document count skip the internal count job (must equal
    ``df.select(id_col).distinct().count()``). Both are pure
    cost knobs: the output relation is unchanged.
    """
    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    slot = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_features),
    )
    tf = (
        df.select(
            F.col(id_col),
            F.explode(tokens(text_col, lowercase=True)).alias("_tok"),
        )
        .withColumn("slot", slot)
        .groupBy(id_col, "slot")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if materialize_tf:
        tf = tf.localCheckpoint()
    if n_docs is None:
        n_docs = df.select(id_col).distinct().count()  # O(1)-row scalar
    idf = (
        tf.groupBy("slot")
        .agg(F.count_distinct(id_col).alias("_df"))
        .select(
            "slot",
            (
                F.log(
                    (F.lit(float(n_docs + 1)))
                    / (F.col("_df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ).alias("_idf"),
        )
    )
    out = tf.join(F.broadcast(idf), "slot").select(
        id_col,
        "slot",
        "tf",
        F.round(F.col("tf") * F.col("_idf"), 6).alias("tfidf"),
    )
    if return_idf:
        # (slot, _idf) at <= n_features rows — the learned idf side of
        # the model, for deployments that freeze it as plan constants
        # (see :func:`score_hashed_logreg`).
        return out, idf
    return out


#: Fixed-point grid of the sparse dot fold (integer summation is
#: associative — any partial-agg order gives the bit-same total in
#: Spark and the DuckDB oracle; the ``token_divergence`` convention).
DOT_FX_SCALE = 10**12


def dense_from_sparse(
    sparse: DataFrame,
    n_features: int,
    id_col: str = "doc_id",
    slot_col: str = "slot",
    value_col: str = "tfidf",
) -> DataFrame:
    """(id, slot, value) → (id, array<double> dense) via ``n_features``
    conditional partial aggs — no pivot, no collect; one shuffle at id
    cardinality. For the BOUNDED model-boundary assembly (training
    sets), not the lake."""
    sums = sparse.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col(slot_col) == i, F.col(value_col)).otherwise(0.0)
            ).alias(f"_f{i}")
            for i in range(n_features)
        ]
    )
    return sums.select(
        id_col,
        F.array(*[F.col(f"_f{i}") for i in range(n_features)]).alias("dense"),
    )


def score_hashed_logreg(
    df: DataFrame,
    idf: list[float],
    weights: list[float],
    n_features: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Deployment scoring of the bag-of-hashed-words linear classifier
    (the fastText / GPT-3-appendix-A quality-filter shape): the MODEL
    is ``idf`` (per-slot idf learned from the training corpus) plus
    ``weights`` (bias first, then one weight per slot), all plan
    constants — so scoring the lake needs NO corpus-wide statistics
    pass: explode tokens, hash to slots (md5-prefix convention,
    oracle-portable), per-(doc, slot) tf partial-agg, then a
    fixed-point sparse dot ``z = w0 + sum(round(w[s]·tfidf·FX))/FX``
    whose integer summation is order-free (:data:`DOT_FX_SCALE`).
    One shuffle at (doc, slot) grain, zero joins against anything
    corpus-sized. Tokenless documents score ``sigmoid(w0)``.
    """
    if len(idf) != n_features:
        raise ValueError(f"idf must have {n_features} entries, got {len(idf)}")
    if len(weights) != n_features + 1:
        raise ValueError(
            f"weights must have {n_features + 1} entries (bias first), "
            f"got {len(weights)}"
        )
    slot = F.pmod(
        F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("long"),
        F.lit(n_features),
    )
    tf = (
        df.select(
            F.col(id_col), F.explode(tokens(text_col, lowercase=True)).alias("_tok")
        )
        .withColumn("slot", slot)
        .groupBy(id_col, "slot")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idf_arr = F.array(*[F.lit(float(v)) for v in idf])
    w_arr = F.array(*[F.lit(float(w)) for w in weights[1:]])
    at = (F.col("slot") + 1).cast("int")
    tfidf = F.round(F.col("tf") * F.element_at(idf_arr, at), 6)
    term = F.round(
        F.element_at(w_arr, at) * tfidf * F.lit(float(DOT_FX_SCALE)), 0
    ).cast("long")
    zfx = tf.select(F.col(id_col), term.alias("_fx")).groupBy(id_col).agg(
        F.sum("_fx").alias("_zfx")
    )
    z = F.lit(float(weights[0])) + F.coalesce(
        F.col("_zfx"), F.lit(0)
    ) / F.lit(float(DOT_FX_SCALE))
    return (
        df.select(id_col)
        .join(zfx, id_col, "left")
        .select(
            id_col,
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias(out_col),
        )
    )
