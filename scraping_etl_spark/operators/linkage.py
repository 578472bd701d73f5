"""Probabilistic record linkage: Fellegi–Sunter match scoring.

The classical decision-theoretic layer ABOVE the similarity joins this
library already ships (``dedup.fuzzy_string_pairs`` /
``edit_distance_pairs`` generate candidate pairs; connected components
assemble entities): given per-field agreement patterns on candidate
pairs and a LABELED pair sample, estimate each field's

- ``m``  = P(field agrees | pair is a true match)
- ``u``  = P(field agrees | pair is a non-match)

and score every pair with the log-likelihood-ratio sum

    score = Σ_field  ln(m/u)            if the field agrees
            Σ_field  ln((1-m)/(1-u))    if it disagrees

(Fellegi & Sunter, JASA 1969; Winkler's survey, 2006). High scores →
link, low → non-link, the middle band → clerical review. With labeled
data the m/u estimates are closed-form count ratios — no EM — which
keeps the whole computation deterministic and oracle-checkable; the
classic unlabeled-EM variant fits the same relational shape (iterate
the count aggregation against soft assignments) but is out of scope
here.

Scale: the weight estimation is ONE partial aggregation over the
labeled pairs producing a single row of plan-constant-sized state; the
scoring join broadcasts that row — zero extra shuffle on the pair
relation, which is the data-scale side at 100 TB. Agreement columns
are caller-provided boolean expressions, so field semantics (exact,
banded numeric, q-gram Jaccard ≥ t) stay in the caller's hands.

Float parity notes (the oracle-hash discipline): estimates use
add-half Laplace smoothing ``(cnt + 0.5) / (n + 1.0)`` so no weight is
±inf; the per-pair score is a FIXED-ORDER expression sum over the
field list (never a groupBy over melted rows, whose float reduction
order is engine-chosen), mirrored verbatim in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_weights(
    labeled: DataFrame,
    agree_cols: list[str],
    label_col: str = "is_match",
) -> DataFrame:
    """Per-field m/u probabilities from a labeled pair sample, as ONE
    row with columns ``m_<field>`` / ``u_<field>`` (+ ``n_match`` /
    ``n_nonmatch`` audit counts). Add-half smoothing keeps every
    probability in (0, 1) so the log weights are finite even for a
    field that always (dis)agrees in the sample."""
    if not agree_cols:
        raise ValueError("agree_cols must name at least one field")
    is_m = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(is_m, 1).otherwise(0)).cast("double").alias("_nm"),
        F.sum(F.when(~is_m, 1).otherwise(0)).cast("double").alias("_nu"),
    ]
    for c in agree_cols:
        a = F.col(c).cast("boolean")
        aggs.append(
            F.sum(F.when(is_m & a, 1).otherwise(0)).cast("double").alias(f"_am_{c}")
        )
        aggs.append(
            F.sum(F.when(~is_m & a, 1).otherwise(0)).cast("double").alias(f"_au_{c}")
        )
    row = labeled.agg(*aggs)
    out = [
        F.col("_nm").cast("long").alias("n_match"),
        F.col("_nu").cast("long").alias("n_nonmatch"),
    ]
    for c in agree_cols:
        out.append(
            ((F.col(f"_am_{c}") + F.lit(0.5)) / (F.col("_nm") + F.lit(1.0)))
            .alias(f"m_{c}")
        )
        out.append(
            ((F.col(f"_au_{c}") + F.lit(0.5)) / (F.col("_nu") + F.lit(1.0)))
            .alias(f"u_{c}")
        )
    return row.select(*out)


#: Fixed-point grid for the EM responsibility sums: each pair's
#: posterior match probability is rounded to an integer grid before
#: the M-step aggregation, so the sums are INTEGER additions —
#: associative, hence bit-identical under any partial-aggregation
#: order on any engine (the ``token_divergence`` trick). Resolution
#: 1e-9 per pair; BIGINT overflow needs > ~9e9 pairs per aggregation.
EM_SCALE = 1_000_000_000


def fs_em_weights(
    pairs: DataFrame,
    agree_cols: list[str],
    n_iters: int = 5,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.5,
) -> dict:
    """UNSUPERVISED Fellegi–Sunter parameter estimation via EM (Winkler
    1988; the deployment case where no labeled pairs exist): treat
    match/non-match as a latent two-class mixture over the per-field
    agreement patterns (conditional independence, the classic FS
    assumption) and iterate

    - E-step: per pair, the posterior match responsibility
      ``w = p·Π_i m-term / (p·Π_i m-term + (1-p)·Π_i u-term)`` with
      the products folded in FIXED field order;
    - M-step: ``m_i = E[w·a_i]/E[w]``, ``u_i`` likewise over ``1-w``,
      ``p = E[w]/N`` — each expectation an integer sum of grid-rounded
      responsibilities (:data:`EM_SCALE`), with m, u AND p all
      add-half-smoothed on the same grid so no probability hits 0/1
      (an unsmoothed p would make sw=0 / sw=N·S absorbing states:
      the E-step numerator or denominator term would collapse to 0
      and freeze EM there).

    Returns ``{"p": float, "m": {field: float}, "u": {field: float},
    "n_pairs": int}`` — plan-constant-sized state, collected once per
    iteration (the train-loop pattern of ``kmeans_train_fx`` /
    WordPiece: k driver-side O(1)-row actions over a one-pass
    aggregation, never a driver loop over data rows). Every arithmetic
    step is deterministic (exact-double E-step from the previous
    constants, integer-grid M-step), so the fixpoint is reproducible
    across engines and partitionings — the property that makes a
    future driver gate oracle-able by unrolled CTEs.

    Scale: each iteration is ONE map-side partial aggregation over the
    pair relation (no shuffle beyond the final combine); state is
    ``2·|fields| + 1`` doubles. 100 TB: the pair relation is the
    candidate output of the blocking join (``fuzzy_string_pairs`` /
    ``edit_distance_pairs``), already data-scale-reduced."""
    if not agree_cols:
        raise ValueError("agree_cols must name at least one field")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if not (0.0 < init_p < 1.0):
        raise ValueError(f"init_p must be in (0, 1), got {init_p}")
    flags = pairs.select(
        *[F.col(c).cast("boolean").alias(c) for c in agree_cols]
    )
    m = {c: float(init_m) for c in agree_cols}
    u = {c: float(init_u) for c in agree_cols}
    p = float(init_p)
    half, one = EM_SCALE // 2, EM_SCALE
    n_pairs = None
    # AQE off for the loop only (the train_logreg convention, r17): a
    # keyless aggregation to ONE row has nothing for AQE to re-plan,
    # and under AQE every EM iteration schedules TWO jobs instead of
    # one. The aggregation, its partitioning and its integer-grid
    # combine are unchanged. Restored in ``finally``.
    spark = pairs.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(n_iters):
            num: Column = F.lit(p)
            den_u: Column = F.lit(1.0 - p)
            for c in agree_cols:  # fixed fold order — mirrors in SQL
                a = F.col(c)
                num = num * F.when(a, F.lit(m[c])).otherwise(F.lit(1.0 - m[c]))
                den_u = den_u * F.when(a, F.lit(u[c])).otherwise(
                    F.lit(1.0 - u[c])
                )
            w = num / (num + den_u)
            # floor(x + 0.5) rather than F.round: identical IEEE mul/add/
            # floor on every engine (HALF_UP on the decimal expansion is
            # JVM-BigDecimal-specific at representability corners), so an
            # unrolled-CTE SQL oracle reproduces the grid bit-for-bit
            wq = F.floor(w * F.lit(float(EM_SCALE)) + F.lit(0.5)).cast("long")
            aggs = [
                F.count(F.lit(1)).alias("_n"),
                F.sum(wq).alias("_sw"),
            ]
            for c in agree_cols:
                aggs.append(
                    F.sum(F.when(F.col(c), wq).otherwise(F.lit(0))).alias(f"_swa_{c}")
                )
                aggs.append(
                    F.sum(
                        F.when(F.col(c), F.lit(EM_SCALE).cast("long") - wq)
                        .otherwise(F.lit(0))
                    ).alias(f"_sua_{c}")
                )
            row = flags.agg(*aggs).first()
            n_pairs = int(row["_n"])
            if n_pairs == 0:
                raise ValueError("fs_em_weights: empty pair relation")
            sw = int(row["_sw"])
            su = n_pairs * one - sw
            # add-half smoothing on p too: if responsibilities collapse
            # (sw == 0 or sw == n·S) an unsmoothed p would hit exactly
            # 0/1 and the next E-step would be frozen at that absorbing
            # state — the same rationale as the m/u smoothing below
            p = (sw + half) / float(n_pairs * one + one)
            for c in agree_cols:
                m[c] = (int(row[f"_swa_{c}"]) + half) / float(sw + one)
                u[c] = (int(row[f"_sua_{c}"]) + half) / float(su + one)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return {"p": p, "m": m, "u": u, "n_pairs": n_pairs}


def fs_em_weights_df(
    spark_pairs: DataFrame,
    agree_cols: list[str],
    **kw,
) -> DataFrame:
    """The :func:`fs_em_weights` fixpoint reshaped to the
    :func:`fs_weights` one-row relation (``m_*`` / ``u_*`` columns +
    ``p_match``), so :func:`fs_score` serves EM-trained weights
    unchanged."""
    est = fs_em_weights(spark_pairs, agree_cols, **kw)
    spark = spark_pairs.sparkSession
    cols = {"p_match": est["p"]}
    for c in agree_cols:
        cols[f"m_{c}"] = est["m"][c]
        cols[f"u_{c}"] = est["u"][c]
    return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))


def fs_score_expr(agree_cols: list[str]) -> Column:
    """The Fellegi–Sunter score as a fixed-order expression over
    ``agree_cols`` and the joined ``m_*`` / ``u_*`` weight columns —
    exposed so callers (and the SQL oracle) share one definition of
    the fold order."""
    score: Column | None = None
    for c in agree_cols:
        m, u = F.col(f"m_{c}"), F.col(f"u_{c}")
        w = F.when(
            F.col(c).cast("boolean"), F.log(m / u)
        ).otherwise(F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)))
        score = w if score is None else score + w
    assert score is not None
    return score


def fs_score(
    pairs: DataFrame,
    weights: DataFrame,
    agree_cols: list[str],
    score_col: str = "fs_score",
) -> DataFrame:
    """Score candidate pairs against trained :func:`fs_weights`: the
    one-row weights relation broadcasts onto the pair relation and the
    log-likelihood-ratio sum lands as ``score_col`` (rounded to 6, the
    oracle-hash convention). All input columns pass through."""
    joined = pairs.crossJoin(F.broadcast(weights))
    return joined.select(
        *pairs.columns,
        F.round(fs_score_expr(agree_cols), 6).alias(score_col),
    )
