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
