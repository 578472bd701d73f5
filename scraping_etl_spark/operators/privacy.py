"""Privacy-preserving release operators.

K-anonymity by full-domain generalization + record suppression
(Samarati, "Protecting Respondents' Identities in Microdata Release",
TKDE 2001; Sweeney, "k-Anonymity: A Model for Protecting Privacy",
IJUFKS 2002) — the metadata-release guarantee a corpus datasheet or a
per-document metadata dump needs before leaving the pipeline: every
released quasi-identifier combination is shared by at least k records,
achieved by generalizing each quasi-identifier up a fixed ladder and
suppressing the (budgeted) records that still stick out.

Reference anchor: the reference ships raw per-article metadata tables
(`DB/Tables/*.csv`); this operator is the release-hardening step that
corpus would need at scale, built Spark-first: the whole generalization
LATTICE is evaluated in ONE grouping-sets aggregation pass.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lattice_costs(
    df: DataFrame,
    k: int,
    ladders: "list[tuple[str, list[Column]]]",
) -> "tuple[DataFrame, list[tuple[int, ...]], dict[tuple[int, ...], int]]":
    """Cost EVERY full-domain level vector in one aggregation pass:
    each candidate vector is a grouping set over its ladder columns,
    so Spark evaluates the whole lattice with ONE scan + ONE shuffle
    (map-side combined ``GROUPING SETS``; the plan shows a single
    Expand — pinned in tests/test_privacy.py) and the result is one
    |lattice|-row relation ``(_gid, _sup)`` of under-k record totals,
    disambiguated by ``grouping_id``.

    Returns ``(costs_df, vectors, gid_of)`` — the vectors in the
    Samarati (total generalization, lexicographic) search order and
    the expected ``grouping_id`` per vector (first grouping column =
    most significant bit; a column's bit is 0 iff it is in the
    vector's set)."""
    names = [n for n, _ in ladders]
    lvl_col = lambda name, i: f"_ka_{name}_{i}"  # noqa: E731
    staged = df
    all_cols: list[str] = []
    for name, levels in ladders:
        for i, expr in enumerate(levels):
            staged = staged.withColumn(lvl_col(name, i), expr)
            all_cols.append(lvl_col(name, i))

    vectors = sorted(
        itertools.product(*[range(len(lvls)) for _, lvls in ladders]),
        key=lambda v: (sum(v), v),
    )

    def expected_gid(vec: "tuple[int, ...]") -> int:
        used = {lvl_col(names[j], lvl) for j, lvl in enumerate(vec)}
        gid = 0
        for c in all_cols:  # first grouping column = most significant bit
            gid = (gid << 1) | (0 if c in used else 1)
        return gid

    sets = [
        [F.col(lvl_col(names[j], lvl)) for j, lvl in enumerate(vec)]
        for vec in vectors
    ]
    grouped = (
        staged.groupingSets(sets, *[F.col(c) for c in all_cols])
        .agg(F.count(F.lit(1)).alias("_cnt"), F.grouping_id().alias("_gid"))
        .groupBy("_gid")
        .agg(
            F.sum(F.when(F.col("_cnt") < k, F.col("_cnt")).otherwise(0))
            .alias("_sup")
        )
    )
    return grouped, vectors, {v: expected_gid(v) for v in vectors}


def k_anonymize(
    df: DataFrame,
    k: int,
    ladders: "list[tuple[str, list[Column]]]",
    max_suppressed: int = 0,
    id_cols: "list[str] | None" = None,
) -> DataFrame:
    """Full-domain k-anonymization of ``df``'s quasi-identifiers.

    ``ladders``: one ``(out_name, [level_0, level_1, ...])`` per
    quasi-identifier — level 0 the most specific expression, the last
    level typically the full-suppression literal ``'*'``. Ladder
    expressions must be non-null (coalesce in the caller): a natural
    NULL would collide with nothing and simply suppress, but keeping
    the contract explicit keeps the oracle replay trivial.

    Search (Samarati's minimal full-domain generalization): level
    vectors are enumerated in (total generalization, lexicographic)
    order and the FIRST vector whose under-k records number at most
    ``max_suppressed`` wins; those records are then suppressed. The
    whole lattice is costed in ONE pass — every candidate vector is a
    grouping set over its three ladder columns, so Spark computes all
    |lattice| aggregations in a single shuffle with map-side combine
    (``GROUPING SETS``, disambiguated by ``grouping_id``), and the
    per-vector under-k totals are one model-scale collect. At 100 TB
    that is one scan + one shuffle regardless of lattice size, vs the
    naive |lattice| full scans.

    Output: ``id_cols`` + ``suppressed`` + one generalized column per
    ladder (NULL when suppressed) + ``group_size`` (NULL when
    suppressed) + one ``lvl_<name>`` plan-constant column per ladder
    recording the chosen level — so a value-level hash pins the
    lattice CHOICE, not just the projection.

    Raises ``ValueError`` when even the fully-generalized top vector
    cannot satisfy the budget (corpus smaller than k and larger than
    the budget)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_suppressed < 0:
        raise ValueError(f"max_suppressed must be >= 0, got {max_suppressed}")
    if not ladders or any(not lvls for _, lvls in ladders):
        raise ValueError("ladders must be non-empty lists of levels")
    id_cols = list(id_cols or [])
    names = [n for n, _ in ladders]

    grouped, vectors, gid_of = lattice_costs(df, k, ladders)
    sup_by_gid = {r["_gid"]: r["_sup"] for r in grouped.collect()}
    chosen = None
    for vec in vectors:
        if sup_by_gid.get(gid_of[vec], 0) <= max_suppressed:
            chosen = vec
            break
    if chosen is None:
        raise ValueError(
            f"k_anonymize: no level vector satisfies k={k} with "
            f"max_suppressed={max_suppressed}"
        )

    gen = [
        ladders[j][1][lvl].alias(f"_g_{names[j]}")
        for j, lvl in enumerate(chosen)
    ]
    out = df.select(*id_cols, *gen)
    w = Window.partitionBy(*[f"_g_{n}" for n in names])
    out = out.withColumn("_gsz", F.count(F.lit(1)).over(w)).withColumn(
        "suppressed", F.col("_gsz") < k
    )
    keep = ~F.col("suppressed")
    return out.select(
        *id_cols,
        "suppressed",
        *[F.when(keep, F.col(f"_g_{n}")).alias(n) for n in names],
        F.when(keep, F.col("_gsz")).cast("long").alias("group_size"),
        *[
            F.lit(lvl).cast("int").alias(f"lvl_{names[j]}")
            for j, lvl in enumerate(chosen)
        ],
    )
