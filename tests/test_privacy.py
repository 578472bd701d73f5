"""Units for privacy.k_anonymize (Samarati'01 / Sweeney'02 full-domain
generalization + suppression) and its staged release gate: the lattice
search replayed by a pure-Python reference, the suppression-budget
branch, the failure contract, and the end-to-end oracle pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators.privacy import k_anonymize


def _ladders():
    return [
        ("lang_g", [F.col("lang"), F.lit("*")]),
        ("source_g", [F.col("source"), F.lit("*")]),
        (
            "n_g",
            [
                F.col("n").cast("string"),
                F.concat(
                    (F.floor(F.col("n") / 10) * 10).cast("long").cast("string"),
                    F.lit("+"),
                ),
                F.lit("*"),
            ],
        ),
    ]


def _py_ladder_vals(lang, source, n):
    return (
        [lang, "*"],
        [source, "*"],
        [str(n), f"{n // 10 * 10}+", "*"],
    )


def _py_search(rows, k, budget, shapes=(2, 2, 3)):
    """Pure-Python replay of the (total, lex) lattice search."""
    import itertools

    vectors = sorted(
        itertools.product(*[range(s) for s in shapes]),
        key=lambda v: (sum(v), v),
    )
    for vec in vectors:
        counts = {}
        for _, lang, source, n in rows:
            ladders = _py_ladder_vals(lang, source, n)
            key = tuple(ladders[j][lvl] for j, lvl in enumerate(vec))
            counts[key] = counts.get(key, 0) + 1
        sup = sum(c for c in counts.values() if c < k)
        if sup <= budget:
            return vec, counts
    return None, None


def test_k_anonymize_matches_python_lattice_search(spark):
    """The chosen level vector, group sizes and zero-suppression
    outcome all equal the pure-Python replay on data where exact n is
    identifying but (lang, source) classes are comfortable."""
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"s{i % 2}", 100 + i)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n int"
    )
    out = {
        r.doc_id: r
        for r in k_anonymize(
            df, k=5, ladders=_ladders(), max_suppressed=0, id_cols=["doc_id"]
        ).collect()
    }
    vec, counts = _py_search(rows, k=5, budget=0)
    assert vec == (0, 0, 2)
    for doc_id, lang, source, n in rows:
        r = out[doc_id]
        assert (r.lvl_lang_g, r.lvl_source_g, r.lvl_n_g) == vec
        assert not r.suppressed
        ladders = _py_ladder_vals(lang, source, n)
        key = tuple(ladders[j][lvl] for j, lvl in enumerate(vec))
        assert (r.lang_g, r.source_g, r.n_g) == key
        assert r.group_size == counts[key]


def test_k_anonymize_suppression_budget_branch(spark):
    """A lone outlier class below k: with a budget of 1 the minimal
    vector keeps everyone else at level 0 and suppresses the outlier
    (NULL release columns); with budget 0 the search must escalate
    instead."""
    rows = [(i, "en", "s0", 7) for i in range(9)] + [(99, "zz", "s0", 7)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n int"
    )
    out = {
        r.doc_id: r
        for r in k_anonymize(
            df, k=5, ladders=_ladders(), max_suppressed=1, id_cols=["doc_id"]
        ).collect()
    }
    assert (out[0].lvl_lang_g, out[0].lvl_source_g, out[0].lvl_n_g) == (0, 0, 0)
    assert out[99].suppressed
    assert out[99].lang_g is None and out[99].group_size is None
    assert not out[0].suppressed and out[0].group_size == 9
    strict = {
        r.doc_id: r
        for r in k_anonymize(
            df, k=5, ladders=_ladders(), max_suppressed=0, id_cols=["doc_id"]
        ).collect()
    }
    # budget 0 -> lang must generalize away; everyone survives
    assert strict[99].lvl_lang_g == 1 and not strict[99].suppressed
    assert strict[99].group_size == 10


def test_k_anonymize_validation_and_impossible(spark):
    df = spark.createDataFrame(
        [(1, "en", "s0", 5)], "doc_id long, lang string, source string, n int"
    )
    with pytest.raises(ValueError):
        k_anonymize(df, k=0, ladders=_ladders())
    with pytest.raises(ValueError):
        k_anonymize(df, k=2, ladders=[])
    with pytest.raises(ValueError):
        k_anonymize(df, k=2, ladders=[("x", [])])
    with pytest.raises(ValueError):
        k_anonymize(df, k=2, ladders=_ladders(), max_suppressed=-1)
    # one row, k=2, budget 0: even full generalization leaves an
    # under-k group bigger than the budget
    with pytest.raises(ValueError, match="no level vector"):
        k_anonymize(df, k=2, ladders=_ladders(), max_suppressed=0)


def test_lattice_costs_one_pass_plan_and_values(spark):
    """The 100 TB claim, pinned: the whole-lattice costing plan holds
    exactly ONE Expand (the grouping-sets fan-out) and no Join — one
    scan + one shuffle for all 12 candidate vectors — and each
    vector's under-k total equals a brute per-vector groupBy."""
    from scraping_etl_spark.operators.privacy import lattice_costs

    rows = [
        (i, ["en", "de", "fr"][i % 3], f"s{i % 2}", 100 + i)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n int"
    )
    k = 4
    grouped, vectors, gid_of = lattice_costs(df, k, _ladders())
    plan = grouped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    got = {r["_gid"]: r["_sup"] for r in grouped.collect()}
    for vec in vectors:
        counts = {}
        for _, lang, source, n in rows:
            ladders = _py_ladder_vals(lang, source, n)
            key = tuple(ladders[j][lvl] for j, lvl in enumerate(vec))
            counts[key] = counts.get(key, 0) + 1
        want = sum(c for c in counts.values() if c < k)
        assert got[gid_of[vec]] == want, vec


def test_doc_k_anonymize_gate_matches_oracle_staged_for_r20(spark):
    """The staged doc_k_anonymize gate hashes against the oracle that
    recomputes all 16 candidate vectors' under-k totals and replays
    the (total, lex) winner; every released group has >= k members and
    the suppressed mass fits the 2% budget."""
    from collections import Counter

    from scraping_etl_spark.plans import pipeline_ops as P
    from tests.oracle import assert_matches_oracle

    sf = "/root/testdata/sf0.001"
    df = P.q_doc_k_anonymize(spark, sf)
    assert_matches_oracle(df, P.ORACLE_DOC_K_ANONYMIZE, sf)
    rows = df.collect()
    n = len(rows)
    sup = [r for r in rows if r.suppressed]
    assert len(sup) <= int(P._KA_SUP_FRAC * n)
    sizes = Counter(
        (r.lang_g, r.source_g, r.chars_g) for r in rows if not r.suppressed
    )
    assert sizes and all(v >= P._KA_K for v in sizes.values())
    for r in rows:
        if not r.suppressed:
            assert sizes[(r.lang_g, r.source_g, r.chars_g)] == r.group_size
