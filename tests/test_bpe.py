"""BPE tokenizer units (operators/bpe.py): the classic hand-computed
Sennrich corpus, merge-fold semantics, fallback, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators import bpe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def classic(spark):
    """The textbook BPE training corpus: low×5 lower×2 newest×6
    widest×3 (Sennrich et al. 2016's worked example, no ``</w>``
    marker)."""
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return _docs(spark, [(1, corpus)])


def test_bpe_train_matches_hand_computed_merges(classic):
    """Hand-derived merge sequence: (e,s) 9 > all; then (es,t) 9;
    then the (l,o)/(o,w) 7-tie breaks lexicographically to (l,o);
    then (lo,w) 7; then the 6-tie among (e,w)/(n,e)/(w,est) breaks
    to (e,w)."""
    merges = bpe.bpe_train(classic, n_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")]


def test_bpe_train_is_rerun_deterministic(classic):
    assert bpe.bpe_train(classic, n_merges=5) == bpe.bpe_train(classic, n_merges=5)


def test_bpe_train_stops_below_min_pair_count(spark):
    """Every pair unique → nothing reaches min_pair_count=2 → no
    merges, regardless of the merge budget."""
    assert bpe.bpe_train(_docs(spark, [(1, "abc def")]), n_merges=10) == []


def test_bpe_train_validates_args(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        bpe.bpe_train(d, n_merges=-1)
    with pytest.raises(ValueError):
        bpe.bpe_train(d, min_pair_count=0)


def test_segment_unseen_word_with_learned_merges(spark, classic):
    """'lowest' is not in the training corpus, but the learned merges
    segment it to [low, est] — the canonical generalization check."""
    merges = bpe.bpe_train(classic, n_merges=5)
    seg = bpe.word_segment_table(_docs(spark, [(2, "lowest")]), merges)
    row = seg.collect()[0]
    assert row.word == "lowest" and list(row.sym) == ["low", "est"]
    assert row.n_sub == 2


def test_apply_merge_is_left_to_right_single_pass(spark):
    """'a a a a' with merge (a,a) → [aa, aa] (greedy left-to-right);
    'a a a' → [aa, a] — a fresh merge never re-merges with the next
    symbol in the same pass."""
    df = spark.range(1).select(
        bpe.apply_merge(F.array(F.lit("a"), F.lit("a"), F.lit("a"), F.lit("a")), "a", "a").alias("x4"),
        bpe.apply_merge(F.array(F.lit("a"), F.lit("a"), F.lit("a")), "a", "a").alias("x3"),
    )
    row = df.collect()[0]
    assert list(row.x4) == ["aa", "aa"]
    assert list(row.x3) == ["aa", "a"]


def test_token_counts_fallback_chars_for_unseen_words(spark, classic):
    """Words outside the segmentation table count their characters
    (the untrained floor); empty docs are (0, 0) not null."""
    merges = bpe.bpe_train(classic, n_merges=5)
    seg = bpe.word_segment_table(classic, merges)
    docs = _docs(spark, [(9, "lowest zzz"), (10, "   ")])
    got = {r.doc_id: (r.n_tokens, r.n_bpe_tokens)
           for r in bpe.bpe_token_counts(docs, seg).collect()}
    # 'lowest' unseen in seg (trained on classic's 4 words) → 6 chars;
    # 'zzz' unseen → 3 chars
    assert got == {9: (2, 9), 10: (0, 0)}


def test_token_counts_uses_broadcast_join_no_shuffle_of_seg(spark, classic):
    """Plan contract: the word→segmentation join is a BroadcastHashJoin
    (the table is vocabulary-scale by construction)."""
    merges = bpe.bpe_train(classic, n_merges=3)
    seg = bpe.word_segment_table(classic, merges)
    out = bpe.bpe_token_counts(classic, seg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_char_symbols_drops_spark_trailing_empty(spark):
    """Spark's split keeps trailing empties (limit −1); symbols must
    never contain ''."""
    row = spark.range(1).select(
        bpe.char_symbols(F.lit("abc")).alias("s")
    ).collect()[0]
    assert list(row.s) == ["a", "b", "c"]
