"""Line-level corpus surgery (operators/lines.py) and the
deterministic shuffle-to-shards layout (curation.shuffle_to_shards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators import lines as L
from scraping_etl_spark.operators.curation import shuffle_to_shards


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------

def test_dedup_lines_first_occurrence_wins_globally(spark):
    df = _docs(spark, [
        (1, "boiler\nunique one\nfooter"),
        (2, "boiler\nunique two\nfooter"),
        (3, "unique three\nboiler"),
    ])
    out = {r.doc_id: r for r in L.dedup_lines(df).collect()}
    assert out[1].text == "boiler\nunique one\nfooter"
    assert out[2].text == "unique two"          # both boilerplate lines gone
    assert out[3].text == "unique three"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    assert (out[2].n_lines, out[2].n_kept) == (3, 1)


def test_dedup_lines_intra_document_repeats_dropped(spark):
    out = L.dedup_lines(_docs(spark, [(1, "x\ny\nx\nx")])).collect()[0]
    assert out.text == "x\ny" and out.n_lines == 4 and out.n_kept == 2


def test_dedup_lines_all_boilerplate_doc_empties_not_dropped(spark):
    df = _docs(spark, [(1, "b1\nb2"), (2, "b1\nb2")])
    out = {r.doc_id: r for r in L.dedup_lines(df).collect()}
    assert out[2].text == "" and out[2].n_kept == 0 and out[2].n_lines == 2
    assert out[1].text == "b1\nb2"


def test_dedup_lines_trims_and_skips_blank_lines(spark):
    out = L.dedup_lines(_docs(spark, [(1, "  a  \n\n \nb")])).collect()[0]
    assert out.text == "a\nb" and out.n_lines == 2


def test_dedup_lines_deterministic_across_partitioning(spark):
    rows = [(i, f"shared line\nunique {i}\nfooter line") for i in range(40)]
    a = L.dedup_lines(_docs(spark, rows).repartition(1)).collect()
    b = L.dedup_lines(_docs(spark, rows).repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# filter_quality_lines
# ---------------------------------------------------------------------------

def test_filter_quality_lines_c4_rules(spark):
    text = "\n".join([
        "this line has enough words.",   # keep
        "too short.",                    # < min_words
        "no terminal punctuation here",  # no punct
        "function() { return 1; }",      # brace
        "does this question line work?", # keep
    ])
    out = L.filter_quality_lines(
        _docs(spark, [(1, text)]), min_words=4
    ).collect()[0]
    assert out.text == (
        "this line has enough words.\ndoes this question line work?"
    )
    assert out.n_lines == 5 and out.n_kept == 2


def test_filter_quality_lines_punct_optional(spark):
    out = L.filter_quality_lines(
        _docs(spark, [(1, "four words right here\nshort.")]),
        min_words=4, require_terminal_punct=False,
    ).collect()[0]
    assert out.text == "four words right here" and out.n_kept == 1


def test_filter_quality_lines_zero_shuffle(spark):
    plan = (
        L.filter_quality_lines(_docs(spark, [(1, "a.\nb.")]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_filter_quality_lines_validates(spark):
    with pytest.raises(ValueError):
        L.filter_quality_lines(_docs(spark, [(1, "x")]), min_words=0)


# ---------------------------------------------------------------------------
# shuffle_to_shards
# ---------------------------------------------------------------------------

def test_shuffle_shards_is_permutation_and_deterministic(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = shuffle_to_shards(df, n_shards=8, seed="s1")
    rows = a.collect()
    assert len(rows) == 500
    # (shard, pos) pairs are unique and positions are dense per shard
    pairs = {(r.shard, r.shard_pos) for r in rows}
    assert len(pairs) == 500
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # rerun + any partitioning -> bit-identical layout
    b = shuffle_to_shards(df.repartition(11), n_shards=8, seed="s1").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b))


def test_shuffle_shards_seed_changes_permutation(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.shard, r.shard_pos)
         for r in shuffle_to_shards(df, 4, seed="e1").collect()}
    b = {r.doc_id: (r.shard, r.shard_pos)
         for r in shuffle_to_shards(df, 4, seed="e2").collect()}
    assert a != b


def test_shuffle_shards_roughly_uniform(spark):
    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    sizes = [
        r.n for r in shuffle_to_shards(df, 8, seed="u")
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes)


def test_shuffle_shards_validates(spark):
    with pytest.raises(ValueError):
        shuffle_to_shards(spark.range(3), n_shards=0)
