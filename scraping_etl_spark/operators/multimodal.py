"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as binary
columns with typed metadata and processes them in Arrow batches. The
image/audio codec libraries are not in this container, so the *decode*
step is stubbed (clearly marked), while everything Spark-side — schema,
``mapInPandas`` batch shape, Arrow binary transfer, partitioning — is
real and tested.

- :func:`attach_payload` — derive a deterministic binary payload column
  (UTF-8 bytes of a text column) so the plumbing is exercisable on the
  driver's ``documents`` table without real media files.
- :func:`media_features` — ``mapInPandas`` over the binary column:
  per-payload byte length + md5 digest (deterministic, oracle-able) —
  the stand-in for real feature extraction.
- :func:`decode_media` — the codec boundary: dispatches on media_type
  and raises ``NotImplementedError`` for real codecs; the ``"raw"``
  type passes bytes through, which is what the tests pin down.

Scale notes: ``mapInPandas`` streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not
partition size; for multi-MB payloads, lower that conf and size
``maxPartitionBytes`` so one task's batches fit the executor. Binary
payloads should live in their own parquet column chunk (they do, by
virtue of being a separate column) so metadata-only queries never read
the bytes — column pruning is the whole game at 100 TB.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried next to every payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("encoding", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "raw"
) -> DataFrame:
    """Deterministic binary payload + metadata from a text column —
    the test stand-in for reading real media bytes (JVM-side encode,
    no UDF)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ),
    )


def decode_media(payload: bytes, media_type: str) -> bytes:
    """Codec boundary — STUB. Real deployments plug PIL/ffmpeg/soundfile
    in here; this container has none of them, so everything except the
    pass-through ``"raw"`` type raises."""
    if media_type == "raw":
        return payload
    raise NotImplementedError(
        f"decode_media({media_type!r}): codec libraries are not available "
        "in this environment — plug in PIL/ffmpeg/soundfile here."
    )


def media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Deterministic features (byte length, md5 hex) stand in for real
    image/audio features; the ``mapInPandas`` batch shape, binary Arrow
    transfer, and schema contract are the production-shaped parts.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_media(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) for p in decoded],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in decoded],
                }
            )

    cols = df.select(
        F.col(id_col), F.col("payload"), F.col("media_meta.media_type").alias("media_type")
    )
    return cols.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing — Arrow-batched ``mapInPandas`` with the real
    schema/batch contract; the pixel math is a deterministic fake
    (truncate/zero-pad the payload to width*height bytes) because no
    image codec ships in this container. Production swaps the body for
    PIL ``Image.resize`` keeping the exact same signature, schema and
    batch shape."""
    import pandas as pd
    from typing import Iterator

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    cols = df.select(F.col(id_col), F.col("payload"))
    return cols.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing — the one-row-in / many-rows-out fan-out
    shape of video frame extraction, as ``mapInPandas`` (which may emit
    any number of output rows per input row — no explode needed).
    Deterministic fake: every ``every_n_bytes`` slice of the payload is
    "a frame", capped at ``max_frames``. Production swaps the body for
    ffmpeg keyframe extraction with the same contract."""
    import pandas as pd
    from typing import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                for k in range(max_frames):
                    lo = k * every_n_bytes
                    if lo >= len(p):
                        break
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytes(p[lo : lo + every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    cols = df.select(F.col(id_col), F.col("payload"))
    return cols.mapInPandas(run, schema=FRAME_SCHEMA)


SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("coarse_sig", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def payload_coarse_signature(
    df: DataFrame, stride: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual-hash-SHAPED signature over the binary payload: md5 of
    every ``stride``-th byte. The downsampling is the deterministic
    stand-in for a real perceptual hash (pHash/chromaprint — codec
    libraries absent here; production swaps the body, keeping the
    signature/schema/batch contract), but the SCALE property it
    exercises is the real one: a byte-level near-dup tier needs a
    BUCKETABLE key computed in one Arrow pass so candidate pairs come
    from an equi-join on the signature, never from pairwise payload
    comparison. Returns ``(id, coarse_sig, n_bytes)``."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "coarse_sig": [
                        hashlib.md5(p[::stride]).hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        sig, schema=SIGNATURE_SCHEMA
    )


def payload_dup_groups(
    df: DataFrame, stride: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Byte-level near-dup families via the coarse signature: one
    partial-agg groupBy on the 32-char signature (the exact-dedup
    shape — ``dedup.exact_dup_groups`` at the payload tier). Returns
    per-payload rows with ``n_family`` and the min-id ``is_canonical``
    survivor flag; families of size 1 pass through. Signature
    collisions over-group (the documented coarse-tier trade —
    downstream exact verification compares ``payload_md5`` from
    :func:`media_features` within each family, a family-bounded
    join, never corpus-pairwise)."""
    sigs = payload_coarse_signature(df, stride=stride, id_col=id_col)
    fams = sigs.groupBy("coarse_sig").agg(
        F.count(F.lit(1)).cast("long").alias("n_family"),
        F.min(id_col).alias("_min_id"),
    )
    return sigs.join(fams, "coarse_sig").select(
        id_col,
        "coarse_sig",
        "n_bytes",
        "n_family",
        (F.col(id_col) == F.col("_min_id")).alias("is_canonical"),
    )


def payload_simhash(
    payload_col: Column | str = "payload",
    chunk_bytes: int = 32,
    bits: int = 16,
) -> Column:
    """Byte-level SimHash over the binary payload — near-dup signature
    for media assets WITHOUT decoding (the asset tier of the text
    SimHash: an image served with touched-up EXIF bytes or a re-muxed
    clip shares most byte chunks, so its signature lands at small
    Hamming distance; Charikar 2002 applied to fixed-stride byte
    chunks, the Dropbox/backup-dedup convention).

    The payload is carried through its HEX encoding (2 chars/byte) so
    the chunk hashing is plain string md5 — bit-for-bit mirrorable in
    DuckDB (``hex(encode(...))`` parity is pinned by the gate); chunks
    are ``chunk_bytes``-byte (=2·chunk_bytes hex chars) fixed strides,
    tail kept. Pure per-row array expressions over the shared
    :func:`~scraping_etl_spark.operators.dedup.simhash_of_hashes` vote
    core — zero shuffle to sign a corpus."""
    from scraping_etl_spark.operators.dedup import _bind, simhash_of_hashes

    col = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    step = 2 * chunk_bytes

    def _chunks(hx: Column) -> Column:
        n = F.length(hx)
        starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(starts, lambda i: hx.substr(i, F.lit(step)))

    def _hashes(chunks: Column) -> Column:
        return F.transform(
            chunks,
            lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        )

    return _bind(
        _bind(F.hex(col), lambda hx: _hashes(_chunks(hx))),
        lambda hashed: simhash_of_hashes(hashed, bits),
    )


def payload_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    chunk_bytes: int = 8,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate binary-asset pairs at Hamming distance ≤
    ``max_hamming`` on the byte-chunk SimHash, found by signature
    BANDING instead of an all-pairs scan: split the ``bits``-bit
    signature into ``bands`` equal slices; by pigeonhole any pair
    within ``max_hamming < bands`` differing bits agrees on at least
    one whole band, so the per-band equi-join is a COMPLETE candidate
    generator (the Manku/Jarvelin-style multi-table SimHash lookup as
    one self-join). Verify re-attaches both signatures and keeps
    ``bit_count(a XOR b) <= max_hamming``.

    Plan: per-row signature (zero shuffle) → explode to ``bands`` rows
    → band-keyed equi-join → pair agg (dedup of multi-band collisions,
    same key as the join) → id-keyed verify carrying two LONGs (not
    payloads). Returns ``(id_a, id_b, hamming)``.

    Sizing: band width = bits/bands is the collision exponent — random
    signatures collide per band at ~n²/2^width, so the default 60/4
    (15-bit bands, 32k buckets) keeps the candidate join linear-ish up
    to ~10⁵-10⁶ assets per band bucket-space; at larger corpora raise
    ``bits``/``bands`` together (64-bit signatures with 16-bit bands is
    the classic Manku web-dedup geometry — bits ≤ 62 here, the vote
    combiner packs into one signed long). ``chunk_bytes`` trades edit
    robustness (smaller = an edit touches fewer chunks = fewer flipped
    bits) against signature cost (more chunks per payload)."""
    if not 0 < max_hamming < bands:
        raise ValueError(
            f"need 0 < max_hamming < bands for the pigeonhole guarantee, "
            f"got max_hamming={max_hamming}, bands={bands}"
        )
    if bits % bands != 0:
        raise ValueError(f"bands must divide bits, got {bits}/{bands}")
    width = bits // bands
    mask = (1 << width) - 1
    sigs = df.select(
        F.col(id_col).alias("_id"),
        payload_simhash(payload_col, chunk_bytes, bits).alias("_sig"),
    ).localCheckpoint()  # consumed by the band explode AND verify ×2
    banded = sigs.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("_band"),
                    F.shiftright("_sig", b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("_val"),
                )
                for b in range(bands)
            ])
        ).alias("_e"),
    ).select("_id", "_e._band", "_e._val")
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._val") == F.col("b._val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_nb"))
        .drop("_nb")
    )
    va = sigs.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_sa"))
    vb = sigs.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def payload_chunk_hashes(
    payload_col: Column | str = "payload",
    chunk_bytes: int = 8,
) -> Column:
    """DISTINCT 60-bit md5 hashes of the payload's fixed-stride byte
    chunks — the set representation :func:`payload_containment_pairs`
    compares (the hex-encoding trick of :func:`payload_simhash`, but
    keeping the chunk SET instead of folding it into one signature).
    LONGs, not strings, so every downstream exchange is ~2.5x smaller
    (the ``doc_allpairs`` lesson); collisions (~n²/2^61) would show as
    an oracle hash mismatch, detected not silent."""
    from scraping_etl_spark.operators.dedup import _bind

    col = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    step = 2 * chunk_bytes

    def _chunks(hx: Column) -> Column:
        n = F.length(hx)
        starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(
                starts,
                lambda i: F.conv(
                    F.substring(F.md5(hx.substr(i, F.lit(step))), 1, 15), 16, 10
                ).cast("long"),
            )
        )

    return _bind(F.hex(col), _chunks)


def payload_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    chunk_bytes: int = 8,
    tau: float = 0.6,
    max_docs_per_chunk: int = 64,
) -> DataFrame:
    """One-sided CONTAINMENT pairs over binary assets WITHOUT decoding
    (Broder 1997 containment on byte-chunk sets): catches the
    asymmetric asset dups the SimHash tier structurally misses — a
    small file archived whole inside a concatenated shard or a
    prefix-extended container has tiny resemblance (the big side
    dominates the union) but containment ≈ 1.

    ``c(A, B) = |C_A ∩ C_B| / min(|C_A|, |C_B|)`` over distinct
    fixed-stride chunk-hash sets; pairs with ``c >= tau`` survive.
    ALIGNMENT CAVEAT (honest domain boundary): fixed strides detect
    the contained file only at stride-aligned offsets — prefix
    containment and shard concatenation at chunk-multiple boundaries,
    which is how shard writers lay files out; an arbitrary-offset
    embedding needs a content-defined chunker to re-sync (the
    ``corpus_prep.cdc_chunks`` tier, byte-level variant future work).

    Plan mirrors :func:`dedup.containment_pairs` exactly: distinct
    (id, chunk-long) relation, the too-common-chunk filter that is
    simultaneously the skew guard (every join key's fan-out bounded by
    ``max_docs_per_chunk`` — zero-runs and shared headers are the
    binary boilerplate), one ``localCheckpoint`` feeding both join
    sides, equi-join + partial-agg count, min()-denominator from the
    UNFILTERED set sizes. Returns ``(id_a, id_b, n_shared, n_a, n_b,
    containment)`` with ``id_a < id_b``, containment rounded to 6.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    chunks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(payload_chunk_hashes(payload_col, chunk_bytes)).alias("_c"),
    )
    sizes = chunks.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks")
    )
    common = (
        chunks.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") > max_docs_per_chunk)
        .select("_c")
    )
    kept = chunks.join(common, "_c", "left_anti").localCheckpoint()
    a = kept.select(F.col("_id").alias("id_a"), "_c")
    b = kept.select(F.col("_id").alias("id_b"), "_c")
    shared = (
        a.join(b, "_c")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        shared.join(sizes.select(F.col("_id").alias("id_a"),
                                 F.col("n_chunks").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("n_chunks").alias("n_b")), "id_b")
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.least("n_a", "n_b").cast("double"), 6),
        )
        .filter(F.col("containment") >= tau)
        .select("id_a", "id_b", "n_shared", "n_a", "n_b", "containment")
    )
