"""Z-order layout + compaction (operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators import layout as L


def _interleave_py(x, y, bits=21):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(i, (i * 37) % 2048, (i * 101) % 2048) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.z
        for r in df.select("id", L.zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for i, x, y in rows:
        assert got[i] == _interleave_py(x, y), (i, x, y)


def test_zvalue_clamps_and_validates(spark):
    df = spark.createDataFrame([(1, -5, 1 << 40)], "id long, x long, y long")
    [r] = df.select(L.zvalue(F.col("x"), F.col("y"), bits=8).alias("z")).collect()
    assert r.z == _interleave_py(0, 255, bits=8)
    with pytest.raises(ValueError):
        L.zvalue(F.col("x"), F.col("y"), bits=0)


def _mean_extent(laid_out, col):
    """Mean per-partition min/max extent of ``col`` — exactly the
    statistic parquet footer pruning consults."""
    return (
        laid_out.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg((F.max(col) - F.min(col) + 1).alias("d"))
        .agg(F.avg("d"))
        .collect()[0][0]
    )


def test_zorder_tightens_partition_bounding_boxes(spark):
    """The pruning claim, measured on a uniform 64x64 grid in 16
    partitions (256 rows each). An x-sorted layout makes full-height
    stripes: x-extent 4, y-extent 64 — a predicate on y alone prunes
    nothing. Z-layout makes ~square cells (~16x16): BOTH extents stay
    small, so min/max stats prune on either column. Assert the
    per-dimension extents, the statistic pruning actually uses."""
    n = 64
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zlay = L.z_order_layout(df, "x", "y", n_files=16)
    xlay = df.repartitionByRange(16, "x").sortWithinPartitions("x")

    z_dy, x_dy = _mean_extent(zlay, "y"), _mean_extent(xlay, "y")
    z_dx = _mean_extent(zlay, "x")
    assert z_dy <= x_dy / 2, (z_dy, x_dy)   # y-pruning restored by Z
    assert z_dx <= 24, z_dx                  # without giving up x-pruning


def test_zorder_preserves_rows(spark):
    df = spark.createDataFrame(
        [(i, i % 10, i // 10, f"p{i}") for i in range(100)],
        "id long, x long, y long, payload string",
    )
    out = L.z_order_layout(df, "x", "y", n_files=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    assert out.columns == df.columns


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5000)], "id long, v string"
    )
    df.repartition(64).write.parquet(p)
    import os

    before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert before >= 32
    n = L.compact_parquet_dir(spark, p, target_bytes=1 << 40)
    assert n == 1
    got = spark.read.parquet(p)
    assert got.count() == 5000
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


def test_compaction_validates_target(spark, tmp_path):
    with pytest.raises(ValueError):
        L.compact_parquet_dir(spark, str(tmp_path), target_bytes=0)
