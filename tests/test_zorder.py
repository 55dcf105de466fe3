"""Z-order clustering: Morton math + layout benefit over linear sort."""

import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.io.sinks import Materialization, materialize
from blockchair_etl_spark.operators.zorder import (
    interleave_bits,
    with_zorder_key,
    zorder_layout,
)


def _py_morton(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (255, 1), (170, 85)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.a, r.b], 8), (r.a, r.b)


def test_interleave_rejects_overflow(spark):
    with pytest.raises(ValueError, match="signed long"):
        interleave_bits([F.lit(1)] * 4, bits=16)


def test_zorder_key_is_deterministic_and_total(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("x"),
        (F.col("id") * 31 % 101).alias("y"),
        F.concat(F.lit("u"), F.col("id") % 13).alias("s"),
    )
    k1 = with_zorder_key(df, ["x", "y", "s"]).select("__zorder").collect()
    k2 = with_zorder_key(df, ["x", "y", "s"]).select("__zorder").collect()
    assert [r[0] for r in k1] == [r[0] for r in k2]
    assert all(r[0] >= 0 for r in k1)


def _files_covering(spark, path, col, value):
    """Fraction of parquet files whose [min, max] of `col` covers value —
    a stand-in for the file-skipping ratio a min/max-pruning scan gets."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col(col).alias("c")
    )
    per_file = df.groupBy("f").agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    rows = per_file.collect()
    covering = sum(1 for r in rows if r.mn <= value <= r.mx)
    return covering / len(rows), len(rows)


def test_zorder_layout_prunes_second_column(spark, tmp_path):
    # 100x100 grid in shuffled order: linear clustering on (x, y) sorts
    # by x, so nearly every file spans the full y range; z-order gives y
    # locality too.
    grid = (
        spark.range(10_000)
        .select((F.col("id") % 100).alias("x"), (F.col("id") / 100).cast("long").alias("y"))
        .orderBy(F.xxhash64("id"))
    )
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        linear = str(tmp_path / "linear")
        grid.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y").write.parquet(linear)
        zpath = str(tmp_path / "zorder")
        zorder_layout(grid, ["x", "y"], num_partitions=16).write.parquet(zpath)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")

    frac_linear, n_lin = _files_covering(spark, linear, "y", 42)
    frac_z, n_z = _files_covering(spark, zpath, "y", 42)
    assert n_lin > 4 and n_z > 4
    # every linear file covers y=42; z-order files mostly don't
    assert frac_linear > 0.9
    assert frac_z <= frac_linear / 2, (frac_z, frac_linear)


def test_materialize_zorder_mode(spark, tmp_path):
    df = spark.range(500).select(
        (F.col("id") % 20).alias("x"), (F.col("id") % 7).alias("y"), F.col("id")
    )
    out = materialize(
        df,
        "zclustered",
        Materialization("table", cluster_by=("x", "y"), cluster_algo="zorder"),
        base_path=str(tmp_path),
    )
    assert out.count() == 500
    assert set(out.columns) == {"x", "y", "id"}  # z-key dropped
