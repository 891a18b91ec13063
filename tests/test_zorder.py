"""Z-order clustered layout — key arithmetic + file-locality tests."""

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.plans.physical import write_zordered, zorder_value


def test_zorder_value_interleaves_bits(spark):
    # ranges [0,4) with bits=2 make cell == value; (x=3, y=1):
    # bit0: x->pos0, y->pos1; bit1: x->pos2, y->pos3 => 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x int, y int")
    (row,) = df.select(
        zorder_value(["x", "y"], [0.0, 0.0], [4.0, 4.0], bits=2).alias("z")
    ).collect()
    assert row["z"] == 0b0111
    (row,) = df.select(
        zorder_value(["x", "y"], [0.0, 0.0], [4.0, 4.0], bits=2).alias("z")
    ).collect()
    # monotone sanity on a grid: (0,0) -> 0, (3,3) -> max
    grid = spark.createDataFrame(
        [(0, 0), (3, 3)], "x int, y int"
    ).select(zorder_value(["x", "y"], [0.0, 0.0], [4.0, 4.0], 2).alias("z"))
    zs = sorted(r["z"] for r in grid.collect())
    assert zs == [0, 15]


def test_zordered_files_are_spatially_compact(spark, tmp_path):
    """The property that drives row-group pruning: under a z-ordered
    layout, a small 2-D range query intersects FEW files' bounding
    boxes; under a hash-shuffled layout every file spans everything."""
    n = 100_000
    df = spark.range(n).select(
        (F.hash(F.col("id").cast("string")) % 1000).alias("x"),
        (F.hash(F.concat(F.col("id").cast("string"), F.lit("y")))
         % 1000).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    zp = str(tmp_path / "zord")
    write_zordered(df, zp, ["x", "y"], bits=8, n_files=16)

    boxes = (
        spark.read.parquet(zp)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    assert len(boxes) >= 8
    q = (0, 100, 0, 100)  # a 1% corner query
    hit = [b for b in boxes
           if not (b["x1"] < q[0] or b["x0"] > q[1]
                   or b["y1"] < q[2] or b["y0"] > q[3])]
    # z-order: the corner lives in a handful of compact boxes
    assert len(hit) <= max(2, len(boxes) // 4)

    rp = str(tmp_path / "rand")
    df.repartition(16).write.mode("overwrite").parquet(rp)
    rboxes = (
        spark.read.parquet(rp)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    rhit = [b for b in rboxes
            if not (b["x1"] < q[0] or b["x0"] > q[1]
                    or b["y1"] < q[2] or b["y0"] > q[3])]
    assert len(rhit) == len(rboxes)  # hash layout: every file intersects


def test_zordered_content_is_preserved(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i * 7 % 13) for i in range(1000)], "x int, y int")
    p = str(tmp_path / "z2")
    write_zordered(df, p, ["x", "y"], bits=4, n_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert sorted(r["x"] for r in back.collect()) == sorted(range(1000))
    assert "_z" not in back.columns
