"""Z-order key correctness and the clustering-locality property of
write_zordered."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.skew import zorder_key
from facolos_data_pipelines_spark.sources.io import write_zordered


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"]
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=3).alias("z")
        ).collect()
    }
    # bit b of x lands at position 2b, bit b of y at 2b+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    # x=3 (0b011) -> bits 0,2 ; y=5 (0b101) -> bits 1,5 -> 0b100111
    assert got[(3, 5)] == 0b100111


def test_zorder_key_null_maps_to_zero_and_validates(spark):
    df = spark.createDataFrame([(None, 2)], "x: long, y: long")
    row = df.select(zorder_key(["x", "y"], bits=2).alias("z")).collect()[0]
    assert row["z"] == zorder_key_ref(0, 2)
    with pytest.raises(ValueError, match="> 62"):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def zorder_key_ref(x, y, bits=2):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_write_zordered_clusters_matching_rows(spark, tmp_path):
    # 4096 rows over a 64x64 (x, y) grid, 1 row per cell
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    z_path = str(tmp_path / "zordered")
    r_path = str(tmp_path / "random")
    write_zordered(df, z_path, ["x", "y"], bits=6, num_files=16)
    df.repartition(16).write.mode("overwrite").parquet(r_path)

    pred = (F.col("x") < 8) & (F.col("y") < 8)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, r_files = files_touched(z_path), files_touched(r_path)
    # the 64 matching rows occupy one compact z-range -> a couple of
    # files; a hash layout scatters them over ~every file (min/max
    # row-group stats can then skip nothing)
    assert z_files <= 2, z_files
    assert r_files >= 8, r_files
    # layout changes placement, never content
    assert spark.read.parquet(z_path).filter(pred).count() == 64


def test_zorder_key_rejects_out_of_range_values(spark):
    df = spark.createDataFrame([(300, 1)], "x: long, y: long")
    with pytest.raises(Exception, match="outside"):
        df.select(zorder_key(["x", "y"], bits=8).alias("z")).collect()
    neg = spark.createDataFrame([(-1, 1)], "x: long, y: long")
    with pytest.raises(Exception, match="outside"):
        neg.select(zorder_key(["x", "y"], bits=8).alias("z")).collect()
