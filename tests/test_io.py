"""TableIO: Hadoop-FS existence semantics (resume must work on
cluster filesystems, not just the driver's local disk) and the
Iceberg seam (exercised when the runtime jar is present, skipped
otherwise — this sandbox has no jar and no ivy network)."""

import os

import pytest
from pyspark.sql import functions as F

from kgpipe.io import TableIO, iceberg_available, iceberg_conf


def test_exists_and_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert not io.exists("t")
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("part_id"))
    io.write(df, "t", partition_by=["part_id"])
    assert io.exists("t")
    assert io.read("t").count() == 10
    io.drop("t")
    assert not io.exists("t")


def test_exists_ignores_non_table_dirs(spark, tmp_path):
    # a bare directory with no _SUCCESS and no parquet files is not a
    # table (e.g. leftovers of a crashed write attempt)
    os.makedirs(tmp_path / "junk")
    (tmp_path / "junk" / "notes.txt").write_text("x")
    io = TableIO(spark, str(tmp_path))
    assert not io.exists("junk")


def test_empty_table_roundtrip_with_schema(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    out = io.read("missing", "a string, b long")
    assert out.count() == 0 and [f.name for f in out.schema.fields] == ["a", "b"]


def test_iceberg_conf_shape():
    conf = iceberg_conf("kg", "/data/wh")
    assert conf["spark.sql.catalog.kg"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.kg.warehouse"] == "/data/wh"
    assert "Iceberg" in conf["spark.sql.extensions"]


def test_catalog_requires_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("jar present: covered by test_iceberg_roundtrip")
    with pytest.raises(RuntimeError, match="Iceberg"):
        TableIO(spark, str(tmp_path), catalog="kg")


def test_iceberg_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on classpath")
    io = TableIO(spark, str(tmp_path), catalog="kg")
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("part_id"))
    io.write(df, "t", partition_by=["part_id"])
    assert io.exists("t") and io.read("t").count() == 10
    io.write(df.where(F.col("part_id") == 0), "t", mode="overwrite", partition_by=["part_id"])
    # dynamic-partition semantics: untouched partitions survive
    assert io.read("t").count() == 10
    io.drop("t")
    assert not io.exists("t")
