"""Catalog seam: parquet in this sandbox, Iceberg in production (SURVEY.md 1.2).

The pipeline only calls ``read_table`` / ``write_table`` / ``append_table``,
so switching to Iceberg is a config change, not a code change.  The Iceberg
backend raises a clear error here because no Iceberg runtime jar ships in
this sandbox (verified in SURVEY.md: /opt/spark/jars has no iceberg*), and
there is no network to fetch one; the spark-submit configuration it needs in
production is documented in its docstring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    """Directory-per-table parquet catalog (sandbox backend)."""

    def __init__(self, root: str):
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write_table(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def append_table(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))

    def overwrite_partitions(self, df: DataFrame, name: str, partition_by: list[str]) -> None:
        """Idempotent per-partition write: only the partitions PRESENT in
        ``df`` are replaced (dynamic partition overwrite) — re-running a
        crashed stage over the same partition set cannot double-append rows.
        This is the parquet stand-in for Iceberg's ``overwritePartitions``."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self.path(name))
        )


class IcebergCatalog:
    """Production backend.  Requires, at spark-submit time:

        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
        --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog
        --conf spark.sql.catalog.kg.type=hadoop        # or hive / rest
        --conf spark.sql.catalog.kg.warehouse=<warehouse-uri>

    Tables are then ``kg.<namespace>.<name>``; hidden partitioning
    (``days(ts)``, ``bucket(256, subj)``) replaces the explicit partition
    columns the parquet backend writes.
    """

    def __init__(self, namespace: str, catalog: str = "kg"):
        self.namespace = namespace
        self.catalog = catalog

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _check(self, spark: SparkSession) -> None:
        if spark.conf.get(f"spark.sql.catalog.{self.catalog}", None) is None:
            raise RuntimeError(
                "Iceberg catalog not configured (no iceberg runtime jar in this "
                "sandbox); use ParquetCatalog or configure spark.sql.catalog."
                + self.catalog
            )

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        self._check(spark)
        return spark.read.table(self._ident(name))

    def write_table(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        self._check(df.sparkSession)
        w = df.writeTo(self._ident(name))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def append_table(self, df: DataFrame, name: str) -> None:
        self._check(df.sparkSession)
        df.writeTo(self._ident(name)).append()

    def overwrite_partitions(self, df: DataFrame, name: str, partition_by: list[str]) -> None:
        self._check(df.sparkSession)
        df.writeTo(self._ident(name)).overwritePartitions()
