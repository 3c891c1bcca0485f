"""Table providers: parquet directory (local/test) or Iceberg (cluster).

The reference only loads CSV in its examples (``examples/.../ExUtils`` CSV
readers) and feeds records through connectors
(``server/.../connectors/ConnectorSimulatorFile.java``); our sources are
real Spark readers so scans get column pruning + predicate pushdown.

The north rule targets an Iceberg table of pre-tokenized sequences; this
sandbox has no Iceberg jar, so the provider abstraction keeps format a
config, not a code path: ``provider='iceberg'`` does
``spark.read.table(name)`` (catalog-managed, hidden-partition pruning),
``provider='parquet_dir'`` reads ``{root}/{name}.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession,
    name: str,
    root: str | None = None,
    provider: str = "parquet_dir",
) -> DataFrame:
    if provider == "iceberg":
        return spark.read.table(name)
    root = root or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return spark.read.parquet(f"{root}/{name}.parquet")


def register_views(spark: SparkSession, root: str) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for t in TESTDATA_TABLES:
        load_table(spark, t, root).createOrReplaceTempView(t)


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source — the offline stand-in for the Iceberg streaming
    read (each new file = one micro-batch, the reference's ActionAdd delta)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
