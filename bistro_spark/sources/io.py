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
    schema: str | None = None,
) -> DataFrame:
    """provider: 'parquet_dir' (testdata), 'iceberg' (catalog table on a
    real cluster), or 'csv_dir' (the reference's bundled-example format —
    ``examples/.../ExUtils`` CSV readers; header row, explicit schema
    preferred over inference so types are deterministic)."""
    if provider == "iceberg":
        return spark.read.table(name)
    root = root or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if provider == "csv_dir":
        reader = spark.read.option("header", "true")
        if schema:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(f"{root}/{name}.csv")
    return spark.read.parquet(f"{root}/{name}.parquet")


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """JSON-Lines reader — the interchange format of LLM data pipelines
    (one JSON object per line, newline-delimited, gzip-splittable when
    chunked). ALWAYS pass an explicit ``schema`` at scale: schema
    inference is a full extra pass over 100 TB; an explicit schema makes
    the read single-pass and gives Catalyst exact types for pruning.
    Corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode) instead of
    failing the job — a real crawl dump always has a few."""
    reader = spark.read
    if schema:
        reader = reader.schema(f"{schema}, _corrupt_record string")
    return reader.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """JSON-Lines writer (one object per line per partition file)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def register_views(spark: SparkSession, root: str) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for t in TESTDATA_TABLES:
        load_table(spark, t, root).createOrReplaceTempView(t)


class SimulatorFileConnector:
    """Rate-paced replay connector — the ConnectorSimulatorFile analog
    (``server/.../connectors/ConnectorSimulatorFile.java`` replays a CSV
    with inter-record delays derived from a timestamp column, scaled by an
    acceleration factor).

    Replays a timestamped DataFrame into a file-stream directory: rows are
    split into deltas of ``delta_rows`` in arrival order, each delta lands
    as one parquet file — written to a dot-prefixed staging dir (invisible
    to Spark's file-source listing) then moved with an atomic rename, so a
    torn file can never be picked up — and the connector sleeps between
    deltas by the deltas' event-time gap divided by ``accel``.

    This is a simulation harness like the reference's (driver-paced;
    per-delta writes run on executors): it feeds processing-time-triggered
    streaming tests with realistically-timed arrivals. A production source
    is the Iceberg/file stream itself.
    """

    def __init__(
        self,
        df: DataFrame,
        out_dir: str,
        time_col: str = "event_time",
        order_col: str = "batch_ofs",
        delta_rows: int = 100,
        accel: float = 100.0,
    ):
        self.df = df
        self.out_dir = out_dir
        self.time_col = time_col
        self.order_col = order_col
        self.delta_rows = delta_rows
        self.accel = accel
        self.files_written = 0

    def run(self) -> int:
        """Replay everything; returns the number of files written."""
        import shutil
        import time

        from pyspark.sql import functions as F

        os.makedirs(self.out_dir, exist_ok=True)
        meta = (
            self.df.select(self.order_col, self.time_col)
            .orderBy(self.order_col)
            .collect()
        )
        chunks = [
            meta[i : i + self.delta_rows]
            for i in range(0, len(meta), self.delta_rows)
        ]
        prev_t = None
        for k, chunk in enumerate(chunks):
            tmax = max(r[self.time_col] for r in chunk)
            if prev_t is not None and self.accel > 0:
                gap = (tmax - prev_t).total_seconds() / self.accel
                if gap > 0:
                    time.sleep(gap)
            prev_t = tmax
            lo = chunk[0][self.order_col]
            hi = chunk[-1][self.order_col]
            staging = os.path.join(self.out_dir, f".staging_b{k}")
            (
                self.df.filter(
                    (F.col(self.order_col) >= lo)
                    & (F.col(self.order_col) <= hi)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(staging)
            )
            for fn in os.listdir(staging):
                if fn.endswith(".parquet"):
                    os.rename(
                        os.path.join(staging, fn),
                        os.path.join(self.out_dir, f"b{k}_{fn}"),
                    )
                    self.files_written += 1
            shutil.rmtree(staging)
        return self.files_written


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


def stream_table(spark: SparkSession, name: str) -> DataFrame:
    """Streaming read of a catalog-managed table — on a cluster with the
    Iceberg runtime this is the incremental-snapshot stream over the
    tokenized corpus (each new snapshot's appended files = one micro-batch,
    the ActionAdd delta at 10^12-sequence scale; hidden partitioning keeps
    pruning in the catalog). The offline sandbox has no Iceberg jar, so
    routing (not snapshot semantics) is what tests cover here."""
    return spark.readStream.table(name)
