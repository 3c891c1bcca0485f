"""Iceberg provider coverage (north rule: the input substrate is an
Iceberg table of pre-tokenized sequences).

The sandbox has no Iceberg jar, so this file splits coverage in two:

- CONTRACT tests (always run): the provider branches route through the
  real catalog APIs — ``spark.read.table`` / ``spark.readStream.table``
  — against a session-catalog table, which is exactly the call surface
  Iceberg binds to; plus the MERGE sink's SQL contract. These catch
  interface typos (wrong reader method, malformed MERGE) before a real
  cluster does.
- INTEGRATION test (skip-marked, auto-runs when the Iceberg runtime jar
  is on the classpath): create an Iceberg table, stream into it with the
  MERGE sink, verify exactly-once under replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bistro_spark.sources.io import load_table, stream_table
from bistro_spark.streaming.sink import IcebergMergeSink


def _iceberg_jar_present(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def catalog_table(spark, tmp_path):
    """A session-catalog table of token sequences (the shape the north
    rule's Iceberg table has), dropped after the test."""
    name = "bistro_iceberg_contract_t"
    df = spark.createDataFrame(
        [(f"d{i}", [i, i + 1, i + 2], 3, f"src{i % 2}") for i in range(20)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    df.write.mode("overwrite").saveAsTable(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_load_table_iceberg_provider_routes_to_catalog(spark, catalog_table):
    """provider='iceberg' must read via spark.read.table (catalog path),
    not a filesystem path — verified against a real catalog table."""
    got = load_table(spark, catalog_table, provider="iceberg")
    assert got.count() == 20
    assert set(got.columns) == {"doc_id", "tokens", "n_tok", "source"}
    assert got.filter(F.col("doc_id") == "d3").first()["tokens"] == [3, 4, 5]


def test_stream_table_routes_to_catalog(spark, catalog_table, tmp_path):
    """stream_table must stream via readStream.table: an availableNow
    pass over the catalog table yields exactly its rows."""
    out: list = []
    q = (
        stream_table(spark, catalog_table)
        .writeStream.format("memory")
        .queryName("bistro_stream_table_smoke")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_stream_table")
        )
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM bistro_stream_table_smoke").collect()
    assert len(out) == 20
    assert {r["doc_id"] for r in out} == {f"d{i}" for i in range(20)}


def test_merge_sink_sql_contract():
    """The MERGE the sink issues: keyed ON-clause, upsert both branches,
    backticked key columns (spaced/odd names survive)."""
    sink = IcebergMergeSink("cat.db.seqs", ["doc_id", "source"])
    sql = sink.merge_sql("stage_v")
    assert sql == (
        "MERGE INTO cat.db.seqs t USING stage_v s "
        "ON t.`doc_id` = s.`doc_id` AND t.`source` = s.`source` "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError):
        IcebergMergeSink("t", [])


def test_merge_sink_write_surfaces_catalog_error(spark, catalog_table):
    """Offline negative contract: write() must reach Spark's MERGE
    analysis (session-catalog parquet tables don't support row-level
    MERGE), proving the foreachBatch body issues a real MERGE — not that
    it silently no-ops. With the Iceberg jar this same call succeeds."""
    if _iceberg_jar_present(spark):
        pytest.skip("Iceberg present — covered by the integration test")
    from pyspark.errors import PySparkException

    sink = IcebergMergeSink(catalog_table, ["doc_id"])
    batch = spark.createDataFrame(
        [("d0", [9], 1, "srcX")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(PySparkException, match="MERGE INTO"):
        sink.write(batch, 0)


def test_iceberg_end_to_end_exactly_once(spark, tmp_path):
    """Full Iceberg round-trip (runs only with the Iceberg runtime jar):
    CREATE TABLE ... USING iceberg, stream micro-batches through
    IcebergMergeSink, kill/replay the last batch, assert key-upsert
    idempotence (row set identical after the replay)."""
    if not _iceberg_jar_present(spark):
        pytest.skip("Iceberg runtime jar not on classpath (offline sandbox)")
    name = "bistro_iceberg_e2e"
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} "
        "(doc_id string, n_tok int) USING iceberg"
    )
    try:
        sink = IcebergMergeSink(name, ["doc_id"])
        b0 = spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, n_tok int")
        b1 = spark.createDataFrame([("b", 5), ("c", 3)], "doc_id string, n_tok int")
        sink.write(b0, 0)
        sink.write(b1, 1)
        sink.write(b1, 1)  # replay of the last batch after recovery
        got = {
            r["doc_id"]: r["n_tok"]
            for r in spark.read.table(name).collect()
        }
        assert got == {"a": 1, "b": 5, "c": 3}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
