"""StreamingCorpusHealth: exact full-history parity with the batch
corpus_health dashboard at every trigger, in ANY arrival order, plus
state/pin lifecycle bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from bistro_spark.caching import pinned_ids
from bistro_spark.operators.olap import corpus_health
from bistro_spark.streaming.health import StreamingCorpusHealth

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _batches(docs, order):
    return [docs.filter(f"doc_id % 3 = {k}") for k in order]


def test_full_history_parity_any_arrival_order(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "source", "text")
    for order in ([0, 1, 2], [2, 0, 1]):
        mon = StreamingCorpusHealth(spark)
        seen = None
        for k in order:
            b = docs.filter(f"doc_id % 3 = {k}")
            seen = b if seen is None else seen.unionByName(b)
            got = sorted(tuple(r) for r in mon.process_batch(b).collect())
            want = sorted(tuple(r) for r in corpus_health(seen).collect())
            assert got == want, f"order={order} after batch {k}"
        mon.close()


def test_duplicate_contents_counted_once_across_triggers(spark):
    rows1 = [(0, "a", "x y x"), (1, "a", "z z")]
    rows2 = [(2, "a", "x y x"), (3, "b", "z z")]  # doc 2 repeats doc 0
    b1 = spark.createDataFrame(rows1, "doc_id long, source string, text string")
    b2 = spark.createDataFrame(rows2, "doc_id long, source string, text string")
    mon = StreamingCorpusHealth(spark)
    mon.process_batch(b1).collect()
    rep = {r["source"]: r for r in mon.process_batch(b2).collect()}
    assert (rep["a"]["n_rows"], rep["a"]["n_distinct"]) == (3, 2)
    assert rep["a"]["dup_ratio"] == round(1 - 2 / 3, 6)
    assert (rep["b"]["n_rows"], rep["b"]["n_distinct"]) == (1, 1)
    want = {
        r["source"]: r
        for r in corpus_health(b1.unionByName(b2)).collect()
    }
    for s in ("a", "b"):
        assert tuple(rep[s]) == tuple(want[s])
    mon.close()


def test_state_and_pin_bounds(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "source", "text")
    before = set(pinned_ids(spark))
    mon = StreamingCorpusHealth(spark)
    pin_sizes = []
    for k in range(4):
        mon.process_batch(docs.filter(f"doc_id % 4 = {k}")).count()
        pin_sizes.append(len(set(pinned_ids(spark)) - before))
    grid, members, terms = mon.state_rows()
    n_groups = docs.select("source").distinct().count()
    assert grid == n_groups
    assert members <= docs.count()  # content-bounded
    assert terms <= n_groups * 64  # tiny shared vocabulary in testdata
    # steady state: pins stop growing after the stores exist
    assert pin_sizes[-1] <= pin_sizes[1]
    mon.close()
    assert set(pinned_ids(spark)) - before == set()
