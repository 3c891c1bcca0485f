"""binidx_manifest: shard files are contiguous (offset + bytes chains
exactly), layout is cluster-shape-invariant, empty input schema-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from bistro_spark.operators.curation import binidx_manifest


def _docs(spark, n=60):
    rows = [(i, 1 + (i * 2654435761) % 50) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_words long")


def test_shard_files_contiguous(spark):
    out = sorted(
        (r["shard"], r["seq_index"], r["byte_offset"], r["n_bytes"], r["n_tokens"])
        for r in binidx_manifest(_docs(spark), n_shards=4).collect()
    )
    by_shard: dict = {}
    for shard, idx, off, nb, nt in out:
        by_shard.setdefault(shard, []).append((idx, off, nb, nt))
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(len(rows)))
        pos = 0
        for idx, off, nb, nt in rows:
            assert off == pos, f"hole in shard {shard} at {idx}"
            assert nb == 2 * nt
            pos += nb


def test_layout_cluster_shape_invariant(spark):
    a = sorted(map(tuple, binidx_manifest(_docs(spark)).collect()))
    b = sorted(
        map(
            tuple,
            binidx_manifest(_docs(spark).repartition(7)).collect(),
        )
    )
    assert a == b


def test_empty_schema_stable(spark):
    out = binidx_manifest(
        spark.createDataFrame([], "doc_id long, n_words long")
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "shard",
        "seq_index",
        "n_tokens",
        "n_bytes",
        "byte_offset",
    ]
