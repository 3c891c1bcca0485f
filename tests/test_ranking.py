"""Two-phase global ranking and token-id encoding: correctness vs a
single-window reference, determinism across partitionings, vocabulary id
assignment, OOV handling, and DuckDB-twin parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.ranking import (
    build_vocab,
    encode_tokens,
    encode_tokens_sql,
    global_rank,
    global_rank_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


# ----------------------------------------------------------- global rank ----


def test_global_rank_matches_single_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(200)], ["id", "key"]
    ).repartition(7)
    got = {
        r.id: r.rank
        for r in global_rank(df, ["key", "id"], n_partitions=5).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("key", "id")
            ).cast("long"),
        ).collect()
    }
    assert got == want
    # ranks are a permutation of 1..n
    assert sorted(got.values()) == list(range(1, 201))


def test_global_rank_partitioning_invariant(spark):
    """The rank must not depend on input partitioning or the number of
    range partitions — the determinism that makes a resumed / re-scaled
    job produce the identical shuffle order."""
    rows = [(i, (i * 13) % 47) for i in range(150)]
    a = global_rank(
        spark.createDataFrame(rows, ["id", "key"]).repartition(3),
        ["key", "id"], n_partitions=2,
    )
    b = global_rank(
        spark.createDataFrame(rows, ["id", "key"]).repartition(11),
        ["key", "id"], n_partitions=9,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_rank_no_single_partition_window(spark):
    """The plan must contain no empty-partition-spec Window (a global
    window funnels the corpus through one task)."""
    import contextlib
    import io

    df = spark.range(100).withColumn("key", F.col("id") % 17)
    out = global_rank(df, ["key", "id"], n_partitions=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="extended")
    plan = buf.getvalue()
    # every Window in the optimized/physical plan partitions by _pid
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line


def test_global_rank_vs_duckdb(spark, docs):
    got = sorted(
        (r.doc_id, r.shuffle_rank)
        for r in global_rank(
            docs.select("doc_id").withColumn(
                "_k", F.md5(F.col("doc_id").cast("string"))
            ),
            ["_k", "doc_id"],
            rank_col="shuffle_rank",
        )
        .select("doc_id", "shuffle_rank")
        .collect()
    )
    con = _duck()
    want = sorted(
        tuple(r)
        for r in con.sql(
            global_rank_sql(
                "documents",
                order_by="md5(CAST(doc_id AS VARCHAR)), doc_id",
                out_cols="doc_id",
                rank_col="shuffle_rank",
            )
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------- vocab + token encoding ----


def test_build_vocab_and_encode_known_values(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "a c b")], ["doc_id", "text"]
    )
    vocab = {r.term: (r.cnt, r.token_id) for r in build_vocab(df).collect()}
    # counts: a=3, b=2, c=1 -> ids 0, 1, 2 (count DESC, term ASC)
    assert vocab == {"a": (3, 0), "b": (2, 1), "c": (1, 2)}
    enc = {r.doc_id: r for r in encode_tokens(df, build_vocab(df)).collect()}
    assert enc[1].token_ids == "1,0,0" and enc[1].n_tok == 3
    assert enc[2].token_ids == "0,2,1"


def test_encode_tokens_oov(spark):
    df = spark.createDataFrame([(1, "a a b z")], ["doc_id", "text"])
    vocab = build_vocab(df, min_count=2)  # only "a" survives
    enc = encode_tokens(df, vocab).collect()[0]
    assert enc.token_ids == "0,0,-1,-1"


def test_encode_tokens_vs_duckdb(docs):
    spark_rows = sorted(
        tuple(r) for r in encode_tokens(docs, build_vocab(docs)).collect()
    )
    con = _duck()
    duck_rows = sorted(
        tuple(r) for r in con.sql(encode_tokens_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows


# -------------------------------------------- composed training-prep flow ----


def test_training_prep_pipeline_parity_sf0001(spark):
    """The 4-stage composed flow (span dedup -> gate -> encode -> pack)
    matches the nested-CTE DuckDB oracle at sf0.001."""
    import __spark_entry__ as ent

    got = sorted(
        tuple(r)
        for r in ent.queries()["training_prep_pipeline"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    con = _duck()
    want = sorted(
        tuple(r)
        for r in con.sql(ent.oracle_sql()["training_prep_pipeline"]).fetchall()
    )
    assert got == want and len(got) > 0
    # packing invariants: offsets within capacity unless single long doc
    for _doc, _shard, _pack, off, ln in got:
        assert off == 0 or off + ln <= 256


# ------------------------------------------------- pack materialization ----


def test_materialize_packs_known_values(spark):
    from bistro_spark.operators.curation import (
        materialize_packs,
        pack_sequences,
    )

    enc = spark.createDataFrame(
        [(0, 3, "1,2,3"), (4, 2, "4,5"), (2, 4, "6,7,8,9")],
        ["doc_id", "n_tok", "token_ids"],
    )
    packed = pack_sequences(enc, len_col="n_tok", capacity=8, n_shards=1)
    out = {
        (r.shard, r.pack_id): r
        for r in materialize_packs(packed, enc).collect()
    }
    # id order 0,2,4: 3+4 fit in 8; doc 4 starts pack 1
    assert out[(0, 0)].token_ids == "1,2,3,-2,6,7,8,9,-2"
    assert out[(0, 0)].n_docs == 2 and out[(0, 0)].n_tokens == 9
    assert out[(0, 1)].token_ids == "4,5,-2"


def test_materialized_packs_contract_parity_sf0001(spark):
    import __spark_entry__ as ent

    got = sorted(
        tuple(r)
        for r in ent.queries()["materialized_packs"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    con = _duck()
    want = sorted(
        tuple(r)
        for r in con.sql(ent.oracle_sql()["materialized_packs"]).fetchall()
    )
    assert got == want and len(got) > 0


def test_global_rank_and_vocab_empty_input(spark):
    from bistro_spark.operators.ranking import build_vocab, global_rank

    empty = spark.createDataFrame([], "id long, key long")
    assert global_rank(empty, ["key", "id"]).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert build_vocab(empty_docs).count() == 0


def test_encode_tokens_stream_static_vocab_parity(spark, tmp_path):
    """The production tokenizer shape: a FIXED vocabulary (fit once on a
    reference corpus, broadcast) encoding a document stream via
    foreachBatch — each doc arrives whole in one micro-batch, so
    streaming output must equal the batch encode on the same files."""
    from bistro_spark.operators.ranking import build_vocab, encode_tokens
    from bistro_spark.sources.io import stream_parquet_dir

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    vocab = build_vocab(docs).localCheckpoint(eager=True)  # fit once

    src = str(tmp_path / "enc_src")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode(
        "overwrite").parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode(
        "append").parquet(src)

    got: list = []
    stream = stream_parquet_dir(
        spark, src, docs.schema, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: got.extend(
                tuple(r) for r in encode_tokens(b, vocab).collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "enc_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        tuple(r)
        for r in encode_tokens(spark.read.parquet(src), vocab).collect()
    )
    assert sorted(got) == want and len(want) > 0


# ------------------------------------------- vocabulary coverage curve ----


def test_vocab_coverage_hand_computed(spark):
    from bistro_spark.operators.ranking import vocab_coverage

    # term counts: a=4, b=2, c=1, d=1 -> ranks 1..4; buckets:
    # b0 = {rank 1} (a, 4 occ), b1 = {ranks 2-3} (b+c, 3), b2 = {rank 4} (d, 1)
    df = spark.createDataFrame(
        [(0, "a a b c"), (1, "a a b d")], ["doc_id", "text"]
    )
    rows = {r.top_k: r for r in vocab_coverage(df).collect()}
    assert set(rows) == {1, 3, 4}
    assert (rows[1].n_terms, rows[1].covered) == (1, 4)
    assert (rows[3].n_terms, rows[3].covered) == (3, 7)
    assert (rows[4].n_terms, rows[4].covered, rows[4].coverage) == (4, 8, 1.0)
    assert rows[1].coverage == 0.5 and rows[1].total_occurrences == 8


def test_vocab_coverage_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.ranking import vocab_coverage, vocab_coverage_sql

    path = "/root/testdata/sf0.001/documents.parquet"
    spark_rows = sorted(
        tuple(r) for r in vocab_coverage(spark.read.parquet(path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(vocab_coverage_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows
    assert spark_rows[-1][4] <= 1.0  # monotone curve tops out at 1


# ------------------------------------------------------- per-slice OOV ----


def test_oov_rate_hand_computed(spark):
    from bistro_spark.operators.ranking import oov_rate

    # vocab k=1 keeps only 'a' (most frequent); slice s1: 3 of 4 tokens
    # OOV over 2 distinct terms; s2: all in-vocab
    df = spark.createDataFrame(
        [
            (0, "a b b c", "s1"),
            (1, "a a a", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    got = {r.source: r for r in oov_rate(df, k=1).collect()}
    assert (got["s1"].n_tokens, got["s1"].n_oov, got["s1"].oov_terms) == (4, 3, 2)
    assert got["s1"].oov_rate == 0.75
    assert (got["s2"].n_oov, got["s2"].oov_rate) == (0, 0.0)


def test_oov_rate_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.ranking import oov_rate, oov_rate_sql

    path = "/root/testdata/sf0.001/documents.parquet"
    spark_rows = sorted(
        tuple(r) for r in oov_rate(spark.read.parquet(path), k=25).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(oov_rate_sql("documents", k=25)).fetchall()
    )
    assert spark_rows == duck_rows


# ------------------------------------------------ value_ranks / RRF ----
def test_value_ranks_competition_semantics(spark):
    """Ties share a rank; the next value skips by the tie count (SQL
    RANK()), both directions."""
    from bistro_spark.operators.ranking import value_ranks

    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 7), (4, 5), (5, 5), (6, 5), (7, 1)],
        ["id", "v"],
    )
    desc = {
        r["id"]: r["rank"]
        for r in value_ranks(df, F.col("v")).collect()
    }
    assert desc == {1: 1, 2: 1, 3: 3, 4: 4, 5: 4, 6: 4, 7: 7}
    asc = {
        r["id"]: r["rank"]
        for r in value_ranks(df, F.col("v"), ascending=True).collect()
    }
    assert asc == {7: 1, 4: 2, 5: 2, 6: 2, 3: 5, 1: 6, 2: 6}


def test_value_ranks_partitioning_invariant(spark):
    from bistro_spark.operators.ranking import value_ranks

    import random

    rng = random.Random(13)
    rows = [(i, rng.randrange(20)) for i in range(200)]
    want = None
    for n in (1, 3, 16):
        df = spark.createDataFrame(rows, ["id", "v"]).repartition(n)
        got = sorted(
            (r["id"], r["rank"])
            for r in value_ranks(df, F.col("v")).collect()
        )
        want = got if want is None else want
        assert got == want


def test_rrf_fusion_plan_level_set_window_and_broadcast(spark, docs):
    """Every window in the fused plan runs over an AGGREGATED level set
    (its subtree contains the groupBy), never the raw corpus, and the
    rank maps come back via broadcast joins."""
    from bistro_spark.operators.ranking import rrf_fusion

    plan = (
        rrf_fusion(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the corpus scan must not feed a Window directly: each Window's
    # child chain goes through a HashAggregate (the level-set collapse)
    for seg in plan.split("Window ")[1:]:
        assert "HashAggregate" in seg.split("Scan ", 1)[0]


def test_rrf_fusion_matches_duckdb(spark, docs):
    from bistro_spark.operators.ranking import rrf_fusion, rrf_fusion_sql

    got = {
        r["doc_id"]: (
            r["r_diversity"], r["r_length"], r["r_brevity"],
            round(r["rrf_score"], 12),
        )
        for r in rrf_fusion(docs).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3], round(r[4], 12))
        for r in _duck().execute(rrf_fusion_sql("documents")).fetchall()
    }
    assert got == want


def test_value_ranks_keeps_null_signal_rows(spark):
    """NULL signals form their own rank level (NULLS LAST, both engines'
    default) instead of silently vanishing through the rank-map join."""
    from bistro_spark.operators.ranking import value_ranks

    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", None), ("d", 20), ("e", None)],
        "id string, v int",
    )
    got = {
        r["id"]: r["rank"]
        for r in value_ranks(df, F.col("v"), ascending=False).collect()
    }
    # RANK(): 20,20 -> 1; 10 -> 3; NULLs last -> 4 (shared)
    assert got == {"b": 1, "d": 1, "a": 3, "c": 4, "e": 4}
    want = {
        r[0]: r[1]
        for r in duckdb.connect()
        .execute(
            "SELECT id, RANK() OVER (ORDER BY v DESC NULLS LAST) FROM "
            "(VALUES ('a',10),('b',20),('c',NULL),('d',20),('e',NULL)) "
            "t(id, v)"
        )
        .fetchall()
    }
    assert got == want
