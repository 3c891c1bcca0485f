"""BPE train/encode (operators/bpe.py): the Sennrich worked example,
parity between the Arrow kernel and the reference encoder, round-trip
losslessness, determinism across cluster shapes, and the memo path."""

from __future__ import annotations

from bistro_spark.operators.bpe import (
    END,
    bpe_decode_pieces,
    bpe_encode,
    bpe_train,
    encode_word,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )


def test_bpe_train_sennrich_worked_example(spark):
    """The canonical example (Sennrich et al. 2016 §3.2): corpus
    {low:5, lower:2, newest:6, widest:3}. With count-DESC /
    lexicographic-ASC tie-breaks the first merges must build 'est</w>'
    from ('e','s'),('es','t'),('est','</w>'), then 'lo' from ('l','o')."""
    rows = ["low "] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    merges = bpe_train(_corpus(spark, rows), n_merges=4)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
    ]


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe_train(docs, n_merges=120)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {
        r["doc_id"]: (r["n_pieces"], r["pieces"])
        for r in bpe_encode(docs, merges).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(src)
    for did, text in src.items():
        want = []
        for w in text.split():
            want.extend(encode_word(w, ranks))
        n, pieces = out[did]
        assert pieces == " ".join(want)
        assert n == len(want)
        # lossless: pieces reassemble to the original whitespace-split text
        assert bpe_decode_pieces(pieces) == " ".join(text.split())


def test_bpe_train_partitioning_invariant(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    m1 = bpe_train(docs.repartition(1), n_merges=60)
    m2 = bpe_train(docs.repartition(17), n_merges=60)
    assert m1 == m2


def test_bpe_encode_compresses(spark):
    """Merges must actually shrink the piece stream vs char-level."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe_train(docs, n_merges=120)
    n_bpe = bpe_encode(docs, merges).agg({"n_pieces": "sum"}).collect()[0][0]
    n_char = bpe_encode(docs, []).agg({"n_pieces": "sum"}).collect()[0][0]
    assert n_bpe < 0.7 * n_char


def test_bpe_unknown_chars_fall_through(spark):
    """Words never seen in training encode as raw chars + marker —
    no OOV failure mode."""
    merges = bpe_train(_corpus(spark, ["aaa aaa aab"]), n_merges=5)
    out = bpe_encode(_corpus(spark, ["zq"]), merges).collect()[0]
    assert out["pieces"] == f"z q {END}" or out["pieces"].endswith(END)
    assert bpe_decode_pieces(out["pieces"]) == "zq"


def test_bpe_encode_fixed_matches_duckdb_recursive_cte(spark):
    """The fixed-merge encode hash-matches the DuckDB recursive-CTE
    replay (leftmost best-ranked merge per step) — the equivalence that
    turns the encode half of BPE into an oracle-checked contract query."""
    import duckdb

    from bistro_spark.operators.bpe import (
        FIXED_MERGES,
        bpe_encode,
        bpe_encode_fixed_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path).select("doc_id", "text")
    spark_rows = sorted(
        tuple(r) for r in bpe_encode(docs, FIXED_MERGES).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(bpe_encode_fixed_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows


def test_fixed_merges_have_creation_order_property(spark):
    """Every composite component of FIXED_MERGES is created by an
    earlier merge — the invariant the SQL oracle's one-occurrence-per-
    step replay relies on (trained lists have it by construction)."""
    from bistro_spark.operators.bpe import FIXED_MERGES

    created = set()
    for a, b in FIXED_MERGES:
        for comp in (a, b):
            assert len(comp) == 1 or comp == END or comp in created, comp
        created.add(a + b)
