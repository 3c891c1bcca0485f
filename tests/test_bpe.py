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


# ------------------------------------------------ tokenizer fertility ----


def test_fertility_stats_hand_computed(spark):
    from bistro_spark.operators.bpe import fertility_stats

    # merges: ("a","b") only -> "ab" becomes [ab, </w>] (2 pieces),
    # any other word of length L becomes L+1 pieces.
    df = spark.createDataFrame(
        [
            (0, "ab ab", "s1"),     # 2 words, 5 chars, 4 pieces
            (1, "xy", "s1"),        # 1 word, 2 chars, 3 pieces
            (2, "", "s2"),          # empty doc: 0 words, 0 pieces
        ],
        ["doc_id", "text", "source"],
    )
    got = {r.source: r for r in fertility_stats(df, [("a", "b")]).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_words, s1.n_chars, s1.n_pieces) == (2, 3, 7, 7)
    assert s1.fertility == round(7 / 3, 6)
    assert s1.chars_per_piece == 1.0
    assert s1.pieces_per_doc == 3.5
    s2 = got["s2"]
    assert (s2.n_words, s2.n_pieces, s2.fertility, s2.chars_per_piece) == (
        0, 0, 0.0, 0.0,
    )


def test_fertility_stats_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.bpe import fertility_stats, fertility_stats_sql

    path = "/root/testdata/sf0.001/documents.parquet"
    spark_rows = sorted(
        tuple(r) for r in fertility_stats(spark.read.parquet(path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(fertility_stats_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows


def test_bpe_encode_keep_passthrough(spark):
    from bistro_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(0, "ab", "s1", 7)], ["doc_id", "text", "source", "extra"])
    [r] = bpe_encode(df, [("a", "b")], keep=["source", "extra"]).collect()
    assert (r.source, r.extra) == ("s1", 7)
    assert r.n_pieces == 2
