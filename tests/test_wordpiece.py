"""WordPiece tokenizer: greedy-encode semantics, training determinism,
and the recursive-CTE SQL twin (see operators/wordpiece.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.wordpiece import (
    CONT,
    FIXED_WORDPIECE_VOCAB,
    UNK,
    _vocab_maps,
    encode_word,
    wordpiece_decode_pieces,
    wordpiece_encode,
    wordpiece_encode_fixed_sql,
    wordpiece_fertility,
    wordpiece_fertility_sql,
    wordpiece_train,
)

VOCAB = [
    UNK,
    *list("abcdehlntuv"),
    *[CONT + c for c in "abcdehlntuvy"],
    "th", "the", "tab", "val", "un",
    "##le", "##ble", "##alue", "##happy", "##lue", "##ue",
]


# ------------------------------------------------------------- encoding --


def test_greedy_longest_match_reference():
    initial, cont, ml = _vocab_maps(VOCAB)
    assert encode_word("the", initial, cont, ml) == ["the"]
    # longest INITIAL match is "tab" (no initial "table"), then greedy
    # continuations: "##le" beats "##l"+"##e"
    assert encode_word("table", initial, cont, ml) == ["tab", "##le"]
    # "##alue" can't match after "val" (cursor sits at "ue"), so the
    # longest continuation there is "##ue"
    assert encode_word("value", initial, cont, ml) == ["val", "##ue"]
    assert encode_word("unhappy", initial, cont, ml) == ["un", "##happy"]
    # empty word and UNK fallbacks
    assert encode_word("", initial, cont, ml) == []
    assert encode_word("zz", initial, cont, ml) == [UNK]  # no initial 'z'
    assert encode_word("az", initial, cont, ml) == [UNK]  # no cont 'z'
    assert encode_word("a" * 101, initial, cont, ml) == [UNK]  # max_chars
    assert encode_word("a" * 100, initial, cont, ml) == ["a"] + ["##a"] * 99


def test_greedy_can_beat_and_lose_to_char_split():
    # greedy commits to the longest prefix even when a shorter one
    # yields fewer total pieces — the documented WordPiece behavior
    # (unlike unigram's Viterbi, which would pick the 2-piece split).
    vocab = [UNK, "a", "ab", "##c", "##bc"]
    initial, cont, ml = _vocab_maps(vocab)
    assert encode_word("abc", initial, cont, ml) == ["ab", "##c"]
    vocab2 = [UNK, "a", "ab", "##bc"]  # no ##c: greedy "ab" strands "c"
    initial, cont, ml = _vocab_maps(vocab2)
    assert encode_word("abc", initial, cont, ml) == [UNK]


def test_encode_dataframe_and_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [("d1", "the table value unhappy"), ("d2", ""), ("d3", "zz the")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in wordpiece_encode(df, VOCAB).collect()}
    assert out["d1"]["pieces"] == "the tab ##le val ##ue un ##happy"
    assert out["d1"]["n_pieces"] == 7
    assert out["d2"]["pieces"] == "" and out["d2"]["n_pieces"] == 0
    assert out["d3"]["pieces"] == f"{UNK} the"
    # round-trip for fully-covered text
    assert wordpiece_decode_pieces(out["d1"]["pieces"]) == "the table value unhappy"


def test_fixed_vocab_covers_corpus_no_unk(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    enc = wordpiece_encode(docs, FIXED_WORDPIECE_VOCAB)
    n_unk = enc.filter(F.col("pieces").contains(UNK)).count()
    assert n_unk == 0  # [a-z] single chars at both positions = coverage
    # round-trip on every doc (no UNK => lossless)
    rows = enc.join(docs, "doc_id").select("pieces", "text").collect()
    for r in rows:
        assert wordpiece_decode_pieces(r["pieces"]) == " ".join(r["text"].split())


# --------------------------------------------------------------- oracle --


def test_sql_twin_parity_including_unk(spark):
    rows = [
        ("d1", "the table value unhappy"),
        ("d2", ""),
        ("d3", "zz az the"),  # UNK via missing initial AND missing cont
        ("d4", "a" * 101 + " tab"),  # max_chars UNK next to a real piece
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_pieces"], r["pieces"])
        for r in wordpiece_encode(df, VOCAB).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    for did, n, p in con.execute(
        wordpiece_encode_fixed_sql("docs", VOCAB)
    ).fetchall():
        assert got[did] == (n, p), did


def test_fertility_matches_sql_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["source"]: tuple(r)[1:]
        for r in wordpiece_fertility(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(wordpiece_fertility_sql("documents")).fetchall()
    assert len(want) == len(got)
    for row in want:
        assert got[row[0]] == row[1:], row[0]


# ------------------------------------------------------------- training --


def test_train_likelihood_gain_not_raw_frequency(spark):
    # "ab" is the most FREQUENT pair (12×) but its symbols are very
    # common (a:22, ##b:16), gain = 12/352; "cd" is rarer (9×) over rare
    # symbols (c:9, ##d:9), gain = 9/81 — likelihood gain must pick cd
    # first where raw-frequency BPE would pick ab.
    docs = [("%d" % i, t) for i, t in enumerate(
        ["ab"] * 12 + ["ba"] * 4 + ["aa"] * 6 + ["cd"] * 9
    )]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    vocab = wordpiece_train(df, vocab_size=9)
    merged = [p for p in vocab if p not in (UNK,) and len(p.replace(CONT, "")) > 1]
    assert merged[0] == "cd"


def test_train_tie_breaks_lexicographic(spark):
    # two pairs with IDENTICAL exact gain fractions -> pair-lex ASC wins.
    # "xy" and "xz": both appear 5x; symbols ##y and ##z both 5; x shared.
    docs = [("%d" % i, t) for i, t in enumerate(["xy"] * 5 + ["xz"] * 5)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    vocab = wordpiece_train(df, vocab_size=5)
    merged = [p for p in vocab if len(p.replace(CONT, "")) > 1 and p != UNK]
    assert merged[0] == "xy"  # ('x','##y') < ('x','##z')


def test_train_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v1 = wordpiece_train(docs.repartition(1), vocab_size=120)
    v7 = wordpiece_train(docs.repartition(7), vocab_size=120)
    assert v1 == v7
    assert v1[0] == UNK and len(v1) == 120


def test_trained_vocab_roundtrips_training_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    vocab = wordpiece_train(docs, vocab_size=150)
    enc = wordpiece_encode(docs, vocab)
    assert enc.filter(F.col("pieces").contains(UNK)).count() == 0
    for r in enc.join(docs, "doc_id").select("pieces", "text").collect():
        assert wordpiece_decode_pieces(r["pieces"]) == " ".join(r["text"].split())


def test_train_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id string, text string")
    assert wordpiece_train(df, vocab_size=10) == [UNK]
