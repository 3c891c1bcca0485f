"""Curation operators: deterministic hash sampling, decontamination,
TF-IDF vocabulary, length stats — plus their DuckDB-twin parity and the
short-document n-gram guard."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.curation import (
    contamination,
    contamination_sql,
    hash_sample,
    hash_sample_sql,
    length_stats,
    top_terms,
)
from bistro_spark.operators.dedup import ngram_set

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


# ---------------------------------------------------------- hash_sample ----


def test_hash_sample_deterministic_and_stratified(docs):
    a = hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
    b = hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0
    # sample of a sample at the same rate is the same sample (prefix filter
    # is idempotent) — the property that makes resumed jobs consistent
    c = hash_sample(a, "doc_id", {"en": 0.25}, "lang", 0.75)
    assert sorted(r.doc_id for r in c.select("doc_id").collect()) == ids_a
    # rates land near their targets per stratum
    tot = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in
            a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept.get("en", 0) / tot["en"] < 0.5
    non_en_tot = sum(v for k, v in tot.items() if k != "en")
    non_en_kept = sum(v for k, v in kept.items() if k != "en")
    assert 0.5 < non_en_kept / non_en_tot <= 1.0


def test_hash_sample_matches_duckdb(docs):
    spark_ids = sorted(
        r.doc_id
        for r in hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
        .select("doc_id").collect()
    )
    pred = hash_sample_sql("doc_id", {"en": 0.25}, "lang", 0.75)
    con = _duck()
    duck_ids = sorted(
        r[0] for r in
        con.sql(f"SELECT doc_id FROM documents WHERE {pred}").fetchall()
    )
    assert spark_ids == duck_ids


def test_hash_sample_rate_edges(docs):
    n = docs.count()
    assert hash_sample(docs, "doc_id", {}, "lang", 1.0).count() == n
    assert hash_sample(docs, "doc_id", {}, "lang", 0.0).count() == 0


# ------------------------------------------------------------ ngram guard ----


def test_ngram_set_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [("a b c",), ("one two three four five six seven eight",)],
        ["text"],
    )
    rows = df.select(ngram_set(F.col("text"), n=5).alias("ng")).collect()
    assert rows[0].ng == []          # 3 words < n=5: no gram, no error
    assert len(rows[1].ng) == 4      # 8 words -> 4 distinct 5-grams


# -------------------------------------------------------- contamination ----


def test_contamination_detects_verbatim_span(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally different words here entirely now")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_collisions
           for r in contamination(train, ev, n=4).collect()}
    # doc 1 shares 4-grams "alpha beta gamma delta"+"beta gamma delta
    # epsilon" with the eval doc; doc 2 shares none
    assert out == {1: 2}


def test_contamination_matches_duckdb(spark, docs):
    spark_rows = sorted(
        (r.doc_id, r.n_collisions)
        for r in contamination(
            docs.filter("doc_id % 7 != 0"), docs.filter("doc_id % 7 = 0"),
            n=4,
        ).collect()
    )
    sql = contamination_sql("doc_id % 7 != 0", "doc_id % 7 = 0", n=4)
    con = _duck()
    duck_rows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0  # premise: the split actually collides


# ------------------------------------------------------------- top_terms ----


def test_top_terms_rank_deterministic_and_bounded(docs):
    out = top_terms(docs, "lang", k=5).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        # ordering is (tf desc, term asc) exactly
        key = [(-r.tf, r.term) for r in rows]
        assert key == sorted(key)
        for r in rows:
            # df is corpus-wide docs containing the term; tf is this
            # group's occurrence count — both at least 1 for a ranked term
            assert r.df >= 1 and r.tf >= 1


# ---------------------------------------------------------- length_stats ----


def test_length_stats_exact_vs_known(spark):
    df = spark.createDataFrame(
        [("x", "a b"), ("x", "a b c d"), ("x", "a b c d e f")],
        ["g", "text"],
    )
    row = length_stats(df, "g", exact=True).collect()[0]
    assert row.n_docs == 3 and row.total_words == 12
    assert row.p50_words == 4.0          # middle of [2, 4, 6]
    assert row.p90_words == pytest.approx(5.6)   # 4 + 0.8*(6-4)


def test_length_stats_approx_close_to_exact(docs):
    exact = {r.lang: r for r in length_stats(docs, "lang",
                                             exact=True).collect()}
    approx = {r.lang: r for r in length_stats(docs, "lang",
                                              exact=False).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs and a.total_words == e.total_words
        # words-per-doc spans ~10-100; sketch should land within 20%
        for c in ("p50_words", "p90_words", "p99_words"):
            assert abs(getattr(a, c) - getattr(e, c)) <= 0.2 * getattr(e, c)


# ------------------------------------------------ repetition signals ----


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"),        # bigrams: ab,ba,ab,ba -> top 2/4
         (2, "x y z"),            # all distinct words, top bigram 1/2
         (3, "solo")],            # 1 word: no bigram
        ["doc_id", "text"],
    )
    from bistro_spark.operators.text import repetition_signals

    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].n_words == 5 and out[1].n_distinct_words == 2
    assert out[1].dup_word_fraction == 0.6
    assert out[1].top_bigram_count == 2
    assert out[1].top_bigram_fraction == 0.5
    assert out[2].dup_word_fraction == 0.0
    assert out[2].top_bigram_count == 1
    assert out[3].top_bigram_count == 0
    assert out[3].top_bigram_fraction == 0.0


def test_repetition_signals_hof_explode_parity(docs):
    from bistro_spark.operators.text import repetition_signals

    cols = ["doc_id", "n_words", "n_distinct_words", "dup_word_fraction",
            "top_bigram_count", "top_bigram_fraction"]
    hof = sorted(
        tuple(r) for r in repetition_signals(docs, via="hof")
        .select(*cols).collect()
    )
    exp = sorted(
        tuple(r) for r in repetition_signals(docs, via="explode")
        .select(*cols).collect()
    )
    assert hof == exp


# ------------------------------------------------------ PII redaction ----


def test_redact_pii_counts_and_scrubs(spark):
    from bistro_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob@example.com and alice@test.org ok"),
         (2, "call +1-555-123-4567 or 555 987 6543 now"),
         (3, "host 192.168.0.1 clean text")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_redact_email == 2
    assert "[EMAIL]" in out[1].text and "@" not in out[1].text
    assert out[2].n_redact_phone == 2
    assert "[PHONE]" in out[2].text
    assert out[3].n_redact_ipv4 == 1
    assert "[IPV4]" in out[3].text and "192.168" not in out[3].text
    # clean text untouched
    assert out[3].text.endswith("clean text")


def test_redact_pii_java_re2_portability(spark):
    """The PII regex subset must mean the same thing to DuckDB's RE2 —
    same match count on the same rows."""
    rows = [
        "mail bob@example.com and alice@test.org ok",
        "call +1-555-123-4567 now",
        "host 192.168.0.1 here",
        "no pii at all",
    ]
    from bistro_spark.operators.text import PII_PATTERNS, redact_pii

    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               ["doc_id", "text"])
    spark_counts = {
        r.doc_id: (r.n_redact_email, r.n_redact_phone, r.n_redact_ipv4)
        for r in redact_pii(df).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(rows):
        duck = tuple(
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [t, PII_PATTERNS[k]],
            ).fetchone()[0]
            for k in ("email", "phone", "ipv4")
        )
        assert spark_counts[i] == duck, (i, t, spark_counts[i], duck)


# ------------------------------------------------------------- JSONL ----


def test_jsonl_roundtrip_and_corrupt_record(spark, tmp_path, docs):
    from bistro_spark.sources.io import read_jsonl, write_jsonl

    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select("doc_id", "text", "lang"), p)
    back = read_jsonl(spark, p,
                      schema="doc_id bigint, text string, lang string")
    a = sorted(tuple(r) for r in
               docs.select("doc_id", "text", "lang").collect())
    b = sorted(tuple(r) for r in
               back.select("doc_id", "text", "lang").collect())
    assert a == b
    # corrupt line lands in _corrupt_record, not a job failure
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en"}\n')
        f.write("{this is not json\n")
    rows = read_jsonl(spark, bad,
                      schema="doc_id bigint, text string, lang string")
    # Spark disallows a query whose only referenced column is the internal
    # corrupt-record column — project a data column alongside it
    got = rows.select("doc_id", "_corrupt_record").collect()
    good = sum(1 for r in got if r._corrupt_record is None)
    corrupt = sum(1 for r in got if r._corrupt_record is not None)
    assert (good, corrupt) == (1, 1)


# ------------------------------------------------------------ chunking ----


def test_chunk_spans_known_values(spark):
    from bistro_spark.operators.curation import chunk_spans

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(1, 11))),  # 10 words
         (2, "a b c")],                                  # fits one chunk
        ["doc_id", "text"],
    )
    out = sorted(
        (r.doc_id, r.chunk_id, r.start_word, r.end_word, r.n_words_chunk,
         r.chunk_text)
        for r in chunk_spans(df, size=4, overlap=1).collect()
    )
    # doc 1: n=10, step=3 -> chunks at words 1-4, 4-7, 7-10 (exactly
    # covering with 1-word overlap)
    assert out == [
        (1, 0, 1, 4, 4, "w1 w2 w3 w4"),
        (1, 1, 4, 7, 4, "w4 w5 w6 w7"),
        (1, 2, 7, 10, 4, "w7 w8 w9 w10"),
        (2, 0, 1, 3, 3, "a b c"),
    ]


def test_chunk_spans_every_word_covered(docs):
    """Coverage invariant: union of [start, end] spans = [1, n_words] for
    every document, and consecutive chunks overlap by exactly `overlap`
    words except possibly the last."""
    from bistro_spark.operators.curation import chunk_spans

    rows = chunk_spans(docs, size=16, overlap=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert chunks[0].start_word == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_word == a.start_word + 12  # step = 16 - 4
            assert b.start_word <= a.end_word + 1     # no gap
        n = max(c.end_word for c in chunks)
        assert chunks[-1].end_word == n


def test_chunk_spans_rejects_bad_overlap(docs):
    from bistro_spark.operators.curation import chunk_spans

    with pytest.raises(ValueError):
        chunk_spans(docs, size=8, overlap=8)


def test_chunk_spans_matches_duckdb(docs):
    from bistro_spark.operators.curation import chunk_spans, chunk_spans_sql

    spark_rows = sorted(
        tuple(r) for r in chunk_spans(docs, size=32, overlap=8).collect()
    )
    con = _duck()
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(
            chunk_spans_sql("documents", size=32, overlap=8)
        ).fetchall()
    )
    assert spark_rows == duck_rows


# ----------------------------------------------------- sequence packing ----


def test_pack_sequences_known_values(spark):
    from bistro_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(0, 100), (4, 100), (8, 60), (12, 300), (16, 10)],
        ["doc_id", "n_words"],
    )
    # all ids % 4 == 0 -> one shard; capacity 256, id order:
    # 100 (p0@0), 100 (p0@100), 60 (p0@200->260 overflows: p1@0),
    # 300 (> cap: doesn't fit after 60 -> p2@0), 10 (p3@0: 300 filled p2)
    out = sorted(
        (r.doc_id, r.shard, r.pack_id, r.offset)
        for r in pack_sequences(df, capacity=256, n_shards=4).collect()
    )
    assert out == [
        (0, 0, 0, 0), (4, 0, 0, 100), (8, 0, 1, 0),
        (12, 0, 2, 0), (16, 0, 3, 0),
    ]


def test_pack_sequences_invariants_and_determinism(spark, docs):
    from bistro_spark.operators.curation import pack_sequences

    src = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    a = sorted(tuple(r) for r in
               pack_sequences(src, capacity=128, n_shards=4).collect())
    b = sorted(tuple(r) for r in
               pack_sequences(src.repartition(13), capacity=128,
                              n_shards=4).collect())
    assert a == b  # partitioning-independent (deterministic at any shape)
    # no pack exceeds capacity unless it holds a single oversized doc
    from collections import defaultdict
    packs = defaultdict(list)
    for doc_id, shard, pack_id, offset, ln in a:
        packs[(shard, pack_id)].append((offset, ln))
    for (shard, pack_id), members in packs.items():
        total = sum(ln for _, ln in members)
        if total > 128:
            assert len(members) == 1  # single oversized doc
        # offsets are contiguous: sorted by offset, each starts where the
        # previous ended
        members.sort()
        pos = 0
        for offset, ln in members:
            assert offset == pos
            pos += ln


# ------------------------------------------------- streaming curation ----


def test_curation_ops_streaming_batch_parity(spark, tmp_path, docs):
    """The stateless curation stages (hash_sample -> split_corpus ->
    train-filter -> redact_pii -> chunk_spans) run unchanged on a file
    stream — narrow ops need no state, so streaming output == batch
    output on the same input files."""
    from bistro_spark.operators.curation import (
        chunk_spans,
        hash_sample,
        split_corpus,
    )
    from bistro_spark.operators.text import redact_pii
    from bistro_spark.sources.io import stream_parquet_dir

    src_dir = str(tmp_path / "stream_src")
    half = docs.select("doc_id", "text", "lang")
    half.filter("doc_id % 2 = 0").coalesce(1).write.mode(
        "overwrite").parquet(src_dir)
    half.filter("doc_id % 2 = 1").coalesce(1).write.mode(
        "append").parquet(src_dir)

    def curate(df):
        sampled = hash_sample(df, "doc_id", {"en": 0.5}, "lang", 1.0)
        train = split_corpus(sampled).filter(F.col("split") == "train")
        scrubbed = redact_pii(train)
        return chunk_spans(scrubbed, size=16, overlap=4)

    stream = stream_parquet_dir(
        spark, src_dir, half.schema, max_files_per_trigger=1
    )
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curation_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql(
            "SELECT * FROM curation_stream_out").collect()
    )
    want = sorted(
        tuple(r)
        for r in curate(spark.read.parquet(src_dir)).collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------- unigram LM scoring ----


def test_unigram_logprob_known_values(spark):
    from bistro_spark.operators.curation import unigram_logprob
    import math

    # corpus: 4 total tokens; p(a)=2/4, p(b)=p(c)=1/4
    df = spark.createDataFrame(
        [(1, "a a"), (2, "b c")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert out[1].n_terms == 2 and out[2].n_terms == 2
    assert out[1].mean_logprob == pytest.approx(math.log(0.5), abs=1e-6)
    assert out[2].mean_logprob == pytest.approx(math.log(0.25), abs=1e-6)
    # rarer words -> lower score
    assert out[2].mean_logprob < out[1].mean_logprob


def test_unigram_logprob_matches_duckdb(docs):
    from bistro_spark.operators.curation import (
        unigram_logprob, unigram_logprob_sql,
    )

    spark_rows = sorted(tuple(r) for r in unigram_logprob(docs).collect())
    con = _duck()
    duck_rows = sorted(
        tuple(r) for r in con.sql(unigram_logprob_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows


# ----------------------------------------------------- per-group quota ----


def test_quota_per_group_caps_and_orders(docs):
    from bistro_spark.operators.curation import quota_per_group

    out = quota_per_group(
        docs.select("doc_id", "source", "n_chars"),
        "source", "n_chars", n=3,
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    full = {r.source: r.n for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, rows in by_src.items():
        assert len(rows) == min(3, full[src])
        rows.sort(key=lambda r: r.quota_rank)
        # best-first by n_chars, doc_id tie-break
        key = [(-r.n_chars, r.doc_id) for r in rows]
        assert key == sorted(key)
    # every source with rows appears
    assert set(by_src) == set(full)


# ------------------------------------------------- span-level exact dedup ----


def test_dedup_spans_known_values(spark):
    from bistro_spark.operators.curation import dedup_spans

    # doc 1: spans [a b][c d]; doc 2: [c d][e f]; doc 3 repeats doc 1
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "a b c d")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_spans(df, size=2).collect()}
    assert out[1].n_spans == 2 and out[1].n_kept == 2
    assert out[1].text_dedup == "a b c d"
    # doc 2 loses its first span ("c d" first occurred in doc 1)
    assert out[2].n_kept == 1 and out[2].text_dedup == "e f"
    # doc 3 is entirely a repeat -> empty reassembly, not a missing row
    assert out[3].n_spans == 2 and out[3].n_kept == 0
    assert out[3].text_dedup == ""


def test_dedup_spans_matches_duckdb(docs):
    from bistro_spark.operators.curation import dedup_spans, dedup_spans_sql

    spark_rows = sorted(
        tuple(r) for r in dedup_spans(docs, size=8).collect()
    )
    con = _duck()
    duck_rows = sorted(
        tuple(r) for r in con.sql(dedup_spans_sql("documents", size=8)).fetchall()
    )
    assert spark_rows == duck_rows
    # the corpus genuinely has repeated spans (the op is not a no-op here)
    assert any(r[2] < r[1] for r in spark_rows)


# ------------------------------------------------- token-budget selection ----


def test_token_budget_select_frontier(docs):
    from bistro_spark.operators.curation import token_budget_select

    out = token_budget_select(
        docs.select("doc_id", "source", "n_chars", "text"),
        "source", "n_chars", budget=600,
    ).collect()
    assert len(out) > 0
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.cum_tok)
        # running total is consistent and within budget
        run = 0
        for r in rows:
            run += r.n_tok
            assert r.cum_tok == run
        assert run <= 600
        # kept set is the best-first prefix: every excluded doc of this
        # source ranks below the worst kept one
        kept_ids = {r.doc_id for r in rows}
        frontier = min((r.n_chars, -r.doc_id) for r in rows)
        for d in docs.filter(F.col("source") == src).collect():
            if d.doc_id not in kept_ids:
                assert (d.n_chars, -d.doc_id) < frontier


def test_token_budget_matches_duckdb(docs):
    from bistro_spark.operators.curation import (
        token_budget_select, token_budget_select_sql,
    )

    spark_rows = sorted(
        tuple(r)
        for r in token_budget_select(
            docs.select("doc_id", "source", "n_chars", "text"),
            "source", "n_chars", budget=600,
        ).select("doc_id", "source", "n_chars", "n_tok", "cum_tok").collect()
    )
    con = _duck()
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(
            token_budget_select_sql(
                "documents", "source", "n_chars", budget=600,
                out_cols="doc_id, source, n_chars",
            )
        ).fetchall()
    )
    assert spark_rows == duck_rows


# --------------------------------------------- temperature-based resample ----


def test_temperature_resample_flattens_skew(docs):
    from bistro_spark.operators.curation import temperature_resample

    out = temperature_resample(
        docs.select("doc_id", "lang"), "lang", temperature=2.0
    )
    rates = {r.lang: r.rate for r in out.select("lang", "rate").distinct().collect()}
    tot = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_min = min(tot.values())
    smallest = min(tot, key=lambda k: (tot[k], k))
    assert rates[smallest] == 1.0
    for lang, n in tot.items():
        assert rates[lang] == pytest.approx((n_min / n) ** 0.5, abs=1e-6)
    # deterministic: same rows on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_resample(
        docs.select("doc_id", "lang"), "lang", temperature=2.0).collect())
    assert a == b and len(a) > 0
    # T=1 keeps everything
    all_rows = temperature_resample(
        docs.select("doc_id", "lang"), "lang", temperature=1.0).count()
    assert all_rows == docs.count()
    with pytest.raises(ValueError):
        temperature_resample(docs, "lang", temperature=0.5)


def test_temperature_resample_matches_duckdb(docs):
    from bistro_spark.operators.curation import (
        temperature_resample, temperature_resample_sql,
    )

    spark_rows = sorted(
        tuple(r)
        for r in temperature_resample(
            docs.select("doc_id", "lang"), "lang", temperature=2.0
        ).select("doc_id", "lang", "rate").collect()
    )
    con = _duck()
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(
            temperature_resample_sql(
                "documents", "lang", temperature=2.0, out_cols="doc_id, lang"
            )
        ).fetchall()
    )
    assert spark_rows == duck_rows


# ----------------------------------------------------- train/val/test split ----


def test_split_corpus_deterministic_and_proportioned(docs):
    from bistro_spark.operators.curation import split_corpus

    out = split_corpus(docs.select("doc_id"))
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in split_corpus(
        docs.select("doc_id").repartition(13)).collect()}
    assert a == b  # partitioning-invariant assignment
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    # 90/5/5 within generous tolerance at ~500 docs
    assert 0.8 * n <= c["train"] <= 0.97 * n
    assert c["test"] > 0 and c["val"] > 0
    with pytest.raises(ValueError):
        split_corpus(docs, weights={"train": 0.5, "val": 0.1})


def test_split_corpus_matches_duckdb(docs):
    from bistro_spark.operators.curation import split_corpus, split_corpus_sql

    got = sorted(
        tuple(r) for r in split_corpus(docs.select("doc_id")).collect()
    )
    con = _duck()
    want = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT doc_id, " + split_corpus_sql("doc_id")
            + " AS split FROM documents"
        ).fetchall()
    )
    assert got == want


# --------------------------------------------------------- mixture report ----


def test_mixture_report_matches_duckdb(docs):
    from bistro_spark.operators.curation import (
        mixture_report, mixture_report_sql,
    )

    targets = {"en": 0.3, "de": 0.175, "es": 0.175, "fr": 0.175, "zh": 0.175}
    got = sorted(
        tuple(r) for r in mixture_report(docs, "lang", targets).collect()
    )
    con = _duck()
    want = sorted(
        tuple(r)
        for r in con.sql(
            mixture_report_sql("documents", "lang", targets)
        ).fetchall()
    )
    assert got == want
    # achieved shares sum to ~1
    assert abs(sum(r[3] for r in got) - 1.0) < 1e-4
    # en is over-represented vs a 0.3 target in this corpus
    en = [r for r in got if r[0] == "en"][0]
    assert en[5] > 1.0


# ----------------------------------------------------- bigram LM scoring ----


def test_bigram_logprob_known_values(spark):
    from bistro_spark.operators.curation import bigram_logprob
    import math

    # corpus bigrams: doc1 "a b","b a","a b"; doc2 "b a"
    # c(a,b)=2 h(a)=2 -> p=1; c(b,a)=2 h(b)=2 -> p=1 ... need variety:
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b a c"), (3, "x")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    # histories: a appears non-finally 3x ("a b" in d1, "a b","a c" in d2)
    # c(a,b)=2 -> p(b|a)=2/3; c(b,c)=1, h(b)=2 -> 1/2; c(b,a)=1 -> 1/2;
    # c(a,c)=1 -> 1/3
    assert out[1].n_bigrams == 2
    assert out[1].mean_logprob == pytest.approx(
        (math.log(2 / 3) + math.log(1 / 2)) / 2, abs=1e-6
    )
    assert out[2].n_bigrams == 3
    assert out[2].mean_logprob == pytest.approx(
        (math.log(2 / 3) + math.log(1 / 2) + math.log(1 / 3)) / 3,
        abs=1e-6,
    )
    assert 3 not in out  # single-word doc: no bigrams, absent


def test_bigram_logprob_matches_duckdb(docs):
    from bistro_spark.operators.curation import (
        bigram_logprob, bigram_logprob_sql,
    )

    spark_rows = sorted(tuple(r) for r in bigram_logprob(docs).collect())
    con = _duck()
    duck_rows = sorted(
        tuple(r) for r in con.sql(bigram_logprob_sql("documents")).fetchall()
    )
    assert spark_rows == duck_rows


def test_bigram_penalizes_scrambled_order(spark):
    """The conditional score must drop when word ORDER is destroyed while
    unigram statistics stay identical — the property that motivates it."""
    from bistro_spark.operators.curation import bigram_logprob

    base = [
        (i, "the quick brown fox jumps over the lazy dog") for i in range(20)
    ]
    scrambled = [(100, "dog the over quick lazy fox brown jumps the")]
    df = spark.createDataFrame(base + scrambled, ["doc_id", "text"])
    out = {r.doc_id: r.mean_logprob for r in bigram_logprob(df).collect()}
    assert out[100] < out[0]


def test_classifier_score_streaming_batch_parity(spark, tmp_path, docs):
    """classifier_score is a stateless narrow map stage, so it runs
    unchanged on a file stream — streaming output == batch output on the
    same input files (the quality-gate shape of a live ingest pipeline)."""
    from bistro_spark.operators.text import classifier_score
    from bistro_spark.sources.io import stream_parquet_dir

    src_dir = str(tmp_path / "clf_stream_src")
    half = docs.select("doc_id", "text")
    half.filter("doc_id % 2 = 0").coalesce(1).write.mode(
        "overwrite").parquet(src_dir)
    half.filter("doc_id % 2 = 1").coalesce(1).write.mode(
        "append").parquet(src_dir)

    stream = stream_parquet_dir(
        spark, src_dir, half.schema, max_files_per_trigger=1
    )
    q = (
        classifier_score(stream)
        .writeStream.format("memory")
        .queryName("clf_stream_out")
        .option("checkpointLocation", str(tmp_path / "clf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM clf_stream_out").collect()
    )
    want = sorted(
        tuple(r)
        for r in classifier_score(spark.read.parquet(src_dir)).collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------ shard export manifest --


def _mat_packs(spark):
    from bistro_spark.operators.curation import (
        materialize_packs,
        pack_sequences,
    )
    from bistro_spark.operators.ranking import build_vocab, encode_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enc = encode_tokens(docs, build_vocab(docs))
    packed = pack_sequences(enc, len_col="n_tok", capacity=256, n_shards=4)
    return materialize_packs(packed, enc)


def test_write_shards_roundtrip_reproduces_manifest(spark, tmp_path):
    """Lossless export: the manifest computed from the INPUT equals the
    manifest re-derived from the files written per shard — the integrity
    contract a trainer relies on."""
    from bistro_spark.operators.curation import shard_manifest, write_shards

    mat = _mat_packs(spark)
    path = str(tmp_path / "shards")
    wrote = sorted(tuple(r) for r in write_shards(mat, path).collect())
    reread = sorted(
        tuple(r) for r in shard_manifest(spark.read.parquet(path)).collect()
    )
    assert wrote == reread and len(wrote) == 4
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    ) == ["shard=0", "shard=1", "shard=2", "shard=3"]


def test_shard_manifest_detects_loss_and_is_partitioning_invariant(spark):
    """Dropping any single pack changes that shard's fingerprint (sum of
    per-pack hashes); repartitioning the input changes nothing (sums are
    order-independent exact integers)."""
    from pyspark.sql import functions as F

    from bistro_spark.operators.curation import shard_manifest

    mat = _mat_packs(spark).cache()
    try:
        base = {r["shard"]: r for r in shard_manifest(mat).collect()}
        victim = mat.orderBy("shard", "pack_id").first()
        lost = {
            r["shard"]: r
            for r in shard_manifest(
                mat.filter(
                    ~(
                        (F.col("shard") == victim["shard"])
                        & (F.col("pack_id") == victim["pack_id"])
                    )
                )
            ).collect()
        }
        s = victim["shard"]
        assert lost[s]["content_fp"] != base[s]["content_fp"]
        assert lost[s]["n_packs"] == base[s]["n_packs"] - 1
        shuffled = {
            r["shard"]: tuple(r)
            for r in shard_manifest(mat.repartition(13)).collect()
        }
        assert shuffled == {k: tuple(v) for k, v in base.items()}
    finally:
        mat.unpersist()


# ----------------------------------------------------- filter funnel ----


def test_filter_funnel_partitions_the_corpus(spark, sf_dir):
    """Ordered attribution: buckets are disjoint, sum to the corpus, and
    every configured rule fires on the gate corpus."""
    from bistro_spark.operators.curation import filter_funnel
    from bistro_spark.sources.io import load_table

    docs = load_table(spark, "documents", sf_dir)
    rows = {r.rule: r for r in filter_funnel(docs).collect()}
    assert set(rows) == {"too_short", "blocklist", "wrong_lang",
                         "low_quality", "kept"}
    assert sum(r.n_docs for r in rows.values()) == docs.count()
    assert all(r.n_docs > 0 for r in rows.values())
    # first-failing-rule semantics: a short doc containing a blocked word
    # must be charged to too_short, not blocklist
    import pyspark.sql.functions as F
    tiny = spark.createDataFrame(
        [(0, "a dup b", "en")], "doc_id long, text string, lang string")
    got = {r.rule: r.n_docs for r in filter_funnel(tiny).collect()}
    assert got == {"too_short": 1}


def test_filter_funnel_single_scan_one_exchange(spark, sf_dir):
    from bistro_spark.operators.curation import filter_funnel
    from bistro_spark.sources.io import load_table
    import contextlib, io

    df = filter_funnel(load_table(spark, "documents", sf_dir))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1
    assert plan.count("Scan parquet") == 1
    assert "Python" not in plan


# ------------------------------------------------------ manifest diff ----


def test_manifest_diff_all_four_statuses(spark):
    from bistro_spark.operators.curation import manifest_diff

    cols = "shard long, n_packs long, n_docs long, n_tokens long, content_fp long"
    old = spark.createDataFrame(
        [(0, 2, 10, 100, 111), (1, 2, 10, 100, 222), (2, 1, 5, 50, 333)], cols)
    new = spark.createDataFrame(
        [(0, 2, 10, 100, 111), (1, 2, 10, 105, 999), (3, 1, 4, 40, 444)], cols)
    got = {r.shard: r for r in manifest_diff(old, new).collect()}
    assert got[0].status == "unchanged" and got[0].token_delta == 0
    assert got[1].status == "changed" and got[1].token_delta == 5
    assert got[2].status == "removed" and got[2].new_n_tokens == 0
    assert got[3].status == "added" and got[3].old_n_tokens == 0


def test_manifest_diff_fingerprint_catches_content_swap(spark):
    """Same token totals, different content -> 'changed' (the case raw
    counts can never catch)."""
    from bistro_spark.operators.curation import manifest_diff

    cols = "shard long, n_packs long, n_docs long, n_tokens long, content_fp long"
    old = spark.createDataFrame([(0, 2, 10, 100, 111)], cols)
    new = spark.createDataFrame([(0, 2, 10, 100, 112)], cols)
    [r] = manifest_diff(old, new).collect()
    assert r.status == "changed" and r.token_delta == 0


# ------------------------------------------------ packing efficiency ----


def test_pack_stats_hand_computed(spark):
    from bistro_spark.operators.curation import pack_stats

    # mat rows: (shard, pack_id, n_docs, n_tokens, token_ids); n_tokens
    # includes one EOD per doc, so payload = n_tokens - n_docs
    mat = spark.createDataFrame(
        [
            (0, 0, 2, 10 + 2, "x"),   # payload 10
            (0, 1, 1, 6 + 1, "x"),    # payload 6
            (1, 0, 3, 12 + 3, "x"),   # payload 12
        ],
        "shard long, pack_id long, n_docs long, n_tokens long, token_ids string",
    )
    got = {r.shard: r for r in pack_stats(mat, capacity=16).collect()}
    s0 = got[0]
    assert (s0.n_packs, s0.n_docs, s0.payload_tokens) == (2, 3, 16)
    assert s0.waste_tokens == 2 * 16 - 16
    assert (s0.min_pack_fill, s0.max_pack_fill) == (6, 10)
    assert s0.fill_ratio == 0.5
    assert got[1].fill_ratio == 0.75 and got[1].waste_tokens == 4


def test_pack_stats_never_overflows_capacity(spark, sf_dir):
    """End-to-end over the real pipeline: no pack's payload may exceed
    capacity, and the report must account for every encoded token."""
    from bistro_spark.operators.curation import (
        materialize_packs,
        pack_sequences,
        pack_stats,
    )
    from bistro_spark.operators.ranking import build_vocab, encode_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    enc = encode_tokens(docs, build_vocab(docs))
    packed = pack_sequences(enc, len_col="n_tok", capacity=256, n_shards=4)
    stats = pack_stats(materialize_packs(packed, enc), capacity=256).collect()
    assert all(r.max_pack_fill <= 256 for r in stats)
    assert all(0.0 < r.fill_ratio <= 1.0 for r in stats)
    total_payload = sum(r.payload_tokens for r in stats)
    assert total_payload == enc.agg({"n_tok": "sum"}).collect()[0][0]


# ---------------------------------------------- DSIR importance weights ----


def test_dsir_logweights_directional(spark):
    """Docs made of target-slice vocabulary must score higher than docs
    made of raw-only vocabulary, and target membership is flagged."""
    from bistro_spark.operators.curation import dsir_logweights

    rows = [(i, "alpha beta gamma alpha beta", "en") for i in range(6)]
    rows += [(10 + i, "zeta eta theta zeta eta", "de") for i in range(6)]
    rows += [(20, "alpha beta gamma alpha beta", "de"),   # target-like raw doc
             (21, "zeta eta theta zeta eta", "fr")]       # raw-like raw doc
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.doc_id: r for r in dsir_logweights(df, "lang = 'en'").collect()}
    assert got[0].is_target and not got[20].is_target
    assert got[20].log_importance > got[21].log_importance
    assert got[20].n_feats == 9  # 5 unigrams + 4 bigrams


def test_dsir_logweights_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.curation import (
        dsir_logweights,
        dsir_logweights_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    spark_rows = sorted(
        tuple(r)
        for r in dsir_logweights(
            spark.read.parquet(path), "lang = 'en'"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(dsir_logweights_sql("documents", "lang = 'en'")).fetchall()
    )
    assert spark_rows == duck_rows


def test_dsir_logweights_partitioning_invariant(spark):
    """Same weights whatever the input split — the integer-frozen
    log-ratio table and exact BIGINT sums make the score reproducible
    on any cluster shape."""
    from bistro_spark.operators.curation import dsir_logweights

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in dsir_logweights(df, "lang = 'en'").collect())
    b = sorted(
        tuple(r)
        for r in dsir_logweights(df.repartition(17), "lang = 'en'").collect()
    )
    assert a == b


def test_dsir_select_matches_duckdb_and_is_biased(spark):
    import duckdb

    from bistro_spark.operators.curation import dsir_select, dsir_select_sql

    path = "/root/testdata/sf0.001/documents.parquet"
    df = spark.read.parquet(path)
    sel = dsir_select(df, "lang = 'en'", n=60)
    spark_rows = sorted(tuple(r) for r in sel.collect())
    assert len(spark_rows) == 60
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(dsir_select_sql("documents", "lang = 'en'", n=60)).fetchall()
    )
    assert spark_rows == duck_rows
    # the draw must tilt toward high-importance docs: selected mean
    # log-importance above the raw-pool mean
    from bistro_spark.operators.curation import dsir_logweights

    pool = dsir_logweights(df, "lang = 'en'").filter("NOT is_target")
    pool_mean = pool.agg({"log_importance": "avg"}).collect()[0][0]
    sel_mean = sum(r[2] for r in spark_rows) / 60
    assert sel_mean > pool_mean


def test_dsir_select_excludes_target_and_is_partition_invariant(spark):
    from bistro_spark.operators.curation import dsir_select

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in dsir_select(df, "lang = 'en'", n=40).collect())
    b = sorted(
        tuple(r)
        for r in dsir_select(df.repartition(13), "lang = 'en'", n=40).collect()
    )
    assert a == b
    en_ids = {r.doc_id for r in df.filter("lang = 'en'").select("doc_id").collect()}
    assert not ({r[0] for r in a} & en_ids)


def test_winsorized_stats_closed_form_and_sketch_variant(spark):
    """Hand-checked group: bounds, clip counts, and winsorized mean on a
    known 5-value distribution; the approx_percentile variant keeps the
    schema and lands within tolerance on real data."""
    from bistro_spark.operators.curation import winsorized_stats

    df = spark.createDataFrame(
        [("A", v) for v in (1, 2, 3, 4, 100)],
        "source string, n_chars long",
    )
    r = winsorized_stats(df, lo_q=0.25, hi_q=0.75).collect()[0]
    # quantile_cont on [1,2,3,4,100]: q25 = 2.0, q75 = 4.0
    assert (r["lo"], r["hi"]) == (2.0, 4.0)
    assert (r["n_clipped_low"], r["n_clipped_high"]) == (1, 1)
    assert r["raw_mean"] == 22.0
    assert r["winsorized_mean"] == round((2 + 2 + 3 + 4 + 4) / 5, 6)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ex = {
        r["source"]: r for r in winsorized_stats(docs, exact=True).collect()
    }
    ap = {
        r["source"]: r for r in winsorized_stats(docs, exact=False).collect()
    }
    assert set(ex) == set(ap)
    for s in ex:
        assert ex[s]["n"] == ap[s]["n"]
        assert abs(ex[s]["winsorized_mean"] - ap[s]["winsorized_mean"]) < 20


# ---------------------------------------------------- pareto_frontier ----
def _naive_skyline(pts):
    out = []
    for i, (pid, x, y) in enumerate(pts):
        dominated = any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (qid, qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((pid, x, y))
    return sorted(out)


def test_pareto_frontier_matches_naive_definition(spark):
    from bistro_spark.operators.curation import pareto_frontier

    pts = [
        (1, 5, 1), (2, 5, 3), (3, 5, 3),   # 2,3 equal pair: both survive
        (4, 3, 7), (5, 3, 6),              # 5 dominated by 4
        (6, 8, 0), (7, 1, 9), (8, 2, 9),   # 7 dominated by 8
        (9, 8, 0),                          # duplicate of 6: both survive
    ]
    df = spark.createDataFrame(pts, ["doc_id", "x", "y"])
    got = sorted(
        (r["doc_id"], r["x"], r["y"])
        for r in pareto_frontier(
            df, id_col="doc_id", x=F.col("x"), y=F.col("y"), n_partitions=3
        ).collect()
    )
    assert got == _naive_skyline(pts)
    assert (1, 5, 1) not in got and (5, 3, 6) not in got


def test_pareto_frontier_partitioning_invariant_and_empty(spark):
    from bistro_spark.operators.curation import pareto_frontier

    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(12), rng.randrange(12)) for i in range(120)]
    df = spark.createDataFrame(pts, ["doc_id", "x", "y"])
    ref = _naive_skyline(pts)
    for n_parts in (1, 2, 7):
        got = sorted(
            (r["doc_id"], r["x"], r["y"])
            for r in pareto_frontier(
                df, id_col="doc_id", x=F.col("x"), y=F.col("y"),
                n_partitions=n_parts,
            ).collect()
        )
        assert got == ref, n_parts
    empty = pareto_frontier(
        df.limit(0), id_col="doc_id", x=F.col("x"), y=F.col("y")
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["doc_id", "x", "y"]


def test_pareto_frontier_plan_no_global_window_no_cartesian(spark):
    """The skyline must not contain a partition-less window (single
    reducer) nor a cartesian/BNLJ product; the doc join broadcasts."""
    from bistro_spark.operators.curation import pareto_frontier

    df = spark.createDataFrame(
        [(1, "a b c", 5)], ["doc_id", "text", "n_chars"]
    )
    out = pareto_frontier(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    for seg in plan.split("Window ")[1:]:
        head = seg.split("\n", 1)[0]
        assert "_pid" in head, head  # every window partitioned by _pid


# ---------------------------------------------------- calibrate_signal ----
def test_calibrate_signal_known_midranks(spark):
    from bistro_spark.operators.curation import calibrate_signal

    df = spark.createDataFrame(
        [(1, "s1", 5), (2, "s1", 5), (3, "s1", 7), (4, "s2", 9)],
        ["doc_id", "source", "n_chars"],
    )
    got = {
        r["doc_id"]: (r["v"], r["pct"])
        for r in calibrate_signal(df).collect()
    }
    assert got == {
        1: (5, round(2 / 6, 6)),
        2: (5, round(2 / 6, 6)),
        3: (7, round(5 / 6, 6)),
        4: (9, 0.5),
    }


def test_calibrate_signal_uniform_within_group(spark):
    """Midrank property: the mean calibrated score is exactly 1/2 in
    every group, whatever the value distribution."""
    from bistro_spark.operators.curation import calibrate_signal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = (
        calibrate_signal(docs)
        .groupBy("source")
        .agg(F.avg("pct").alias("m"))
        .collect()
    )
    assert rows and all(abs(r["m"] - 0.5) < 1e-4 for r in rows)


def test_calibrate_signal_plan_level_set_windows_only(spark):
    """No corpus-sized window: every Window's subtree aggregates first;
    the pct map joins back broadcast."""
    from bistro_spark.operators.curation import calibrate_signal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        calibrate_signal(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # each Window sits above the level-set HashAggregate (tree prints
    # parent-first): an aggregate appears below it before any scan
    idx = 0
    while True:
        idx = plan.find("Window ", idx)
        if idx < 0:
            break
        rest = plan[idx + 7 :]
        assert "HashAggregate" in rest.split("Scan ", 1)[0]
        idx += 7


def test_pii_redact_query_plan_map_only(spark):
    """The contract PII gate is pure codegen: no Exchange, no Python
    stage, single scan."""
    import __spark_entry__ as ent

    df = ent.queries()["pii_redact"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert plan.count("Scan parquet") == 1


def test_ingest_pipeline_gates_fire_and_plan_two_exchanges(spark):
    """The composed ingest pipeline: gates actually drop documents at
    the gate SF (non-trivial filter), and the whole composition is ONE
    scan + exactly two exchanges (dedup groupBy, report agg), no
    Python stage, no window."""
    import __spark_entry__ as ent

    sf = "/root/testdata/sf0.01"
    out = ent.queries()["ingest_pipeline"](spark, sf)
    kept = sum(r["n_docs"] for r in out.collect())
    total = spark.read.parquet(f"{sf}/documents.parquet").count()
    # gates drop documents AND the 20 injected duplicates all collapse
    assert 0 < kept < total
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # two scans: the corpus + the doc_id<20 dup injection (whose filter
    # is pushed into the parquet reader)
    assert final.count("Scan parquet") == 2
    assert "LessThan(doc_id,20)" in final
    assert final.count("Exchange") == 2
    assert "Python" not in final and "Window" not in final


# ---------------------------------------------------- cross_perplexity ----
def test_cross_perplexity_hand_computed(spark):
    import math

    from bistro_spark.operators.curation import cross_perplexity

    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "a c")], ["source", "text"]
    )
    # counts: s1{a:2,b:1} total 3; s2{a:1,c:1} total 2; V=3
    out = {
        (r["group_a"], r["group_b"]): (r["n_tokens_a"], r["mean_logprob"])
        for r in cross_perplexity(df).collect()
    }
    r9 = lambda x: round(math.log(x), 9)  # noqa: E731
    cell = lambda s, ta, tb: round(s / ta - math.log(tb + 3), 6)  # noqa: E731
    assert out[("s1", "s1")] == (3, cell(2 * r9(3) + 1 * r9(2), 3, 3))
    assert out[("s1", "s2")] == (3, cell(2 * r9(2), 3, 2))
    assert out[("s2", "s1")] == (2, cell(1 * r9(3), 2, 3))
    assert out[("s2", "s2")] == (2, cell(1 * r9(2) + 1 * r9(2), 2, 2))


def test_cross_perplexity_full_grid_and_partition_invariance(spark):
    from bistro_spark.operators.curation import cross_perplexity

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(tuple(r) for r in cross_perplexity(docs).collect())
    g = docs.select("source").distinct().count()
    assert len(base) == g * g  # complete matrix, including no-overlap pairs
    re16 = sorted(
        tuple(r) for r in cross_perplexity(docs.repartition(16)).collect()
    )
    assert base == re16  # decimal-exact: bit-identical on any partitioning


def test_manifest_diff_stored_equals_recomputed(spark, tmp_path):
    """Diffing against a STORED manifest snapshot returns exactly the
    diff against a freshly recomputed manifest — the entry point a
    versioned corpus uses so the old side is a KB-scan, not a pipeline
    re-run — and the stored side's plan carries no encode/pack stages."""
    from bistro_spark.operators.curation import (
        manifest_diff,
        manifest_diff_stored,
        shard_manifest,
        store_manifest,
    )

    mat = _mat_packs(spark)
    old = shard_manifest(mat)
    new = shard_manifest(
        mat.filter("pack_id % 7 <> 3")  # perturb: some packs dropped
    )
    path = str(tmp_path / "manifest_v1")
    store_manifest(old, path)
    stored = manifest_diff_stored(spark, path, new)
    recomputed = manifest_diff(old, new)
    assert sorted(tuple(r) for r in stored.collect()) == sorted(
        tuple(r) for r in recomputed.collect()
    )
    # the old side reads the snapshot files (plan toString() elides long
    # relation fields, so check inputFiles instead)
    assert any("manifest_v1" in f for f in stored.inputFiles())
    # and the stored form's physical plan is strictly lighter than the
    # recomputed one (no old-side encode/pack exchanges)
    n_ex = stored._jdf.queryExecution().executedPlan().toString().count("Exchange")
    n_ex_re = recomputed._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_ex < n_ex_re


def test_pareto_frontier_pins_collector_releases_clean(spark):
    """An ad-hoc caller (no pin_scope) can collect the frontier pin ids
    via `pins` and release them — no storage blocks leak."""
    from bistro_spark.caching import pinned_ids, release
    from bistro_spark.operators.curation import pareto_frontier

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = pinned_ids(spark)
    pins: set[int] = set()
    out = pareto_frontier(docs, pins=pins)
    assert out.count() > 0
    assert pins, "frontier pin ids were not collected"
    assert pins <= pinned_ids(spark)
    release(spark, pins)
    assert pinned_ids(spark) <= before
