"""trainprep operators: FIM reordering (reconstruction property, exact
hashlib-recomputed cut points, gates, SQL twin), concat-and-cut chunk
packing (coverage/fullness/EOD invariants, brute-force parity,
cluster-shape invariance, SQL twin), and curriculum step apportionment
(exactness, monotone buckets, brute parity, SQL twin, empty input)."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from bistro_spark.operators.trainprep import (
    concat_chunks,
    concat_chunks_sql,
    curriculum_schedule,
    curriculum_schedule_sql,
    fim_transform,
    fim_transform_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _h(doc_id: int, salt: str) -> int:
    return int(
        hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16
    )


# ------------------------------------------------------------------ FIM --


def test_fim_reconstruction_property(spark):
    """Every FIM row reassembles to the original word sequence:
    prefix + middle + suffix == words, sentinels at the computed
    positions; non-FIM rows pass through verbatim."""
    docs = spark.read.parquet(DOCS)
    out = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    n_fim = 0
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in row["text"].split(" ") if w != ""]
        r = out[row["doc_id"]]
        if not r["is_fim"]:
            assert r["out_text"] == " ".join(words)
            assert r["n_out"] == len(words)
            assert r["fim_start"] is None and r["fim_end"] is None
            continue
        n_fim += 1
        toks = r["out_text"].split(" ")
        assert toks[0] == "<PRE>"
        a, b = r["fim_start"], r["fim_end"]
        n = len(words)
        assert 1 <= a <= n - 1 and a <= b <= n
        assert toks == (
            ["<PRE>"] + words[:a] + ["<SUF>"] + words[b:] + ["<MID>"]
            + words[a:b]
        )
        assert r["n_out"] == n + 3
    assert n_fim > 0


def test_fim_cut_points_match_hashlib(spark):
    """The md5-derived gate and cut points equal an independent
    hashlib recomputation — determinism is a function of the id only."""
    docs = spark.read.parquet(DOCS)
    got = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        i = row["doc_id"]
        n = len([w for w in row["text"].split(" ") if w != ""])
        want_fim = _h(i, ":fim") % 100 < 50 and n >= 4
        assert got[i]["is_fim"] == want_fim
        if want_fim:
            a = _h(i, ":fima") % (n - 1) + 1
            b = a + _h(i, ":fimb") % (n - a + 1)
            assert (got[i]["fim_start"], got[i]["fim_end"]) == (a, b)


def test_fim_gates(spark):
    docs = spark.read.parquet(DOCS)
    assert (
        fim_transform(docs, rate_pct=0).filter("is_fim").count() == 0
    )
    assert (
        fim_transform(docs, min_words=10**9).filter("is_fim").count() == 0
    )
    # rate 100: everything long enough is transformed
    full = fim_transform(docs, rate_pct=100)
    assert full.filter("NOT is_fim AND n_out >= 4").count() == 0


def test_fim_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "a b"), (4, "  ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_transform(df).collect()}
    for i, n in [(1, 0), (2, 1), (3, 2), (4, 0)]:
        assert not rows[i]["is_fim"]
        assert rows[i]["n_out"] == n


def test_fim_sql_twin(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range((i * 7) % 12)))
        for i in range(80)
    ] + [(100, "a  b   c d e f")]  # multi-space
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in fim_transform(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(fim_transform_sql("t")).fetchall()
    )
    assert got == want


# --------------------------------------------------------- concat chunks --


def _brute_chunks(rows, cap, n_shards, sep=1):
    out, cursor = [], {}
    for i, ln in sorted(rows):
        s = i % n_shards
        start = cursor.get(s, 0)
        span = ln + sep
        cursor[s] = start + span
        last = (start + span - 1) // cap
        for c in range(start // cap, last + 1):
            lo, hi = max(start, c * cap), min(start + span, (c + 1) * cap)
            out.append((s, c, i, lo - c * cap, lo - start, hi - lo, c == last))
    return sorted(out)


def test_concat_chunks_invariants_and_brute_parity(spark):
    rows = [(i, (i * 13) % 90) for i in range(300)]  # incl. len-0 docs
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = sorted(
        tuple(r) for r in concat_chunks(df, capacity=64, n_shards=3).collect()
    )
    assert got == _brute_chunks(rows, 64, 3)
    # invariants: every doc fully covered, exactly one EOD chunk
    per_doc = {}
    for s, c, i, sic, sid, n, eod in got:
        per_doc.setdefault(i, []).append((sid, n, eod))
    lens = dict(rows)
    for i, segs in per_doc.items():
        segs.sort()
        assert sum(n for _, n, _ in segs) == lens[i] + 1  # incl. EOD
        assert sum(1 for _, _, e in segs if e) == 1
        # contiguous within the doc
        pos = 0
        for sid, n, _ in segs:
            assert sid == pos
            pos += n
    # fullness: every chunk except each shard's last holds exactly cap
    per_chunk = {}
    for s, c, i, sic, sid, n, eod in got:
        per_chunk[(s, c)] = per_chunk.get((s, c), 0) + n
    last_chunk = {}
    for s, c in per_chunk:
        last_chunk[s] = max(last_chunk.get(s, -1), c)
    for (s, c), tot in per_chunk.items():
        if c < last_chunk[s]:
            assert tot == 64
        else:
            assert 0 < tot <= 64


def test_concat_chunks_cluster_shape_invariance(spark):
    docs = spark.read.parquet(DOCS).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    a = sorted(tuple(r) for r in concat_chunks(docs).collect())
    b = sorted(
        tuple(r) for r in concat_chunks(docs.repartition(7)).collect()
    )
    assert a == b


def test_concat_chunks_sql_twin(spark):
    rows = [(i, 1 + (i * 31) % 400) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = sorted(
        tuple(r)
        for r in concat_chunks(df, capacity=128, n_shards=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n_words BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            concat_chunks_sql(
                "t", len_expr="n_words", capacity=128, n_shards=4
            )
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------- curriculum --


def test_curriculum_apportionment_and_brute_parity(spark):
    rows = [(i, (i * 17) % 97) for i in range(230)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = {
        r["step"]: r for r in curriculum_schedule(df, n_steps=10).collect()
    }
    assert sorted(got) == list(range(10))
    assert sum(r["n_docs"] for r in got.values()) == 230
    # monotone difficulty: bucket t's max signal <= bucket t+1's min
    for t in range(9):
        assert got[t]["sig_max"] <= got[t + 1]["sig_min"]
    # brute: sort by (sig, id), bucket by rank floor
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for rank0, (_, sig) in enumerate(srt):
        t = rank0 * 10 // 230
        n, ssum, smin, smax = want.get(t, (0, 0, None, None))
        want[t] = (
            n + 1,
            ssum + sig,
            sig if smin is None else min(smin, sig),
            sig if smax is None else max(smax, sig),
        )
    for t, (n, ssum, smin, smax) in want.items():
        r = got[t]
        assert (r["n_docs"], r["sig_sum"], r["sig_min"], r["sig_max"]) == (
            n, ssum, smin, smax,
        )


def test_curriculum_sql_twin_and_empty(spark):
    rows = [(i, 1 + (i * 7) % 50) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = sorted(
        tuple(r) for r in curriculum_schedule(df, n_steps=7).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n_words BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            curriculum_schedule_sql("t", signal_expr="n_words", n_steps=7)
        ).fetchall()
    )
    assert got == want
    empty = spark.createDataFrame([], "doc_id long, n_words long")
    assert curriculum_schedule(empty).count() == 0


# ------------------------------------------------------- chunk manifest --


def test_chunk_manifest_consistency_with_chunks(spark):
    """Every chunk row aggregates exactly its concat_chunks segments,
    arrays offset-ordered and contiguous."""
    from bistro_spark.operators.trainprep import chunk_manifest

    docs = spark.read.parquet(DOCS).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    chunks = concat_chunks(docs, capacity=128, n_shards=3).collect()
    man = chunk_manifest(docs, capacity=128, n_shards=3).collect()
    by_chunk = {}
    for r in chunks:
        by_chunk.setdefault((r["shard"], r["chunk_id"]), []).append(r)
    assert len(man) == len(by_chunk)
    for m in man:
        segs = sorted(
            by_chunk[(m["shard"], m["chunk_id"])],
            key=lambda r: r["start_in_chunk"],
        )
        assert m["n_segments"] == len(segs)
        assert m["tok_filled"] == sum(r["n_tok"] for r in segs)
        assert m["doc_ids"] == [r["doc_id"] for r in segs]
        assert m["starts_in_chunk"] == [r["start_in_chunk"] for r in segs]
        assert m["starts_in_doc"] == [r["start_in_doc"] for r in segs]
        assert m["seg_lens"] == [r["n_tok"] for r in segs]
        assert m["eod_flags"] == [r["has_eod"] for r in segs]
        # contiguity inside the chunk
        pos = m["starts_in_chunk"][0]
        for s, ln in zip(m["starts_in_chunk"], m["seg_lens"]):
            assert s == pos
            pos += ln
        assert m["tok_filled"] <= 128
        assert m["n_segments"] <= 128  # capacity-bounded collect


def test_chunk_manifest_sql_twin(spark):
    from bistro_spark.operators.trainprep import (
        chunk_manifest,
        chunk_manifest_sql,
    )

    rows = [(i, 1 + (i * 31) % 300) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = sorted(
        str(tuple(r))
        for r in chunk_manifest(df, capacity=96, n_shards=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n_words BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(
        str(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in con.execute(
            chunk_manifest_sql(
                "t", len_expr="n_words", capacity=96, n_shards=4
            )
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------ chunk read plan --


def test_chunk_read_plan_consistency_and_disjoint(spark):
    """The loader I/O plan equals the Python join of the chunk layout to
    the .bin layout (same-shard discipline, EOD spans produce no read,
    reads clamped to the doc's real byte span), arrays offset-ordered,
    totals consistent, and — the real invariant — all reads within one
    shard file are pairwise DISJOINT (every doc byte read exactly once
    across the whole plan)."""
    from bistro_spark.operators.curation import binidx_manifest
    from bistro_spark.operators.trainprep import chunk_read_plan

    rows = [(i, 1 + (i * 31) % 400) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    bpt = 2
    plan = {
        (r["shard"], r["chunk_id"]): r
        for r in chunk_read_plan(
            df, capacity=128, n_shards=4, bytes_per_token=bpt
        ).collect()
    }
    chunks = concat_chunks(df, capacity=128, n_shards=4).collect()
    layout = {
        r["doc_id"]: r
        for r in binidx_manifest(df, "doc_id", "n_words", 4, bpt).collect()
    }
    want = {}
    for c in chunks:
        lay = layout[c["doc_id"]]
        assert c["shard"] == lay["shard"]  # shared id%n_shards rule
        off = lay["byte_offset"] + c["start_in_doc"] * bpt
        nb = (
            max(
                min(c["start_in_doc"] + c["n_tok"], lay["n_tokens"])
                - c["start_in_doc"],
                0,
            )
            * bpt
        )
        if nb > 0:
            want.setdefault((c["shard"], c["chunk_id"]), []).append(
                (off, nb)
            )
    assert set(plan) == set(want)
    by_shard = {}
    for (shard, _), reads in want.items():
        reads.sort()
        r = plan[(shard, _)]
        assert list(r["offsets"]) == [o for o, _n in reads]
        assert list(r["sizes"]) == [n for _o, n in reads]
        assert r["n_reads"] == len(reads)
        assert r["bytes_total"] == sum(n for _o, n in reads)
        assert r["n_reads"] <= 128  # every read covers >= 1 token
        by_shard.setdefault(shard, []).extend(reads)
    for shard, reads in by_shard.items():
        reads.sort()
        for (o1, n1), (o2, _n2) in zip(reads, reads[1:]):
            assert o1 + n1 <= o2  # disjoint within the shard file
        # reads stay inside the shard file's real byte extent
        extent = sum(
            lay["n_tokens"] * bpt
            for lay in layout.values()
            if lay["shard"] == shard
        )
        assert reads[-1][0] + reads[-1][1] <= extent


def test_chunk_read_plan_sql_twin(spark):
    from bistro_spark.operators.trainprep import (
        chunk_read_plan,
        chunk_read_plan_sql,
    )

    rows = [(i, 1 + (i * 31) % 400) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    got = sorted(
        str(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in chunk_read_plan(df, capacity=128, n_shards=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n_words BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(
        str(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in con.execute(
            chunk_read_plan_sql(
                "t", len_expr="n_words", capacity=128, n_shards=4
            )
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------- fim spans --


def test_fim_spans_tile_output_and_match_realized_tokens(spark):
    """The manifest's spans tile [0, n_out) exactly, sentinels sit at
    the claimed positions IN THE REALIZED out_text, the middle span's
    tokens are exactly the words fim_transform cut out, and non-FIM
    rows are one full prefix span with everything supervised."""
    from bistro_spark.operators.trainprep import fim_spans, fim_transform

    docs = spark.read.parquet(DOCS)
    spans = {r["doc_id"]: r for r in fim_spans(docs).collect()}
    real = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    assert set(spans) == set(real)
    n_fim = 0
    for did, s in spans.items():
        toks = real[did]["out_text"].split(" ") if real[did]["n_out"] else []
        assert s["n_out"] == real[did]["n_out"]
        if not s["is_fim"]:
            assert s["prefix_start"] == 0
            assert s["prefix_len"] == s["n_out"] == s["n_supervised"]
            assert s["pre_pos"] is None and s["mid_pos"] is None
            continue
        n_fim += 1
        cover = (
            [s["pre_pos"], s["suf_pos"], s["mid_pos"]]
            + list(range(s["prefix_start"], s["prefix_start"] + s["prefix_len"]))
            + list(range(s["suffix_start"], s["suffix_start"] + s["suffix_len"]))
            + list(range(s["middle_start"], s["middle_start"] + s["middle_len"]))
        )
        assert sorted(cover) == list(range(s["n_out"]))
        assert toks[s["pre_pos"]] == "<PRE>"
        assert toks[s["suf_pos"]] == "<SUF>"
        assert toks[s["mid_pos"]] == "<MID>"
        assert s["n_supervised"] == s["n_out"] - 3
        # the middle span holds the words the transform cut out
        a, b = real[did]["fim_start"], real[did]["fim_end"]
        words = [w for w in toks if w not in ("<PRE>", "<SUF>", "<MID>")]
        orig = (
            toks[s["prefix_start"] : s["prefix_start"] + s["prefix_len"]]
            + toks[s["middle_start"] : s["middle_start"] + s["middle_len"]]
            + toks[s["suffix_start"] : s["suffix_start"] + s["suffix_len"]]
        )
        assert len(orig) == len(words)
        assert s["middle_len"] == b - a
    assert n_fim > 0


def test_fim_spans_sql_twin(spark):
    from bistro_spark.operators.trainprep import fim_spans, fim_spans_sql

    docs = spark.read.parquet(DOCS)
    got = sorted(str(tuple(r)) for r in fim_spans(docs).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    want = sorted(
        str(tuple(r)) for r in con.execute(fim_spans_sql()).fetchall()
    )
    assert got == want
