"""Property-based tests (hypothesis): randomized invariants for the
operators whose correctness is structural — packing feasibility, chunk
coverage, sampling-threshold monotonicity, ranking permutations — beyond
the fixed-vector and oracle-parity suites.

Spark jobs per example are expensive, so example counts are deliberately
small; the generators still cover degenerate shapes (empty, single-row,
all-equal keys, oversize docs) via hypothesis shrinking.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------- pack_sequences ----


@SPARK_SETTINGS
@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), max_size=25),
    capacity=st.integers(min_value=8, max_value=64),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_invariants(spark, lens, capacity, n_shards):
    from bistro_spark.operators.curation import pack_sequences

    rows = [(i, ln) for i, ln in enumerate(lens)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["doc_id", "n_words"])
    out = pack_sequences(
        df, len_col="n_words", capacity=capacity, n_shards=n_shards
    ).collect()
    # every doc assigned exactly once, shard = id % n_shards
    assert sorted(r.doc_id for r in out) == [r[0] for r in rows]
    packs: dict[tuple, list] = {}
    for r in out:
        assert r.shard == r.doc_id % n_shards
        packs.setdefault((r.shard, r.pack_id), []).append(r)
    for members in packs.values():
        members.sort(key=lambda r: r.offset)
        end = 0
        for r in members:
            assert r.offset == end  # packs are gap-free in doc-id order
            end = r.offset + r.len
        # capacity respected unless the pack is one oversize doc
        assert end <= capacity or len(members) == 1
    # greedy = a doc never fit in its predecessor pack (no lookback holes)
    for (shard, pid), members in packs.items():
        if pid == 0:
            continue
        prev = packs[(shard, pid - 1)]
        prev_end = max(r.offset + r.len for r in prev)
        first = min(members, key=lambda r: r.doc_id)
        assert prev_end + first.len > capacity


# ----------------------------------------------------------- chunk_spans ----


@SPARK_SETTINGS
@given(
    n_words=st.integers(min_value=1, max_value=120),
    size=st.integers(min_value=2, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_spans_cover_every_word(spark, n_words, size, overlap_frac):
    from bistro_spark.operators.curation import chunk_spans

    overlap = min(int(size * overlap_frac), size - 1)
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = chunk_spans(df, size=size, overlap=overlap).collect()
    covered = set()
    for c in chunks:
        assert 1 <= c.start_word <= c.end_word <= n_words
        assert c.n_words_chunk == c.end_word - c.start_word + 1
        assert c.n_words_chunk <= size
        covered.update(range(c.start_word, c.end_word + 1))
        # the chunk text is exactly those words
        assert c.chunk_text.split(" ") == [
            f"w{i - 1}" for i in range(c.start_word, c.end_word + 1)
        ]
    assert covered == set(range(1, n_words + 1))


# --------------------------------------------------- sampling thresholds ----


@given(
    rates=st.lists(
        st.floats(min_value=0.0, max_value=1.0), min_size=2, max_size=8
    ),
    digits=st.sampled_from([2, 4]),
)
def test_hex_threshold_monotone_in_rate(rates, digits):
    from bistro_spark.operators.curation import _hex_threshold

    rates = sorted(rates)
    thrs = [_hex_threshold(r, digits) for r in rates]
    # a higher keep-rate never yields a lexically smaller threshold
    # ('g' sorts above every hex digit, so keep-all stays the maximum)
    assert thrs == sorted(thrs)
    assert _hex_threshold(1.0, digits) == "g"
    assert _hex_threshold(0.0, digits) == "0" * digits


# ------------------------------------------------------------ global_rank ----


@SPARK_SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=5), max_size=30),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_global_rank_is_a_sorted_permutation(spark, keys, n_parts):
    from bistro_spark.operators.ranking import global_rank

    rows = [(i, k) for i, k in enumerate(keys)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["id", "key"])
    out = global_rank(df, ["key", "id"], n_partitions=n_parts).collect()
    assert sorted(r.rank for r in out) == list(range(1, len(rows) + 1))
    by_rank = sorted(out, key=lambda r: r.rank)
    assert [(r.key, r.id) for r in by_rank] == sorted(
        (k, i) for i, k in rows
    )


# ------------------------------------------------ value_ranks / skyline ----


@SPARK_SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=40
    ),
    ascending=st.booleans(),
)
def test_value_ranks_equals_sorted_position(spark, vals, ascending):
    """Competition rank == 1 + #strictly better, for any multiset and
    either direction."""
    from bistro_spark.operators.ranking import value_ranks

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    got = {
        r["id"]: r["rank"]
        for r in value_ranks(df, F.col("v"), ascending=ascending).collect()
    }
    for i, v in enumerate(vals):
        better = sum(
            1 for w in vals if (w < v if ascending else w > v)
        )
        assert got[i] == better + 1


@SPARK_SETTINGS
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_frontier_is_exactly_the_undominated_set(spark, pts):
    from bistro_spark.operators.curation import pareto_frontier

    import pyspark.sql.functions as F

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in pareto_frontier(
            df, id_col="id", x=F.col("x"), y=F.col("y")
        ).collect()
    )
    want = sorted(
        (i, x, y)
        for i, (x, y) in enumerate(pts)
        if not any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
    )
    assert got == want


# ------------------------------------------------------------ wordpiece ----


@settings(max_examples=300, deadline=None)
@given(
    word=st.text(alphabet="abcxyz", min_size=0, max_size=12),
    vocab_bodies=st.sets(
        st.text(alphabet="abcx", min_size=1, max_size=3), min_size=1, max_size=12
    ),
)
def test_wordpiece_greedy_invariants(word, vocab_bodies):
    """For ANY vocab/word: the encoding either round-trips exactly or is
    whole-word [UNK]; every emitted piece is the LONGEST vocab match at
    its cursor (the defining greedy property)."""
    from bistro_spark.operators.wordpiece import CONT, UNK, encode_word

    initial = set(vocab_bodies)
    cont = {b for b in vocab_bodies if len(b) <= 2}
    max_len = max(len(b) for b in initial | cont)
    out = encode_word(word, initial, cont, max_len)
    if word == "":
        assert out == []
        return
    if out == [UNK]:
        # some cursor had no match: re-walk greedily and find it
        pos = 0
        while pos < len(word):
            table = initial if pos == 0 else cont
            match = max(
                (b for b in table if word[pos:].startswith(b)),
                key=len,
                default=None,
            )
            if match is None:
                return  # confirmed: greedy walk genuinely dead-ends
            pos += len(match)
        raise AssertionError("UNK emitted but a full greedy walk exists")
    # round-trip + longest-match at every cursor
    pos = 0
    for p in out:
        body = p[len(CONT):] if p.startswith(CONT) else p
        table = cont if p.startswith(CONT) else initial
        assert (pos > 0) == p.startswith(CONT)
        assert word[pos : pos + len(body)] == body
        longer = [
            b
            for b in table
            if len(b) > len(body) and word[pos:].startswith(b)
        ]
        assert not longer, f"{p} not longest at {pos}: {longer}"
        pos += len(body)
    assert pos == len(word)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=0, max_value=1 << 40))
def test_pow2_bucket_formula(n):
    """The integer bin()-length pow2 ceiling used by length_buckets
    equals the mathematical smallest power of two >= n (n >= 2)."""
    bucket = n if n <= 1 else 1 << (n - 1).bit_length()
    if n >= 1:
        assert bucket >= n and (bucket == n or bucket < 2 * n)
        assert bucket & (bucket - 1) == 0 or bucket == 1
    else:
        assert bucket == 0


# ------------------------------------------------------ apply_changelog ----


@SPARK_SETTINGS
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.booleans(),                           # delete?
            st.integers(min_value=0, max_value=99),  # payload
        ),
        max_size=30,
    )
)
def test_apply_changelog_matches_sequential_replay(spark, ops):
    """For ANY log, the declarative snapshot equals a sequential replay
    of the log in seq order onto a dict — upserts overwrite, deletes
    remove, seq is the list position (unique by construction)."""
    from bistro_spark.operators.cdc import apply_changelog

    rows = [
        (k, i, "D" if d else "U", f"e{p}", float(p))
        for i, (k, d, p) in enumerate(ops)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "entity_id long, seq long, op string, event_type string, "
        "value double"
    )
    got = {
        r["entity_id"]: (r["version"], r["event_type"], r["value"])
        for r in apply_changelog(df).collect()
    }
    table: dict = {}
    for k, i, op, et, v in rows:  # already seq-ordered
        if op == "D":
            table.pop(k, None)
        else:
            table[k] = (i, et, v)
    assert got == table


# ------------------------------------------------------- anneal_schedule ----


@SPARK_SETTINGS
@given(
    masses=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=6
    ),
    n_steps=st.integers(min_value=1, max_value=12),
    batch=st.integers(min_value=1, max_value=300),
)
def test_anneal_schedule_exact_apportionment(spark, masses, n_steps, batch):
    """For ANY weight masses / steps / batch size: every step draws
    exactly `batch` sequences, per-step ppm sums to exactly 1e6, the
    final step's weights are the natural mix floors (+ residual on the
    last source), and cum_seqs telescopes."""
    from bistro_spark.operators.curation import anneal_schedule

    rows = []
    rid = 0
    for s, m in enumerate(masses):
        rows.append((rid, f"s{s}", m))
        rid += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = anneal_schedule(
        df, weight_col="n_chars", n_steps=n_steps, batch_size=batch
    ).collect()
    by_step: dict = {}
    cum: dict = {}
    for r in out:
        by_step.setdefault(r["step"], [0, 0])
        by_step[r["step"]][0] += r["n_seqs"]
        by_step[r["step"]][1] += r["weight_ppm"]
        cum[(r["step"], r["source"])] = r["cum_seqs"]
    assert set(by_step) == set(range(1, n_steps + 1))
    for t, (n, ppm) in by_step.items():
        assert n == batch and ppm == 1_000_000, t
    # telescoping: cum(t) - cum(t-1) == n_seqs(t)
    for r in out:
        prev = cum.get((r["step"] - 1, r["source"]), 0)
        assert r["cum_seqs"] - prev == r["n_seqs"]
    # endpoint = natural floors with residual-to-last
    tot = sum(masses)
    last = max(f"s{s}" for s in range(len(masses)))
    w1 = {f"s{s}": (m * 1_000_000) // tot for s, m in enumerate(masses)}
    w1[last] += 1_000_000 - sum(w1.values())
    got_last = {
        r["source"]: r["weight_ppm"] for r in out if r["step"] == n_steps
    }
    assert got_last == w1


# -------------------------------------------------- preference_pairs ----


@SPARK_SETTINGS
@given(
    cands=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # prompt
            st.integers(min_value=0, max_value=500), # reward
        ),
        max_size=20,
    ),
    min_margin=st.integers(min_value=1, max_value=5),
)
def test_preference_pairs_matches_brute(spark, cands, min_margin):
    """best_vs_rest equals the pure-Python fold for ANY candidate set:
    chosen = (reward DESC, cand ASC) argmax per prompt; one pair per
    other candidate clearing the margin."""
    from bistro_spark.operators.preference import preference_pairs

    rows = [(p, i, r) for i, (p, r) in enumerate(cands)]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, reward long"
    )
    got = sorted(
        tuple(r)
        for r in preference_pairs(df, min_margin=min_margin).collect()
    )
    best = {}
    for p, c, r in rows:
        if p not in best or (-r, c) < (-best[p][1], best[p][0]):
            best[p] = (c, r)
    want = sorted(
        (p, best[p][0], c, best[p][1], r, best[p][1] - r)
        for p, c, r in rows
        if c != best[p][0] and best[p][1] - r >= min_margin
    )
    assert got == want


# ---------------------------------------------------- sft_turn_spans ----


@SPARK_SETTINGS
@given(
    n_words=st.integers(min_value=0, max_value=60),
    doc_id=st.integers(min_value=0, max_value=10**9),
)
def test_sft_spans_tile_for_any_length(spark, n_words, doc_id):
    """For ANY document length (including 0 and lengths below the turn
    count): exactly k rows, spans + sentinels tile [0, n+k), supervised
    lengths sum to the assistant word total."""
    import hashlib

    from bistro_spark.operators.trainprep import sft_turn_spans

    text = " ".join(f"w{j}" for j in range(n_words))
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    turns = sorted(
        sft_turn_spans(df).collect(), key=lambda r: r["turn_idx"]
    )
    k = 2 + (
        int(hashlib.md5(f"{doc_id}:turns".encode()).hexdigest()[:8], 16)
        % 3
    )
    assert len(turns) == k
    pos = 0
    for r in turns:
        assert r["sent_pos"] == pos
        assert r["span_start"] == pos + 1
        assert r["span_len"] >= 0
        pos = r["span_start"] + r["span_len"]
    assert pos == n_words + k
    sup = sum(r["span_len"] for r in turns if r["supervised"])
    assert sup == sum(
        ((i + 1) * n_words) // k - (i * n_words) // k
        for i in range(k)
        if i % 2 == 1
    )


# ------------------------------------------------------- bt_fixpoint ----


@settings(max_examples=40, deadline=None)
@given(
    games=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=5),
        ),
        max_size=12,
    ),
    split=st.integers(min_value=1, max_value=4),
)
def test_bt_fixpoint_grid_aggregation_invariance(games, split):
    """The fixpoint is a function of the AGGREGATED win grid: splitting
    any (winner, loser) count into multiple grid entries, or permuting
    the grid, changes nothing (the property that makes the streaming
    monitor's additive state exact)."""
    from bistro_spark.operators.preference import bt_fixpoint

    grid = [(f"i{a}", f"i{b}", n) for a, b, n in games if a != b]
    if not grid:
        return
    base = bt_fixpoint(grid, iters=7)
    shattered = []
    for a, b, n in grid:
        q, r = divmod(n, split)
        shattered.extend([(a, b, q)] * split if q else [])
        if r:
            shattered.append((a, b, r))
    shattered = [(a, b, n) for a, b, n in shattered if n > 0]
    assert bt_fixpoint(list(reversed(shattered)), iters=7) == base
