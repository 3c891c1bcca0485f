"""mixture_manifest: per-(step, source) draw counts equal
mixture_schedule's allocations exactly (including the epoch-wrapped
repetition case), positions are contiguous, epoch accounting matches
repetition_budget, and the layout is cluster-shape-invariant."""

from __future__ import annotations

from bistro_spark.operators.curation import mixture_manifest, mixture_schedule

T, B = 9, 30


def _corpus(spark):
    rows = []
    rid = 0
    for src, n in (("web", 80), ("code", 40), ("books", 20)):
        for _ in range(n):
            rows.append((rid, src))
            rid += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_manifest_realizes_the_schedule_exactly(spark):
    df = _corpus(spark)
    man = mixture_manifest(df, n_steps=T, batch_size=B).collect()
    sched = {
        (r["step"], r["source"]): (r["n_seqs"], r["cum_seqs"])
        for r in mixture_schedule(df, n_steps=T, batch_size=B).collect()
    }
    by_cell: dict = {}
    for r in man:
        by_cell.setdefault((r["step"], r["source"]), []).append(r)
    # every schedule cell is realized with exactly n_seqs draws,
    # positions 1..n_seqs, draw indices exactly (cum - n_seqs, cum]
    for cell, (n_seqs, cum) in sched.items():
        rows = by_cell.pop(cell, [])
        assert len(rows) == n_seqs, cell
        assert sorted(r["position"] for r in rows) == list(
            range(1, n_seqs + 1)
        )
        assert sorted(r["draw"] for r in rows) == list(
            range(cum - n_seqs + 1, cum + 1)
        )
    assert not by_cell  # nothing outside the schedule
    # the run draws exactly what the schedule allocates (floor
    # apportionment totals B*T - (<#sources) - documented deviation)
    assert len(man) == sum(n for n, _ in sched.values())
    assert T * B - len(man) < 3


def test_manifest_epoch_wrap_matches_repetition(spark):
    """The 140-doc corpus draws 270 sequences — sources repeat; each
    doc's epoch-e draw index is rank + (e-1)*n_s and the per-source
    epoch count matches the drawn/available ratio."""
    df = _corpus(spark)
    man = mixture_manifest(df, n_steps=T, batch_size=B).collect()
    avail = {"web": 80, "code": 40, "books": 20}
    per_src: dict = {}
    for r in man:
        per_src.setdefault(r["source"], []).append(r)
        assert r["draw"] == r["rank"] + (r["epoch"] - 1) * avail[r["source"]]
    for s, rows in per_src.items():
        drawn = len(rows)
        max_epoch = max(r["epoch"] for r in rows)
        # full epochs + a partial one
        assert max_epoch == -(-drawn // avail[s])
        # draws are exactly 1..drawn (the consumption prefix, wrapped)
        assert sorted(r["draw"] for r in rows) == list(range(1, drawn + 1))


def test_manifest_cluster_shape_invariant(spark):
    df = _corpus(spark)
    a = sorted(
        map(tuple, mixture_manifest(df, n_steps=T, batch_size=B).collect())
    )
    b = sorted(
        map(
            tuple,
            mixture_manifest(
                df.repartition(7), n_steps=T, batch_size=B
            ).collect(),
        )
    )
    assert a == b


def test_step_read_plan_consistency(spark):
    """Every manifest draw appears in exactly one read cell; per-cell
    read counts sum to the schedule; offsets/sizes align with binidx."""
    from pyspark.sql import functions as F

    from bistro_spark.operators.curation import (
        binidx_manifest,
        step_read_plan,
    )

    df = _corpus(spark).withColumn("n_words", F.lit(7) + F.col("doc_id") % 5)
    plan = step_read_plan(
        df, len_col="n_words", n_steps=T, batch_size=B, n_shards=3
    ).collect()
    man = mixture_manifest(df, n_steps=T, batch_size=B).collect()
    layout = {
        r["doc_id"]: (r["shard"], r["byte_offset"], r["n_bytes"])
        for r in binidx_manifest(
            df.select("doc_id", "n_words"), n_shards=3
        ).collect()
    }
    # rebuild the expected cells from the two constituents
    want: dict = {}
    for r in man:
        shard, off, nb = layout[r["doc_id"]]
        want.setdefault((r["step"], shard), []).append((off, nb))
    got = {}
    for r in plan:
        got[(r["step"], r["shard"])] = (
            r["n_reads"],
            r["bytes_total"],
            list(zip(r["offsets"], r["sizes"])),
        )
    assert set(got) == set(want)
    for cell, reads in want.items():
        n, bt, pairs = got[cell]
        assert n == len(reads) and bt == sum(b for _, b in reads)
        assert pairs == sorted(reads)
        assert n <= B  # capacity-bounded collect: never beyond the batch
