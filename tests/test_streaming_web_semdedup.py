"""Streaming twins of the web family and SemDeDup: full-history parity
with the batch ops (domain grid: ANY arrival order; semdedup:
id-monotone arrival, plus the pinned out-of-order divergence
counter-example), the stateless URL gate on a real stream, and pin
lifecycle bounds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bistro_spark.caching import pinned_ids
from bistro_spark.operators.similarity import semdedup
from bistro_spark.operators.web import domain_stats, with_normalized_urls
from bistro_spark.streaming.semdedup import StreamingSemDedup
from bistro_spark.streaming.web import StreamingDomainStats, streaming_url_gate

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


# ----------------------------------------------------------- url gate --


def test_streaming_url_gate_is_stateless_on_a_real_stream(spark, tmp_path):
    """The gate is pure projection: Structured Streaming accepts it with
    no watermark/state, and the committed rows equal the batch op."""
    docs = spark.read.parquet(DOCS).select("doc_id", "source")
    src_dir = str(tmp_path / "src")
    for k in range(3):
        docs.filter(f"doc_id % 3 = {k}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"b{k}"))
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    gated = streaming_url_gate(stream)
    assert gated.isStreaming
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "url_norm", "domain")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in with_normalized_urls(docs)
        .select("doc_id", "url_norm", "domain")
        .collect()
    )
    assert got == want and len(got) == docs.count()


# -------------------------------------------------------- domain grid --


def test_streaming_domain_stats_full_history_parity_any_order(spark):
    """After EVERY trigger the returned grid equals batch domain_stats
    over everything seen — including out-of-id-order arrival (both
    measures are arrival-order-invariant)."""
    docs = spark.read.parquet(DOCS).select("doc_id", "source")
    # deliberately non-monotone batch split (id mod, descending)
    batches = [docs.filter(f"doc_id % 3 = {i}") for i in (2, 0, 1)]
    s = StreamingDomainStats(spark)
    seen = None
    for b in batches:
        got = sorted(tuple(r) for r in s.process_batch(b).collect())
        seen = b if seen is None else seen.unionByName(b)
        want = sorted(tuple(r) for r in domain_stats(seen).collect())
        assert got == want
    s.close()


def test_streaming_domain_stats_replayed_url_not_double_counted(spark):
    """A URL seen in an earlier trigger adds docs but never a second
    page: n_pages stays flat, n_docs and dup_ratio move."""
    docs = spark.read.parquet(DOCS).select("doc_id", "source").limit(40)
    s = StreamingDomainStats(spark)
    first = {r["domain"]: r for r in s.process_batch(docs).collect()}
    second = {r["domain"]: r for r in s.process_batch(docs).collect()}
    assert set(first) == set(second)
    for d in first:
        assert second[d]["n_pages"] == first[d]["n_pages"]
        assert second[d]["n_docs"] == 2 * first[d]["n_docs"]
    s.close()


def test_streaming_domain_stats_pin_lifecycle_bounded(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "source")
    s = StreamingDomainStats(spark)
    before = set(pinned_ids(spark))
    for i in range(3):
        s.process_batch(docs.filter(f"doc_id % 3 = {i}")).collect()
    # steady state: the two stores + one trigger delta, nothing per-batch
    during = pinned_ids(spark) - before
    assert len(during) <= 4
    s.close()
    assert pinned_ids(spark) <= before


# ------------------------------------------------------------ semdedup --


def _emb_corpus(spark):
    """Embeddings + exact copies of vec_id<15 (ids +100000) so
    same-cluster ≥0.99 pairs exist across triggers."""
    emb = spark.read.parquet(EMB).select("vec_id", "embedding")
    dups = emb.filter("vec_id < 15").withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    return emb.unionByName(dups)


KW = dict(n_clusters=8, threshold=0.99, dim=64)


def test_streaming_semdedup_id_monotone_parity(spark):
    """Id-monotone arrival: after every trigger the union of emissions
    equals batch semdedup over everything seen (id, cluster, is_dup)."""
    corpus = _emb_corpus(spark)
    cuts = [(0, 200), (200, 500), (500, 200000)]
    s = StreamingSemDedup(spark, **KW)
    emitted: dict = {}
    seen = None
    for lo, hi in cuts:
        b = corpus.filter(f"vec_id >= {lo} AND vec_id < {hi}")
        out = s.process_batch(b).collect()
        for r in out:
            emitted[r["id"]] = (r["cluster"], r["is_dup"])
        seen = b if seen is None else seen.unionByName(b)
        want = {
            r["vec_id"]: (r["cluster"], r["is_dup"])
            for r in semdedup(seen, **KW).collect()
        }
        assert emitted == want
    # the injected copies were flagged
    assert sum(1 for c, d in emitted.values() if d) >= 15
    s.close()


def test_streaming_semdedup_out_of_order_divergence_pinned(spark):
    """The documented counter-example: when a higher-id copy arrives
    BEFORE its lower-id original, the stream must emit it against the
    rows seen so far (keep), and the original's later arrival cannot
    retroflip that emission — batch over the full corpus marks the
    higher id dup instead. Each trigger still exactly matches batch
    semdedup over what had ARRIVED when it fired."""
    corpus = _emb_corpus(spark)
    hi = corpus.filter("vec_id >= 100000")  # the copies (higher ids)
    lo = corpus.filter("vec_id < 100000")
    s = StreamingSemDedup(spark, **KW)
    first = {r["id"]: r["is_dup"] for r in s.process_batch(hi).collect()}
    # trigger-local parity: identical to batch over the arrived prefix
    want_hi = {
        r["vec_id"]: r["is_dup"] for r in semdedup(hi, **KW).collect()
    }
    assert first == want_hi
    second = {r["id"]: r["is_dup"] for r in s.process_batch(lo).collect()}
    # the keep-first rule anchors on LOWER ids only, so the late-arriving
    # originals are not flagged against their higher-id copies
    assert not any(second[i] for i in range(15))
    batch = {
        r["vec_id"]: r["is_dup"]
        for r in semdedup(corpus, **KW).collect()
    }
    # pinned divergence: batch flags high-id copies as dups of their
    # originals; the stream already emitted (at least some of) them as
    # keeps because the originals had not arrived yet
    div = [i for i in range(15) if batch[i + 100000] and not first[i + 100000]]
    assert div
    s.close()


def test_streaming_semdedup_pin_lifecycle_and_store(spark):
    corpus = _emb_corpus(spark)
    s = StreamingSemDedup(spark, **KW)
    before = set(pinned_ids(spark))
    total = 0
    for i in range(2):
        b = corpus.filter(f"vec_id % 2 = {i}")
        s.process_batch(b).collect()
        total += b.count()
        assert s.store_rows() == total
    during = pinned_ids(spark) - before
    assert len(during) <= 4  # store + previous-trigger blocks only
    sizes = {r["cluster"]: r["n_in_cluster"] for r in s.cluster_sizes().collect()}
    assert sum(sizes.values()) == total
    s.close()
    assert pinned_ids(spark) <= before
