"""Web-curation operators: URL normalization, registered domain, URL
dedup, per-domain stats — value edge cases plus the map-only plan shape.

Cross-engine hash equality over the whole synthetic corpus is the driver
gate's job (url_normalize / domain_stats oracles); here we pin the
individual normalization rules on hand-built URLs where each rule fires
alone, the suffix-list branch of the registered domain, and the plan
properties (normalization is exchange-free; domain_stats is two
partial-agg exchanges).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from bistro_spark.operators.web import (
    domain_stats,
    normalize_url,
    registered_domain,
    synth_url,
    url_dedup,
    with_normalized_urls,
)


def plan_of(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _norm(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(normalize_url("url").alias("n")).collect()]


def test_each_normalization_rule_alone(spark):
    cases = {
        # case folding of scheme+host only; path/query case preserved
        "HTTPS://ExAmPlE.CoM/Doc?Id=3": "https://example.com/Doc?Id=3",
        # one leading www. stripped; inner 'www' labels untouched
        "https://www.example.com/a": "https://example.com/a",
        "https://www2.example.com/a": "https://www2.example.com/a",
        # default port stripped per scheme; non-default kept
        "https://h.com:443/a": "https://h.com/a",
        "http://h.com:80/a": "http://h.com/a",
        "https://h.com:8443/a": "https://h.com:8443/a",
        # one trailing slash stripped ('/' root collapses to empty path)
        "https://h.com/a/": "https://h.com/a",
        "https://h.com/": "https://h.com",
        # utm_* params dropped, others kept in order; all-utm -> no '?'
        "https://h.com/a?utm_source=x&id=1&utm_c=y&b=2": "https://h.com/a?id=1&b=2",
        "https://h.com/a?utm_source=x": "https://h.com/a",
        # fragment always dropped
        "https://h.com/a#frag": "https://h.com/a",
        # no-path, no-query URL survives untouched
        "https://h.com": "https://h.com",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_registered_domain_suffix_branch(spark):
    df = spark.createDataFrame(
        [
            ("https://app.brand.co.uk/a",),   # listed 2-level suffix -> 3 labels
            ("https://cdn.brand.com/a",),     # plain tld -> 2 labels
            ("https://brand.com/a",),         # already registered
            ("https://localhost/a",),         # single label -> itself
            ("https://a.b.brand.com:8080?q=1",),  # port+query, no path
        ],
        "u string",
    )
    got = [r.d for r in df.select(registered_domain("u").alias("d")).collect()]
    assert got == ["brand.co.uk", "brand.com", "brand.com", "localhost", "brand.com"]


def test_synth_pair_collides_after_normalization(spark):
    """ids 2m and 2m+1 emit different raw URLs that canonicalize equal —
    the property that makes url_dedup non-trivial on the gate corpus."""
    df = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    out = with_normalized_urls(df).select("doc_id", "url", "url_norm").collect()
    by_id = {r.doc_id: r for r in out}
    for m in range(20):
        a, b = by_id[2 * m], by_id[2 * m + 1]
        assert a.url != b.url
        assert a.url_norm == b.url_norm


def test_url_dedup_keeps_first_and_counts(spark):
    df = with_normalized_urls(
        spark.range(0, 10).select(F.col("id").alias("doc_id"))
    )
    per_url = {r.url_norm: r for r in url_dedup(df).collect()}
    assert len(per_url) == 5
    for r in per_url.values():
        assert r.n_copies == 2 and r.keep_doc_id % 2 == 0


def test_domain_stats_consistency(spark):
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    rows = domain_stats(df).collect()
    # 5 brands x {co.uk, com} but brand(m%5) and tld(m%4) overlap on m%20:
    # every (brand, tld) combo occurs -> 10 domains
    assert len(rows) == 10
    assert sum(r.n_docs for r in rows) == 200
    assert sum(r.n_pages for r in rows) == 100
    for r in rows:
        assert abs(r.dup_ratio - r.n_docs / r.n_pages) < 1e-9


def test_normalization_is_map_only_no_exchange(spark):
    """The canonicalization pass must fuse into the scan: no Exchange, no
    Python (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    df = with_normalized_urls(
        spark.range(0, 100).select(F.col("id").alias("doc_id"))
    )
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_domain_stats_two_partial_agg_exchanges(spark):
    """url group-by + domain group-by: exactly two exchanges, both fed by
    partial HashAggregates (crawl dups collapse map-side)."""
    plan = plan_of(
        domain_stats(spark.range(0, 100).select(F.col("id").alias("doc_id")))
    )
    assert plan.count("Exchange") == 2
    assert "HashAggregate" in plan
    assert "Python" not in plan


def test_synth_url_is_deterministic(spark):
    df = spark.range(5, 9).select(synth_url(F.col("id")).alias("u"))
    a = [r.u for r in df.collect()]
    b = [r.u for r in df.collect()]
    assert a == b and all(u.lower().startswith("https://") for u in a)


# --------------------------------------------------- normalize_text ----
# (lives here to avoid paying another module-scoped Spark warmup; the
# web + unicode sanitation ops are the same curation stage)


def test_normalize_text_composes_and_collapses(spark):
    from bistro_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (0, "café  au\tlait\r\n end "),   # NFC + whitespace
            (1, "plain ascii"),                      # untouched
            (2, "Å ring"),                     # A + combining ring -> Å
        ],
        "id long, t string",
    )
    got = {r.id: r.text_norm
           for r in normalize_text(df, "t").collect()}
    assert got[0] == "café au lait end"
    assert got[1] == "plain ascii"
    assert got[2] == "Å ring"


def test_normalize_text_idempotent_and_single_arrow_stage(spark):
    from bistro_spark.operators.text import messy_text, normalize_text

    df = spark.range(0, 50).select(
        F.concat(F.lit("the speed"), F.col("id").cast("string")).alias("t")
    ).withColumn("t", messy_text("t"))
    once = normalize_text(df, "t")
    twice = normalize_text(once, "text_norm", out_col="t2")
    assert twice.filter(F.col("t2") != F.col("text_norm")).count() == 0
    plan = plan_of(once)
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


# ------------------------------------------------------------- BM25 ----
# (same curation-stage test session; BM25 lives in operators/text.py)


def test_bm25_hand_computed(spark):
    import math
    from bistro_spark.operators.text import BM25_B, BM25_K1, bm25_scores

    docs = spark.createDataFrame(
        [(0, "spark spark join"), (1, "join table"), (2, "other words here")],
        "doc_id long, text string",
    )
    got = {(r.query_id, r.doc_id): r
           for r in bm25_scores(docs, {0: ["spark"]}).collect()}
    # only doc 0 contains 'spark'
    assert set(got) == {(0, 0)}
    n, df_t, dl, avgdl, tf = 3, 1, 3, 8 / 3, 2
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    expect = idf * tf * (BM25_K1 + 1) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
    assert abs(got[(0, 0)].score - round(expect, 6)) < 1e-9
    assert got[(0, 0)].n_hits == 2


def test_bm25_single_score_scan_any_query_count(spark):
    """Scoring must scan the corpus once for the stats row and once for
    the score map — independent of how many query sets ride the pass."""
    from bistro_spark.operators.text import bm25_scores

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("spark join w"), F.col("id").cast("string")).alias("text"),
    )
    q1 = bm25_scores(docs, {0: ["spark"]})
    q3 = bm25_scores(docs, {0: ["spark"], 1: ["join"], 2: ["w1", "w2"]})
    assert plan_of(q1).count("Scan") == plan_of(q3).count("Scan")
    assert "BroadcastNestedLoopJoin" in plan_of(q3) or "BroadcastExchange" in plan_of(q3)
