"""Text-analysis, similarity-search and multimodal-plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthetic_media,
)
from bistro_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from bistro_spark.operators.text import add_text_features


# ------------------------------------------------------------- text ------


def test_text_features(spark):
    df = spark.createDataFrame(
        [(1, "x the cat and the dog of it"), (2, "der und die der hund")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in add_text_features(df).collect()}
    # ' the ' twice, ' and ' once, ' of ' once
    assert out[1]["n_words"] == 8
    assert out[1]["n_stop"] == 4  # the(2) + and(1) + of(1); ' a '/' to ' absent
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"  # ' und ' + ' die ' markers
    import hashlib

    assert out[1]["fp_md5"] == hashlib.md5(b"x the cat and the dog of it").hexdigest()


def test_text_features_on_documents(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = add_text_features(df)
    assert out.count() == df.count()
    row = out.first()
    assert row["n_words"] > 0 and row["quality"] is not None


# -------------------------------------------------------- similarity ------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qids = sorted(vecs)[:3]
    queries = spark.createDataFrame(
        [(q, [float(x) for x in vecs[q]]) for q in qids],
        "query_id long, query_vec array<float>",
    )
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos_sim"]))

    for q in qids:
        qv = np.array(
            np.array(vecs[q], dtype=np.float32), dtype=np.float64
        )  # float32 round-trip like Spark's array<float>
        sims = []
        for vid, v in vecs.items():
            v32 = np.array(np.array(v, dtype=np.float32), dtype=np.float64)
            c = float(v32 @ qv / (np.linalg.norm(v32) * np.linalg.norm(qv)))
            sims.append((round(c, 6), vid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        expect = [(i + 1, vid, s) for i, (s, vid) in enumerate(sims[:5])]
        assert sorted(by_q[q]) == expect, q
        # self always rank 1 with sim 1.0
        assert expect[0][1] == q and abs(expect[0][2] - 1.0) < 1e-6


def test_cosine_topk_lsh_subset_of_bruteforce(spark, emb):
    qids = [r["vec_id"] for r in emb.limit(2).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=50).collect()
    approx = cosine_topk_lsh(emb, queries, k=5, sign_bits=4).collect()
    exact_set = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        # every approx hit scores identically to the exact computation
        key = (r["query_id"], r["vec_id"])
        if key in exact_set:
            assert abs(exact_set[key] - r["cos_sim"]) < 1e-9
    # identical-vector query is in its own bucket -> rank 1 is itself
    r1 = {r["query_id"]: r["vec_id"] for r in approx if r["rank"] == 1}
    for q in qids:
        assert r1[q] == q


# -------------------------------------------------------- multimodal ------


def test_decode_stub_raises_without_fake():
    from bistro_spark.operators import multimodal

    if multimodal._PILImage is not None:
        pytest.skip("PIL installed — real decode path active")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 32)


def test_decode_real_image_when_pil_present():
    """Real decode path (auto-skips offline): a PNG round-trips through
    decode_image to an HxWx3 uint8 array with the encoded pixel values."""
    from bistro_spark.operators import multimodal

    if multimodal._PILImage is None:
        pytest.skip("PIL not installed in this container")
    import io

    import numpy as np

    img = multimodal._PILImage.new("RGB", (4, 2), color=(10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (2, 4, 3) and arr.dtype == np.uint8
    assert (arr == [10, 20, 30]).all()


def test_multimodal_features(spark):
    media = synthetic_media(spark, 90)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 90
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:int,mean_byte:double,"
        "feat:array<float>>"
    )
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["n_bytes"] == 32  # sha256 payload
    assert len(by_id[0]["feat"]) == 3
    # deterministic: rerun gives identical features
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert all(by_id[i]["feat"] == again[i]["feat"] for i in by_id)


def test_frame_sample(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample(media, every_ms=5000)
    got = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video'").collect()
    }
    for r in got:
        d = durations[r["media_id"]]
        expect = max((d - 1), 0) // 5000 + 1 if d > 0 else 1
        assert r["count"] == expect, (r["media_id"], d)


def test_ivf_topk_recall(spark):
    """IVF probe search finds most of the brute-force top-k (recall is
    tunable via n_probe; with n_probe=n_lists it is exact by construction)."""
    from bistro_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx_df, centroids = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4)
    approx = {(r["query_id"], r["vec_id"]) for r in approx_df.collect()}
    assert centroids.shape[0] == 8
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # full probe = exact, reusing the prebuilt index (no re-fit)
    full_df, _ = ivf_topk(
        emb, queries, k=5, n_lists=8, n_probe=8, centroids=centroids
    )
    full = {(r["query_id"], r["vec_id"]) for r in full_df.collect()}
    assert full == exact


def test_cosine_topk_lsh_recall(spark):
    """Quantitative recall of the LSH-bucketed ANN path vs the exact twin:
    fewer sign bits → bigger buckets → higher recall (tunable), and the
    query's own vector (cos=1, identical sign pattern) is always found."""
    from bistro_spark.operators.similarity import cosine_topk, cosine_topk_lsh

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk_lsh(emb, queries, k=5, sign_bits=2).collect()
    }
    # self-match always collides (identical vector -> identical signs)
    assert all((q, q) in approx for q in range(10))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall


# ------------------------------------------- random projection + centroids ----


def test_random_projection_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.similarity import (
        random_projection,
        random_projection_sql,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    got = sorted(
        (r.vec_id, *[r.proj[i] for i in range(4)])
        for r in random_projection(emb, out_dim=4).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(
        tuple(r)
        for r in con.sql(
            random_projection_sql("embeddings", out_dim=4, dim=64)
        ).fetchall()
    )
    assert got == want and len(got) == emb.count()


def test_group_centroids_exact_and_partitioning_invariant(spark):
    import duckdb

    from bistro_spark.operators.similarity import (
        group_centroids,
        group_centroids_sql,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    a = sorted(tuple(r) for r in group_centroids(emb).collect())
    b = sorted(
        tuple(r) for r in group_centroids(emb.repartition(17)).collect()
    )
    assert a == b  # decimal sums: order/partitioning independent
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(
        tuple(r) for r in con.sql(group_centroids_sql("embeddings")).fetchall()
    )
    assert a == want
    # 64 dims per label
    labels = {r[0] for r in a}
    assert len(a) == 64 * len(labels)


# --------------------------------------------------------- semantic dedup ----


def test_semdedup_planted_copies_and_invariance(spark):
    """Exact copies (cos = 1) of rows 0..4 must be flagged as duplicates
    (keep-first: the lower-id original survives); result is identical on
    any partitioning; every row lands in [0, n_clusters)."""
    from bistro_spark.operators.similarity import semdedup

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    dups = emb.filter("vec_id < 5").withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dups)
    out = semdedup(corpus, threshold=0.95, n_clusters=8).toPandas()
    assert len(out) == corpus.count()
    assert out["cluster"].between(0, 7).all()
    flagged = set(out[out["is_dup"]]["vec_id"])
    assert {100000 + i for i in range(5)} <= flagged
    originals = set(out[~out["is_dup"]]["vec_id"])
    assert set(range(5)) <= originals
    # cluster sizes are consistent within each cluster
    sizes = out.groupby("cluster")["n_in_cluster"].nunique()
    assert (sizes == 1).all()

    out2 = semdedup(
        corpus.repartition(13), threshold=0.95, n_clusters=8
    ).toPandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_semdedup_cluster_cap_guard(spark):
    """A cluster past max_cluster_rows raises with guidance instead of
    silently attempting an O(c^2) GEMM that can't fit."""
    import pytest as _pytest

    from bistro_spark.operators.similarity import semdedup

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    with _pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(emb, n_clusters=1, max_cluster_rows=10).toPandas()


def test_semdedup_matches_duckdb(spark):
    """Full-row parity vs the SQL twin (assignment argmax rule included)."""
    import duckdb

    from bistro_spark.operators.similarity import semdedup, semdedup_sql

    path = "/root/testdata/sf0.001/embeddings.parquet"
    out = (
        semdedup(
            spark.read.parquet(path).select("vec_id", "embedding"),
            threshold=0.9,
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    ora = (
        con.sql(semdedup_sql(threshold=0.9))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in ["vec_id", "cluster", "n_in_cluster", "is_dup"]:
        assert (out[c].to_numpy() == ora[c].to_numpy()).all(), c


# --------------------------------------- hashed linear quality classifier ----


def test_classifier_score_known_value(spark):
    """Hand-computed expectation for a three-word doc (hashlib md5 —
    independent of both engines' md5/conv plumbing)."""
    import hashlib
    import math

    from bistro_spark.operators.text import classifier_score

    text = "alpha beta gamma"
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]

    def w(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 2001 - 1000

    w_sum = sum(w(t) for t in feats)
    score = round(
        1.0 / (1.0 + math.exp(-(w_sum / (1000.0 * math.sqrt(len(feats)))))), 6
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = classifier_score(df).collect()[0]
    assert row["n_feats"] == 5
    assert row["w_sum"] == w_sum
    assert row["score"] == score
    assert row["keep"] == (score >= 0.5)


def test_classifier_score_single_word_and_duckdb_parity(spark):
    """Single-word doc has no bigrams (the sequence()-descends guard);
    full-row parity vs the DuckDB twin on real documents."""
    import duckdb

    from bistro_spark.operators.text import (
        classifier_score,
        classifier_score_sql,
    )

    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    row = classifier_score(df).collect()[0]
    assert row["n_feats"] == 1

    path = "/root/testdata/sf0.001/documents.parquet"
    out = (
        classifier_score(spark.read.parquet(path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    ora = (
        con.sql(classifier_score_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ["n_feats", "w_sum", "score", "keep"]:
        assert (out[c].to_numpy() == ora[c].to_numpy()).all(), c


# ------------------------------------------------ heavy hitters (MG) ----


def test_heavy_hitters_exact_and_adversarial(spark):
    """Exact equality with the brute-force definition on a skewed
    synthetic corpus, at several partitionings (the per-partition MG
    summaries differ wildly between shapes — the output must not)."""
    rows = []
    # zipf-ish: word_i appears ~ 600/i times, i = 1..40, scattered as
    # one-word docs so partitioning really moves occurrences around
    for i in range(1, 41):
        rows += [(f"w{i}",)] * (600 // i)
    df = spark.createDataFrame(rows, "text string")
    n_total = sum(600 // i for i in range(1, 41))
    for k in (5, 10, 25):
        want = sorted(
            (f"w{i}", 600 // i)
            for i in range(1, 41)
            if (600 // i) * (k + 1) > n_total
        )
        for parts in (1, 7):
            from bistro_spark.operators.text import heavy_hitters

            got = sorted(
                tuple(r)
                for r in heavy_hitters(df.repartition(parts), k=k).collect()
            )
            assert got == want, (k, parts)


def test_heavy_hitters_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.text import heavy_hitters, heavy_hitters_sql

    path = "/root/testdata/sf0.001/documents.parquet"
    got = sorted(
        tuple(r)
        for r in heavy_hitters(spark.read.parquet(path), k=40).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    want = sorted(tuple(r) for r in con.sql(heavy_hitters_sql(k=40)).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------------- centroid_similarity ----
def test_centroid_similarity_hand_values(spark):
    from bistro_spark.operators.similarity import centroid_similarity

    rows = [
        (1, [1.0, 0.0], 1), (2, [1.0, 0.0], 1),   # centroid (1, 0)
        (3, [0.0, 2.0], 2),                        # centroid (0, 2)
        (4, [4.0, 0.0], 3),                        # centroid (4, 0)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        (r["group_a"], r["group_b"]): (r["n_a"], r["n_b"], r["cosine"])
        for r in centroid_similarity(df).collect()
    }
    assert got == {
        (1, 2): (2, 1, 0.0),
        (1, 3): (2, 1, 1.0),
        (2, 3): (1, 1, 0.0),
    }


def test_centroid_similarity_partitioning_invariant_and_duckdb(spark):
    import duckdb

    from bistro_spark.operators.similarity import (
        centroid_similarity,
        centroid_similarity_sql,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    base = sorted(
        tuple(r) for r in centroid_similarity(emb).collect()
    )
    re16 = sorted(
        tuple(r)
        for r in centroid_similarity(emb.repartition(16)).collect()
    )
    assert base == re16  # bit-identical: decimal-exact pipeline
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            centroid_similarity_sql("embeddings")
        ).fetchall()
    )
    assert base == want


# ------------------------------------------------ quantize_embeddings ----
def test_quantize_embeddings_hand_values_and_plan(spark):
    from bistro_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["scale"] == 1.0 and out[1]["q"] == "127,-64,0"
    # |−0.5 − (−64/127)| = 0.003937
    assert out[1]["max_err"] == round(abs(-0.5 + 64.0 / 127.0), 6)
    assert out[2]["scale"] == 0.0 and out[2]["q"] == "0,0,0"
    assert out[2]["max_err"] == 0.0
    plan = (
        quantize_embeddings(
            spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# --------------------------------------------------------- centroid_shift --


def test_centroid_shift_brute_and_edges(spark):
    """Exact numerator recomputed in pure Python ints; identical
    snapshots shift 0; a label present on one side only gets NULL."""
    from bistro_spark.operators.similarity import centroid_shift

    old = [
        (1, [0.5, 0.0], 1),
        (2, [1.0, 1.0], 1),
        (3, [0.25, -0.5], 2),
        (7, [0.1, 0.2], 3),  # label 3 only in old
    ]
    new = [
        (4, [0.75, 0.5], 1),
        (5, [0.0, 0.0], 2),
        (6, [0.5, -1.0], 2),
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["label"]: r for r in centroid_shift(mk(old), mk(new)).collect()}
    S = 10**6

    def q(v):
        import decimal

        return int(
            decimal.Decimal(float(v) * S).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )

    for lbl in (1, 2):
        o = [v for _i, v, l in old if l == lbl]
        n = [v for _i, v, l in new if l == lbl]
        no, nn = len(o), len(n)
        num = sum(
            (
                sum(q(v[d]) for v in o) * nn
                - sum(q(v[d]) for v in n) * no
            )
            ** 2
            for d in range(2)
        )
        r = got[lbl]
        assert (r["n_old"], r["n_new"]) == (no, nn)
        assert int(r["shift2_num"]) == num
        assert r["shift"] == round(num**0.5 / (no * nn * S), 9)
    r3 = got[3]
    assert (r3["n_old"], r3["n_new"]) == (1, 0)
    assert r3["shift2_num"] is None and r3["shift"] is None
    # identical snapshots: zero shift everywhere
    same = {
        r["label"]: r
        for r in centroid_shift(mk(old), mk(old)).collect()
    }
    assert all(int(r["shift2_num"]) == 0 and r["shift"] == 0.0
               for r in same.values())


def test_centroid_shift_null_label_raises(spark):
    import pytest as _pytest

    from bistro_spark.operators.similarity import centroid_shift

    bad = spark.createDataFrame(
        [(1, [0.1], None)], "vec_id long, embedding array<float>, label int"
    )
    ok = spark.createDataFrame(
        [(2, [0.1], 1)], "vec_id long, embedding array<float>, label int"
    )
    with _pytest.raises(ValueError, match="NULL label"):
        centroid_shift(bad, ok)
    with _pytest.raises(ValueError, match="NULL label"):
        centroid_shift(ok, bad)
