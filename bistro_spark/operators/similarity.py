"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant is the scale path (candidate set ∝ bucket size, not corpus size).
At 100 TB the queries broadcast (they're small) and the corpus never
shuffles — each partition scores its local rows and emits only its top-k
(partial top-k via window over the broadcast-join output; AQE coalesces).

All arithmetic is double, accumulated left-to-right (portable vs DuckDB's
list_dot_product); similarities are rounded before ranking so float noise
can't flip the deterministic (sim DESC, id ASC) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bistro_spark.operators.dedup import _sign_bucket, cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force cosine top-k per query (the baseline).

    Plan shape: broadcast(queries) cross-joined into the corpus → one pass
    over the corpus per partition, no corpus shuffle; the final top-k
    window shuffles only (|queries| × |corpus|/partitions) pre-filtered
    candidate rows.
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_sim")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    sign_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join, exact cosine
    within the matching bucket only (recall < 1 by construction; the scale
    path — candidate count drops ~2^-bits)."""
    c = corpus.withColumn("bucket", _sign_bucket(F.col(vec_col), sign_bits))
    q = queries.withColumn("bucket", _sign_bucket(F.col(query_vec_col), sign_bits))
    scored = c.join(F.broadcast(q), "bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_sim")
    )
