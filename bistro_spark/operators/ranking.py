"""Distributed total-order ranking and token-id encoding.

``global_rank`` is the DataFrame version of the classic two-phase
zipWithIndex: a global ``row_number()`` window is a single-reducer sort
(the whole corpus through one task — the canonical scale mistake), so
instead we range-partition on the order key, count rows per partition
(one tiny driver-collected aggregate: #partitions rows), and add each
partition's cumulative offset to its local rank. Deterministic whenever
the order key is a TOTAL order (callers append a unique id tie-break);
the result is independent of the sampled range boundaries.

``build_vocab`` / ``encode_tokens`` are the training-prep tokenization
steps: rank the corpus vocabulary by (count DESC, term ASC) — reusing
``global_rank``, because a vocabulary can be 10^8 terms and a global
window over it has the same single-reducer problem — then encode every
document as its sequence of token ids via an explode + vocabulary join
(broadcast up to very large vocabularies, shuffle join beyond).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ----------------------------------------------------------- global rank ----


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Add a 1-based global ``rank`` over ``order_cols`` (ascending)
    without a single-partition window.

    Two-phase: range-partition by the key, materialize once
    (``localCheckpoint`` — on a cluster this is executor-storage, the
    same cost zipWithIndex pays), count rows per partition, broadcast the
    cumulative offsets back, and rank locally per partition. The order
    key MUST totally order the rows (append a unique id as the last
    column); given that, the rank is independent of where the sampled
    range boundaries fall.
    """
    cols = [F.col(c) for c in order_cols]
    part = (
        df.repartitionByRange(*([n_partitions] if n_partitions else []), *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in part.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    if not offsets:  # empty input: typed empty result, no zero-arg map
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    from pyspark.sql import Window

    off = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.withColumn("_local", F.row_number().over(w))
        .withColumn(
            rank_col,
            (F.element_at(off, F.col("_pid")) + F.col("_local")).cast(
                "long"
            ),
        )
        .drop("_pid", "_local")
    )


def global_rank_sql(
    table: str, order_by: str, out_cols: str, rank_col: str = "rank"
) -> str:
    """Oracle twin: the single-window form (fine at oracle scale)."""
    return f"""
      SELECT {out_cols},
             CAST(row_number() OVER (ORDER BY {order_by}) AS BIGINT)
               AS {rank_col}
      FROM {table}
    """


# ------------------------------------------------- vocabulary + encoding ----


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with dense 0-based token ids assigned by
    (count DESC, term ASC) — the standard frequency-ordered id scheme.
    Returns (term, cnt, token_id). Ranking goes through
    :func:`global_rank`, so a 10^8-term vocabulary never funnels through
    one reducer."""
    terms = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        terms.groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .withColumn("_neg", -F.col("cnt"))
    )
    ranked = (
        global_rank(vocab, ["_neg", "term"])
        .withColumn("token_id", (F.col("rank") - 1).cast("long"))
        .drop("_neg", "rank")
    )
    if max_vocab is not None:
        ranked = ranked.filter(F.col("token_id") < max_vocab)
    return ranked


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    max_broadcast_terms: int = 5_000_000,
) -> DataFrame:
    """Encode each document as its token-id sequence under ``vocab``
    (from :func:`build_vocab`): (id, n_tok, token_ids) with the id
    sequence serialized as a comma-joined string (array outputs must be
    canonically serialized for cross-engine comparison; a writer keeps
    the array form).

    Explode-with-position + vocabulary equi-join, then one per-doc
    re-aggregation ordered by position. Out-of-vocabulary terms (a
    ``min_count``/``max_vocab``-capped vocab) encode as ``oov_id``.

    The join side is GATED, not hinted blindly: a vocabulary is usually
    dimension-sized (broadcast — the fact side never shuffles on term),
    but the module's own motivating scale is a 10^8-term vocab, and a
    hard ``F.broadcast`` hint there overrides
    ``autoBroadcastJoinThreshold`` straight into executor OOM. So the
    vocab is counted (one cheap aggregate — its plan is already
    materialized through ``global_rank``'s checkpoint) and the hint is
    applied only under ``max_broadcast_terms``; above it the plain join
    lets AQE pick a shuffle strategy (and split skewed terms).
    """
    pos_terms = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    v = vocab.select("term", "token_id")
    if vocab.count() <= max_broadcast_terms:
        v = F.broadcast(v)
    enc = pos_terms.join(v, "term", "left").withColumn(
        "tid", F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("long")
    )
    return enc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tok"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tid")))
                ),
                lambda x: x["tid"].cast("string"),
            ),
        ).alias("token_ids"),
    )


def encode_tokens_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``build_vocab(min_count=1)`` + :func:`encode_tokens`
    (parallel unnests zip term with its position)."""
    return f"""
      WITH w AS (
        SELECT {id_col}, string_split({text_col}, ' ') AS wrd FROM {table}
      ),
      p AS (
        SELECT {id_col}, unnest(wrd) AS term,
               unnest(range(1, len(wrd) + 1)) AS pos
        FROM w
      ),
      t AS (SELECT * FROM p WHERE term <> ''),
      vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term
      ),
      ranked AS (
        SELECT term,
               CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) - 1
                    AS BIGINT) AS token_id
        FROM vocab
      )
      SELECT t.{id_col} AS {id_col},
             CAST(count(*) AS BIGINT) AS n_tok,
             string_agg(CAST(t2.token_id AS VARCHAR), ','
                        ORDER BY t.pos) AS token_ids
      FROM t JOIN ranked t2 USING (term)
      GROUP BY t.{id_col}
    """
