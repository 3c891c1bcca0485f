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


# -------------------------------------------- vocabulary coverage curve ----
def vocab_coverage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary-size sizing curve: what share of all token occurrences
    the top-k most frequent terms cover, at log-spaced k — THE plot that
    picks a tokenizer/vocab size before training (Zipf means the curve
    saturates fast; the knee is the budget answer).

    Shape at 100 TB: the vocabulary comes from :func:`build_vocab`
    (two-phase global rank, never one reducer); ranks collapse to
    log2-buckets via integer bin()-length (exact on both engines — no
    float log2 edge disputes), ONE partial-aggregated groupBy down to
    ≤ 64 bucket rows, and the cumulative sum runs a window over those
    ≤ 64 rows only (single tiny partition BY CONSTRUCTION — log-bounded,
    never vocabulary-sized). All counts exact BIGINT; coverage is a
    round-6 report column.

    Returns (top_k, n_terms, covered, total_occurrences, coverage) —
    one row per occupied log2 bucket, top_k = 2^(b+1)−1 clipped to the
    vocabulary size (the largest rank the bucket can hold).
    """
    from pyspark.sql import Window

    vocab = build_vocab(df, text_col=text_col)  # (term, cnt, token_id)
    rank = F.col("token_id") + 1
    bucket = (F.length(F.bin(rank)) - F.lit(1)).cast("int")
    per_bucket = (
        vocab.select(bucket.alias("b"), "cnt")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("terms"),
            F.sum("cnt").cast("long").alias("occ"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_bucket.agg(
        F.sum("terms").cast("long").alias("_v"),
        F.sum("occ").cast("long").alias("_tot"),
    )
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .select(
            # SQL expr: pyspark's F.shiftleft only takes a literal shift
            F.least(
                F.expr("shiftleft(1L, b + 1) - 1L"), F.col("_v")
            ).alias("top_k"),
            F.sum("terms").over(w).cast("long").alias("n_terms"),
            F.sum("occ").over(w).cast("long").alias("covered"),
            F.col("_tot").alias("total_occurrences"),
            F.round(F.sum("occ").over(w) / F.col("_tot"), 6).alias("coverage"),
        )
    )


def vocab_coverage_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`vocab_coverage` (row_number vocabulary,
    same integer bin()-length buckets, window cumsum)."""
    return f"""
      WITH t AS (
        SELECT unnest(string_split({text_col}, ' ')) AS term FROM {table}
      ),
      tt AS (SELECT term FROM t WHERE term <> ''),
      vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tt GROUP BY term
      ),
      ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
        FROM vocab
      ),
      pb AS (
        SELECT CAST(length(bin(rank)) - 1 AS INTEGER) AS b,
               CAST(count(*) AS BIGINT) AS terms,
               CAST(sum(cnt) AS BIGINT) AS occ
        FROM ranked GROUP BY 1
      ),
      tot AS (SELECT CAST(sum(terms) AS BIGINT) AS v,
                     CAST(sum(occ) AS BIGINT) AS tot FROM pb)
      SELECT CAST(least((1::BIGINT << (b + 1)) - 1, tot.v) AS BIGINT)
               AS top_k,
             CAST(sum(terms) OVER (ORDER BY b) AS BIGINT) AS n_terms,
             CAST(sum(occ) OVER (ORDER BY b) AS BIGINT) AS covered,
             tot.tot AS total_occurrences,
             round(CAST(sum(occ) OVER (ORDER BY b) AS DOUBLE) / tot.tot, 6)
               AS coverage
      FROM pb, tot
    """


# ---------------------------------------------------- per-slice OOV rate ----
def oov_rate(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-slice out-of-vocabulary rate under a top-``k`` frequency
    vocabulary: the share of a slice's token occurrences that a
    k-capped tokenizer would map to <unk>. The per-slice companion to
    :func:`vocab_coverage` — corpus-level coverage can look fine while
    one slice (code, another script) is half-OOV.

    The k-term vocabulary is dimension-sized by construction —
    broadcast to the exploded corpus (left join, no shuffle of the fact
    side), then ONE partial-aggregated groupBy per slice. Exact BIGINT
    counts; oov_rate is a round-6 report column.

    Returns (group, n_tokens, n_oov, oov_terms, oov_rate)."""
    vocab = build_vocab(df, text_col=text_col, max_vocab=k).select("term")
    terms = df.select(
        F.col(group_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    joined = terms.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "term", "left"
    )
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.countDistinct(
            F.when(F.col("_in").isNull(), F.col("term"))
        ).cast("long").alias("oov_terms"),
        F.round(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


def oov_rate_sql(
    table: str = "documents",
    k: int = 100,
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`oov_rate` (same (cnt DESC, term ASC)
    vocabulary cut)."""
    return f"""
      WITH t AS (
        SELECT {group_col} AS grp,
               unnest(string_split({text_col}, ' ')) AS term
        FROM {table}
      ),
      tt AS (SELECT * FROM t WHERE term <> ''),
      vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tt GROUP BY term
      ),
      topk AS (
        SELECT term FROM vocab
        ORDER BY cnt DESC, term ASC LIMIT {k}
      )
      SELECT tt.grp AS {group_col},
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN topk.term IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov,
             CAST(count(DISTINCT CASE WHEN topk.term IS NULL
                                      THEN tt.term END) AS BIGINT)
               AS oov_terms,
             round(CAST(sum(CASE WHEN topk.term IS NULL THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS oov_rate
      FROM tt LEFT JOIN topk USING (term)
      GROUP BY tt.grp
    """


# ------------------------------------------- reciprocal-rank fusion (RRF) ----
def value_ranks(
    df: DataFrame,
    value,
    rank_col: str = "rank",
    ascending: bool = False,
) -> DataFrame:
    """Competition rank (1 + #rows strictly better) for every row, by
    VALUE-LEVEL collapse — the scalable substitute for a global
    ``RANK()`` window (which is a single-reducer sort of the corpus).

    Plan: ONE partial-aggregated groupBy collapses the corpus to its
    distinct-value level set (bounded by the signal's domain — the
    contract is integer/binned signals, the same assumption as
    ``pareto_frontier``), the strict-prefix count runs a window over the
    LEVEL SET ONLY (tiny by construction — never corpus-sized), and the
    (value → rank) map broadcasts back onto the corpus. Ties share a
    rank; the next value's rank skips by the tie count — exactly SQL
    ``RANK()``, including NULL signals: NULL forms its own level, sorts
    NULLS LAST (both engines' default), and the map join is null-safe so
    NULL-signal rows keep their rank row instead of silently vanishing.

    Returns ``df`` + ``rank_col`` (long)."""
    from pyspark.sql import Window

    v = value.alias("_v") if hasattr(value, "alias") else F.col(value).alias("_v")
    with_v = df.withColumn("_v", v)
    levels = with_v.groupBy("_v").agg(F.count(F.lit(1)).alias("_n"))
    order = (
        F.col("_v").asc_nulls_last() if ascending else F.col("_v").desc_nulls_last()
    )
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    rank_map = levels.select(
        F.col("_v").alias("_rv"),
        (F.coalesce(F.sum("_n").over(w), F.lit(0)) + 1)
        .cast("long")
        .alias(rank_col),
    )
    return (
        with_v.join(
            F.broadcast(rank_map), F.col("_v").eqNullSafe(F.col("_rv"))
        )
        .drop("_v")
        .drop("_rv")
    )


def rrf_fusion(
    df: DataFrame,
    signals: list[tuple[str, "F.Column", bool]] | None = None,
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank-fusion quality ensemble: fuse heterogeneous
    per-document quality signals on the RANK scale —
    ``score = Σ_s 1/(k + rank_s(doc))`` (Cormack & Clarke's RRF, the
    standard way to blend signals whose raw scales are incomparable;
    k=60 is the published default). Ranks are competition ranks, best
    first, via :func:`value_ranks` — so the whole fusion is
    level-set aggregations + broadcast joins, zero corpus-sized sorts.

    ``signals`` is [(name, column_expr, ascending)]; ascending=True
    means SMALLER is better. Defaults (over the documents table):
    distinct-word diversity (max), n_chars length (max), total word
    count (min — a token-cost signal).

    Returns (id, r_<name>..., rrf_score). The score expression is a
    fixed-order sum of ``1/(k + rank)`` terms — deterministic and
    bit-identical across engines for the same ranks."""
    if signals is None:
        words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        signals = [
            ("diversity", F.size(F.array_distinct(words)).cast("long"), False),
            ("length", F.col("n_chars").cast("long"), False),
            ("brevity", F.size(words).cast("long"), True),
        ]
    out = df.select(id_col, *[c.alias(f"_s_{n}") for n, c, _ in signals])
    for name, _, asc in signals:
        out = value_ranks(
            out, F.col(f"_s_{name}"), rank_col=f"r_{name}", ascending=asc
        )
    score = None
    for name, _, _ in signals:
        term = F.lit(1.0) / (F.lit(k) + F.col(f"r_{name}"))
        score = term if score is None else score + term
    return out.select(
        id_col,
        *[F.col(f"r_{n}") for n, _, _ in signals],
        score.alias("rrf_score"),
    )


def rrf_fusion_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 60,
) -> str:
    """DuckDB twin of :func:`rrf_fusion` (default signals) — the
    definitional single-window ``RANK()`` form (fine at oracle scale;
    competition-rank semantics match value_ranks exactly)."""
    words = f"list_filter(string_split({text_col}, ' '), w -> w <> '')"
    return f"""
      WITH sig AS (
        SELECT {id_col},
               CAST(len(list_distinct({words})) AS BIGINT) AS s_div,
               CAST(n_chars AS BIGINT) AS s_len,
               CAST(len({words}) AS BIGINT) AS s_brev
        FROM {table}
      ),
      r AS (
        SELECT {id_col},
               CAST(rank() OVER (ORDER BY s_div DESC) AS BIGINT)
                 AS r_diversity,
               CAST(rank() OVER (ORDER BY s_len DESC) AS BIGINT)
                 AS r_length,
               CAST(rank() OVER (ORDER BY s_brev ASC) AS BIGINT)
                 AS r_brevity
        FROM sig
      )
      SELECT {id_col}, r_diversity, r_length, r_brevity,
             1.0 / ({k} + r_diversity)
               + 1.0 / ({k} + r_length)
               + 1.0 / ({k} + r_brevity) AS rrf_score
      FROM r
    """


# ------------------------------------------- vocab truncation OOV sweep ----


def vocab_truncation_sweep(
    df: DataFrame,
    text_col: str = "text",
    sizes: tuple[int, ...] = (500, 1000, 2000, 4000, 8000),
) -> DataFrame:
    """What OOV token rate does each candidate vocabulary size buy?
    Rank terms by corpus frequency (ties by term — deterministic), then
    for every candidate size report the token mass the top-k vocabulary
    covers and the OOV rate a tokenizer truncated there would pay. The
    sizing decision BEFORE training a tokenizer; pairs with
    ``olap.vocab_growth`` (how fast the vocabulary grows) and the
    fertility reports (what the chosen tokenizer actually costs).

    Scale: term counts are one partial-agg shuffle; the frequency rank
    uses the two-phase :func:`global_rank` (range-partitioned, no
    single-reducer window); the whole size grid is then ONE pass over
    the vocabulary-sized term table as parallel conditional sums (the
    grid multiplies agg columns, not rows — the oracle's cross join is
    definitional only).
    """
    tc = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ranked = global_rank(
        tc.withColumn("_negc", -F.col("c")),
        ["_negc", "term"],
        rank_col="rank",
    )
    aggs = [F.sum("c").cast("long").alias("total_tokens")]
    for k in sizes:
        aggs.append(
            F.sum(F.when(F.col("rank") <= int(k), F.col("c")).otherwise(0))
            .cast("long")
            .alias(f"cov_{int(k)}")
        )
    row = ranked.agg(*aggs)
    stack = ", ".join(f"{int(k)}L, cov_{int(k)}" for k in sizes)
    return row.select(
        F.expr(
            f"stack({len(sizes)}, {stack}) AS (vocab_size, covered_tokens)"
        ),
        "total_tokens",
    ).select(
        "vocab_size",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.lit(1.0) - F.col("covered_tokens") / F.col("total_tokens"), 9
        ).alias("oov_rate"),
    )


def vocab_truncation_sweep_sql(
    table: str = "documents",
    text_col: str = "text",
    sizes: tuple[int, ...] = (500, 1000, 2000, 4000, 8000),
) -> str:
    """DuckDB twin of :func:`vocab_truncation_sweep` — the definitional
    rank window + grid cross join."""
    grid = ", ".join(str(int(k)) for k in sizes)
    return f"""
      WITH t AS (
        SELECT unnest(string_split({text_col}, ' ')) AS term FROM {table}
      ),
      tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS c
        FROM t WHERE term <> '' GROUP BY term
      ),
      r AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rank
        FROM tc
      ),
      d AS (SELECT CAST(unnest([{grid}]) AS BIGINT) AS vocab_size)
      SELECT d.vocab_size,
             CAST(sum(CASE WHEN r.rank <= d.vocab_size THEN r.c ELSE 0 END)
                  AS BIGINT) AS covered_tokens,
             CAST(sum(r.c) AS BIGINT) AS total_tokens,
             round(1 - CAST(sum(CASE WHEN r.rank <= d.vocab_size
                                     THEN r.c ELSE 0 END) AS DOUBLE)
                     / sum(r.c), 9) AS oov_rate
      FROM r CROSS JOIN d
      GROUP BY d.vocab_size
    """
