"""Training-data curation operators: deterministic stratified sampling,
eval-set decontamination, corpus vocabulary/TF-IDF stats, and exact/approx
length-distribution reports.

These are the steps of a large-scale LLM training-data pipeline that sit
*between* quality filtering (operators/text.py) and dedup (operators/dedup.py):
decide how much of each stratum to keep, remove eval-set contamination, and
report what the resulting corpus looks like.

Design notes for the 100 TB case (the reference has no analog of these; the
bistro calculus rows they extend are calc (C2) for the row-level hash / gram
columns and accu (C5) for the grouped reports):

- ``hash_sample`` is a pure codegen filter (md5 prefix compare against a
  per-stratum literal threshold) — no shuffle, no RNG state, reproducible
  across retries/executors/restarts, and stable when the input is re-split.
  That determinism is the whole point at scale: a resumed job samples the
  SAME rows, and a bigger cluster samples the SAME corpus.
- ``contamination`` broadcasts the eval-gram set (eval sets are ~10^5 grams
  — tiny next to a 100 TB train corpus) so the train side is scanned once,
  map-side, with no shuffle of the exploded grams. Only when the eval side
  is genuinely large does the fallback shuffle join engage (Spark/AQE picks
  it when the broadcast threshold is exceeded).
- ``top_terms`` ranks by (tf DESC, term ASC) — integer+string ordering
  only, so the top-k frontier is deterministic and oracle-reproducible;
  tf-idf is emitted as a rounded *report column*, never used as a sort key
  (two libm ``ln`` implementations may differ in the last ulp).
- ``length_stats(exact=True)`` uses Spark's exact ``percentile`` (sort-based
  per group — fine up to ~10^9 rows/group); ``exact=False`` switches to
  ``approx_percentile`` (t-digest-ish GK sketch, mergeable map-side, the
  100 TB path) with identical output schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bistro_spark.operators.dedup import ngram_set, ngram_set_sql

# ------------------------------------------------- stratified hash sample ----


def _hex_threshold(rate: float, digits: int = 2) -> str:
    """Map a keep-rate in [0,1] to a lexical hex-prefix threshold.

    With 2 hex digits the rate granularity is 1/256; md5's prefix bytes are
    uniform, so P(prefix < threshold) = threshold/256.
    """
    buckets = 16 ** digits
    t = max(0, min(buckets, round(rate * buckets)))
    if t >= buckets:
        # rate 1.0: a threshold lexically above every hex prefix ('g' > 'f')
        return "g"
    return format(t, f"0{digits}x")


def hash_sample(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the first two hex
    chars of md5(key) fall under the stratum's threshold.

    ``rates`` maps stratum value -> keep rate (e.g. downsample the dominant
    language). Rows in strata not listed keep ``default_rate``. Pure
    narrow filter: no shuffle, no RNG, repeatable on any cluster shape.
    """
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    thr: Column = F.lit(_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def hash_sample_sql(
    key_expr: str,
    rates: dict[str, float],
    strata_expr: str,
    default_rate: float = 1.0,
) -> str:
    """WHERE-clause twin of :func:`hash_sample` for the DuckDB oracle
    (md5 of the decimal string renders identically in both engines)."""
    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN '{_hex_threshold(r)}'"
        for s, r in sorted(rates.items())
    )
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, 2) < "
        f"(CASE {cases} ELSE '{_hex_threshold(default_rate)}' END)"
    )


# ---------------------------------------------------------- contamination ----


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Eval-set decontamination scan: for every train document, count how
    many of its distinct word n-grams appear anywhere in the eval set.

    Returns (id, n_collisions) for contaminated documents only
    (n_collisions >= 1); the caller anti-joins this against the corpus to
    drop or audit them. The eval-gram set is broadcast — the 100 TB train
    side never shuffles; each partition probes a shared hash set map-side.
    """
    eval_grams = (
        eval_df.select(
            F.explode(ngram_set(F.col(text_col), n=n)).alias("gram")
        )
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode(ngram_set(F.col(text_col), n=n)).alias("gram"),
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_collisions"))
    )


def contamination_sql(
    train_pred: str,
    eval_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> str:
    """DuckDB twin of :func:`contamination` over one table split by two
    predicates (train side / eval side)."""
    gs = ngram_set_sql(text_col, n=n)
    return f"""
      WITH eval_grams AS (
        SELECT DISTINCT unnest({gs}) AS gram
        FROM {table} WHERE {eval_pred}
      ),
      train_grams AS (
        SELECT {id_col}, unnest({gs}) AS gram
        FROM {table} WHERE {train_pred}
      )
      SELECT t.{id_col} AS {id_col},
             CAST(count(*) AS BIGINT) AS n_collisions
      FROM train_grams t JOIN eval_grams e USING (gram)
      GROUP BY t.{id_col}
    """


# ------------------------------------------------------------- vocabulary ----


def top_terms(
    df: DataFrame,
    group_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus terms per group by term frequency, with document
    frequency and smoothed tf-idf as report columns.

    Rank ordering is (tf DESC, term ASC) — integers and strings only, so
    the frontier is deterministic; idf = ln((N+1)/(df+1)) is emitted
    rounded, never compared. Two aggregations (term-level df over the
    corpus, (group, term)-level tf) + a per-group top-k window; the window
    input is already term-aggregated, i.e. vocabulary-sized, not
    corpus-sized.
    """
    from pyspark.sql import Window

    n_docs = df.agg(
        F.countDistinct(id_col).cast("long").alias("_n_docs")
    )
    terms = df.select(
        F.col(id_col),
        F.col(group_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy(group_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = terms.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("df")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("tf").desc(), F.col("term").asc())
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            "term",
            "tf",
            "df",
            "rank",
            F.round(
                F.col("tf")
                * F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )


def top_terms_sql(
    group_col: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
      WITH terms AS (
        SELECT {id_col}, {group_col},
               unnest(string_split({text_col}, ' ')) AS term
        FROM {table}
      ),
      tf AS (
        SELECT {group_col}, term, CAST(count(*) AS BIGINT) AS tf
        FROM terms WHERE term <> '' GROUP BY 1, 2
      ),
      dfreq AS (
        SELECT term, CAST(count(DISTINCT {id_col}) AS BIGINT) AS df
        FROM terms WHERE term <> '' GROUP BY 1
      ),
      n AS (SELECT count(DISTINCT {id_col}) AS n_docs FROM {table}),
      ranked AS (
        SELECT tf.{group_col}, tf.term, tf.tf, dfreq.df,
               CAST(row_number() OVER (
                 PARTITION BY tf.{group_col}
                 ORDER BY tf.tf DESC, tf.term ASC) AS INTEGER) AS rank,
               round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6)
                 AS tfidf
        FROM tf JOIN dfreq USING (term), n
      )
      SELECT {group_col}, term, tf, df, rank, tfidf
      FROM ranked WHERE rank <= {k}
    """


# ------------------------------------------------------------ length stats ----


def length_stats(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """Per-group corpus length report: doc count, total words, and the
    p50/p90/p99 words-per-document quantiles.

    ``exact=True`` is the oracle-checkable path (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: linear interpolation on the sorted group).
    ``exact=False`` swaps in ``approx_percentile`` — a mergeable sketch
    that never sorts or collects a group, the variant to run at 100 TB —
    with the same schema (tests pin it within tolerance of exact).
    """
    n_words = F.size(F.split(F.col(text_col), " ")).cast("long")
    pfn = "percentile" if exact else "approx_percentile"
    pcts = F.expr(f"{pfn}(_n_words, array(0.5D, 0.9D, 0.99D))")
    return (
        df.select(F.col(group_col), n_words.alias("_n_words"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_n_words").cast("long").alias("total_words"),
            F.round(pcts[0].cast("double"), 6).alias("p50_words"),
            F.round(pcts[1].cast("double"), 6).alias("p90_words"),
            F.round(pcts[2].cast("double"), 6).alias("p99_words"),
        )
    )


def length_stats_sql(
    group_col: str, table: str = "documents", text_col: str = "text"
) -> str:
    return f"""
      WITH w AS (
        SELECT {group_col},
               CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_words
        FROM {table}
      )
      SELECT {group_col},
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS total_words,
             round(CAST(quantile_cont(n_words, 0.5) AS DOUBLE), 6)
               AS p50_words,
             round(CAST(quantile_cont(n_words, 0.9) AS DOUBLE), 6)
               AS p90_words,
             round(CAST(quantile_cont(n_words, 0.99) AS DOUBLE), 6)
               AS p99_words
      FROM w GROUP BY {group_col}
    """


# ---------------------------------------------------------- chunking ----


def chunk_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Context-window chunking: split each document into word spans of
    ``size`` with ``overlap`` words shared between consecutive chunks (the
    RAG / training-prep striding scheme).

    Emits one row per (doc, chunk): 0-based ``chunk_id``, 1-based
    inclusive word span [start_word, end_word], the chunk word count, and
    the chunk text itself. A doc of n words yields
    1 + ceil(max(n - size, 0) / (size - overlap)) chunks; the final chunk
    may be short; every word belongs to >= 1 chunk. Pure codegen
    (sequence + explode + slice) — the explode multiplies rows ~n/step x,
    which is the op's output, not overhead; no shuffle is introduced.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    step = size - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(step))
    ).cast("int")
    out = df.select(
        F.col(id_col),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        words.alias("_w"),
    )
    start = F.col("chunk_id") * step + 1
    end = F.least(start + (size - 1), F.col("_n"))
    return out.select(
        id_col,
        "chunk_id",
        start.cast("int").alias("start_word"),
        end.cast("int").alias("end_word"),
        (end - start + 1).cast("int").alias("n_words_chunk"),
        F.concat_ws(
            " ", F.slice(F.col("_w"), start, end - start + 1)
        ).alias("chunk_text"),
    )


def chunk_spans_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
) -> str:
    """DuckDB twin of :func:`chunk_spans`."""
    step = size - overlap
    return f"""
      WITH w AS (
        SELECT {id_col}, string_split({text_col}, ' ') AS wrd FROM {table}
      ),
      c AS (
        SELECT {id_col}, wrd, len(wrd) AS n,
               unnest(range(0, 1 + CAST(ceil(greatest(len(wrd) - {size}, 0)
                                             / {step}.0) AS INTEGER)))
                 AS chunk_id
        FROM w
      )
      SELECT {id_col},
             CAST(chunk_id AS INTEGER) AS chunk_id,
             CAST(chunk_id * {step} + 1 AS INTEGER) AS start_word,
             CAST(least(chunk_id * {step} + {size}, n) AS INTEGER)
               AS end_word,
             CAST(least(chunk_id * {step} + {size}, n)
                  - (chunk_id * {step} + 1) + 1 AS INTEGER)
               AS n_words_chunk,
             array_to_string(
               wrd[chunk_id * {step} + 1 : least(chunk_id * {step} + {size}, n)],
               ' ') AS chunk_text
      FROM c
    """


# ------------------------------------------------------ sequence packing ----


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_words",
    capacity: int = 256,
    n_shards: int = 4,
) -> DataFrame:
    """Greedy no-split sequence packing (the training-batch "packing" step:
    concatenate whole documents into fixed-capacity token buffers).

    Documents are sharded by ``id % n_shards`` and packed within each
    shard in id order: a doc joins the current pack if it fits, else opens
    the next pack (a doc longer than ``capacity`` gets a pack to itself).
    Returns (id, shard, pack_id, offset, len) — pack_id is per-shard.

    The fold is inherently sequential per shard, so this is a grouped-map
    ``applyInPandas`` kernel: each shard's rows arrive as one pandas frame,
    the greedy scan is a single numpy pass, and shards pack in parallel.
    At 100 TB, ``n_shards`` is sized to executor parallelism (thousands) —
    packing quality is unaffected because packs never span shards by
    construction, and determinism is exact: the same (id, len) set packs
    identically on any cluster shape. Global (unsharded) packing of a
    distributed corpus is not parallelizable without changing semantics.
    """
    import pandas as pd

    shard_expr = (F.col(id_col) % n_shards).cast("int").alias("shard")
    src = df.select(
        F.col(id_col), shard_expr, F.col(len_col).cast("long").alias("len")
    )
    schema = (
        f"{id_col} long, shard int, pack_id long, offset long, len long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        lens = pdf["len"].to_numpy()
        pack_ids = []
        offsets = []
        pack_id, end = 0, 0
        first = True
        for ln in lens:
            if first:
                pack_id, off = 0, 0
                first = False
            elif end + ln <= capacity:
                off = end
            else:
                pack_id, off = pack_id + 1, 0
            end = off + ln
            pack_ids.append(pack_id)
            offsets.append(off)
        pdf["pack_id"] = pack_ids
        pdf["offset"] = offsets
        return pdf[[id_col, "shard", "pack_id", "offset", "len"]]

    return src.groupBy("shard").applyInPandas(pack, schema=schema)


def pack_sequences_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    len_expr: str = "len(string_split(text, ' '))",
    capacity: int = 256,
    n_shards: int = 4,
) -> str:
    """DuckDB twin of :func:`pack_sequences`: the same greedy fold as a
    recursive CTE stepping through each shard's rows in id order."""
    return f"""
      WITH RECURSIVE src AS (
        SELECT {id_col},
               CAST({id_col} % {n_shards} AS INTEGER) AS shard,
               CAST({len_expr} AS BIGINT) AS len,
               row_number() OVER (
                 PARTITION BY {id_col} % {n_shards} ORDER BY {id_col}
               ) AS rn
        FROM {table}
      ),
      packed AS (
        SELECT {id_col}, shard, len, rn,
               CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS "offset"
        FROM src WHERE rn = 1
        UNION ALL
        SELECT s.{id_col}, s.shard, s.len, s.rn,
               CASE WHEN p."offset" + p.len + s.len <= {capacity}
                    THEN p.pack_id ELSE p.pack_id + 1 END,
               CASE WHEN p."offset" + p.len + s.len <= {capacity}
                    THEN p."offset" + p.len ELSE 0 END
        FROM src s JOIN packed p
          ON s.shard = p.shard AND s.rn = p.rn + 1
      )
      SELECT {id_col}, shard, pack_id, "offset", len FROM packed
    """
