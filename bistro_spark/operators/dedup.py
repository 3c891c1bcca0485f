"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. North-rule training-pipeline extensions (the
reference has nothing comparable; its project column C4 is the closest —
distinct-key extraction).

Scale design:
- exact dedup = hash groupBy on a content fingerprint (md5) — one shuffle
  keyed by the hash, perfectly balanced (hash keys are uniform even when
  the data is skewed).
- MinHash+LSH = per-row signature (narrow, codegen'd) → explode to
  (band_id, band_hash) → self-join *within band buckets only*; at 100 TB
  the band join shuffles only (bands × docs) small rows and AQE splits hot
  buckets. Never a quadratic all-pairs compare.
- SimHash = per-row 16/32-bit sketch; near-dup candidates = equal sketch
  (or Hamming≤d via multi-probe over bit-flip neighborhoods).
- All hashes derive from md5 so the DuckDB oracle reproduces them exactly.

MinHash math: h_j(w) = (A_j * H(w) + B_j) mod P over word hashes
H(w) = int(md5(w)[:8], 16); signature_j = min over words. Standard
universal-hash MinHash (Broder 1997).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31-1 (Mersenne prime)
A0, B0 = 2_654_435_761, 0x9E3779B9  # deterministic per-j coefficient bases


def hash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (A_j, B_j) pairs, reproducible in SQL."""
    return [((A0 + 2 * j + 1) % P, (B0 * (j + 1)) % P) for j in range(k)]


def word_hash(word: Column) -> Column:
    """H(w) = first 8 md5 hex digits as int — engine-portable."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")


def word_hash_sql(word_expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({word_expr}), 1, 8)) AS BIGINT)"


# ------------------------------------------------------------ exact ------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: group by content hash, keep the smallest id.

    Returns (groups, survivors): groups = one row per distinct content with
    keep_id + dup count; survivors = input rows whose id is the keeper.
    """
    groups = df.groupBy(F.md5(F.col(text_col)).alias("fp")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups")
    )
    survivors = df.join(
        groups.select("keep_id"),
        df[id_col] == groups["keep_id"],
        "left_semi",
    )
    return groups, survivors


# ----------------------------------------------------------- minhash -----


def minhash_signature(
    df: DataFrame, text_col: str = "text", k: int = 16
) -> DataFrame:
    """Append ``sig`` array<long> of k MinHash values (native Catalyst:
    split → md5-hash per word → k affine min-reductions; no Python)."""
    words = F.split(F.col(text_col), " ")
    hashes = F.transform(words, lambda w: word_hash(w))
    sig = F.array(
        *[
            F.array_min(
                F.transform(hashes, lambda h: (h * F.lit(a) + F.lit(b)) % P)
            )
            for a, b in hash_coeffs(k)
        ]
    )
    return df.withColumn("sig", sig)


def minhash_sig_sql(text_expr: str, k: int = 16) -> str:
    """The identical signature as a DuckDB list expression."""
    h = word_hash_sql("w")
    mins = ", ".join(
        f"(SELECT min(({h} * {a} + {b}) % {P}) "
        f"FROM unnest(string_split({text_expr}, ' ')) AS t(w))"
        for a, b in hash_coeffs(k)
    )
    return f"[{mins}]"


def lsh_bands(
    sig_df: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Explode signatures to (band_id, band_key): band_key = md5 of the
    band's minhash values — docs sharing any band_key are candidates."""
    cols = []
    for b in range(bands):
        vals = [
            F.col("sig").getItem(b * rows_per_band + r)
            for r in range(rows_per_band)
        ]
        key = F.md5(F.concat_ws(",", *[v.cast("string") for v in vals]))
        cols.append(F.struct(F.lit(b).alias("band_id"), key.alias("band_key")))
    return sig_df.withColumn("band", F.explode(F.array(*cols))).select(
        "*", F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key")
    ).drop("band")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: distinct (id_a < id_b) sharing ≥1
    band bucket. The join is bucket-local — the scale path."""
    rows = k // bands
    banded = lsh_bands(minhash_signature(df, text_col, k), bands, rows).select(
        F.col(id_col).alias("id"), "band_id", "band_key"
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


# ----------------------------------------------------------- simhash -----


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash sketch: bit b set iff sum over words of ±1 (sign of bit b of
    H(w)) is positive. Near-dups have close sketches (Charikar 2002)."""
    words = F.split(F.col(text_col), " ")
    hashes = F.transform(words, lambda w: word_hash(w))
    bit_cols = []
    for b in range(bits):
        contrib = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    return df.withColumn("simhash", sum(bit_cols, start=F.lit(0)).cast("long"))


def simhash_sql(text_expr: str, bits: int = 16) -> str:
    h = word_hash_sql("w")
    terms = []
    for b in range(bits):
        terms.append(
            f"(CASE WHEN (SELECT sum(CASE WHEN (({h}) // {1 << b}) % 2 = 1 "
            f"THEN 1 ELSE -1 END) "
            f"FROM unnest(string_split({text_expr}, ' ')) AS t(w)) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# ------------------------------------------------------ n-gram jaccard ----


def ngram_set(text: Column, n: int = 3) -> Column:
    """Distinct hashed word n-grams (sorted, so set ops are portable)."""
    words = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0))),
        lambda i: word_hash(F.concat_ws(" ", F.slice(words, i, n))),
    )
    return F.array_sort(F.array_distinct(grams))


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over two ngram-set columns: |∩| / |∪| (null-safe, 0 if both
    empty)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, 0.0).otherwise(inter / union)


# --------------------------------------------- embedding cosine near-dup --


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns — JVM-side zip_with +
    left-to-right aggregate in double (bit-reproducible order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def embedding_neardup_pairs(
    emb_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 8,
) -> DataFrame:
    """Embedding near-dup candidates at scale: random-hyperplane sign
    bucket (deterministic pseudo-hyperplanes) → exact cosine only within
    buckets. Avoids the quadratic all-pairs compare; cosine ≥ threshold
    filter applied after the bucket-local join."""
    bucketed = emb_df.withColumn(
        "bucket", _sign_bucket(F.col(vec_col), sign_bits)
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _sign_bucket(vec: Column, bits: int) -> Column:
    """Deterministic random-hyperplane LSH bucket: bit j = sign of
    dot(vec, h_j) with pseudo-hyperplane h_j[i] = frac((j*10007 + i) *
    0.6180339887) - 0.5 (Weyl sequence — no RNG state, same in any
    engine)."""
    terms = []
    for j in range(bits):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * (
                    ((F.lit(j * 10007).cast("double") + i) * 0.6180339887) % 1.0
                    - 0.5
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        terms.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(terms, start=F.lit(0))
