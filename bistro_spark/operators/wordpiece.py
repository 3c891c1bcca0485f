"""WordPiece subword tokenizer (train + encode), Spark-first.

The third learned-subword family production pipelines deploy, next to
BPE (``operators/bpe.py``) and unigram-LM (``operators/unigram.py``):
Schuster & Nakajima 2012 / Wu et al. 2016's WordPiece, the BERT-family
tokenizer. Two structural differences from its siblings drive the
design:

- **Training** is a BPE-shaped greedy merge loop, but the pair score is
  *likelihood gain* ``count(ab) / (count(a) * count(b))`` instead of raw
  pair frequency. Same Spark/driver split as BPE: the corpus-scale part
  is ONE distributed word-frequency aggregation (``bpe.word_frequencies``
  — the word-TYPE table is vocabulary-sized, never corpus-sized), then
  the inherently-sequential merge loop runs driver-side over that dict.
  Determinism on any cluster shape: scores are FRACTIONS of exact BIGINT
  counts, compared by integer cross-multiplication — no float division
  anywhere in the argmax — with ties broken by pair lexicographic ASC.

- **Encoding** is greedy longest-match-first (NOT a merge replay and NOT
  a Viterbi DP): per word, repeatedly take the longest vocabulary piece
  matching at the cursor — word-initial pieces match bare, word-internal
  pieces carry the ``##`` continuation prefix — and if NO piece matches
  at some cursor (or the word exceeds ``max_chars``), the WHOLE word
  becomes ``[UNK]``. One map-only Arrow stage with a per-batch word memo
  (Zipf reuse, as in ``bpe_encode``); the vocabulary ships via closure.

Cross-engine exactness: greedy longest-match is DETERMINISTIC (two
distinct vocab pieces matching the same cursor position are different
strings, hence different lengths — the longest is unique), so unlike
BPE's iterative fixpoint the whole encode is hash-checkable against a
set-oriented SQL twin: :func:`wordpiece_encode_fixed_sql` replays the
cursor walk as a recursive CTE that keeps exactly ONE row per word per
step, selecting the longest match via a NOT EXISTS guard (no window
functions inside the recursive term). Trained vocabularies stay
pytest-pinned (reference-implementation parity, UNK semantics,
round-trip losslessness, cluster-shape invariance), mirroring the
bpe_encode / bpe_encode_fixed split.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bistro_spark.operators.bpe import word_frequencies

CONT = "##"  # continuation prefix for word-internal pieces (BERT-style)
UNK = "[UNK]"  # whole-word fallback when no piece matches at a cursor
MAX_WORD_CHARS = 100  # HF default: longer words become [UNK] outright


# ------------------------------------------------------------- encoding --


def _vocab_maps(vocab: list[str]) -> tuple[set[str], set[str], int]:
    """Split a WordPiece vocabulary into (word-initial bodies,
    continuation bodies, max body length). ``[UNK]`` is control, not a
    matchable piece."""
    initial = {p for p in vocab if not p.startswith(CONT) and p != UNK}
    cont = {p[len(CONT):] for p in vocab if p.startswith(CONT) and len(p) > len(CONT)}
    max_len = max((len(p) for p in initial | cont), default=1)
    return initial, cont, max_len


def encode_word(
    word: str,
    initial: set[str],
    cont: set[str],
    max_len: int,
    max_chars: int = MAX_WORD_CHARS,
) -> list[str]:
    """Reference single-word encoder: greedy longest-match-first with
    whole-word ``[UNK]`` fallback (HF ``WordpieceTokenizer`` semantics)."""
    n = len(word)
    if n == 0:
        return []
    if n > max_chars:
        return [UNK]
    out: list[str] = []
    pos = 0
    while pos < n:
        table = initial if pos == 0 else cont
        end = min(n, pos + max_len)
        while end > pos and word[pos:end] not in table:
            end -= 1
        if end == pos:
            return [UNK]
        out.append(word[pos:end] if pos == 0 else CONT + word[pos:end])
        pos = end
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: list[str] | None = None,
    max_chars: int = MAX_WORD_CHARS,
) -> DataFrame:
    """Encode each document into WordPiece pieces under ``vocab``:
    (id, n_pieces, pieces) with ``pieces`` the space-joined piece
    sequence (``##`` marking continuations — lossless round-trip via
    :func:`wordpiece_decode_pieces` for fully-covered words). One
    map-only Arrow stage; per-batch word memo; the vocabulary ships via
    closure (vocab-sized). ``keep`` passes extra input columns through
    unchanged, as in ``bpe_encode`` — downstream per-group stats ride
    the same map stage instead of re-joining on the id."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    initial, cont, max_len = _vocab_maps(vocab)

    @pandas_udf("array<string>")
    def encode(texts):
        memo: dict[str, list[str]] = {}

        def enc_doc(t):
            out: list[str] = []
            for w in (t or "").split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, initial, cont, max_len, max_chars)
                out.extend(got)
            return out

        return pd.Series([enc_doc(t) for t in texts])

    enc = df.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("_pieces"),
        *[F.col(c) for c in (keep or [])],
    )
    return enc.select(
        id_col,
        F.size("_pieces").cast("int").alias("n_pieces"),
        F.concat_ws(" ", "_pieces").alias("pieces"),
        *(keep or []),
    )


def wordpiece_decode_pieces(pieces: str) -> str:
    """Inverse of the piece serialization for fully-covered words: a
    piece without the ``##`` prefix opens a new word, ``##`` pieces
    extend it. ``[UNK]`` decodes to itself (the original is lost by
    definition)."""
    words: list[str] = []
    for p in pieces.split(" "):
        if not p:
            continue
        if p.startswith(CONT) and words:
            words[-1] += p[len(CONT):]
        else:
            words.append(p)
    return " ".join(words)


# ------------------------------------------------------------- training --


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_words: int = 50_000,
) -> list[str]:
    """Learn a WordPiece vocabulary: seed with the corpus alphabet
    (word-initial chars bare, word-internal chars ``##``-prefixed), then
    greedily merge the adjacent pair with the highest likelihood gain
    ``count(ab) / (count(a) * count(b))`` until ``vocab_size`` pieces
    (or no pair repeats). Returns the vocabulary for
    :func:`wordpiece_encode`: ``[UNK]`` + alphabet (sorted) + merged
    pieces in creation order.

    See the module docstring for the distributed/driver split. The
    argmax compares exact count fractions by integer cross-
    multiplication (``Fraction``), never float division, and breaks ties
    by pair lexicographic ASC — same corpus, same vocabulary, on any
    cluster shape / retry."""
    wf = word_frequencies(df, text_col=text_col, max_words=max_words)
    vocab_words: dict[tuple[str, ...], int] = {}
    for w, n in wf:
        sym = tuple([w[0]] + [CONT + c for c in w[1:]]) if w else ()
        if sym:
            vocab_words[sym] = vocab_words.get(sym, 0) + n
    alphabet = sorted({s for sym in vocab_words for s in sym})
    vocab: list[str] = [UNK] + alphabet

    def merged_form(a: str, b: str) -> str:
        return a + b[len(CONT):]

    while len(vocab) < vocab_size:
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab_words.items():
            for s in sym:
                sym_counts[s] = sym_counts.get(s, 0) + n
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        repeated = {p: c for p, c in pair_counts.items() if c >= 2}
        if not repeated:
            break
        best = min(
            repeated.items(),
            key=lambda kv: (
                -Fraction(kv[1], sym_counts[kv[0][0]] * sym_counts[kv[0][1]]),
                kv[0],
            ),
        )[0]
        vocab.append(merged_form(*best))
        joined = merged_form(*best)
        vocab_words = {
            _merge_sym(sym, best, joined): n for sym, n in vocab_words.items()
        }
    return vocab


def _merge_sym(
    sym: tuple[str, ...], pair: tuple[str, str], joined: str
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


# ------------------------------------------ fixed-vocab encode (oracle) --

# Hand-written vocabulary over [a-z]: every letter is present both
# word-initially and as a ##-continuation (so the corpus tables never hit
# [UNK] — the UNK branch is pinned by pytest on adversarial inputs), plus
# multi-char pieces at both positions so the longest-match choice is
# non-trivial at cursor 0 AND mid-word.
FIXED_WORDPIECE_VOCAB: list[str] = [
    UNK,
    *list("abcdefghijklmnopqrstuvwxyz"),
    *[CONT + c for c in "abcdefghijklmnopqrstuvwxyz"],
    # word-initial multi-char pieces
    "th", "the", "ha", "hash", "ro", "row", "tab", "val", "wind",
    "str", "scan", "qu", "gr", "col", "cust", "so", "sor", "ba",
    # continuation multi-char pieces
    "##le", "##ue", "##ow", "##sh", "##ble", "##alue", "##ash", "##er",
    "##dow", "##eam", "##ery", "##umn", "##omer", "##in", "##ta", "##rt",
    "##ch", "##an", "##all", "##ine", "##oup", "##art", "##ig",
    "##ast", "##up", "##ey", "##ata", "##rge", "##ter", "##der", "##oin",
]


def wordpiece_encode_fixed_sql(
    table: str = "documents",
    vocab: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = MAX_WORD_CHARS,
) -> str:
    """DuckDB twin of :func:`wordpiece_encode` under a FIXED vocabulary —
    the greedy cursor walk replayed as a recursive CTE over the DISTINCT
    word types, then joined back to per-document word positions.

    Exactness argument (why one row per word per step): at a given
    cursor the longest matching piece is UNIQUE — two distinct pieces of
    equal length matching the same substring would be equal strings —
    so the LEFT JOIN + NOT-EXISTS(longer match) filter yields exactly
    one successor row (the no-match row carries ``[UNK]`` and jumps the
    cursor to the end, terminating that word). No window functions or
    aggregates appear in the recursive term, which DuckDB restricts;
    the argmax is the NOT EXISTS guard against the non-recursive vocab
    relation. ``substr``/``length`` are character-based in DuckDB,
    matching Python slicing on multi-byte text."""
    vocab = FIXED_WORDPIECE_VOCAB if vocab is None else vocab
    rows = []
    seen = set()
    for p in vocab:
        if p == UNK or p in seen:
            continue
        seen.add(p)
        if p.startswith(CONT):
            body, tok, is_cont = p[len(CONT):], p, "TRUE"
        else:
            body, tok, is_cont = p, p, "FALSE"
        b = body.replace("'", "''")
        t = tok.replace("'", "''")
        rows.append(f"('{b}', '{t}', {is_cont})")
    vocab_values = ", ".join(rows)
    return f"""
      WITH RECURSIVE
      vocab(body, tok, is_cont) AS (VALUES {vocab_values}),
      words AS (
        SELECT DISTINCT w
        FROM (SELECT unnest(string_split_regex({text_col}, '\\s+')) AS w
              FROM {table})
        WHERE w <> ''
      ),
      seg AS (
        SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces
        FROM words WHERE length(w) <= {max_chars}
        UNION ALL
        SELECT s.w,
               CASE WHEN v.tok IS NULL THEN length(s.w)
                    ELSE s.pos + length(v.body) END AS pos,
               CASE WHEN v.tok IS NULL THEN ['{UNK}']
                    ELSE list_append(s.pieces, v.tok) END AS pieces
        FROM seg s LEFT JOIN vocab v
          ON v.is_cont = (s.pos > 0)
         AND substr(s.w, s.pos + 1, length(v.body)) = v.body
        WHERE s.pos < length(s.w)
          AND (v.tok IS NULL OR NOT EXISTS (
                SELECT 1 FROM vocab v2
                WHERE v2.is_cont = (s.pos > 0)
                  AND substr(s.w, s.pos + 1, length(v2.body)) = v2.body
                  AND length(v2.body) > length(v.body)))
      ),
      perword AS (
        SELECT w, pieces FROM seg WHERE pos = length(w)
        UNION ALL
        SELECT w, ['{UNK}'] AS pieces
        FROM words WHERE length(w) > {max_chars}
      ),
      docwords AS (
        SELECT {id_col}, w, i
        FROM (SELECT {id_col},
                     unnest(string_split_regex({text_col}, '\\s+')) AS w,
                     unnest(range(1, len(string_split_regex({text_col}, '\\s+')) + 1)) AS i
              FROM {table})
        WHERE w <> ''
      ),
      agg AS (
        SELECT d.{id_col},
               CAST(sum(len(p.pieces)) AS INT) AS n_pieces,
               string_agg(array_to_string(p.pieces, ' '), ' ' ORDER BY d.i)
                 AS pieces
        FROM docwords d JOIN perword p USING (w)
        GROUP BY d.{id_col}
      )
      SELECT t.{id_col}, coalesce(a.n_pieces, 0) AS n_pieces,
             coalesce(a.pieces, '') AS pieces
      FROM {table} t LEFT JOIN agg a USING ({id_col})
    """


def wordpiece_fertility(
    df: DataFrame,
    vocab: list[str] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group fertility of the WordPiece tokenizer: ONE map-only
    Arrow encode (word/char counts ride the same projection via
    ``keep``) into ONE partial-aggregated groupBy — same shape and
    guarantees as ``bpe.fertility_stats`` / ``unigram_fertility``."""
    vocab = FIXED_WORDPIECE_VOCAB if vocab is None else vocab
    pre = df.select(
        id_col,
        text_col,
        F.col(group_col),
        F.length(text_col).cast("long").alias("_chars"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
        .cast("long")
        .alias("_words"),
    )
    enc = wordpiece_encode(pre, vocab, id_col, text_col, keep=[group_col, "_chars", "_words"])
    agg = enc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_words").cast("long").alias("n_words"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "n_words",
        "n_chars",
        "n_pieces",
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                F.col("n_pieces") / F.col("n_words")
            ),
            6,
        ).alias("fertility"),
        F.round(
            F.when(F.col("n_pieces") == 0, F.lit(0.0)).otherwise(
                F.col("n_chars") / F.col("n_pieces")
            ),
            6,
        ).alias("chars_per_piece"),
        F.round(F.col("n_pieces") / F.col("n_docs"), 6).alias("pieces_per_doc"),
    )


def wordpiece_fertility_sql(
    table: str = "documents",
    vocab: list[str] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`wordpiece_fertility`: reuse the recursive
    fixed-vocab encode for per-doc piece counts, join back to the base
    table for word/char counts, aggregate per group — same formulation
    as ``fertility_stats_sql`` / ``unigram_fertility_sql``."""
    enc = wordpiece_encode_fixed_sql(table, vocab, id_col, text_col)
    return f"""
      WITH enc AS ({enc}),
      perdoc AS (
        SELECT d.{group_col} AS grp,
               len(list_filter(string_split_regex(d.{text_col}, '\\s+'),
                               w -> w <> '')) AS words,
               length(d.{text_col}) AS chars,
               e.n_pieces
        FROM {table} d JOIN enc e USING ({id_col})
      ),
      agg AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(words) AS BIGINT) AS n_words,
               CAST(sum(chars) AS BIGINT) AS n_chars,
               CAST(sum(n_pieces) AS BIGINT) AS n_pieces
        FROM perdoc GROUP BY grp
      )
      SELECT grp AS {group_col}, n_docs, n_words, n_chars, n_pieces,
             round(CASE WHEN n_words = 0 THEN 0.0
                        ELSE CAST(n_pieces AS DOUBLE) / n_words END,
                   6) AS fertility,
             round(CASE WHEN n_pieces = 0 THEN 0.0
                        ELSE CAST(n_chars AS DOUBLE) / n_pieces END,
                   6) AS chars_per_piece,
             round(CAST(n_pieces AS DOUBLE) / n_docs, 6) AS pieces_per_doc
      FROM agg
    """
