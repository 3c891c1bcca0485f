"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Not in the reference (Bistro has no scalar function library at all —
SURVEY.md §2.5); these are the north-rule training-pipeline extensions.
Everything is native Catalyst (whole-stage codegen, zero Python) and each
formula is chosen to be *bit-reproducible in ANSI SQL* so the DuckDB
oracles can verify exact equality:

- counts use the length-minus-replace trick (no regex dialect drift),
- word split is on a single literal space,
- the only hash is md5 (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker substrings per language for the n-gram-ish language-ID heuristic;
# spaces included so they match whole words mid-sentence.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " los "],
}

STOPWORDS = [" the ", " a ", " of ", " and ", " to "]


def substr_count(text: Column | str, marker: str) -> Column:
    """Occurrences of ``marker`` in ``text`` via length/replace — exact and
    engine-portable (SQL: (length(t)-length(replace(t,m,'')))/length(m))."""
    t = F.col(text) if isinstance(text, str) else text
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("int")


def word_count(text: Column | str) -> Column:
    """Whitespace token count (single-space split, portable)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(t, " "))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit counts per candidate language."""
    return {
        lang: sum(
            (substr_count(text, m) for m in markers), start=F.lit(0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_pred(text: Column | str) -> Column:
    """argmax language with deterministic tie-break (declaration order) —
    expressible as a CASE chain in SQL."""
    scores = lang_scores(text)
    langs = list(scores)
    pred: Column = F.lit(langs[-1])
    # build CASE from last to first so earlier langs win ties
    for lang in reversed(langs[:-1]):
        others = [scores[o] for o in langs if o != lang]
        cond = None
        for o in others:
            c = scores[lang] >= o
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def stopword_count(text: Column | str) -> Column:
    return sum((substr_count(text, s) for s in STOPWORDS), start=F.lit(0))


def quality_score(text: Column | str) -> Column:
    """Deterministic quality heuristic: stopword density + mean word length
    band. All-integer inputs, double output — portable bit-for-bit."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    n_words = word_count(t)
    stop = stopword_count(t)
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # exact: ints → double
    return (
        (stop / n_words) * F.lit(2.0)
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 8.0), 1.0).otherwise(0.0)
    ).alias("quality")


def fingerprint(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 (identical in every engine)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(t)


def winnow_fingerprint(
    text: Column | str, gram_n: int = 3, window: int = 4
) -> Column:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003 — the
    MOSS scheme): hash every word ``gram_n``-gram as it rolls over the
    document, keep the minimum hash of each sliding window of ``window``
    consecutive gram hashes, return the distinct mins sorted
    (array<long>). Guarantees any shared run of ~window+gram_n-1 words
    between two documents shares a fingerprint element — the rolling-hash
    dedup/overlap primitive. Native Catalyst; md5 word-hash keeps it
    bit-identical in the DuckDB oracle."""
    from bistro_spark.operators.dedup import word_hash

    t = F.col(text) if isinstance(text, str) else text
    words = F.split(t, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (gram_n - 1), F.lit(1))),
        lambda i: word_hash(F.concat_ws(" ", F.slice(words, i, gram_n))),
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(grams) - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(grams, i, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprint_sql(
    text_expr: str = "text", gram_n: int = 3, window: int = 4
) -> str:
    """The identical winnowing fingerprint as DuckDB SQL."""
    gram_hash = (
        "CAST(concat('0x', substr(md5(array_to_string("
        f"wrd[i:i+{gram_n - 1}], ' ')), 1, 8)) AS BIGINT)"
    )
    return f"""(
      SELECT list_sort(list_distinct(list_transform(
               range(1, greatest(len(grm) - {window - 1}, 1) + 1),
               i -> list_min(grm[i:i+{window - 1}]))))
      FROM (
        SELECT list_transform(
                 range(1, greatest(len(wrd) - {gram_n - 1}, 1) + 1),
                 i -> {gram_hash}) AS grm
        FROM (SELECT string_split({text_expr}, ' ') AS wrd)
      )
    )"""


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All features in one pass (single projection, codegen'd)."""
    return df.select(
        "*",
        word_count(text_col).alias("n_words"),
        stopword_count(text_col).alias("n_stop"),
        quality_score(text_col).alias("quality"),
        lang_pred(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp_md5"),
    )


def lang_pred_sql(text_expr: str = "text") -> str:
    """The identical lang_pred as ANSI SQL (oracle side)."""

    def cnt(m: str) -> str:
        return (
            f"CAST((length({text_expr}) - length(replace({text_expr}, '{m}', '')))"
            f" / {len(m)} AS INTEGER)"
        )

    score = {
        lang: " + ".join(cnt(m) for m in ms) for lang, ms in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    case = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        conds = " AND ".join(
            f"({score[lang]}) >= ({score[o]})" for o in langs if o != lang
        )
        case = f"CASE WHEN {conds} THEN '{lang}' ELSE {case} END"
    return case


def substr_count_sql(text_expr: str, marker: str) -> str:
    return (
        f"CAST((length({text_expr}) - length(replace({text_expr}, '{marker}', '')))"
        f" / {len(marker)} AS INTEGER)"
    )


def stopword_count_sql(text_expr: str = "text") -> str:
    return " + ".join(substr_count_sql(text_expr, s) for s in STOPWORDS)


def quality_score_sql(text_expr: str = "text") -> str:
    n_words = f"len(string_split({text_expr}, ' '))"
    mean_wlen = f"(length({text_expr}) - ({n_words} - 1)) / {n_words}"
    return (
        f"(({stopword_count_sql(text_expr)}) / {n_words}) * 2.0 + "
        f"CASE WHEN ({mean_wlen}) >= 3.0 AND ({mean_wlen}) <= 8.0 "
        f"THEN 1.0 ELSE 0.0 END"
    )
