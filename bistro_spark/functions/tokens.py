"""Scalar functions over the token payload (tokens: array<int>).

The reference has NO scalar function library — every scalar op is a user
Java lambda passed to ``Column.java#calc`` (or an exp4j/EvalEx formula
string, ``formula/.../FormulaExp4j.java``).  Here the calc surface accepts
any Catalyst expression; these helpers are the token-specific vocabulary,
all JVM-side (higher-order array functions, whole-stage codegen) except the
explicitly-pandas variants kept as Arrow-path parity checks.

input_hint invariant: everything vectorized, no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def n_tok_native(tokens: str | Column = "tokens") -> Column:
    """Token count — F.size, pure Catalyst."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c)


def n_tok_pandas(tokens: str | Column = "tokens") -> Column:
    """Token count via Arrow — parity twin of the reference's per-row
    lambda (ColumnDefinitionCalc Evaluator), used in tests to prove the
    pandas calc path returns identical values to the native path.

    Built lazily (pandas_udf registration needs an active session).
    """
    udf = pandas_udf(lambda t: t.map(len).astype("int32"), "int")
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return udf(c)


def token_sum(tokens: str | Column = "tokens") -> Column:
    """Sum of token ids — F.aggregate (JVM fold, no shuffle, no Python)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))


def token_head(n: int, tokens: str | Column = "tokens") -> Column:
    """First n tokens — F.slice (context-window truncation primitive)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.slice(c, 1, n)


def token_fingerprint(tokens: str | Column = "tokens") -> Column:
    """Order-sensitive 64-bit content fingerprint of the token array.

    xxhash64 over the array value — exact-dup detection key. JVM-side,
    stable across partitionings (pure function of the value).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.xxhash64(c)


def token_ngrams(n: int, tokens: str | Column = "tokens") -> Column:
    """All n-grams of the token array as array<array<int>> — JVM-side via
    sequence+transform+slice (shingling primitive for Jaccard/MinHash)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(c) - (n - 1), F.lit(0))),
        lambda i: F.slice(c, i, n),
    )
