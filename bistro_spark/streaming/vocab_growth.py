"""Streaming twin of ``operators/olap.vocab_growth``: the Heaps-law
vocabulary-growth curve maintained live.

The batch operator's checkpoint is an md5 bucket of the DOC ID — a
property of the data, not of arrival — and a term's first-appearance
checkpoint is a MIN over the buckets of the documents containing it.
Min is commutative, associative, and idempotent, and the per-bucket
token counts are additive, so full-history parity with the batch curve
(and its fitted exponent) is EXACT at every trigger in ANY arrival
order.

State: one (term → first_bucket) entry per distinct term plus
#checkpoints token counters — vocabulary-bounded, which is exactly what
Heaps' law itself promises stays sublinear (the monitor measures the
growth of its own state). The report rebuilds the batch grid and the
decimal-summed log-log regression via the ENGINE, so rows hash-match
batch ``vocab_growth``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingVocabGrowth:
    """Feed per-trigger document deltas to :meth:`process_batch`; read
    the live Heaps curve + fit via :meth:`report` — same schema and
    rows as batch ``vocab_growth`` over everything seen."""

    def __init__(
        self,
        spark: SparkSession,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_checkpoints: int = 10,
        max_terms: int = 50_000_000,
    ):
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.nb = int(n_checkpoints)
        self.max_terms = int(max_terms)
        self._first: dict[str, int] = {}  # term -> min bucket seen
        self._tok: dict[int, int] = {}  # bucket -> token count
        self.batches_seen = 0

    # ------------------------------------------------------- recovery --
    def state_snapshot(self) -> dict:
        return {
            "first": dict(self._first),
            "tok": {str(k): v for k, v in self._tok.items()},
        }

    def restore_state(self, snapshot: dict) -> None:
        self._first = {str(k): int(v) for k, v in snapshot["first"].items()}
        self._tok = {int(k): int(v) for k, v in snapshot["tok"].items()}

    # ---------------------------------------------------------- fold --
    def process_batch(self, batch_df: DataFrame) -> int:
        """Absorb one trigger: per-term min bucket + per-bucket token
        counts, both reduced DISTRIBUTED-side before the driver merge
        (delta-vocabulary-sized collect, never delta-row-sized)."""
        self.batches_seen += 1
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.col(self.id_col).cast("string")), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % self.nb
        )
        terms = (
            batch_df.select(
                bucket.alias("b"),
                F.explode(F.split(F.col(self.text_col), " ")).alias("term"),
            )
            .filter(F.col("term") != "")
        )
        agg = terms.groupBy("term").agg(
            F.min("b").alias("fb"), F.count("*").cast("long").alias("c")
        )
        per_bucket = (
            terms.groupBy("b")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        )
        rows = agg.collect()
        if len(self._first) + len(rows) > self.max_terms:
            raise ValueError(
                f"StreamingVocabGrowth: term store exceeds "
                f"{self.max_terms}; frequency-prune or shard by term"
            )
        absorbed = 0
        for r in per_bucket:
            self._tok[int(r["b"])] = self._tok.get(int(r["b"]), 0) + int(
                r["n"]
            )
            absorbed += int(r["n"])
        for r in rows:
            t = r["term"]
            fb = int(r["fb"])
            cur = self._first.get(t)
            if cur is None or fb < cur:
                self._first[t] = fb
        return absorbed

    # -------------------------------------------------------- report --
    def report(self) -> DataFrame:
        """Engine-computed from the integer state so rows hash-match the
        batch operator (same grid windows, same decimal-summed fit)."""
        from pyspark.sql import Window

        assert self._tok, "no rows absorbed yet"
        new: dict[int, int] = {}
        for fb in self._first.values():
            new[fb] = new.get(fb, 0) + 1
        buckets = sorted(set(self._tok) | set(new))
        grid = self.spark.createDataFrame(
            [
                (b, self._tok.get(b, 0), new.get(b, 0))
                for b in buckets
            ],
            "b long, n_tokens long, new_terms long",
        )
        w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
        curve = grid.select(
            F.col("b").cast("long").alias("checkpoint"),
            "n_tokens",
            "new_terms",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_terms").over(w).cast("long").alias("cum_vocab"),
        )
        pts = curve.select(
            "*",
            F.round(F.log("cum_tokens"), 9).alias("x"),
            F.round(F.log("cum_vocab"), 9).alias("y"),
        )
        dec = lambda c: F.sum(F.col(c).cast("decimal(30,15)")).cast(  # noqa: E731
            "double"
        )
        fit = pts.select(
            "x",
            "y",
            F.round(F.col("x") * F.col("y"), 9).alias("xy"),
            F.round(F.col("x") * F.col("x"), 9).alias("xx"),
        ).agg(
            F.count("*").cast("double").alias("n"),
            dec("x").alias("sx"),
            dec("y").alias("sy"),
            dec("xy").alias("sxy"),
            dec("xx").alias("sxx"),
        )
        beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        fit1 = fit.select(
            (F.round(beta, 6) + F.lit(0.0)).alias("heaps_beta"),
            F.round(
                F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6
            ).alias("heaps_k"),
        )
        return pts.crossJoin(F.broadcast(fit1)).select(
            "checkpoint",
            "n_tokens",
            "new_terms",
            "cum_tokens",
            "cum_vocab",
            "heaps_beta",
            "heaps_k",
        )
