"""Streaming product-quantization gate: encode arriving embedding rows
to their m-byte PQ codes LIVE, against a codebook fitted once batch-side.

The batch encode (``operators/similarity.pq_encode``) is a pure function
of the ROW (its own vector) and the FIXED codebook, so the streaming
form is the stateless map-only Arrow gate of ``streaming/lm.py`` /
``streaming/decontam.py``: fit once on a corpus snapshot
(``pq_sample_codebook`` — deterministic md5-bottom-k, so refitting on
the same snapshot reproduces the same codebook), project live, no state
store, no watermark, no shuffle. Exactly-once and kill/resume come for
free from the source/sink contract — a replayed row re-encodes to the
same codes because everything is exact int64.

At 10^12-sequence scale this is the ingest-side indexer: vectors arrive,
8 bytes of codes leave for the ANN index, and the 32×-smaller code
column is what downstream ``pq_topk`` scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bistro_spark.operators.similarity import _int_quantize_expr


def pq_gate(
    df: DataFrame,
    codebook: list,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    keep: list[str] | None = None,
) -> DataFrame:
    """Append ``codes array<int>`` to a batch OR streaming DataFrame —
    per-subspace exact-int64 argmin against the closed-over codebook
    (numpy argmin: ties -> smallest index, the batch operator's rule).
    ``keep`` lists passthrough columns for the downstream sink."""
    import numpy as np

    C = np.asarray(codebook, dtype=np.int64)
    n_codes, dim = C.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    keep = list(keep or [])
    src = df.select(
        id_col, *keep, _int_quantize_expr(vec_col, scale).alias("_iq")
    )

    def enc(batches):
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in b["_iq"]])
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                Cs = C[:, s * sub : (s + 1) * sub]
                codes[:, s] = (
                    ((Xs[:, None, :] - Cs[None, :, :]) ** 2).sum(-1).argmin(1)
                )
            out = {id_col: b[id_col]}
            for c in keep:
                out[c] = b[c]
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    types = dict(src.dtypes)
    schema = ", ".join(
        [f"{id_col} {types[id_col]}"]
        + [f"{c} {types[c]}" for c in keep]
        + ["codes array<int>"]
    )
    return src.mapInPandas(enc, schema)
