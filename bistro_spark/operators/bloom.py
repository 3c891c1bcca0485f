"""Distributed bloom filter build + probe.

Spark ships a BloomFilter sketch in the JVM (``DataFrameStatFunctions
.bloomFilter``, and the internal ``bloom_filter_agg`` expression used by
runtime row-level filtering), but neither is reachable from the PySpark
SQL surface (``bloom_filter_agg`` is not in the function registry — probed
on Spark 4.1), so this is the engine-native equivalent built from public
primitives:

- **build**: one map-only pass — ``xxhash64`` of the key JVM-side, then a
  per-partition numpy bitset via ``mapInArrow`` (each task emits ONE row:
  its ``m_bits/8``-byte bitset); the driver ORs #partitions bitsets. No
  shuffle; driver traffic = #partitions × m/8 bytes (a 2^23-bit filter is
  1 MiB/partition — the same cost profile as the JVM sketch's treeReduce).
- **probe**: a broadcast of the bitset bytes + an Arrow-batched pandas
  UDF computing k double-hash positions per value (h1 + i*h2 mod m with
  h2 forced odd, so the probe sequence walks the whole power-of-two ring).

Guarantee: NO false negatives (a present key always tests True), tunable
false-positive rate ~ (1 - e^{-kn/m})^k. The canonical use here is
pruning the new side of ``incremental_span_dedup`` before its equi-join
against the (corpus-scale) old span set: definite-miss spans never
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(
    df: DataFrame, col: str, m_bits: int = 1 << 23, k: int = 5
) -> tuple[bytes, int, int]:
    """Build an ``m_bits``-bit / ``k``-hash bloom filter over ``col``.

    ``m_bits`` must be a power of two (the double-hash stepper relies on
    odd step sizes being coprime with the ring). Returns
    ``(bitset_bytes, m_bits, k)`` — pass to :func:`might_contain`."""
    import numpy as np
    import pyarrow as pa

    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    nbytes = m_bits >> 3
    hashed = df.select(F.xxhash64(F.col(col)).alias("_h64"))

    def to_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            if not len(h):
                continue
            h1 = h % np.uint64(m_bits)
            h2 = ((h >> np.uint64(32)) << np.uint64(1)) | np.uint64(1)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        yield pa.RecordBatch.from_arrays(
            [pa.array([bits.tobytes()], type=pa.binary())], names=["bits"]
        )

    agg = np.zeros(nbytes, dtype=np.uint8)
    for r in hashed.mapInArrow(to_bits, "bits binary").collect():
        agg |= np.frombuffer(r["bits"], dtype=np.uint8)
    return agg.tobytes(), m_bits, k


def might_contain(
    df: DataFrame, col: str, bloom: tuple[bytes, int, int]
) -> Column:
    """Boolean probe column: False ⇒ the value is definitely NOT in the
    set the filter was built over (no false negatives). The bitset ships
    to executors once via a Spark broadcast; the probe is one
    Arrow-batched vectorized kernel, no per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bloom_bytes, m_bits, k = bloom
    bc = df.sparkSession.sparkContext.broadcast(bloom_bytes)

    # annotation-free form: string hints under `from __future__ import
    # annotations` are rejected by the pandas-UDF type inferencer
    @pandas_udf("boolean")
    def bloom_might_contain(s):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h = s.to_numpy().astype(np.uint64)
        if not len(h):
            return pd.Series([], dtype=bool)
        h1 = h % np.uint64(m_bits)
        h2 = ((h >> np.uint64(32)) << np.uint64(1)) | np.uint64(1)
        ok = np.ones(len(h), dtype=bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            ok &= (
                (byte >> (pos & np.uint64(7)).astype(np.uint8))
                & np.uint8(1)
            ).astype(bool)
        return pd.Series(ok)

    return bloom_might_contain(F.xxhash64(F.col(col)))
