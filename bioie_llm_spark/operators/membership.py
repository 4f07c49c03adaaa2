"""Distributed Bloom-filter membership: the broadcast-set screen's 100 TB
scale path.

The exact contamination screen broadcasts the benchmark's distinct gram
set (operators/curation.contamination_check). That works while the
benchmark is MBs; when the "have we seen this key" side grows to GBs —
URL-seen lists, cross-batch doc-hash registries, giant eval suites — an
exact broadcast stops fitting and a Bloom filter is the standard
replacement: ~10 bits/key at 1% false positives, ZERO false negatives by
construction (a Bloom never misses a true member, so a screen built on
it can only over-flag, never leak).

Execution shape, Spark-first:
- both base hashes are computed JVM-side (`xxhash64` twice — stable
  across sessions and engines), so the Python side never hashes;
- build: mapInPandas sets bits into one local bitmap per PARTITION
  (numpy-vectorized Kirsch-Mitzenmacher double hashing: pos_i =
  (h1 + i*h2) mod m), then the ≤ num_partitions partial bitmaps —
  bounded by construction at partitions × m/8 bytes — OR-merge on the
  driver (the same declared bounded-collect pattern as the ANN client
  split, similarity.py). OR is commutative/associative, so partition
  count and row order cannot change the result;
- probe: the finished bitmap travels to executors inside the UDF
  closure (a real multi-executor deploy passes it through
  ``spark.sparkContext.broadcast`` instead — same plan, one copy per
  executor) and membership is a map-side vectorized bit test; no
  shuffle, no join.

No reference analog — engine extension alongside the curation screens.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = ["bloom_parameters", "bloom_build", "bloom_probe"]

_H2_SEED = 1  # second base hash = xxhash64(value, lit(_H2_SEED))


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: bits m = -n·ln(p)/ln(2)^2 (rounded up to a byte
    boundary), hashes k = (m/n)·ln(2). Returns (m_bits, k)."""
    n = max(n_items, 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _base_hashes(col: Column) -> tuple[Column, Column]:
    return F.xxhash64(col), F.xxhash64(col, F.lit(_H2_SEED))


def _positions(h1: np.ndarray, h2: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    # uint64 arithmetic wraps mod 2^64 — identical in build and probe, so
    # overflow is consistent, not a correctness hazard.
    return (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int) -> bytes:
    """One pass over ``df[col]`` -> the filter's bitmap (m_bits/8 bytes).

    Each partition emits one partial bitmap; the driver ORs them. The
    collect is bounded by construction: num_partitions × m_bits/8 bytes.
    """
    assert m_bits % 8 == 0 and m_bits > 0, "m_bits must be a positive multiple of 8"
    h1c, h2c = _base_hashes(F.col(col))
    hashed = df.where(F.col(col).isNotNull()).select(h1c.alias("h1"), h2c.alias("h2"))

    def build_partition(batches):
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if not len(pdf):
                continue
            saw = True
            h1 = pdf["h1"].to_numpy(np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(np.int64).view(np.uint64)
            for i in range(k):
                pos = _positions(h1, h2, i, m_bits)
                np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                                 np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        if saw:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    partials = hashed.mapInPandas(build_partition, "bm binary").collect()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: bytes,
    k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Adds boolean ``out_col``: True iff all k bit positions of ``col``'s
    value are set (map-side, no shuffle). NULL values probe as False."""
    m_bits = len(bloom) * 8
    bm = np.frombuffer(bloom, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        if not len(h1s):
            return pd.Series([], dtype=bool)
        h1 = h1s.to_numpy(np.int64).view(np.uint64)
        h2 = h2s.to_numpy(np.int64).view(np.uint64)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(k):
            pos = _positions(h1, h2, i, m_bits)
            bits = bm[(pos >> np.uint64(3)).astype(np.int64)]
            ok &= (bits & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
        return pd.Series(ok)

    # xxhash64(NULL) is the hash of zero inputs (a constant), which could
    # spuriously probe True — gate NULL values expression-side instead.
    h1c, h2c = _base_hashes(F.col(col))
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(False)).otherwise(probe(h1c, h2c)),
    )
