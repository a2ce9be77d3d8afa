"""URL-seen / negative-cache machinery (C1-C3 of SURVEY.md §2.3).

The reference keeps two file-backed negative sets (`missingCards.txt`,
`missingImages.txt`; CrawlerLib/MissingResourceTracker.fs:12-44) and treats
local presence as "already crawled" (FileCollector.fs:5-25).  Here:

* ``seen(url_hash)``   — positive cache: resources already fetched+stored.
* ``missing(id)``      — negative cache: resources confirmed Absent (404).

Both checks are LEFT ANTI joins — the exact-correctness backstop.  At
10^10-URL scale an anti-join of every wave against the full seen table is the
dominant shuffle, so we put a **partitioned Bloom prefilter** in front: build
one bloom per seen-table partition (numpy bitmap inside mapInPandas, OR-merged
on the driver), broadcast the merged filter, and drop the guaranteed-unseen
rows cheaply before the exact anti-join runs on the survivors.  False
positives only cost a row entering the exact join; never correctness.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_unseen(frontier_df: DataFrame, seen_df: DataFrame,
                  key: str = "url_hash") -> DataFrame:
    """Exact: frontier rows whose key is NOT in seen (C1 anti-join)."""
    return frontier_df.join(seen_df.select(key).distinct(), key, "left_anti")


def filter_not_missing(frontier_df: DataFrame, missing_df: DataFrame,
                       key: str = "id") -> DataFrame:
    """Exact: drop rows already in the negative cache (C1-C3,
    MissingResourceTracker.Check → skip before any fetch)."""
    return frontier_df.join(missing_df.select(key).distinct(), key, "left_anti")


class BloomFilter:
    """Plain double-hashing Bloom over int64 keys, numpy-backed.

    Built per-partition and OR-merged; serialized as bytes for broadcast.
    """

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @classmethod
    def sized(cls, expected_items: int, fpp: float = 0.01) -> "BloomFilter":
        n = max(expected_items, 1)
        n_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        n_hashes = max(1, int(round(n_bits / n * math.log(2))))
        return cls(n_bits, n_hashes)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing h1 + i*h2 over the already-64-bit xxhash64 keys
        k = keys.astype(np.uint64)
        h1 = k * np.uint64(0x9E3779B97F4A7C15)
        h2 = (k >> np.uint64(17)) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1 + i * h2) % np.uint64(self.n_bits)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        return BloomFilter(self.n_bits, self.n_hashes, self.bits | other.bits)


def build_bloom(seen_df: DataFrame, key: str = "url_hash",
                expected_items: int | None = None, fpp: float = 0.01) -> BloomFilter:
    """Distributed bloom build: one partial filter per partition via
    mapInPandas, OR-merged on the driver (partial bytes, not rows, move)."""
    if expected_items is None:
        expected_items = seen_df.count() or 1
    proto = BloomFilter.sized(expected_items, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def partial(batches):
        bf = BloomFilter(n_bits, n_hashes)
        for pdf in batches:
            bf.add_many(pdf[key].to_numpy(dtype=np.int64, na_value=0))
        yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    partials = seen_df.select(key).mapInPandas(partial, "bits binary").collect()
    merged = BloomFilter(n_bits, n_hashes)
    for row in partials:
        merged.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged


def bloom_prefilter_unseen(frontier_df: DataFrame, bloom: BloomFilter,
                           key: str = "url_hash") -> DataFrame:
    """Drop rows the bloom proves unseen... inverted: KEEP rows that are
    definitely-NOT-seen plus the (≤fpp) maybe-seen band for the exact join.

    Returns frontier with ``maybe_seen`` boolean — callers route:
    ``maybe_seen = false`` → fetch directly (bloom guarantees unseen);
    ``maybe_seen = true``  → exact anti-join backstop.
    """
    spark = frontier_df.sparkSession
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.n_hashes, bloom.bits.tobytes()))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain_udf(keys: pd.Series) -> pd.Series:
        n_bits, n_hashes, raw = bc.value
        bf = BloomFilter(n_bits, n_hashes, np.frombuffer(raw, dtype=np.uint8))
        return pd.Series(bf.might_contain(keys.to_numpy(dtype=np.int64, na_value=0)))

    return frontier_df.withColumn("maybe_seen", might_contain_udf(F.col(key)))


def filter_unseen_with_bloom(frontier_df: DataFrame, seen_df: DataFrame,
                             bloom: BloomFilter, key: str = "url_hash") -> DataFrame:
    """Scale path: bloom prefilter + exact anti-join only on the maybe band.

    Semantically identical to :func:`filter_unseen` (verified in tests); at
    scale the anti-join input shrinks from |wave| to ~|wave ∩ seen| + fpp.
    """
    flagged = bloom_prefilter_unseen(frontier_df, bloom, key)
    definitely_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen_df.select(key).distinct(), key, "left_anti")
    return definitely_new.unionByName(confirmed_new)
