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


class ShardedBloom(BloomFilter):
    """Bloom filter partitioned into ``n_shards`` disjoint bitmap shards,
    keys routed by ``key mod n_shards``.

    Same probabilistic guarantees as :class:`BloomFilter`; the shard
    structure is the 10^10-key scale path.  Memory math: 10^10 keys at 1%
    fpp need ~9.6 bits/key ≈ **12 GB** of bitmap — undistributable as one
    driver-held broadcast.  Sharded into 256 pieces that is 256 × ~47 MB
    filters; because shard(key) is a pure function of the key, each
    executor task only ever consults the shards of the url_hash range it
    holds, so the shards can live co-partitioned with the frontier (join on
    shard id) instead of every executor holding all 12 GB.  At sandbox
    scale the merged filter still fits in one broadcast; the shard routing
    is identical either way.

    Serialization is a fixed int64 header + the raw bitmap, so per-wave
    partials and the running merged filter persist as single blobs.
    """

    _MAGIC = 0x53_42_4C_4D  # "SBLM"

    def __init__(self, n_shards: int, shard_bits: int, n_hashes: int,
                 bits: np.ndarray | None = None):
        self.n_shards = n_shards
        self.shard_bits = shard_bits
        n_bits = n_shards * shard_bits
        super().__init__(n_bits, n_hashes, bits)

    @classmethod
    def sized(cls, expected_items: int, fpp: float = 0.01,
              n_shards: int = 32) -> "ShardedBloom":
        base = BloomFilter.sized(max(expected_items, 1), fpp)
        shard_bits = -(-base.n_bits // n_shards)  # ceil
        return cls(n_shards, shard_bits, base.n_hashes)

    def empty_like(self) -> "ShardedBloom":
        return ShardedBloom(self.n_shards, self.shard_bits, self.n_hashes)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        shard_base = (k % np.uint64(self.n_shards)) * np.uint64(self.shard_bits)
        h1 = k * np.uint64(0x9E3779B97F4A7C15)
        h2 = (k >> np.uint64(17)) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (shard_base + (h1 + i * h2) % np.uint64(self.shard_bits)).astype(
            np.int64
        )

    def to_bytes(self) -> bytes:
        header = np.array(
            [self._MAGIC, self.n_shards, self.shard_bits, self.n_hashes],
            dtype=np.int64,
        )
        return header.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "ShardedBloom":
        header = np.frombuffer(raw[:32], dtype=np.int64)
        assert header[0] == cls._MAGIC, "not a ShardedBloom blob"
        bf = cls(int(header[1]), int(header[2]), int(header[3]))
        bits = np.frombuffer(raw[32:], dtype=np.uint8)
        assert len(bits) == len(bf.bits), "bitmap size mismatch"
        bf.bits = bits.copy()
        return bf


def build_bloom_into(df: DataFrame, proto: BloomFilter,
                     key: str = "url_hash") -> BloomFilter:
    """Distributed partial build with FIXED filter parameters: one partial
    filter per partition via mapInPandas, OR-merged on the driver (partial
    bytes move, never rows).  Used both for one-shot full builds and for the
    per-wave *incremental* partials that keep the seen-bloom up to date
    without ever rescanning the seen table."""
    is_sharded = isinstance(proto, ShardedBloom)
    params = (
        (proto.n_shards, proto.shard_bits, proto.n_hashes)
        if is_sharded
        else (proto.n_bits, proto.n_hashes)
    )

    def partial(batches):
        bf = ShardedBloom(*params) if is_sharded else BloomFilter(*params)
        for pdf in batches:
            bf.add_many(pdf[key].to_numpy(dtype=np.int64, na_value=0))
        yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    partials = df.select(key).mapInPandas(partial, "bits binary").collect()
    merged = ShardedBloom(*params) if is_sharded else BloomFilter(*params)
    for row in partials:
        merged.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged


def build_bloom(seen_df: DataFrame, key: str = "url_hash",
                expected_items: int | None = None, fpp: float = 0.01) -> BloomFilter:
    """One-shot distributed bloom build sized from the input (counts the
    input when no expected_items given — use :func:`build_bloom_into` with a
    pre-sized filter for incremental maintenance, which never rescans)."""
    if expected_items is None:
        expected_items = seen_df.count() or 1
    proto = BloomFilter.sized(expected_items, fpp)
    return build_bloom_into(seen_df, proto, key)


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
