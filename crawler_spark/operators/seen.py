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


class CuckooFilter:
    """Cuckoo filter over int64 keys — the deletion-capable alternative to
    :class:`ShardedBloom` (north_rule: "bloom/cuckoo URL-seen set").

    Standard 2-choice construction: 16-bit fingerprints, 4 slots/bucket,
    bucket₂ = bucket₁ XOR h(fingerprint), insert-with-eviction.  Unlike a
    bloom it supports ``delete_many`` — which is exactly what the cache
    re-validation sweep wants: a healed card's key can be REMOVED so the
    prefilter stays precise, where the bloom permanently accumulates stale
    keys (correct either way — stale keys only cost exact-join traffic).

    Lookup is fully vectorized (two gathers + compares per key batch);
    insert/delete run a per-key Python loop, acceptable because the engine
    only ever inserts ONE politeness-bounded wave at a time, never a whole
    table.  At 10^10 keys the same shard-by-key-mod layout as ShardedBloom
    applies (each executor holds/serves its key range's filter); 16-bit
    fingerprints at load ≤0.84 give ~2^-13 fpp per probe.
    """

    _MAGIC = 0x43_4B_46_31  # "CKF1"

    def __init__(self, n_buckets: int, slots: int = 4, max_kicks: int = 500,
                 table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.n_buckets = n_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.table = (
            table if table is not None
            else np.zeros((n_buckets, slots), dtype=np.uint16)
        )

    @classmethod
    def sized(cls, expected_items: int, load: float = 0.84) -> "CuckooFilter":
        need = max(int(expected_items / (4 * load)), 1)
        n_buckets = 1 << (need - 1).bit_length()
        return cls(n_buckets)

    # -- hashing ------------------------------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        fp = ((k * np.uint64(0xFF51AFD7ED558CCD)) >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        return ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)).astype(
            np.int64
        ) & (self.n_buckets - 1)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1
        )
        return (i1.astype(np.uint64) ^ h).astype(np.int64)

    # -- ops ----------------------------------------------------------------
    def insert_many(self, keys: np.ndarray) -> int:
        """Insert; returns the number of keys DROPPED (table too full —
        callers size the filter so this stays 0; a dropped key is a false
        negative, so the caller must fall back to exact joins if nonzero)."""
        import random

        rng = random.Random(0xC0FFEE)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        dropped = 0
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            placed = False
            # presence FIRST so re-inserting a key is idempotent (no
            # duplicate fingerprints — keeps delete_many exact-ish and
            # capacity honest on snapshot-overwrite top-ups)
            for b in (i1, i2):
                if (self.table[b] == fp).any():
                    placed = True
                    break
            if not placed:
                for b in (i1, i2):
                    row = self.table[b]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = fp
                        placed = True
                        break
            if placed:
                continue
            b, cur = i1, fp
            for _ in range(self.max_kicks):
                s = rng.randrange(self.slots)
                cur, self.table[b][s] = int(self.table[b][s]), cur
                b = int(
                    self._i2(np.array([b]), np.array([cur], dtype=np.uint16))[0]
                )
                row = self.table[b]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur
                    cur = None
                    break
            if cur is not None:
                dropped += 1
        return dropped

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove one fingerprint copy per key; returns keys not found."""
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        missing = 0
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            for b in (i1, i2):
                row = self.table[b]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    break
            else:
                missing += 1
        return missing

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        return (
            (self.table[i1s] == fps[:, None]).any(axis=1)
            | (self.table[i2s] == fps[:, None]).any(axis=1)
        )

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array(
            [self._MAGIC, self.n_buckets, self.slots, self.max_kicks],
            dtype=np.int64,
        )
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooFilter":
        header = np.frombuffer(raw[:32], dtype=np.int64)
        assert header[0] == cls._MAGIC, "not a CuckooFilter blob"
        cf = cls(int(header[1]), int(header[2]), int(header[3]))
        cf.table = (
            np.frombuffer(raw[32:], dtype=np.uint16)
            .reshape(cf.n_buckets, cf.slots)
            .copy()
        )
        return cf


def build_bloom(seen_df: DataFrame, key: str = "url_hash",
                expected_items: int | None = None, fpp: float = 0.01) -> BloomFilter:
    """One-shot distributed bloom build sized from the input (counts the
    input when no expected_items given — use :func:`build_bloom_into` with a
    pre-sized filter for incremental maintenance, which never rescans)."""
    if expected_items is None:
        expected_items = seen_df.count() or 1
    proto = BloomFilter.sized(expected_items, fpp)
    return build_bloom_into(seen_df, proto, key)


def serialize_filter(flt) -> tuple:
    """Type-preserving wire form for broadcasting a seen-filter to executors.

    The filter's bit/slot layout is part of its identity: reconstructing a
    ShardedBloom's bitmap as a plain BloomFilter computes DIFFERENT bit
    positions — silent false negatives.  Self-describing blobs (magic-headed
    to_bytes) carry the type; the plain BloomFilter ships its two params.
    """
    if isinstance(flt, (ShardedBloom, CuckooFilter)):
        return ("blob", flt.to_bytes())
    return ("plain", flt.n_bits, flt.n_hashes, flt.bits.tobytes())


def deserialize_filter(payload: tuple):
    if payload[0] == "blob":
        return filter_from_bytes(payload[1])
    _, n_bits, n_hashes, raw = payload
    return BloomFilter(n_bits, n_hashes, np.frombuffer(raw, dtype=np.uint8).copy())


def filter_from_bytes(raw: bytes):
    """Dispatch a magic-headed blob to its filter class."""
    magic = int(np.frombuffer(raw[:8], dtype=np.int64)[0])
    for cls in (ShardedBloom, CuckooFilter):
        if magic == cls._MAGIC:
            return cls.from_bytes(raw)
    raise ValueError(f"unknown seen-filter blob magic {magic:#x}")


def bloom_prefilter_unseen(frontier_df: DataFrame, bloom,
                           key: str = "url_hash") -> DataFrame:
    """Drop rows the filter proves unseen... inverted: KEEP rows that are
    definitely-NOT-seen plus the (≤fpp) maybe-seen band for the exact join.

    Accepts any approximate-membership filter (BloomFilter / ShardedBloom /
    CuckooFilter).  Returns frontier with ``maybe_seen`` boolean — callers
    route: ``maybe_seen = false`` → fetch directly (the filter guarantees
    unseen); ``maybe_seen = true`` → exact anti-join backstop.
    """
    spark = frontier_df.sparkSession
    bc = spark.sparkContext.broadcast(serialize_filter(bloom))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain_udf(keys: pd.Series) -> pd.Series:
        flt = deserialize_filter(bc.value)
        return pd.Series(flt.might_contain(keys.to_numpy(dtype=np.int64, na_value=0)))

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
