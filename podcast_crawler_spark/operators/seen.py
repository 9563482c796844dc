"""URL-seen set: partitioned Bloom filter with cuckoo-filter fallback,
verified exactly by anti-join.

The reference gets idempotence implicitly from Postgres upserts
(``ON CONFLICT rss_feed_url`` / ``ON CONFLICT guid`` —
``/root/reference/src/infrastructure/persistence/repositories/
podcast_repository.rs:178-183,212-218``).  The north rule makes the seen
set explicit at 10^10-URL scale (SURVEY.md §2.7 D3):

* **Build**: each partition builds a numpy bit array over its 64-bit keys
  (``xxhash64(canonical_url)`` — already a uniform hash, so the k probe
  positions derive via Kirsch-Mitzenmacher double hashing h1+i·h2, no
  per-key rehash).  Partition filters are OR-merged.  PySpark does not
  expose Spark's internal BloomFilter aggregate, hence this Arrow-batched
  construction (SURVEY.md §4).
* **Probe**: the merged filter is broadcast; membership is evaluated
  vectorized in numpy.  A Bloom "maybe" is only an *accelerator* —
  candidate hits are verified exactly with a ``left_anti``/``left_semi``
  join so false positives can never drop URLs; set equality with the
  reference's upsert keys is therefore provable (SURVEY.md §7.2).
* **Cuckoo fallback**: a partition-local cuckoo filter (numpy buckets,
  4 slots × 16-bit fingerprints) supporting **delete** — used when keys
  must be retired (e.g. re-crawl after ``fetch_interval``); same
  broadcast-probe pattern.

Scale math (documented for the 10^10 design point): bits = -n·ln(p)/ln(2)²;
at n=10^10, p=1% → ~95.8 Gbit ≈ 12 GB — too big to broadcast, so in
production the filter stays **partitioned by pmod(url_hash, P)** (each
executor holds m/P bits and probes its own shard after the same hash
partitioning; the driver never materializes it).  The sandbox corpus
(≤10^6) uses the broadcast path; both share this code, switched by
``partitioned=True``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _h1_h2(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Two derived 64-bit hashes from the xxhash64 key (splitmix64 finalize
    for h2 so h1/h2 are independent enough for double hashing)."""
    h1 = keys.astype(np.uint64)
    z = h1 + _MIX
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd ⇒ full cycle
    return h1, h2


def bloom_params(expected_keys: int, fpp: float = 0.01) -> Tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate."""
    n = max(expected_keys, 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


@dataclass
class BloomFilter:
    bits: np.ndarray  # uint8 array, m/8 bytes
    num_bits: int
    num_hashes: int

    def contains(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _h1_h2(keys)
        out = np.ones(len(keys), dtype=bool)
        m = np.uint64(self.num_bits)
        for i in range(self.num_hashes):
            idx = (h1 + np.uint64(i) * h2) % m
            out &= (self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                    >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out

    def add(self, keys: np.ndarray) -> None:
        h1, h2 = _h1_h2(keys)
        m = np.uint64(self.num_bits)
        for i in range(self.num_hashes):
            idx = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(
                self.bits,
                (idx >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
            )


def build_bloom(
    df: DataFrame,
    key_col: str = "url_hash",
    expected_keys: Optional[int] = None,
    fpp: float = 0.01,
) -> BloomFilter:
    """Distributed build: per-partition numpy bit arrays, OR-merged on the
    driver (merge payload = P × m/8 bytes, independent of row count)."""
    if expected_keys is None:
        expected_keys = df.count()
    num_bits, num_hashes = bloom_params(expected_keys, fpp)
    schema = StructType([StructField("bits", BinaryType())])

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(
            np.zeros(num_bits // 8, dtype=np.uint8), num_bits, num_hashes
        )
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                bf.add(pdf[key_col].to_numpy(dtype=np.int64))
        if any_rows:
            yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    parts = df.select(key_col).mapInPandas(_build, schema=schema).collect()
    merged = np.zeros(num_bits // 8, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(merged, num_bits, num_hashes)


def bloom_probe(
    df: DataFrame, bloom: BloomFilter, key_col: str = "url_hash",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Vectorized membership probe; adds boolean *out_col*.  The filter is
    shipped once per executor via the closure (Spark broadcast of the
    serialized task), not per row."""
    bits, num_bits, num_hashes = bloom.bits, bloom.num_bits, bloom.num_hashes
    cols = df.columns
    schema = StructType(df.schema.fields + [StructField(out_col, BooleanType())])

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(np.frombuffer(bits, dtype=np.uint8), num_bits, num_hashes)
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = (
                bf.contains(pdf[key_col].to_numpy(dtype=np.int64))
                if len(pdf)
                else np.zeros(0, dtype=bool)
            )
            yield out

    return df.mapInPandas(_probe, schema=schema)


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: Optional[BloomFilter],
    key_col: str = "url_hash",
) -> DataFrame:
    """Exact "not yet seen" (D3): Bloom pre-filter (definite-negatives skip
    the join entirely) + ``left_anti`` verification of the maybes.  With
    bloom=None this degrades to the plain anti-join — results are identical
    by construction, which the tests assert."""
    if bloom is None:
        return candidates.join(seen.select(key_col), key_col, "left_anti")
    probed = bloom_probe(candidates, bloom, key_col)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = maybes.join(seen.select(key_col), key_col, "left_anti")
    return definite_new.unionByName(verified_new)


# ---------------- cuckoo filter (deletable fallback) ----------------


class CuckooFilter:
    """Bucketized cuckoo filter: 4 slots/bucket, 16-bit fingerprints,
    partial-key cuckoo hashing (Fan et al., CoNEXT'14).  Supports delete —
    the property Bloom lacks — for retiring re-crawlable keys."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, num_buckets: int, seed: int = 42):
        self.num_buckets = 1 << (num_buckets - 1).bit_length()  # power of two
        self.table = np.zeros((self.num_buckets, self.SLOTS), dtype=np.uint16)
        self.rng = np.random.default_rng(seed)
        self.size = 0

    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (keys.astype(np.uint64) >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.num_buckets)).astype(
            np.int64
        )

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = fp.astype(np.uint64) * _MIX
        return ((i1.astype(np.uint64) ^ h) % np.uint64(self.num_buckets)).astype(
            np.int64
        )

    def _try_place(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, keys: np.ndarray) -> int:
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        inserted = 0
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            i2 = int(self._index2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
            if self._try_place(i1, fp) or self._try_place(i2, fp):
                inserted += 1
                continue
            bucket, cur = (i1 if self.rng.integers(2) else i2), fp
            ok = False
            for _ in range(self.MAX_KICKS):
                slot = int(self.rng.integers(self.SLOTS))
                cur, self.table[bucket, slot] = (
                    int(self.table[bucket, slot]),
                    cur,
                )
                bucket = int(
                    self._index2(
                        np.array([bucket]), np.array([cur], dtype=np.uint16)
                    )[0]
                )
                if self._try_place(bucket, cur):
                    ok = True
                    break
            if ok:
                inserted += 1
            else:
                raise RuntimeError("cuckoo filter full — grow num_buckets")
        self.size += inserted
        return inserted

    def _locate(self, key: int) -> Tuple[int, int, int]:
        k = np.array([key], dtype=np.int64)
        fp = int(self._fingerprint(k)[0])
        i1 = int(self._index1(k)[0])
        i2 = int(self._index2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        return fp, i1, i2

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        for j, key in enumerate(keys.tolist()):
            fp, i1, i2 = self._locate(key)
            out[j] = fp in self.table[i1] or fp in self.table[i2]
        return out

    def delete(self, key: int) -> bool:
        fp, i1, i2 = self._locate(key)
        for b in (i1, i2):
            slots = np.nonzero(self.table[b] == fp)[0]
            if len(slots):
                self.table[b, slots[0]] = 0
                self.size -= 1
                return True
        return False
