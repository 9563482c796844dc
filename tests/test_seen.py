"""Seen-set: Bloom build/probe (no false negatives), exact equality of
bloom-accelerated filter_unseen with the plain anti-join, cuckoo fallback."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from podcast_crawler_spark.operators.seen import (
    BloomFilter,
    CuckooFilter,
    bloom_params,
    bloom_probe,
    build_bloom,
    filter_unseen,
)


def _keys_df(spark, lo, hi, parts=4):
    return spark.range(lo, hi, 1, parts).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id"),
    )


def test_bloom_params_math():
    m, k = bloom_params(10_000, 0.01)
    assert 90_000 < m < 110_000  # ≈ 9.59 bits/key
    assert k in (6, 7)


def test_bloom_no_false_negatives_and_low_fpp(spark):
    seen = _keys_df(spark, 0, 5_000).cache()
    bloom = build_bloom(seen, expected_keys=5_000, fpp=0.01)
    # every inserted key must hit
    probed = bloom_probe(seen, bloom)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # disjoint keys: fpp should be near target
    fresh = _keys_df(spark, 1_000_000, 1_010_000)
    fp = bloom_probe(fresh, bloom).filter(F.col("maybe_seen")).count()
    assert fp / 10_000 < 0.03


def test_filter_unseen_exact_equality(spark):
    seen = _keys_df(spark, 0, 3_000).cache()
    candidates = _keys_df(spark, 2_000, 6_000).cache()  # 1k overlap
    bloom = build_bloom(seen, expected_keys=3_000)
    with_bloom = set(
        r.id for r in filter_unseen(candidates, seen, bloom).collect()
    )
    exact = set(
        r.id for r in filter_unseen(candidates, seen, None).collect()
    )
    assert with_bloom == exact
    assert exact == set(range(3_000, 6_000))


def test_bloom_numpy_roundtrip():
    bf = BloomFilter(np.zeros(1024 // 8, dtype=np.uint8), 1024, 5)
    keys = np.array([1, -5, 2**62, -(2**60)], dtype=np.int64)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(num_buckets=2048)
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=4_000, dtype=np.int64)
    cf.insert(keys)
    assert cf.contains(keys).all()  # no false negatives
    other = rng.integers(-(2**62), 2**62, size=4_000, dtype=np.int64)
    fp_rate = cf.contains(other).mean()
    assert fp_rate < 0.01  # 16-bit fingerprints ⇒ ~2b/2^16 per bucket pair
    # delete then re-check
    assert cf.delete(int(keys[0]))
    assert cf.size == 3_999


def test_cuckoo_full_raises():
    cf = CuckooFilter(num_buckets=4)
    keys = np.arange(0, 64, dtype=np.int64)
    with pytest.raises(RuntimeError):
        cf.insert(keys)
