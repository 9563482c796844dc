"""Sketch operator tests: HLL distinct and count-min heavy hitters.

Correctness is pinned three ways: a straight-line python oracle for the
register/counter derivation, the sketch-algebra merge laws (the property
that makes them usable across crawl epochs), and plan assertions for the
scale contract (map-side combine before the exchange, broadcast probe).
"""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _py_register(key: str):
    h = hashlib.md5(key.encode()).hexdigest()
    bucket = int(h[:2], 16)
    v = int(h[2:17], 16)
    rho = 61 if v == 0 else 61 - len(bin(v)[2:])
    return bucket, rho


def test_hll_registers_python_oracle(spark):
    from podcast_crawler_spark.operators.sketches import hll_registers

    keys = [str(i) for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.bucket: r.reg for r in hll_registers(df, "k").collect()}
    want = {}
    for k in keys:
        b, rho = _py_register(k)
        want[b] = max(want.get(b, 0), rho)
    assert got == want


def test_hll_estimate_accuracy(events):
    from podcast_crawler_spark.operators.sketches import hll_distinct

    rows = hll_distinct(events, "user_id", ["event_type"]).collect()
    assert rows, "no groups"
    for r in rows:
        # m=256 -> standard error 1.04/sqrt(256) = 6.5%; 3 sigma bound
        assert r.rel_err < 0.20, (r.event_type, r.n_exact, r.hll_estimate)
        assert r.harmonic_scaled > 0


def test_hll_register_merge_law(events):
    """Registers are a semilattice: sketching two halves and merging
    with groupBy-max equals sketching the whole — the property that lets
    epoch sketches accumulate without re-scanning history."""
    from podcast_crawler_spark.operators.sketches import hll_registers

    lo = events.filter(F.col("event_id") % 2 == 0)
    hi = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        hll_registers(lo, "user_id")
        .unionByName(hll_registers(hi, "user_id"))
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    full = hll_registers(events, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_partial_aggregation_plan(events):
    """The register build must have a map-side partial max below the
    exchange — each task emits <= m rows, the scale contract."""
    from podcast_crawler_spark.operators.sketches import hll_registers

    plan = (
        hll_registers(events, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines) if "partial_max" in l]
    final = [i for i, l in enumerate(lines) if "HashAggregate" in l and "max(" in l and "partial" not in l]
    assert partial and final, plan
    # partial agg is BELOW (printed after) the final agg + exchange
    assert min(partial) > min(final), plan


def test_cm_never_undercounts(docs):
    from podcast_crawler_spark.operators.sketches import cm_heavy_hitters

    rows = cm_heavy_hitters(docs, "text", k=25).collect()
    assert len(rows) == 25  # sf0.001 corpus has 31 distinct tokens
    for r in rows:
        assert r.cm_est >= r.n_exact, r
        assert r.overcount == r.cm_est - r.n_exact


def test_cm_exact_counts_match_python(docs):
    from podcast_crawler_spark.operators.sketches import cm_heavy_hitters

    texts = [r.text for r in docs.select("text").collect()]
    counts = Counter(t for txt in texts for t in txt.split(" ") if t)
    want_top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {
        r.token: r.n_exact
        for r in cm_heavy_hitters(docs, "text", k=10).collect()
    }
    assert got == dict(want_top)


def test_cm_sketch_merge_law(docs):
    """Counter tables from two batches merge by summing cells."""
    from podcast_crawler_spark.operators.sketches import cm_sketch

    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        cm_sketch(lo).unionByName(cm_sketch(hi))
        .groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
    )
    full = cm_sketch(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_cm_probe_is_broadcast(docs):
    """The candidate->counter probe must broadcast the counter table
    (<= depth*width rows) — a corpus-sized shuffle there would defeat
    the sketch."""
    from podcast_crawler_spark.operators.sketches import cm_heavy_hitters

    plan = (
        cm_heavy_hitters(docs, "text", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_histogram_bins_merge_law(events):
    from podcast_crawler_spark.operators.sketches import histogram_bins

    lo_half = events.filter(F.col("event_id") % 2 == 0)
    hi_half = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        histogram_bins(lo_half, "value", 0.0, 500.0)
        .unionByName(histogram_bins(hi_half, "value", 0.0, 500.0))
        .groupBy("bin")
        .agg(F.sum("c").alias("c"))
    )
    full = histogram_bins(events, "value", 0.0, 500.0)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert full.count() <= 64


def test_histogram_quantiles_accuracy_and_clamping(events):
    from podcast_crawler_spark.operators.sketches import (
        histogram_quantiles,
    )

    vals = sorted(r.value for r in events.select("value").collect())
    got = {
        r.q: r
        for r in histogram_quantiles(
            events, "value", [0.25, 0.5, 0.9], lo=0.0, hi=500.0
        ).collect()
    }
    width = 500.0 / 64
    n = len(vals)
    for q, r in got.items():
        import math

        k = max(1, math.ceil(q * n))
        exact = vals[k - 1]
        # estimate lands within one bin width of the exact k-th value
        assert abs(r.est - exact) <= width, (q, r.est, exact)
        assert r.k == k
    # out-of-range values clamp to edge bins rather than vanish
    out_of_range = events.limit(0).sparkSession.createDataFrame(
        [(-50.0,), (9999.0,)], "value double"
    )
    from podcast_crawler_spark.operators.sketches import histogram_bins

    bins = {r.bin: r.c for r in
            histogram_bins(out_of_range, "value", 0.0, 500.0).collect()}
    assert bins == {0: 1, 63: 1}


def test_hll_distinct_ungrouped(events):
    """The no-group path (global cardinality) returns one row."""
    from podcast_crawler_spark.operators.sketches import hll_distinct

    rows = hll_distinct(events, "user_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_exact > 0 and r.rel_err < 0.20


def test_hll_merge_equals_union_sketch(spark):
    """Registers are a max-semilattice: merging per-epoch register
    tables must give exactly the registers of the union stream."""
    from podcast_crawler_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("epoch"),
        (F.col("id") % 700).cast("string").alias("k"),
    )
    per_epoch = hll_registers(df, "k", ["epoch"])
    merged = {
        (r["bucket"]): r["reg"] for r in hll_merge(per_epoch).collect()
    }
    direct = {
        (r["bucket"]): r["reg"] for r in hll_registers(df, "k").collect()
    }
    assert merged == direct
    est = hll_estimate_from_registers(hll_merge(per_epoch)).collect()[0]
    # 700 distinct keys; HLL-256 should land within ~15%
    assert abs(est["hll_estimate"] - 700) / 700 < 0.15


# --------------------------------------------------------------------------
# KMV bottom-k set operations
# --------------------------------------------------------------------------


def _py_kmv_hash(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)


def test_kmv_set_ops_python_oracle(spark):
    """Full python replay of the estimator on two overlapping key sets:
    ranks, membership, integer estimators and exact audits."""
    from podcast_crawler_spark.operators.sketches import (
        KMV_HASH_SPACE, kmv_set_ops,
    )

    k = 64
    A = [str(i) for i in range(0, 900)]
    B = [str(i) for i in range(600, 1500)]   # overlap 600..899
    a = spark.createDataFrame([(x,) for x in A], "k string")
    b = spark.createDataFrame([(x,) for x in B], "k string")
    row = kmv_set_ops(a, b, "k", k=k).collect()[0]

    ska = sorted(_py_kmv_hash(x) for x in set(A))[:k]
    skb = sorted(_py_kmv_hash(x) for x in set(B))[:k]
    sku = sorted(set(ska) | set(skb))[:k]
    k_used, h_k = len(sku), max(sku)
    union_est = (
        k_used if k_used < k else (k_used - 1) * KMV_HASH_SPACE // h_k
    )
    matches = sum(1 for h in sku if h in set(ska) and h in set(skb))
    assert row.k_used == k_used and row.h_k == h_k
    assert row.union_est == union_est
    assert row.matches == matches
    assert row.jaccard_ppm == 1_000_000 * matches // k_used
    assert row.inter_est == matches * union_est // k_used
    assert row.n_exact_union == 1500 and row.n_exact_inter == 300


def test_kmv_estimates_are_accurate(spark):
    """k=256 on 5000 ∪ 5000 keys with 2000 shared: union and
    intersection estimates within 15% (KMV std err ~1/sqrt(k)=6%)."""
    from podcast_crawler_spark.operators.sketches import kmv_set_ops

    A = [f"u{i}" for i in range(0, 5000)]
    B = [f"u{i}" for i in range(3000, 8000)]
    a = spark.createDataFrame([(x,) for x in A], "k string")
    b = spark.createDataFrame([(x,) for x in B], "k string")
    row = kmv_set_ops(a, b, "k", k=256).collect()[0]
    assert abs(row.union_est - 8000) / 8000 < 0.15
    assert abs(row.inter_est - 2000) / 2000 < 0.15


def test_kmv_small_set_is_exact(spark):
    """Fewer distinct keys than k: the sketch IS the set — estimates
    equal the exact counts."""
    from podcast_crawler_spark.operators.sketches import kmv_set_ops

    A = [str(i) for i in range(30)]
    B = [str(i) for i in range(20, 50)]
    a = spark.createDataFrame([(x,) for x in A * 3], "k string")  # dups
    b = spark.createDataFrame([(x,) for x in B], "k string")
    row = kmv_set_ops(a, b, "k", k=256).collect()[0]
    assert row.union_est == 50 == row.n_exact_union
    assert row.inter_est == 10 == row.n_exact_inter
    assert row.jaccard_ppm == 1_000_000 * 10 // 50


def test_kmv_grouped_sketch_partial_window_limit(spark, events):
    """The per-set bottom-k must keep <= k rows per map task BEFORE the
    exchange (WindowGroupLimit Partial) — the O(k·partitions) scale
    contract."""
    from podcast_crawler_spark.operators.sketches import kmv_sketch

    ev = events.withColumn("set_id", F.col("event_id") % 2)
    sk = kmv_sketch(ev, "user_id", k=16, set_col="set_id")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
