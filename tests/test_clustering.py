"""Distributed spherical k-means + SemDeDup tests: numpy mirror of the
exact fixed-iteration algorithm, degenerate/empty-cluster behavior, the
oversized-cluster guard, and the scale-contract plan shapes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from podcast_crawler_spark.operators import clustering

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _round7(x):
    # DuckDB/Spark-compatible half-away-from-zero rounding at 7 dp
    import math

    return math.copysign(math.floor(abs(x) * 1e7 + 0.5), x) / 1e7


def np_kmeans(ids, M, k, iters):
    """Independent mirror of the fixed-iteration algorithm (numpy argmax
    instead of JVM expressions; same init, rounding, and tie-break)."""
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    Vn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = np.vectorize(_round7)(Vn[:k].copy())
    for _ in range(iters):
        scores = Vn @ C.T / np.linalg.norm(C, axis=1)
        a = np.argmax(scores, axis=1)  # first max = lowest cluster id
        nxt = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                nxt[j] = np.vectorize(_round7)(Vn[m].mean(axis=0))
        C = nxt
    a = np.argmax(Vn @ C.T / np.linalg.norm(C, axis=1), axis=1)
    return dict(zip(ids.tolist(), a.tolist()))


def test_kmeans_matches_numpy_mirror(spark, emb):
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in clustering.kmeans_clusters(emb, k=8, iters=3).collect()
    }
    pdf = emb.toPandas()
    want = np_kmeans(
        pdf["vec_id"].to_numpy(),
        np.vstack(pdf["embedding"].to_numpy()).astype(np.float64),
        k=8,
        iters=3,
    )
    assert got == want
    assert len(set(got.values())) > 1  # it actually partitioned


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=4 with init centroid 3 an EXACT duplicate of centroid 0: every
    # point ties between c0 and c3 and the tie-break sends it to the
    # lower cluster, so cluster 3 is empty from the first assignment —
    # the update must keep its previous centroid (coalesce path) instead
    # of crashing or emitting a truncated centroid table
    rng = np.random.RandomState(7)
    centers = np.eye(3, 8)
    rows = [
        (0, [float(x) for x in centers[0]]),
        (1, [float(x) for x in centers[1]]),
        (2, [float(x) for x in centers[2]]),
        (3, [float(x) for x in centers[0]]),  # duplicate of id 0
    ]
    i = 4
    for g in range(3):
        for _ in range(20):
            v = centers[g] + rng.normal(0, 0.01, 8)
            rows.append((i, [float(x) for x in v]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # iteration 1: every point ties c0 vs c3 and goes to cluster 0 —
    # cluster 3 is genuinely empty after the first assignment
    import pyspark.sql.functions as F

    base = df.select(
        F.col("vec_id").alias("vid"), clustering._unit("embedding").alias("vn")
    )
    init = (
        base.orderBy("vid")
        .limit(4)
        .select(F.transform("vn", lambda x: F.round(x, 7)).alias("c"))
        .collect()
    )
    C = [list(r["c"]) for r in init]
    assert C[0] == C[3]
    first = base.withColumn("cluster_id", clustering._assign_expr(C)).collect()
    assert 3 not in {r["cluster_id"] for r in first}

    # full run: the empty cluster's centroid must survive the update
    # (coalesce path) — proven by its REVIVAL: once c0 drifts to the
    # group mean, the exact-center points defect back to the preserved
    # original centroid c3.  And the run must match the numpy mirror.
    out = clustering.kmeans_clusters(df, k=4, iters=3).collect()
    assert len(out) == 64
    got = {r["vec_id"]: r["cluster_id"] for r in out}
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    assert got == np_kmeans(ids, M, k=4, iters=3)
    assert 3 in set(got.values())  # revived — the centroid was kept


def test_semantic_dedup_flags_near_dups_within_cluster(spark):
    # two tight groups; inject exact near-copies — each copy must be
    # flagged (smaller-id original in the same cluster), originals kept
    rng = np.random.RandomState(3)
    rows = []
    i = 0
    for g in range(2):
        base = np.zeros(8)
        base[g] = 1.0
        for _ in range(10):
            v = base + rng.normal(0, 0.05, 8)
            rows.append((i, [float(x) for x in v]))
            i += 1
    # near-copies of ids 0 and 10
    for src in (0, 10):
        v = np.array(rows[src][1]) * 1.001
        rows.append((i, [float(x) for x in v]))
        i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in clustering.semantic_dedup(
            df, threshold=0.999, k=2, iters=2
        ).collect()
    }
    assert out[20][1] and out[21][1]  # the copies are dups
    assert not out[0][1] and not out[10][1]  # originals kept
    assert out[20][0] == out[0][0] and out[21][0] == out[10][0]


def test_semantic_dedup_oversized_cluster_raises(spark, emb):
    with pytest.raises(ValueError, match="max_cluster_size"):
        clustering.semantic_dedup(emb, k=2, iters=1, max_cluster_size=10)


def test_kmeans_assignment_is_map_side(emb):
    """Scale contract: the assignment stage is pure map-side — centroids
    are plan literals, so the plan contains NO join and no exchange other
    than the (tiny, k·d-partial) update aggregation."""
    assigned, _ = clustering.kmeans_fit(emb, k=4, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan  # cached base scan + project only


def test_kmeans_update_has_partial_aggregation(emb):
    """The centroid update must do map-side combine: a partial
    HashAggregate below the exchange, so only k·d partials per task cross
    the wire regardless of corpus size."""
    base = emb.select(
        F.col("vec_id").alias("vid"),
        clustering._unit("embedding").alias("vn"),
    )
    upd = (
        base.withColumn("cluster_id", F.lit(0).cast("long"))
        .select("cluster_id", F.posexplode("vn").alias("pos", "x"))
        .groupBy("cluster_id", "pos")
        .agg(F.round(F.avg("x"), 7).alias("m"))
    )
    plan = upd._jdf.queryExecution().executedPlan().toString()
    lo = plan.lower()
    assert "partial_avg" in lo or "partial" in lo
    assert "exchange" in lo


def test_semantic_dedup_pair_join_keyed_by_cluster(emb):
    """Candidate pairs are generated per cluster (join key = cluster_id),
    never as an all-pairs cross join over the corpus."""
    out = clustering.semantic_dedup(emb, threshold=0.35, k=8, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_purity_exact(spark):
    """Purity is the exact majority fraction per cluster with the
    max-struct tie rule; perfectly separated labels give 10^6 ppm."""
    import numpy as np

    from podcast_crawler_spark.operators.clustering import cluster_purity

    # two tight orthogonal groups of 6; labels: group A pure, group B
    # 4-vs-2 mixed
    # even ids = group A, odd ids = group B, so the deterministic init
    # (k smallest ids: 0 and 1) seeds one centroid per group
    rows = []
    for i in range(6):
        rows.append((2 * i, [1.0, 0.0, 0.0, float(i) * 1e-3], 7))
    for i in range(6):
        rows.append((2 * i + 1, [0.0, 1.0, 0.0, float(i) * 1e-3],
                     3 if i < 4 else 9))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.majority_label: r for r in
           cluster_purity(df, k=2, iters=3).collect()}
    assert out[7].purity_ppm == 1_000_000 and out[7].n == 6
    assert out[3].n == 6 and out[3].n_majority == 4
    assert out[3].purity_ppm == 666_666
