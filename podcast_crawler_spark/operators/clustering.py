"""Distributed spherical k-means and SemDeDup-style semantic dedup.

These are the clustering legs of the training-data pipeline: k-means
gives the coarse partitioning that (a) IVF ANN uses as its quantizer and
(b) semantic dedup (SemDeDup, Abbas et al. 2023) uses to bound the
pairwise-cosine comparison to within-cluster members only — the step
that turns an O(n²) corpus dedup into k independent O((n/k)²) problems
that each fit a task.

Scale design (10^10 vectors, 1000 executors):

- **Assignment is pure map-side.** Centroids are a k×d literal baked
  into the plan (k·d doubles — for the SemDeDup regime k≈100k·d=768
  that's the same "broadcast the small side" contract as every dimension
  table; here, at quantizer scale, it is a few KB of plan constants).
  Each row computes k JVM-side dot products (``aggregate``/``zip_with``
  inside whole-stage codegen — no Python, no join, no shuffle of the
  corpus) and takes the argmax.
- **The update step shuffles k×d partials per partition, not rows.**
  ``posexplode(vn)`` is map-side; the ``groupBy(cluster, pos).avg``
  that follows has map-side partial aggregation, so each map task emits
  at most k·d running sums into the exchange regardless of how many
  vectors it scanned.  Driver state per iteration is the k×d centroid
  matrix — the same footprint Spark MLlib's KMeans carries.
- **Determinism / oracle parity.** Init is the k smallest ids'
  normalized vectors; every centroid component is rounded to 7 decimals
  (in-engine, ``F.round`` / DuckDB ``round``) each iteration, so the
  entire fixed-iteration run is exactly recomputable by a DuckDB CTE
  chain — the driver correctness gate hash-checks the final
  ``(vec_id, cluster_id)`` assignment, not a recall tripwire.  Engine
  float divergence (~1 ulp on unrounded dot scores) only matters at
  exact argmax ties, which the data cannot produce; rounded values gate
  every cross-iteration hand-off.
- Ties in the argmax break to the lowest cluster id (``array_position``
  returns the first maximum; the oracle orders ``score desc,
  cluster_id``).
- Empty clusters keep their previous centroid (both sides).

Reference anchor: the reference has no clustering (its dedup is
key-based upsert, ``podcast_repository.rs:178-218``); this family is
part of the beyond-reference LLM-data-pipeline surface, sharing the
cosine kernel with ``operators/similarity.py``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit(vec_col):
    """JVM-side unit-normalize an array<float> column in float64."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(v, lambda x: x / norm)


def _lit_vec(vals: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def _dot_lit(col, vals: Sequence[float]):
    """dot(col, literal vector) as a sequential JVM fold (same summation
    order as DuckDB's list_inner_product, so scores agree to ~1 ulp)."""
    return F.aggregate(
        F.zip_with(col, _lit_vec(vals), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_expr(centroids: List[List[float]]):
    """cluster = argmax_j dot(vn, c_j)/|c_j|, ties to lowest j.

    |c_j| is a plan-time constant; ``array_position`` of the max returns
    the FIRST occurrence, which is the lowest cluster id.
    """
    norms = [
        sum_sq ** 0.5 or 1.0
        for sum_sq in (_seq_sum_sq(c) for c in centroids)
    ]
    scores = F.array(
        *[
            _dot_lit(F.col("vn"), c) / F.lit(n)
            for c, n in zip(centroids, norms)
        ]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("long")


def _seq_sum_sq(vals: Sequence[float]) -> float:
    s = 0.0
    for v in vals:
        s += float(v) * float(v)
    return s


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Tuple[DataFrame, List[List[float]]]:
    """Fixed-iteration spherical k-means.  Returns ``(assigned,
    centroids)`` where ``assigned`` is the input plus ``vn`` (unit
    vector) and ``cluster_id``, and ``centroids`` is the final k×d
    rounded centroid list.

    Each iteration runs one Spark job: map-side assignment against the
    current centroid literals, then ``posexplode → groupBy(cluster,
    pos).avg → round(7)`` (map-side combine: k·d partials per task cross
    the exchange) collected as the next k×d matrix.  ``iters`` is fixed
    (not convergence-tested) so the algorithm is a deterministic,
    oracle-recomputable function of the input.
    """
    base = corpus.select(
        F.col(id_col).alias("vid"), _unit(vec_col).alias("vn")
    )
    base.cache()

    init = (
        base.orderBy("vid")
        .limit(k)
        .select(F.transform("vn", lambda x: F.round(x, 7)).alias("c"))
        .collect()
    )
    centroids = [list(r["c"]) for r in init]

    for _ in range(iters):
        assigned = base.withColumn("cluster_id", _assign_expr(centroids))
        upd = (
            assigned.select("cluster_id", F.posexplode("vn").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("x"), 7).alias("m"))
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty cluster keeps previous
        by_cluster: dict = {}
        for r in upd:
            by_cluster.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = r["m"]
        for j, comps in by_cluster.items():
            nxt[j] = [comps[p] for p in range(len(comps))]
        centroids = nxt

    assigned = base.withColumn("cluster_id", _assign_expr(centroids))
    return assigned.withColumnRenamed("vid", id_col), centroids


def kmeans_clusters(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster_id)`` after ``iters`` deterministic iterations."""
    assigned, _ = kmeans_fit(corpus, k, iters, id_col, vec_col)
    return assigned.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """SemDeDup: ``(vec_id, cluster_id, is_dup)`` — a document is a
    semantic duplicate iff some SAME-CLUSTER document with a smaller id
    has cosine ≥ threshold with it (keep-lowest-id policy, matching the
    exact-dedup keeper rule in ``operators/dedup.py``).

    The pair join is keyed by ``cluster_id``, so candidate generation is
    k independent within-cluster self-joins — never an all-pairs over
    the corpus.  At SemDeDup's published operating point k is chosen so
    clusters hold ~10³-10⁴ members (k ≈ n/10³), keeping each cluster's
    pair expansion a single-task matmul-sized problem; cosine rides the
    same JVM kernel as ``similarity.cosine_topk``.  Only ``(id, vn)``
    enters the pair exchange.

    ``max_cluster_size`` is a loud guard, not a silent cap: a cluster
    bigger than it (k mis-sized for the corpus) would make the self-join
    quadratic, so the operator raises with the offending sizes instead
    of running a scale-killer — same fail-loudly discipline as the seen-
    set shard checks.
    """
    assigned, _ = kmeans_fit(corpus, k, iters, id_col, vec_col)
    members = assigned.select(
        F.col(id_col).alias("id"), "cluster_id", "vn"
    )
    members.cache()

    oversized = (
        members.groupBy("cluster_id")
        .count()
        .filter(F.col("count") > max_cluster_size)
        .collect()
    )
    if oversized:
        raise ValueError(
            "semantic_dedup: cluster(s) exceed max_cluster_size="
            f"{max_cluster_size}: "
            f"{[(r['cluster_id'], r['count']) for r in oversized]}; "
            "raise k (SemDeDup sizes k ~ n/10^3) or the guard"
        )

    l = members.select(
        "cluster_id", F.col("id").alias("id_a"), F.col("vn").alias("va")
    )
    r = members.select(
        "cluster_id", F.col("id").alias("id_b"), F.col("vn").alias("vb")
    )
    dup_ids = (
        l.join(r, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("va"), F.col("vb"), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        members.join(dup_ids.withColumn("is_dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").cast("long").alias(id_col),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def cluster_purity(
    corpus: DataFrame,
    label_col: str = "label",
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Clustering evaluation against ground-truth labels: per k-means
    cluster, how label-homogeneous is it?  The standard purity metric
    (majority-label fraction), exact-integer form — the quality gate
    for SemDeDup-style semantic grouping (a low-purity clustering
    over-merges unlike documents, and its within-cluster "dups" are
    false).

    Output per cluster: ``(cluster_id, n, majority_label, n_majority,
    purity_ppm)`` with the majority tie broken toward the larger label
    value (``max(struct(n, label))``, same rule as
    ``textstats.paragraph_lang_mix`` dominance).

    Composition: the fully-oracled :func:`kmeans_clusters` assignment
    joined back to the labels (narrow id→label join), two map-side
    aggregates.  The SQL oracle replays the ENTIRE k-means CTE chain
    plus the purity rollup, so a drift anywhere in the algorithm reds
    this row too.
    """
    assigned = kmeans_clusters(corpus, k, iters, id_col, vec_col)
    labeled = assigned.join(
        corpus.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(label_col).cast("long").alias("label"),
        ),
        id_col,
    )
    per = labeled.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("n_l")
    )
    agg = per.groupBy("cluster_id").agg(
        F.sum("n_l").alias("n"),
        F.max(F.struct(F.col("n_l"), F.col("label"))).alias("m"),
    )
    return agg.select(
        "cluster_id",
        "n",
        F.col("m.label").alias("majority_label"),
        F.col("m.n_l").alias("n_majority"),
        F.expr("(1000000 * m.n_l) div n").alias("purity_ppm"),
    )
