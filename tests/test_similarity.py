"""Similarity-search tests: brute-force cosine vs a numpy oracle; LSH and
IVF recall against the exact result."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, M


def np_topk(ids, M, qids, k):
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    for q in qids:
        sims = Mn @ Mn[id_to_row[q]]
        order = sorted(
            ((float(s), int(i)) for s, i in zip(sims, ids) if int(i) != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [(i, r + 1) for r, (s, i) in enumerate(order[:k])]
    return out


def test_cosine_topk_matches_numpy(emb, emb_np):
    from podcast_crawler_spark.operators.similarity import cosine_topk

    ids, M = emb_np
    qids = [0, 1, 2, 3]
    got = cosine_topk(emb, emb.filter(emb.vec_id < 4), k=5).collect()
    want = np_topk(ids, M, qids, 5)
    for r in got:
        assert (r.neighbor_id, r.rank) in [
            (n, rk) for n, rk in want[r.query_id]
        ], (r, want[r.query_id])
    assert len(got) == 4 * 5


def test_lsh_topk_high_recall(emb, emb_np):
    from podcast_crawler_spark.operators.similarity import lsh_topk

    ids, M = emb_np
    qids = list(range(8))
    exact = np_topk(ids, M, qids, 5)
    got = lsh_topk(emb, emb.filter(emb.vec_id < 8), k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(by_q.get(q, set()) & {n for n, _ in exact[q]}) for q in qids
    )
    # multiprobe sign-LSH on random 64-dim data: recall is approximate by
    # design; require a sane floor and correct output shape
    assert hits / (len(qids) * 5) >= 0.2
    assert all(len(v) <= 5 for v in by_q.values())


def test_ivf_topk_high_recall(emb, emb_np):
    from podcast_crawler_spark.operators.similarity import ivf_topk

    ids, M = emb_np
    qids = list(range(8))
    exact = np_topk(ids, M, qids, 5)
    got = ivf_topk(emb, emb.filter(emb.vec_id < 8), k=5, n_cells=8, nprobe=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(by_q.get(q, set()) & {n for n, _ in exact[q]}) for q in qids
    )
    assert hits / (len(qids) * 5) >= 0.3


def test_embedding_neardup_verified(emb, emb_np):
    """Every returned pair must truly exceed the cosine threshold (the
    exact-verification step guarantees no false positives)."""
    from podcast_crawler_spark.operators.similarity import embedding_neardup_pairs

    ids, M = emb_np
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    got = embedding_neardup_pairs(emb, threshold=0.35).collect()
    assert len(got) > 0
    for r in got:
        true_cos = float(Mn[id_to_row[r.id_a]] @ Mn[id_to_row[r.id_b]])
        assert true_cos >= 0.35 - 1e-9
        assert abs(true_cos - r.cos) < 1e-5
        assert r.id_a < r.id_b


def test_topk_partial_window_group_limit(emb):
    """The 10^10 scale contract of every top-k: Catalyst must split the
    rank filter into WindowGroupLimit Partial (below the exchange — each
    map task keeps only its top-k per query) and Final (above it), so no
    single task ever receives a query's whole scored corpus."""
    from podcast_crawler_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )

    q = emb.filter(emb.vec_id < 4)
    for name, df in [
        ("cosine", cosine_topk(emb, q, k=5)),
        ("lsh", lsh_topk(emb, q, k=5)),
        ("ivf", ivf_topk(emb, q, k=5, n_cells=8, nprobe=4)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        partial = [
            i for i, l in enumerate(lines)
            if "WindowGroupLimit" in l and "Partial" in l
        ]
        final = [
            i for i, l in enumerate(lines)
            if "WindowGroupLimit" in l and "Final" in l
        ]
        assert partial and final, (name, plan)
        # Partial appears BELOW (later in the tree dump than) the Final +
        # its exchange: Final line index < exchange < Partial line index
        exch = [
            i for i, l in enumerate(lines)
            if "Exchange hashpartitioning(query_id" in l
        ]
        assert exch and final[0] < exch[0] < partial[0], (name, plan)


def test_ivf_topk_distributed_bulk_queries(emb):
    """A query set exceeding the driver guard no longer raises: it takes
    the distributed cell-assignment path (mapInPandas matmul + shuffle
    join on cell, zero toPandas).  With nprobe == n_cells every cell is
    probed, so the result must EQUAL exact brute force."""
    from podcast_crawler_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    q = emb.filter(emb.vec_id < 8)
    got = ivf_topk(
        emb, q, k=5, n_cells=8, nprobe=8, max_driver_queries=4
    ).collect()
    exact = cosine_topk(emb, q, k=5).collect()
    key = lambda r: (r.query_id, r.rank)
    got_m = {key(r): (r.neighbor_id, r.cos) for r in got}
    exact_m = {key(r): (r.neighbor_id, r.cos) for r in exact}
    assert set(got_m) == set(exact_m)
    for kk, (nid, cos) in exact_m.items():
        assert got_m[kk][0] == nid, (kk, got_m[kk], (nid, cos))
        assert abs(got_m[kk][1] - cos) < 1e-6


def test_ivf_topk_distributed_fit(emb):
    """distributed_fit=True trains the coarse quantizer with the
    full-corpus distributed k-means (clustering.kmeans_fit) instead of a
    driver-side sample.  With nprobe == n_cells every cell is probed, so
    regardless of where the centroids came from the result must EQUAL
    exact brute force — this pins the wiring, not the clustering."""
    from podcast_crawler_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    q = emb.filter(emb.vec_id < 6)
    got = ivf_topk(
        emb, q, k=5, n_cells=8, nprobe=8, distributed_fit=True
    ).collect()
    exact = cosine_topk(emb, q, k=5).collect()
    key = lambda r: (r.query_id, r.rank)
    got_m = {key(r): (r.neighbor_id, r.cos) for r in got}
    exact_m = {key(r): (r.neighbor_id, r.cos) for r in exact}
    assert got_m == exact_m


def test_ivf_assign_distributed_fit_partitions_corpus(emb):
    """The distributed-fit quantizer must produce a usable partitioning:
    every vector lands in a cell, cells are within range, and more than
    one cell is populated (the corpus actually splits)."""
    from podcast_crawler_spark.operators.similarity import ivf_assign

    assigned, C = ivf_assign(emb, n_cells=8, distributed_fit=True)
    cells = [r.cell for r in assigned.select("cell").collect()]
    assert len(cells) == emb.count()
    assert all(0 <= c < 8 for c in cells)
    assert len(set(cells)) > 1
    assert C.shape[0] == 8
    # centroids are unit vectors (spherical k-means contract)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)


def test_quantize_int8_python_oracle(emb):
    import hashlib
    import math

    from podcast_crawler_spark.operators.similarity import quantize_int8

    got = {r.vec_id: r for r in quantize_int8(emb).collect()}
    for row in emb.select("vec_id", "embedding").collect():
        v = [float(x) for x in row.embedding]
        scale = max(abs(x) for x in v)
        q = [
            max(-127, min(127, math.floor(x * 127.0 / scale + 0.5)))
            for x in v
        ]
        r = got[row.vec_id]
        assert r.n_dims == len(v)
        assert r.scale == scale
        assert r.q_md5 == hashlib.md5(
            ",".join(str(c) for c in q).encode()
        ).hexdigest()
        err = max(abs(x - qi * (scale / 127.0)) for x, qi in zip(v, q))
        assert r.max_err_milli == math.floor(err * 1000.0)
        # int8 reconstruction keeps each coord within half a step
        assert err <= scale / 127.0


def test_quantize_int8_zero_shuffle(emb):
    from podcast_crawler_spark.operators.similarity import quantize_int8

    plan = (
        quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ----------------------------------------------------------------- PQ


def _pq_corpus(spark, n=40, d=8, clusters=4):
    # well-separated clusters: cluster c lives near axis block c
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(n):
        c = i % clusters
        v = rng.normal(0, 0.05, d)
        v[c * (d // clusters):(c + 1) * (d // clusters)] += 1.0
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_fit_shapes_and_determinism(spark):
    from podcast_crawler_spark.operators.similarity import pq_fit

    corpus = _pq_corpus(spark)
    cb1 = pq_fit(corpus, m=2, ksub=4, iters=2)
    cb2 = pq_fit(corpus, m=2, ksub=4, iters=2)
    assert len(cb1) == 2 and len(cb1[0]) == 4 and len(cb1[0][0]) == 4
    assert cb1 == cb2  # fixed-iteration + rounded hand-offs => bit-identical


def test_pq_encode_codes_and_audit(spark):
    from podcast_crawler_spark.operators.similarity import pq_encode, pq_fit

    corpus = _pq_corpus(spark)
    cbs = pq_fit(corpus, m=2, ksub=4, iters=2)
    enc = pq_encode(corpus, cbs).collect()
    assert len(enc) == 40
    for r in enc:
        assert 0 <= r["code_0"] < 4 and 0 <= r["code_1"] < 4
        assert r["err_milli"] >= 0
    # identical vectors must get identical codes AND identical audit
    first = corpus.filter("vec_id = 0").first()["embedding"]
    dup = spark.createDataFrame(
        [(100, first), (101, first)], "vec_id long, embedding array<float>"
    )
    d0, d1 = pq_encode(dup, cbs).orderBy("vec_id").collect()
    assert (d0["code_0"], d0["code_1"], d0["err_milli"]) == (
        d1["code_0"], d1["code_1"], d1["err_milli"]
    )


def test_pq_adc_topk_finds_true_neighbors(spark):
    from podcast_crawler_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    corpus = _pq_corpus(spark)
    cbs = pq_fit(corpus, m=2, ksub=4, iters=2)
    enc = pq_encode(corpus, cbs)
    # query = a cluster-0 member's vector; all top-k should be cluster 0
    q = corpus.filter("vec_id = 0").first()["embedding"]
    top = pq_adc_topk(enc, cbs, q, k=5).collect()
    assert len(top) == 5
    assert all(r["vec_id"] % 4 == 0 for r in top)


def test_pq_encode_plan_is_map_side(spark):
    from podcast_crawler_spark.operators.similarity import pq_encode, pq_fit

    corpus = _pq_corpus(spark)
    cbs = pq_fit(corpus, m=2, ksub=4, iters=1)
    plan = (
        pq_encode(corpus, cbs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jl_project_preserves_distances(spark):
    """The ±1/√k projection is (a) bit-deterministic across runs and
    (b) approximately norm-preserving — the JL contract the pre-filter
    relies on; orthogonal-ish inputs stay separated."""
    import numpy as np

    from podcast_crawler_spark.operators.similarity import (
        _jl_signs,
        jl_project,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 64).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = jl_project(df, in_dim=64, out_dim=16).orderBy("id").collect()
    proj = np.array([[getattr(r, f"p{j}") for j in range(16)] for r in out])
    # numpy replay of the same literals = exact same doubles
    S = np.array(_jl_signs(42, 64, 16), dtype=np.float64)
    expected = (vecs.astype(np.float64) @ S.T) / np.sqrt(16.0)
    # same values (operation order differs numpy-vs-unrolled: allow ulps)
    assert np.allclose(proj, expected, rtol=1e-12, atol=1e-12)
    # norm preservation in distribution: median ratio near 1
    r = np.linalg.norm(proj, axis=1) / np.linalg.norm(
        vecs.astype(np.float64), axis=1
    )
    assert 0.7 < np.median(r) < 1.3
