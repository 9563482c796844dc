"""BM25 tests: hand-computed scores on a tiny corpus, term-absence
behavior, and the two-scan / zero-corpus-shuffle plan contract."""

import math

import pytest

from podcast_crawler_spark.operators import ranking

DOCS = [
    (1, "spark shuffle join join join"),
    (2, "hash join"),
    (3, "filter scan scan"),
    (4, "join hash hash spark"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def bm25_ref(terms, k1=1.2, b=0.75):
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tk in toks.items():
        score = 0.0
        hit = False
        for t in terms:
            tf = tk.count(t)
            if tf:
                hit = True
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if hit:
            out[d] = round(score, 6)
    return out


def test_bm25_matches_hand_computation(docs):
    got = {
        r["doc_id"]: r["score"]
        for r in ranking.bm25_topk(docs, ["join", "hash"], k=10).collect()
    }
    assert got == bm25_ref(["join", "hash"])


def test_bm25_rank_ordering_and_k(docs):
    rows = ranking.bm25_topk(docs, ["join"], k=2).collect()
    assert [r["rank"] for r in rows] == [1, 2]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) == 2


def test_bm25_absent_term_contributes_nothing(docs):
    got = {
        r["doc_id"]: r["score"]
        for r in ranking.bm25_topk(docs, ["join", "zzz"], k=10).collect()
    }
    assert got == bm25_ref(["join", "zzz"])
    assert got == bm25_ref(["join"])


def test_bm25_plan_no_corpus_shuffle(docs):
    """Scale contract: scoring is map-side (idf/avgdl literals) and the
    top-k is TakeOrderedAndProject — the only exchange in the plan is the
    single-partial-row stats/limit machinery, never a corpus repartition,
    and there is no join and no explode-to-token-table."""
    df = ranking.bm25_topk(docs, ["join", "hash"], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode


def test_inverted_index_hand_corpus(spark):
    from podcast_crawler_spark.operators.ranking import inverted_index

    rows = [
        (1, "a a b"),
        (2, "a b b c"),
        (3, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, inverted_index(df, top_k=2).collect())
    )
    # term a: df=2 total=3, top: (doc1 tf2), (doc2 tf1)
    # term b: df=3 total=4, top: (doc2 tf2), (doc1 tf1) — doc3 capped out
    # term c: df=1 total=1
    assert got == sorted(
        [
            ("a", 2, 3, 1, 1, 2),
            ("a", 2, 3, 2, 2, 1),
            ("b", 3, 4, 1, 2, 2),
            ("b", 3, 4, 2, 1, 1),
            ("c", 1, 1, 1, 2, 1),
        ]
    )


def test_inverted_index_topk_window_group_limit(spark):
    """The posting-list cap must plan as WindowGroupLimit Partial below
    the exchange — a hot term's full posting list never lands in one
    task."""
    from podcast_crawler_spark.operators.ranking import inverted_index

    df = spark.createDataFrame(
        [(i, "the quick fox") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        inverted_index(df, top_k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    final = [i for i, l in enumerate(lines)
             if "WindowGroupLimit" in l and "Final" in l]
    assert partial and final, plan
    assert min(partial) > min(final), plan


def test_tfidf_cosine_pairs_python_oracle(spark):
    import math
    from collections import Counter

    from podcast_crawler_spark.operators.ranking import tfidf_cosine_pairs

    rows = [
        (1, "apple banana apple"),
        (2, "apple banana cherry"),
        (3, "dog dog dog cherry"),
        (4, "unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.dot_int, r.cosine)
        for r in tfidf_cosine_pairs(df, max_df=10, k=10).collect()
    }

    tfs = {d: Counter(t.split(" ")) for d, t in rows}
    dfs = Counter(term for c in tfs.values() for term in c)
    nbits = len(bin(len(rows))) - 2
    w = {
        d: {
            t: tf * (nbits - (len(bin(dfs[t])) - 2))
            for t, tf in c.items()
            if tf * (nbits - (len(bin(dfs[t])) - 2)) > 0
        }
        for d, c in tfs.items()
    }
    want = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = math.sqrt(sum(x * x for x in w[a].values()))
            nb2 = math.sqrt(sum(x * x for x in w[b].values()))
            want[(a, b)] = (dot, round(dot / (na * nb2), 6))
    assert got == want
    # near-identical docs outrank the unrelated pair
    assert got[(1, 2)][1] > got[(2, 3)][1]


def test_tfidf_pairs_stopword_cap(spark):
    """Terms with df > max_df must not generate candidate pairs."""
    from podcast_crawler_spark.operators.ranking import tfidf_cosine_pairs

    rows = [(i, "common specific%d" % (i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_cosine_pairs(df, max_df=6, k=100).collect()
    # 'common' (df=10) is capped out; the specific terms (df=5) pair up
    assert out, "expected pairs from the specific terms"
    for r in out:
        assert r.id_a % 2 == r.id_b % 2


def test_doc_keywords_hand_corpus(spark):
    from podcast_crawler_spark.operators.ranking import doc_keywords

    rows = [
        (0, "apple apple banana common"),
        (1, "banana cherry common"),
        (2, "common common cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [
        (r.doc, r.rank, r.term, r.tf, r.doc_freq, r.score)
        for r in doc_keywords(df, k=2)
        .orderBy("doc", "rank")
        .collect()
    ]
    # N=3; bitlen(3//1)=2, bitlen(3//2)=1, bitlen(3//3)=1
    assert out[0] == (0, 1, "apple", 2, 1, 4)  # 2*bitlen(3)=4
    assert out[1] == (0, 2, "banana", 1, 2, 1)
    # doc 2: common tf=2 df=3 -> 2*1=2 beats cherry 1*1=1
    assert out[4] == (2, 1, "common", 2, 3, 2)
    assert out[5] == (2, 2, "cherry", 1, 2, 1)


def test_doc_keywords_plan_window_group_limit(spark):
    from podcast_crawler_spark.operators.ranking import doc_keywords

    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(50)], "doc_id long, text string"
    )
    plan = doc_keywords(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Python" not in plan, plan
