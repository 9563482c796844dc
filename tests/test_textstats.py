"""Text-analysis operator tests against straight-line python oracles."""

import hashlib
import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def test_language_id(spark):
    from podcast_crawler_spark.operators.textstats import language_id

    rows = [
        (1, "the cat and the dog of hearts"),
        (2, "der hund und die katze und der vogel"),
        (3, "zzz qqq www"),
        (4, "le chat et la maison et le chien"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.lang_pred, r.lang_score) for r in language_id(df).collect()}
    assert got[1] == ("en", 4)  # the×2 + and×1 + of×1
    assert got[2] == ("de", 5)  # der×2 + und×2 + die×1
    assert got[3] == ("unk", 0)
    assert got[4] == ("fr", 5)  # le×2 + et×2 + la×1


def test_quality_scores_python_oracle(docs, docs_pd):
    from podcast_crawler_spark.operators.textstats import quality_scores

    got = {r.id: r for r in quality_scores(docs).collect()}
    for row in docs_pd.head(25).itertuples():
        text = row.text
        toks = [t for t in text.split(" ") if t]
        n_chars = len(text)
        n_tokens = len(toks)
        padded = f" {text} "
        stop = sum(
            (len(padded) - len(padded.replace(f" {w} ", ""))) // (len(w) + 2)
            for w in ["the", "and", "of"]
        )
        alnum = sum(ch.isascii() and ch.isalnum() for ch in text)
        r = got[row.doc_id]
        assert r.n_chars == n_chars
        assert r.n_tokens == n_tokens
        assert math.isclose(r.stopword_ratio, round(stop / n_tokens, 6), abs_tol=1e-6)
        assert math.isclose(r.alnum_ratio, round(alnum / n_chars, 6), abs_tol=1e-6)
        q = (
            min(n_tokens / 20.0, 1.0) * 0.4
            + min(stop / n_tokens * 10.0, 1.0) * 0.3
            + alnum / n_chars * 0.3
        )
        assert math.isclose(r.quality, round(q, 6), abs_tol=1e-6)


def test_token_counts_python_oracle(docs, docs_pd):
    from podcast_crawler_spark.operators.textstats import token_counts

    got = {r.id: r for r in token_counts(docs).collect()}
    for row in docs_pd.head(25).itertuples():
        toks = row.text.split(" ")
        ws = sum(1 for t in toks if t)
        alnum_of = lambda s: "".join(c for c in s if c.isascii() and c.isalnum())
        bpe = sum(math.ceil(len(alnum_of(t)) / 4.0) for t in toks) + sum(
            1 for c in row.text if not (c.isascii() and c.isalnum()) and c != " "
        )
        r = got[row.doc_id]
        assert r.ws_tokens == ws
        assert r.bpe_pieces == bpe


def test_fingerprints_python_oracle(docs, docs_pd):
    from podcast_crawler_spark.operators.textstats import fingerprints

    got = {r.id: (r.fp_min, r.fp_max) for r in fingerprints(docs).collect()}
    for row in docs_pd.head(25).itertuples():
        t = row.text.split(" ")
        n_windows = max(len(t) - 8, 0) + 1
        grams = [
            hashlib.md5(" ".join(t[i:i + 8]).encode()).hexdigest()
            for i in range(n_windows)
        ]
        assert got[row.doc_id] == (min(grams), max(grams))


def test_fingerprint_shared_window_detection(spark):
    """Two docs sharing an 8-token run share fp candidates (containment)."""
    from podcast_crawler_spark.operators.textstats import fingerprints

    shared = "one two three four five six seven eight"
    rows = [(1, f"intro {shared} outro"), (2, f"{shared} totally different tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = fingerprints(df).collect()
    # the shared 8-gram's md5 must appear in both docs' [fp_min, fp_max] range
    h = __import__("hashlib").md5(shared.encode()).hexdigest()
    for r in fps:
        assert r.fp_min <= h <= r.fp_max


def test_sample_by_hash_deterministic_and_rate(spark):
    """Hash-threshold sampling: same keys in or out on every run /
    partitioning; realized rate near nominal; membership matches the
    straight-python md5 rule."""
    import hashlib

    from podcast_crawler_spark.operators.sampling import sample_by_hash

    df = spark.range(0, 5_000, 1, 4).withColumnRenamed("id", "k")
    got = {r.k for r in sample_by_hash(df, "k", 0.3).collect()}
    got2 = {r.k for r in sample_by_hash(df.repartition(13), "k", 0.3).collect()}
    assert got == got2  # partitioning-independent
    want = {
        k for k in range(5_000)
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        < int(0.3 * 2**32 + 0.5)
    }
    assert got == want
    assert 0.25 < len(got) / 5_000 < 0.35


def test_stratified_sample_rates(spark):
    from podcast_crawler_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_sample(df, "k", "lang", {"en": 0.5, "de": 0.1}).collect()
    en = sum(1 for r in out if r.lang == "en") / 2_000
    de = sum(1 for r in out if r.lang == "de") / 2_000
    assert 0.45 < en < 0.55 and 0.05 < de < 0.15


def test_vocab_df_matches_python(spark):
    from collections import Counter

    from podcast_crawler_spark.operators.textstats import vocab_df

    rows = [(1, "a b b c"), (2, "b c c"), (3, "a  a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.token, r.doc_freq, r.total_tf) for r in vocab_df(df).collect()}
    tf, dfreq = Counter(), Counter()
    for _, text in rows:
        toks = [t for t in text.split(" ") if t]
        tf.update(toks)
        dfreq.update(set(toks))
    want = {(t, dfreq[t], tf[t]) for t in tf}
    assert got == want


def test_mixture_sample_budgets(spark):
    """Acceptance rates derive from weight budgets: a stratum whose
    budget exceeds its total keeps every row at rate 1.0; sampled weight
    of a capped stratum lands near its budget; unbudgeted strata fall
    back to default_rate."""
    from podcast_crawler_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i < 400 else "small", 100) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, d string, w long")
    out = mixture_sample(
        df, "k", "d", "w", budgets={"big": 10000.0, "small": 1e9},
        default_rate=0.0,
    ).collect()
    by_d = {}
    for r in out:
        by_d.setdefault(r.d, []).append(r)
    # uncapped stratum: every row kept, rate exactly 1.0
    assert len(by_d["small"]) == 100
    assert all(r.rate == 1.0 for r in by_d["small"])
    # capped stratum: rate 10000/40000 = 0.25; hash sampling keeps ~100
    assert all(r.rate == 0.25 for r in by_d["big"])
    got_w = sum(r.w for r in by_d["big"])
    assert 0.5 * 10000 <= got_w <= 1.5 * 10000
    # default_rate=0 would drop an unbudgeted stratum entirely
    out2 = mixture_sample(
        df, "k", "d", "w", budgets={"big": 10000.0}, default_rate=0.0
    ).collect()
    assert all(r.d == "big" for r in out2)


def test_mixture_sample_membership_consistent_with_hash_rule(spark):
    """Membership must be the same md5-threshold rule as sample_by_hash
    (a row kept at rate p is kept at every rate >= p)."""
    from podcast_crawler_spark.operators.sampling import (
        key_hash32,
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "x", 10) for i in range(300)], "k long, d string, w long"
    )
    kept = {
        r.k
        for r in mixture_sample(
            df, "k", "d", "w", budgets={"x": 900.0}
        ).collect()
    }  # rate 900/3000 = 0.3
    hs = {
        r.k: r.h
        for r in df.select(
            "k", key_hash32(df["k"]).alias("h")
        ).collect()
    }
    want = {k for k, h in hs.items() if h < int(0.3 * (1 << 32) + 0.5)}
    assert kept == want


def test_lm_surprisal_handcrafted(spark):
    """Exact bit arithmetic on a corpus small enough to do by hand:
    N=8 tokens -> bitlen(8)=4; 'a' c=5 -> bits 4-bitlen(6)=1;
    'b' c=2 -> 4-bitlen(3)=2; 'z' OOV with vocab_size=2 -> 4-1=3."""
    from podcast_crawler_spark.operators.textstats import lm_surprisal

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a b z")], "doc_id long, text string"
    )
    got = {r.id: r for r in lm_surprisal(df, vocab_size=2).collect()}
    assert got[1].sum_bits == 1 + 1 + 1 + 2 == 5
    assert got[2].sum_bits == 1 + 1 + 2 + 3 == 7
    assert got[2].oov_frac == 0.25
    assert got[1].mean_bits == 1.25


def test_lm_surprisal_vocab_cap_and_determinism(spark):
    """Tokens outside the top-V vocab score as OOV; the result is
    partition-invariant (integer sums are order-independent)."""
    from podcast_crawler_spark.operators.textstats import lm_surprisal

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, lm_surprisal(docs, vocab_size=4).collect()))
    b = sorted(
        map(tuple, lm_surprisal(docs.repartition(17), vocab_size=4).collect())
    )
    assert a == b
    big = sorted(map(tuple, lm_surprisal(docs, vocab_size=10000).collect()))
    # rarer-vocab run can only raise surprisal, never lower it
    for (ka, *ra), (kb, *rb) in zip(a, big):
        assert ka == kb
        assert ra[1] >= rb[1]  # sum_bits with capped vocab >= full vocab


def test_classifier_score_python_oracle(docs, docs_pd):
    from podcast_crawler_spark.operators.textstats import classifier_score

    got = {r.id: r for r in classifier_score(docs).collect()}
    for _, row in docs_pd.iterrows():
        toks = [t for t in row.text.split(" ") if t]
        wts = [
            int(hashlib.md5(f"w:{t}".encode()).hexdigest()[:5], 16) % 2001
            - 1000
            for t in toks
        ]
        s = sum(wts)
        r = got[row.doc_id]
        assert r.n_tokens == len(toks)
        assert r.score_sum == s
        sign = (s > 0) - (s < 0)
        assert r.mean_milli == sign * (abs(s) * 1000 // len(toks))
        assert r.label == (s > 0)


def test_classifier_score_zero_shuffle(docs):
    """The hashed linear model is a pure expression — the scoring plan
    must contain no Exchange (map-side only, rides the scan)."""
    from podcast_crawler_spark.operators.textstats import classifier_score

    plan = (
        classifier_score(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ------------------------------------------------------- token divergence


def test_token_divergence_exact_bits(spark):
    from podcast_crawler_spark.operators.textstats import token_divergence

    rows = [
        ("aa aa bb", "en"),
        ("aa cc", "en"),
        ("bb bb bb dd", "de"),
    ]
    df = spark.createDataFrame(rows, "text string, lang string")
    got = {r["token"]: r.asDict() for r in token_divergence(df).collect()}
    # slice A (en): aa=3 bb=1 cc=1 (n_a=5); slice B: bb=3 dd=1 (n_b=4)
    # vocab=4 -> n_b+V=8
    assert set(got) == {"aa", "bb", "cc"}  # only cnt_a>0 tokens
    def bl(x):
        return x.bit_length()
    for tok, ca, cb in [("aa", 3, 0), ("bb", 1, 3), ("cc", 1, 0)]:
        want_bits = bl(ca) + bl(8) - bl(cb + 1) - bl(5)
        assert got[tok]["cnt_a"] == ca and got[tok]["cnt_b"] == cb
        assert got[tok]["bits"] == want_bits, tok
        assert got[tok]["w_bits"] == ca * want_bits


def test_token_divergence_explicit_slice_b_and_k(spark):
    from podcast_crawler_spark.operators.textstats import token_divergence

    rows = [("x x y", "en"), ("x", "de"), ("z", "fr")]
    df = spark.createDataFrame(rows, "text string, lang string")
    out = token_divergence(df, slice_a="en", slice_b="de", k=1).collect()
    # fr tokens count toward NEITHER slice; k caps output
    assert len(out) == 1
    assert out[0]["token"] == "x"
    assert out[0]["cnt_b"] == 1  # only the de occurrence


def test_token_divergence_plan_no_join_no_global_sort(spark):
    from podcast_crawler_spark.operators.textstats import token_divergence

    df = spark.createDataFrame([("a b", "en"), ("b", "de")],
                               "text string, lang string")
    plan = (
        token_divergence(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan  # cap, not a global Sort


def test_bigram_surprisal_hand_computed(spark):
    """Hand-checkable corpus: 'a b a b' + 'a b c'.  Unigrams: a=3, b=3,
    c=1 (N=7).  Bigrams: (a,b)=3, (b,a)=1, (b,c)=1.  With full caps,
    every transition is in-table; bits = bitlen(c_prev) - bitlen(c_bi)."""
    from podcast_crawler_spark.operators.textstats import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in bigram_surprisal(df, vocab_size=10,
                                             bigram_size=10).collect()}
    # doc 1: (a,b) bits = bitlen(3)-bitlen(3) = 0; (b,a) = bitlen(3)-bitlen(1)
    #        = 2-1 = 1; (a,b) = 0  -> sum 1 over 3 bigrams
    assert out[1].n_bigrams == 3 and out[1].sum_bits == 1
    assert out[1].backoff_frac == 0.0
    # doc 2: (a,b)=0; (b,c) = bitlen(3)-bitlen(1) = 1 -> sum 1 over 2
    assert out[2].n_bigrams == 2 and out[2].sum_bits == 1
    # doc 3 has one token -> no bigram row
    assert 3 not in out


def test_bigram_surprisal_backoff_path(spark):
    """With bigram_size=1 only the hottest bigram stays; everything else
    takes stupid backoff: backoff_bits + bitlen(N) - bitlen(c_cur+1)."""
    from podcast_crawler_spark.operators.textstats import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.id: r for r in bigram_surprisal(
        df, vocab_size=10, bigram_size=1, backoff_bits=2).collect()}
    # N=7 (bitlen 3).  (a,b) kept (count 3).  (b,a): backoff ->
    # 2 + 3 - bitlen(3+1) = 2+3-3 = 2.  (b,c): 2 + 3 - bitlen(1+1) = 3.
    assert out[1].sum_bits == 0 + 2 + 0 and out[1].n_bigrams == 3
    assert out[2].sum_bits == 0 + 3 and out[2].backoff_frac == 0.5


def test_bigram_surprisal_plan_broadcast_scoring(spark):
    """Scoring joins the capped model tables by BROADCAST — the corpus
    pair stream never shuffles on token keys; the only corpus exchange
    is the per-doc rollup (plus the two training aggregations)."""
    from podcast_crawler_spark.operators.textstats import bigram_surprisal

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        bigram_surprisal(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_pmi_collocations_hand_corpus(spark):
    from podcast_crawler_spark.operators.textstats import pmi_collocations

    # "new york" always adjacent (PMI high); "the cat" mixed with many
    # "the X" contexts (PMI low).
    rows = [
        (0, "new york new york new york"),
        (1, "the cat the dog the bird the cat"),
        (2, "new york is big the cat sat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.tok1, r.tok2): r
        for r in pmi_collocations(df, min_count=2, k=10).collect()
    }
    ny = out[("new", "york")]
    # counts: 'new'=4, 'york'=4, pair=4 (intra-doc adjacency only)
    assert (ny.c_pair, ny.c_tok1, ny.c_tok2) == (4, 4, 4)
    assert ny.score_micro == 1000000 * 4 // 16
    tc = out[("the", "cat")]
    # 'the' = 4 (doc 1) + 1 (doc 2) = 5
    assert (tc.c_pair, tc.c_tok1, tc.c_tok2) == (3, 5, 3)
    assert tc.score_micro == 1000000 * 3 // 15
    assert ny.score_micro > tc.score_micro


def test_pmi_topk_plan_no_global_sort(spark):
    from podcast_crawler_spark.operators.textstats import pmi_collocations

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    plan = (
        pmi_collocations(df, min_count=1, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan


# ---------------------------------------------------------- winnowing


def _py_winnow(text, k, w):
    import hashlib

    toks = text.split(" ")
    grams = [
        hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
        for i in range(max(len(toks) - k, 0) + 1)
    ]
    out = set()
    for j in range(max(len(grams) - w, 0) + 1):
        jend = min(j + w - 1, len(grams) - 1)
        mh = min(grams[j:jend + 1])
        pos = max(i for i in range(j, jend + 1) if grams[i] == mh)
        out.add((pos, mh))
    return out


def test_winnow_matches_python(spark):
    from podcast_crawler_spark.operators.textstats import (
        winnow_fingerprints,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and so"),
        (2, "short doc"),
        (3, "a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=5, w=4).collect()
    }
    exp = {(i, p, h) for i, t in docs for (p, h) in _py_winnow(t, 5, 4)}
    assert got == exp


def test_winnow_guarantee_shared_run(spark):
    # any shared run of >= w+k-1 tokens must share a fingerprint
    from podcast_crawler_spark.operators.textstats import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = [
        (1, "x1 y1 " + shared + " z1"),
        (2, "p2 " + shared + " q2 r2 s2"),
        (3, "unrelated words entirely here nothing common at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, w=4).collect()
    by = {}
    for r in fps:
        by.setdefault(r["id"], set()).add(r["fp"])
    assert by[1] & by[2]
    assert not (by[1] & by[3])


def test_winnow_density(spark):
    # expected density ~ 2/(w+1): far fewer fingerprints than grams
    from podcast_crawler_spark.operators.textstats import (
        winnow_fingerprints,
    )

    text = " ".join(f"t{(i * 17) % 101}" for i in range(300))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fp = winnow_fingerprints(df, k=5, w=4).count()
    n_grams = 300 - 5 + 1
    assert n_fp < 0.6 * n_grams  # 2/(w+1) = 0.4 expected


def test_winnow_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.textstats import (
        winnow_fingerprints, winnow_oracle_sql,
    )

    docs = [
        (i, " ".join(f"w{(i * j * 7) % 29}" for j in range(40)))
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=5, w=4).collect()
    )
    vals = ",".join(f"({i}, '{t}')" for i, t in docs)
    osql = winnow_oracle_sql(
        f"select * from (values {vals}) v(id, text)", k=5, w=4
    )
    exp = sorted(
        (int(a), int(b), c) for a, b, c in duckdb.sql(osql).fetchall()
    )
    assert got == exp


# ------------------------------------------------------------- scripts


def test_script_profile_pure_scripts(spark):
    from podcast_crawler_spark.operators.textstats import script_profile

    docs = [
        (1, "hello plain english"),
        (2, "привет мир"),
        (3, "你好世界"),
        (4, "مرحبا بالعالم"),
        (5, "1234 !!! ???"),
        (6, "café résumé"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["dominant_script"], r["script_pct"])
        for r in script_profile(df).collect()
    }
    assert got[1] == ("latin", 100)
    assert got[2] == ("cyrillic", 100)
    assert got[3] == ("cjk", 100)
    assert got[4] == ("arabic", 100)
    assert got[5] == ("unknown", None)
    assert got[6] == ("latin", 100)  # accented Latin counted


def test_script_profile_mixed_and_tiebreak(spark):
    from podcast_crawler_spark.operators.textstats import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello привет"),  # 5 latin vs 6 cyrillic
            (2, "ab яб"),         # exact 2-2 tie -> earlier range wins
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["latin"], r["cyrillic"], r["dominant_script"])
        for r in script_profile(df).collect()
    }
    assert got[1] == (5, 6, "cyrillic")
    assert got[2] == (2, 2, "latin")


def test_script_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.textstats import (
        script_profile, script_oracle_sql,
    )

    docs = [
        (1, "hello plain"),
        (2, "привет мир hello"),
        (3, "你好 world"),
        (4, "..."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in script_profile(df).collect())
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    osql = script_oracle_sql(f"select * from (values {vals}) v(id, text)")
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    assert [tuple(g) for g in got] == [
        tuple(int(x) if isinstance(x, int) else x for x in e) for e in exp
    ]


# ----------------------------------------------------------------- BPE


def test_bpe_candidates_counts(spark):
    from podcast_crawler_spark.operators.textstats import (
        bpe_merge_candidates,
    )

    # "abab abab ab" -> token 'abab' x2, 'ab' x1 (len>1 kept)
    df = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "x")], "doc_id long, text string"
    )
    got = {
        (r["sym1"], r["sym2"]): r["pair_count"]
        for r in bpe_merge_candidates(df, k=10).collect()
    }
    # 'abab': pairs ab, ba, ab -> per token (2 ab, 1 ba), x2 tokens
    # 'ab': 1 ab.  totals: ab=5, ba=2; 'x' dropped (len 1)
    assert got == {("a", "b"): 5, ("b", "a"): 2}


def test_bpe_candidates_tiebreak_total_order(spark):
    from podcast_crawler_spark.operators.textstats import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [(1, "ab cd ab cd ef")], "doc_id long, text string"
    )
    rows = [
        (r["sym1"], r["sym2"], r["pair_count"])
        for r in bpe_merge_candidates(df, k=2).collect()
    ]
    # ab=2, cd=2, ef=1; k=2 keeps the two count-2 pairs in (sym1,sym2)
    # order — deterministic cut at the boundary
    assert rows == [("a", "b", 2), ("c", "d", 2)]


def test_bpe_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.textstats import (
        bpe_merge_candidates, bpe_oracle_sql,
    )

    docs = [
        (i, " ".join(f"w{(i * j) % 17}x{(j * 3) % 7}" for j in range(20)))
        for i in range(1, 8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in bpe_merge_candidates(df, k=25).collect()]
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    osql = bpe_oracle_sql(f"select * from (values {vals}) v(id, text)", k=25)
    exp = [
        (a, b, int(c)) for a, b, c in duckdb.sql(osql).fetchall()
    ]
    assert got == exp


def test_bpe_encode_matches_python(spark):
    import hashlib
    from podcast_crawler_spark.operators.textstats import bpe_encode

    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]

    def enc(tok):
        seq = " " + " ".join(list(tok)) + " "
        for a, b in merges:
            seq = seq.replace(f" {a} {b} ", f" {a}{b} ")
        return seq.strip()

    docs = [(1, "the cat and the hat"), (2, "x"), (3, "thethe and")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: tuple(r)[1:] for r in bpe_encode(df, merges).collect()}
    for i, t in docs:
        toks = [x for x in t.split(" ") if x]
        pieces = [enc(x) for x in toks]
        np = sum(len(p.split(" ")) for p in pieces)
        md = hashlib.md5("/".join(pieces).encode()).hexdigest()
        assert got[i] == (len(toks), np, md)


def test_bpe_encode_merge_priority_order(spark):
    # ("t","h") must merge before ("th","e") can fire — reversing the
    # table changes the segmentation
    from podcast_crawler_spark.operators.textstats import bpe_encode

    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    fwd = bpe_encode(df, [("t", "h"), ("th", "e")]).collect()[0]
    rev = bpe_encode(df, [("th", "e"), ("t", "h")]).collect()[0]
    assert fwd["n_pieces"] == 1  # t h e -> th e -> the
    assert rev["n_pieces"] == 2  # 'th e' merge can't fire first -> th, e


def test_bpe_encode_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.textstats import (
        bpe_encode, bpe_encode_oracle_sql,
    )

    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")]
    docs = [(i, f"thing{i} the ring singing w{i}") for i in range(1, 8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in bpe_encode(df, merges).collect())
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    osql = bpe_encode_oracle_sql(
        f"select * from (values {vals}) v(id, text)", merges
    )
    exp = sorted(
        (int(a), int(b), int(c), d)
        for a, b, c, d in duckdb.sql(osql).fetchall()
    )
    assert got == exp



def test_normalize_text_rules(spark):
    from podcast_crawler_spark.operators.textstats import normalize_text

    docs = [
        (1, "plain ascii text"),
        (2, "zero\u200bwidth\u200c here"),
        (3, "curly \u2018quotes\u2019 and \u201cdouble\u201d"),
        (4, "dash \u2013 and \u2014 plus \u2026 nbsp\u00a0end"),
        (5, "  spaced   out  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["text"], r["n_changed"])
           for r in normalize_text(df).collect()}
    assert got[1] == ("plain ascii text", 0)
    assert got[2] == ("zerowidth here", 2)
    assert got[3] == ("curly 'quotes' and \"double\"", 0)
    assert got[4] == ("dash - and - plus ... nbsp end", -2)
    assert got[5] == ("spaced out", 6)


def test_normalize_makes_dedup_evaders_identical(spark):
    # byte-distinct, render-identical docs collapse to one digest
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.textstats import normalize_text

    df = spark.createDataFrame(
        [
            (1, "the same\u200b sentence here"),
            (2, "the same sentence\u00a0here"),
        ],
        "doc_id long, text string",
    )
    out = normalize_text(df).select(F.md5("text").alias("d")).collect()
    assert out[0]["d"] == out[1]["d"]


def test_normalize_oracle_matches(spark):
    import duckdb

    from podcast_crawler_spark.operators.textstats import (
        normalize_oracle_sql, normalize_text,
    )

    docs = [
        (1, "a\u200bb \u2018c\u2019"),
        (2, "plain"),
        (3, "x \u2026 y\u00a0z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in normalize_text(df).collect())
    vals = ",".join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in docs
    )
    osql = normalize_oracle_sql(f"select * from (values {vals}) v(id, text)")
    exp = sorted((int(a), b, int(c)) for a, b, c in duckdb.sql(osql).fetchall())
    assert [tuple(g) for g in got] == exp


# -------------------------------------------------------- trigram LID


def test_lang_id_ngram_discriminates_and_handles_nospace(spark):
    from podcast_crawler_spark.operators.textstats import lang_id_ngram

    docs = [
        (1, "the dogs were there with them over the day"),
        (2, "der hund springt ueber den anderen hund den ganzen tag"),
        (3, "le chien saute par dessus les autres chiens la journee"),
        (4, "el perro salta sobre los otros perros todo el dia"),
        (5, "zzz qqq xxx"),
        (6, "thequickbrownfoxjumpsoverthelazydog"),  # no spaces
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["lang_pred"], r["margin"])
           for r in lang_id_ngram(df).collect()}
    assert got[1][0] == "en" and got[2][0] == "de"
    assert got[3][0] == "fr" and got[4][0] == "es"
    assert got[5] == ("unk", 0)
    assert got[6][0] == "en" and got[6][1] > 0  # stopword LID can't


def test_lang_id_ngram_python_oracle(spark):
    from podcast_crawler_spark.operators.textstats import (
        LID_PROFILES, lang_id_ngram,
    )

    text = "the rapid dog and der hund"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = lang_id_ngram(df).collect()[0]
    padded = " " + text.lower() + " "
    scores = {
        lang: sum(padded.count(g) * w for g, w in prof)
        for lang, prof in LID_PROFILES.items()
    }
    best = max(scores.values())
    pred = min(l for l, s in scores.items() if s == best)
    second = max(s for l, s in scores.items() if l != pred)
    assert (r["lang_pred"], r["lang_score"], r["margin"]) == (
        pred, best, best - second
    )


def test_lang_id_ngram_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.textstats import (
        lang_id_ngram, lang_id_ngram_oracle_sql,
    )

    docs = [
        (1, "the day with the dogs"),
        (2, "den ganzen tag mit den hunden"),
        (3, "mixed le the der el"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in lang_id_ngram(df).collect())
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    osql = lang_id_ngram_oracle_sql(
        f"select * from (values {vals}) v(id, text)"
    )
    exp = sorted(
        (int(a), b, int(c), int(d))
        for a, b, c, d in duckdb.sql(osql).fetchall()
    )
    assert [tuple(g) for g in got] == exp


def test_paragraph_lang_mix_rollup(spark):
    """A two-language doc reports both classes with the majority
    dominant and an exact mix_ppm; a single-language doc is pure; an
    empty-paragraph doc is absent."""
    from podcast_crawler_spark.operators.textstats import (
        paragraph_lang_mix,
    )

    en = "the quick thing and the other things that we have here"
    fr = "les choses que nous avons dans cette vie sont les leurs"
    docs = spark.createDataFrame(
        [
            (1, f"{en}\n\n{fr}\n\n{en}"),
            (2, f"{en}\n\n{en}"),
            (3, "   \n\n  "),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in paragraph_lang_mix(docs).collect()}
    assert set(out) == {1, 2}
    d1 = out[1]
    assert (d1.n_paras, d1.n_langs, d1.dominant_lang) == (3, 2, "en")
    assert d1.dominant_n == 2 and d1.mix_ppm == 333_333
    d2 = out[2]
    assert (d2.n_langs, d2.dominant_lang, d2.mix_ppm) == (1, "en", 0)


def test_lid_agreement_routing(spark):
    """Non-unk agreement accepts; disagreement or double-unk
    quarantines."""
    from podcast_crawler_spark.operators.textstats import lid_agreement

    en = ("the cat and the dog with a thing of the day that is here "
          "and there was this from")
    docs = spark.createDataFrame(
        [(1, en), (2, "zzz qqq xxx 12345")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in lid_agreement(docs).collect()}
    assert out[1].lang_stop == "en" and out[1].lang_tri == "en"
    assert out[1].decision == "accept"
    assert out[2].decision == "quarantine"
    # fused composition: one projection over one scan, no join
    q = lid_agreement(docs)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_tokenizer_fertility_matches_python(docs):
    from podcast_crawler_spark.operators.textstats import tokenizer_fertility

    import re

    pdf = docs.select("lang", "text").toPandas()
    exp = {}
    for lang, text in zip(pdf["lang"], pdf["text"]):
        toks = [t for t in text.split(" ") if t]
        pieces = sum(
            math.ceil(len(re.sub(r"[^a-zA-Z0-9]", "", t)) / 4.0)
            for t in text.split(" ")
        ) + len(re.sub(r"[a-zA-Z0-9 ]", "", text))
        d = exp.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(toks)
        d[2] += pieces
        d[3] += len(text)
    out = {r["lang"]: r for r in tokenizer_fertility(docs).collect()}
    assert set(out) == set(exp)
    for lang, (nd, ws, pieces, chars) in exp.items():
        r = out[lang]
        assert (r["n_docs"], r["n_ws_tokens"], r["n_pieces"], r["n_chars"]) \
            == (nd, ws, pieces, chars)
        assert r["fertility_ppm"] == 1_000_000 * pieces // max(ws, 1)
        assert r["chars_per_piece_ppm"] == 1_000_000 * chars // max(pieces, 1)


def test_dsir_weights_prefers_target_language(docs):
    from podcast_crawler_spark.operators.sampling import dsir_weights

    from pyspark.sql import functions as F

    out = dsir_weights(
        docs.withColumn("is_en", F.col("lang") == "en"), "is_en"
    )
    rows = out.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).collect()
    en_w = [r["dsir_logw_micro"] for r in rows if r["lang"] == "en"]
    other_w = [r["dsir_logw_micro"] for r in rows if r["lang"] != "en"]
    # the target slice must score higher than the rest on average, and
    # docs score deterministically (re-run equality on a sample handled
    # by the oracle harness)
    assert sum(en_w) / len(en_w) > sum(other_w) / len(other_w)
    # weights are exact integers; every doc present exactly once
    assert len(rows) == docs.count()


def test_dsir_weights_singleton_and_empty_docs(spark):
    from podcast_crawler_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame(
        [(1, "hello", True), (2, "", False), (3, "a b", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {r["doc_id"]: r for r in dsir_weights(df, "tgt").collect()}
    assert len(out) == 3
    # one unigram, no bigram (sequence guard: size<2 must not blow up)
    assert out[1]["n_feats"] == 1
    # empty text -> zero features, zero weight, not selected
    assert out[2]["n_feats"] == 0 and out[2]["dsir_logw_micro"] == 0
    assert not out[2]["target_like"]
    # two unigrams + one bigram
    assert out[3]["n_feats"] == 3


def test_ccnet_buckets_thirds_and_rank_equivalence(spark):
    """ccnet_buckets: (a) the two-phase distributed rank equals a naive
    per-language row_number window on the same integer scores; (b)
    bucket sizes follow the exact-thirds rule; (c) head really is the
    low-score (low-perplexity) end."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.textstats import (
        ccnet_buckets,
        lm_surprisal,
    )

    # two languages, 10 + 7 docs, mixed common/rare tokens so scores
    # spread; doc text deterministic from the id
    rows = []
    for i in range(10):
        rows.append((i, "en", ("the of and " * (i % 3 + 1))
                     + f"rare{i} " + "web page text " * (i % 4)))
    for i in range(10, 17):
        rows.append((i, "fr", ("le la et " * (i % 2 + 1))
                     + f"rare{i} mot"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_buckets(df, vocab_size=8).toPandas()
    assert len(out) == 17
    # (a) rank equivalence vs a naive window
    scored = lm_surprisal(df, vocab_size=8).select(
        "id", F.expr("1000000 * sum_bits div n_tokens").alias("score_ppm")
    ).join(df.select(F.col("doc_id").alias("id"), "lang"), "id")
    naive = scored.withColumn(
        "rk_naive",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("score_ppm", "id")
        ),
    ).toPandas().set_index("id")
    for r in out.itertuples(index=False):
        assert int(r.rk) == int(naive.loc[r.id].rk_naive), r
    # (b) exact thirds: en 10 → 4/3/3, fr 7 → 3/2/2
    en = out[out.lang == "en"].bucket.value_counts().to_dict()
    fr = out[out.lang == "fr"].bucket.value_counts().to_dict()
    assert en == {"head": 4, "middle": 3, "tail": 3}
    assert fr == {"head": 3, "middle": 2, "tail": 2}
    # (c) every head score <= every tail score within a language
    for lang in ("en", "fr"):
        sub = out[out.lang == lang]
        assert (sub[sub.bucket == "head"].score_ppm.max()
                <= sub[sub.bucket == "tail"].score_ppm.min())


def test_ccnet_buckets_single_lang_and_ties(spark):
    """All-tied scores (identical docs) still produce a total order
    (ties broken by id) and exact thirds."""
    from podcast_crawler_spark.operators.textstats import ccnet_buckets

    df = spark.createDataFrame(
        [(i, "en", "same words here") for i in range(9)],
        "doc_id long, lang string, text string",
    )
    out = ccnet_buckets(df, vocab_size=8).orderBy("rk").toPandas()
    assert list(out.rk) == list(range(1, 10))
    assert list(out.id) == list(range(9))  # tie → id order
    assert list(out.bucket) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_calibration_audit_bins_and_gaps(spark):
    """Bin clamping at both edges, integer obs/pred/gap, and a
    perfectly calibrated construction landing gap 0 in its bin."""
    from podcast_crawler_spark.operators.textstats import (
        calibration_audit,
    )

    rows = []
    # bin 0 midpoint pred = 50000 ppm; make obs exactly 50000: 1 pos
    # in 20 docs at score 0 (score range [0, 99] → bin 0 of 10 over
    # [0, 999])
    for i in range(20):
        rows.append((0, i == 0))
    # bin 9: scores at the top edge, all positive → obs 1e6, pred
    # 950000, gap 50000
    for i in range(4):
        rows.append((999, True))
    # out-of-range scores clamp: -50 → bin 0, 2000 → bin 9
    rows.append((-50, False))
    rows.append((2000, True))
    df = spark.createDataFrame(rows, "score int, label boolean")
    out = {r.bin: r for r in calibration_audit(
        df, "score", "label", score_min=0, score_max=999, n_bins=10
    ).collect()}
    assert set(out) == {0, 9}
    b0, b9 = out[0], out[9]
    assert b0.n == 21 and b0.n_pos == 1   # includes the clamped -50
    assert b0.pred_ppm == 50_000
    assert b0.obs_ppm == 1_000_000 * 1 // 21
    assert b0.gap_ppm == abs(50_000 - b0.obs_ppm)
    assert b9.n == 5 and b9.n_pos == 5 and b9.obs_ppm == 1_000_000
    assert b9.pred_ppm == 950_000 and b9.gap_ppm == 50_000
    # mean_score is the TRUNCATED integer mean (includes clamped rows):
    # bin 0 sum is -50 over 21 rows → -2 (toward zero; floor would be -3)
    assert b0.mean_score == -2
    assert b9.mean_score == (999 * 4 + 2000) // 5
