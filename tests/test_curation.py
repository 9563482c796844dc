"""Curation operator tests (repetition, decontamination, PII) against
straight-line python oracles and brute-force recomputations."""

from collections import Counter

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _brute_rep(text, n=2, max_tokens=256):
    toks = [t for t in text.split(" ") if t][:max_tokens]
    grams = [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)]
    top = max(Counter(grams).values())
    return (
        len(grams),
        len(set(grams)),
        round((len(grams) - len(set(grams))) / len(grams), 6),
        top,
        round(top / len(grams), 6),
    )


def test_repetition_scores_handcrafted(spark):
    from podcast_crawler_spark.operators.curation import repetition_scores

    rows = [
        (1, "a b a b a b a b"),  # "a b" x4, "b a" x3
        (2, "x x x x x"),  # single repeated gram "x x" x4
        (3, "one two three four"),  # all distinct
        (4, "solo"),  # shorter than n -> one whole-doc gram
        (5, "  padded   tokens  "),  # empty-token filtering
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in repetition_scores(df).collect()}
    for doc_id, text in rows:
        ng, nd, dup, top, topf = _brute_rep(text)
        r = got[doc_id]
        assert (r.n_grams, r.n_distinct, r.top_ngram_count) == (ng, nd, top), text
        assert abs(r.dup_ngram_frac - dup) < 1e-9
        assert abs(r.top_ngram_frac - topf) < 1e-9
    # spot values: doc 1 has 7 grams, 2 distinct, top "a b" x4
    assert got[1].n_grams == 7 and got[1].n_distinct == 2
    assert got[1].top_ngram_count == 4
    assert got[2].top_ngram_count == 4 and got[2].n_distinct == 1
    assert got[3].dup_ngram_frac == 0.0
    assert got[4].n_grams == 1 and got[4].top_ngram_count == 1


def test_repetition_scores_brute_force_corpus(docs):
    from podcast_crawler_spark.operators.curation import repetition_scores

    got = {r.id: r for r in repetition_scores(docs).collect()}
    for row in docs.toPandas().head(40).itertuples():
        ng, nd, dup, top, topf = _brute_rep(row.text)
        r = got[row.doc_id]
        assert (r.n_grams, r.n_distinct, r.top_ngram_count) == (ng, nd, top)
        assert abs(r.dup_ngram_frac - dup) < 1e-9


def test_repetition_scores_map_side_only(docs):
    from podcast_crawler_spark.operators.curation import repetition_scores

    plan = repetition_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_contamination_handcrafted(spark):
    from podcast_crawler_spark.operators.curation import contamination

    corpus = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 tail"),  # shares the 8-gram prefix
            (2, "clean text with no overlap at all here ok"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),  # the benchmark doc itself
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(3, "w1 w2 w3 w4 w5 w6 w7 w8")], "doc_id long, text string"
    )
    got = {r.id: r for r in contamination(corpus, bench).collect()}
    assert got[1].contaminated and got[1].n_contaminated == 1
    assert not got[2].contaminated and got[2].n_contaminated == 0
    assert got[3].contaminated


def test_contamination_broadcast_vs_exploded(spark, docs):
    from podcast_crawler_spark.operators.curation import contamination

    bench = docs.filter(F.col("doc_id") % 17 == 0)
    a = contamination(docs, bench, broadcast_bench=True)
    b = contamination(docs, bench, broadcast_bench=False)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_pii_scrub_handcrafted(spark):
    from podcast_crawler_spark.operators.curation import pii_scrub

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org thanks"),
        (2, "call 555-867-5309 or 123-456-7890 now"),
        (3, "server at 10.0.0.1 and 192.168.12.255 up"),
        (4, "mixed a@b.co 1.2.3.4 999-888-7777"),
        (5, "none of the above"),
        # email domain must NOT be re-matched as phone/ip after redaction
        (6, "x@10.22.33.com stays one email"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (1, 0, 0)
    assert got[1].redacted == "mail me at <EMAIL> thanks"
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 2, 0)
    assert got[2].redacted == "call <PHONE> or <PHONE> now"
    assert (got[3].n_emails, got[3].n_phones, got[3].n_ips) == (0, 0, 2)
    assert got[3].redacted == "server at <IP> and <IP> up"
    assert got[4].redacted == "mixed <EMAIL> <IP> <PHONE>"
    assert got[5].redacted == "none of the above"
    assert (got[6].n_emails, got[6].n_phones, got[6].n_ips) == (1, 0, 0)
    assert got[6].redacted == "<EMAIL> stays one email"


def test_pii_scrub_map_side_only(docs):
    from podcast_crawler_spark.operators.curation import pii_scrub

    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _naive_pack(spark, df, budget):
    """Single-task global-window reference implementation."""
    from pyspark.sql import Window

    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    w = (
        Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(F.col("doc_id").alias("id"), F.size(toks).cast("long").alias("n_tokens"))
        .withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "start_offset",
            (F.col("start_offset") / 7).cast("long").alias("shard_id"),
        )
    )


def test_pack_shards_handcrafted(spark):
    from podcast_crawler_spark.operators.curation import pack_shards

    rows = [
        (1, "a b c"),  # 3 tokens, start 0, shard 0
        (2, "d e f g h"),  # 5 tokens, start 3, shard 0
        (3, "i j"),  # start 8, shard 1 (budget 7)
        (4, ""),  # zero tokens, start 10, shard 1
        (5, "k " * 20),  # 20 tokens (> budget): starts in shard 1, spans on
        (6, "end"),  # start 30, shard 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in pack_shards(df, budget=7).collect()}
    assert (got[1].n_tokens, got[1].start_offset, got[1].shard_id) == (3, 0, 0)
    assert (got[2].start_offset, got[2].shard_id) == (3, 0)
    assert (got[3].start_offset, got[3].shard_id) == (8, 1)
    assert (got[4].n_tokens, got[4].start_offset) == (0, 10)
    assert (got[5].n_tokens, got[5].start_offset, got[5].shard_id) == (20, 10, 1)
    assert (got[6].start_offset, got[6].shard_id) == (30, 4)


def test_pack_shards_equals_naive_global_window(spark, docs):
    from podcast_crawler_spark.operators.curation import pack_shards

    # force many range partitions so partition offsets really matter
    a = pack_shards(docs, budget=7, num_partitions=13)
    b = _naive_pack(spark, docs, 7)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_pack_shards_plan(docs):
    """The corpus-scale prefix sum must never pass through a single
    task: the corpus moves through exactly ONE hashpartitioning(bkt)
    exchange whose shuffle write also serves the totals branch
    (ReusedExchange — AQE materializes the reuse at runtime, so the
    query must execute first), and the only SinglePartition exchange
    carries the B per-bucket totals."""
    from podcast_crawler_spark.operators.curation import pack_shards

    q = pack_shards(docs, budget=2048, num_partitions=13)
    q.collect()  # finalize the adaptive plan on THIS QueryExecution
    plan = q._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan's toString appends the pre-AQE "Initial Plan";
    # assert on the final plan only
    final = plan.split("Initial Plan")[0]
    assert "isFinalPlan=true" in final, plan
    # single corpus-size shuffle; the totals branch reads the cached
    # windowed rows, it never re-shuffles (or re-tokenizes) the corpus
    assert final.count("Exchange hashpartitioning(bkt") == 1, plan
    assert final.count("lambdafunction") <= 1, plan  # one tokenize pass
    # corpus window is per-bucket, never an empty spec over the data
    assert "windowspecdefinition(bkt" in final, plan
    # the lone single-task exchange carries only the B bucket totals
    assert final.count("Exchange SinglePartition") <= 1, plan


def test_global_shuffle_matches_python_permutation(spark, docs):
    """The distributed rank must equal the single-process permutation:
    sort ids by md5(f"{id}:{seed}") in plain python."""
    import hashlib

    from podcast_crawler_spark.operators.curation import global_shuffle

    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expect = {
        i: pos
        for pos, i in enumerate(
            sorted(ids, key=lambda i: (hashlib.md5(f"{i}:7".encode()).hexdigest(), i))
        )
    }
    got = {
        r.id: (r.shuffle_pos, r.out_file)
        for r in global_shuffle(docs, seed=7, rows_per_file=100).collect()
    }
    assert len(got) == len(expect)
    for i, pos in expect.items():
        assert got[i] == (pos, pos // 100), (i, pos, got[i])


def test_global_shuffle_seed_changes_order(spark, docs):
    from podcast_crawler_spark.operators.curation import global_shuffle

    a = {r.id: r.shuffle_pos for r in global_shuffle(docs, seed=1).collect()}
    b = {r.id: r.shuffle_pos for r in global_shuffle(docs, seed=2).collect()}
    assert a.keys() == b.keys()
    assert any(a[i] != b[i] for i in a), "different seeds must permute differently"
    # and each is a permutation of 0..n-1
    assert sorted(a.values()) == list(range(len(a)))
    assert sorted(b.values()) == list(range(len(b)))


def test_global_shuffle_plan(docs):
    """Same plan contract as pack_shards: one corpus-size exchange, the
    totals branch reads the cache, B-row single-task exchange only."""
    from podcast_crawler_spark.operators.curation import global_shuffle

    q = global_shuffle(docs, seed=7)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "isFinalPlan=true" in final, plan
    assert final.count("Exchange hashpartitioning(bkt") == 1, plan
    assert final.count("md5") <= 1, plan  # digest computed in one pass
    assert "windowspecdefinition(bkt" in final, plan
    assert final.count("Exchange SinglePartition") <= 1, plan


def test_paragraph_dedup_handcrafted(spark):
    """Boilerplate paragraphs (global count >= min_dup) drop; unique
    paragraphs survive in original order; a doc losing everything keeps
    an empty clean_text row."""
    from podcast_crawler_spark.operators.curation import paragraph_dedup

    B = "cookie banner"
    rows = [
        (1, f"{B}\n\nalpha unique one\n\nbeta unique two"),
        (2, f"{B}\n\ngamma unique three"),
        (3, f"{B}\n\n{B}"),  # all paragraphs are boilerplate
        (4, "delta solo paragraph"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in paragraph_dedup(df, min_dup=2).collect()}
    assert got[1].clean_text == "alpha unique one\n\nbeta unique two"
    assert (got[1].n_paras, got[1].n_dropped) == (3, 1)
    assert got[2].clean_text == "gamma unique three"
    assert got[3].clean_text == ""
    assert (got[3].n_paras, got[3].n_dropped) == (2, 2)
    assert got[3].dup_frac == 1.0
    assert got[4].clean_text == "delta solo paragraph"
    assert got[4].n_dropped == 0


def test_paragraph_dedup_within_doc_repeat_counts(spark):
    """min_dup counts OCCURRENCES corpus-wide, so a paragraph repeated
    twice inside one document is boilerplate by the same rule."""
    from podcast_crawler_spark.operators.curation import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "same para\n\nmiddle bit\n\nsame para")],
        "doc_id long, text string",
    )
    r = paragraph_dedup(df, min_dup=2).collect()[0]
    assert r.clean_text == "middle bit"
    assert (r.n_paras, r.n_dropped) == (3, 2)


def test_paragraph_dedup_partitioning_invariant(spark, docs):
    """Result is a pure function of the corpus — identical under a
    different partitioning (the global count table sees all shards)."""
    from podcast_crawler_spark.operators.curation import paragraph_dedup

    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("shared head\n\n"), F.col("text"), F.lit("\n\ntail "),
            F.col("doc_id"),
        ).alias("text"),
    )
    a = sorted(
        (r.id, r.clean_text, r.n_dropped)
        for r in paragraph_dedup(base, min_dup=2).collect()
    )
    b = sorted(
        (r.id, r.clean_text, r.n_dropped)
        for r in paragraph_dedup(base.repartition(13), min_dup=2).collect()
    )
    assert a == b
    assert all(n >= 1 for _, _, n in a)  # shared head always drops


def test_export_manifest_membership_and_fingerprint(spark):
    import hashlib

    from podcast_crawler_spark.operators.curation import (
        export_manifest,
        global_shuffle,
    )

    df = spark.createDataFrame(
        [(i, "tok " * (i % 5 + 1)) for i in range(57)],
        "doc_id long, text string",
    )
    man = {r.out_file: r for r in export_manifest(df, rows_per_file=10).collect()}
    assign = global_shuffle(df, rows_per_file=10).collect()
    by_file = {}
    for r in assign:
        by_file.setdefault(r.out_file, []).append(r)
    assert set(man) == set(by_file)
    total = 0
    for f, rows in by_file.items():
        m = man[f]
        assert m.n_docs == len(rows)
        assert m.first_pos == min(r.shuffle_pos for r in rows)
        assert m.last_pos == max(r.shuffle_pos for r in rows)
        fp = sum(
            int(hashlib.md5(f"{r.id}:fp".encode()).hexdigest()[:12], 16)
            for r in rows
        )
        assert m.content_fp == fp
        total += m.n_docs
        # 'tok ' * k splits to k tokens; ids unknown per file, so check sum
        assert m.n_tokens == sum((r.id % 5 + 1) for r in rows)
        assert m.n_bytes == sum(4 * (r.id % 5 + 1) for r in rows)
    assert total == 57
    # full files hold exactly rows_per_file docs; only the last is ragged
    sizes = [man[f].n_docs for f in sorted(man)]
    assert sizes[:-1] == [10] * 5 and sizes[-1] == 7


def test_length_buckets_pow2_and_waste(spark):
    from podcast_crawler_spark.operators.curation import length_buckets

    docs = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, n in [(1, 1), (2, 15), (3, 16), (4, 17), (5, 100)]
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["bucket_cap"]: (r["n_docs"], r["total_tokens"], r["waste_pct"])
        for r in length_buckets(df).collect()
    }
    # 1, 15, 16 -> cap 16; 17 -> 32; 100 -> 128
    assert got[16] == (3, 32, 33)
    assert got[32] == (1, 17, 46)
    assert got[128] == (1, 100, 21)


def test_length_buckets_truncation_visible(spark):
    # doc beyond max_bucket: negative waste, not silently hidden
    from podcast_crawler_spark.operators.curation import length_buckets

    df = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(300)))],
        "doc_id long, text string",
    )
    row = length_buckets(df, max_bucket=256).collect()[0]
    assert row["bucket_cap"] == 256 and row["waste_pct"] < 0


def test_length_buckets_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.curation import (
        length_buckets, length_buckets_oracle_sql,
    )

    docs = [
        (i, " ".join(f"w{j}" for j in range((i * 13) % 70)))
        for i in range(1, 20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in length_buckets(df).collect())
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    osql = length_buckets_oracle_sql(
        f"select * from (values {vals}) v(id, text)"
    )
    exp = sorted(tuple(int(x) for x in r) for r in duckdb.sql(osql).fetchall())
    assert [tuple(int(x) for x in g) for g in got] == exp


def test_curriculum_interleave_cadence(spark):
    from podcast_crawler_spark.operators.curation import (
        curriculum_interleave,
    )

    # 90 docs of source A, 10 of B: in interleave order, every prefix
    # of length ~10k/1k should contain B at ~its share
    rows = [(i, "A") for i in range(90)] + [(100 + i, "B") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        (r["interleave_key"], r["source"], r["src_rank"], r["id"])
        for r in curriculum_interleave(df).collect()
    )
    first20 = [s for _, s, _, _ in out[:20]]
    assert first20.count("B") >= 1  # B appears early, not after all of A
    # every source's ranks are a permutation 1..n
    ranks_a = sorted(r for _, s, r, _ in out if s == "A")
    ranks_b = sorted(r for _, s, r, _ in out if s == "B")
    assert ranks_a == list(range(1, 91)) and ranks_b == list(range(1, 11))
    # proportional spacing: B's keys are ~evenly spread over the axis
    keys_b = sorted(k for k, s, _, _ in out if s == "B")
    gaps = [b - a for a, b in zip(keys_b, keys_b[1:])]
    assert max(gaps) <= 2 * min(gaps)


def test_curriculum_interleave_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.curation import (
        curriculum_interleave, interleave_oracle_sql,
    )

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(tuple(r) for r in curriculum_interleave(df).collect())
    vals = ",".join(f"({i},'{s}')" for i, s in rows)
    osql = interleave_oracle_sql(
        f"select * from (values {vals}) v(id, source)"
    )
    exp = sorted(
        tuple(int(x) if isinstance(x, int) else x for x in r)
        for r in duckdb.sql(osql).fetchall()
    )
    assert [tuple(int(x) if isinstance(x, int) else x for x in g)
            for g in got] == exp


def test_split_leakage_detects_cross_split_twins(spark):
    """Byte-identical docs with different keys leak across splits and
    are reported; keying the split by a GROUP id that ties the twins
    together removes the leak; a dup-free corpus reports nothing."""
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.curation import split_leakage

    # 200 unique docs + one duplicated text carried by 30 different ids
    rows = [(i, f"g{i}", f"unique text {i}") for i in range(200)] + [
        (1000 + i, "gdup", "identical twin body") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    leaks = split_leakage(df, "doc_id", val_pct=20, test_pct=20).collect()
    assert len(leaks) == 1
    assert leaks[0].n_docs == 30 and leaks[0].n_splits >= 2
    assert "," in leaks[0].splits
    # group-keyed split: all twins share grp -> one split -> no leak
    assert (
        split_leakage(df, "grp", val_pct=20, test_pct=20).count() == 0
    )
    clean = df.filter(F.col("doc_id") < 200)
    assert split_leakage(clean, "doc_id", val_pct=20, test_pct=20).count() == 0


def test_chunk_documents_windows_and_tail(spark):
    """Window starts advance by chunk−overlap; consecutive chunks share
    the overlap; the clipped tail survives; empty docs vanish."""
    import hashlib

    from podcast_crawler_spark.operators.curation import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "   ")], "id long, text string"
    )
    out = [
        (r.id, r.chunk_idx, r.start_tok, r.n_tokens_chunk, r.chunk_md5)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2, id_col="id")
        .orderBy("id", "chunk_idx").collect()
    ]
    toks = [f"t{i}" for i in range(10)]
    exp = []
    for idx, s in enumerate(range(0, 10, 2)):
        ch = toks[s:s + 4]
        exp.append((1, idx, s, len(ch),
                    hashlib.md5(" ".join(ch).encode()).hexdigest()))
    exp.append((2, 0, 0, 2, hashlib.md5(b"a b").hexdigest()))
    assert out == exp  # doc 3 absent, tail (t8 t9) kept as 2-token chunk


def test_benchmark_overlap_python_oracle(spark, docs):
    """Per-bench-item leakage vs a straight-line python recomputation:
    distinct 8-gram sets, corpus membership, integer ppm."""
    from podcast_crawler_spark.operators.curation import benchmark_overlap

    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    # bench: truncations of every 10th doc plus an out-of-corpus marker
    brows = [
        (i, " ".join(t.split(" ")[:20]) + f" zz_marker {i}")
        for i, t in rows
        if i % 10 == 0
    ]
    bench = spark.createDataFrame(brows, "doc_id long, text string")

    def grams(text, n=8, mt=256):
        toks = [t for t in text.split(" ") if t][:mt]
        return {
            " ".join(toks[i : i + n])
            for i in range(max(len(toks) - n, 0) + 1)
        }

    corpus_grams = set().union(*(grams(t) for _, t in rows))
    expect = {}
    for bid, bt in brows:
        g = grams(bt)
        found = len(g & corpus_grams)
        expect[bid] = (len(g), found, (1_000_000 * found) // len(g), found > 0)

    got = {
        r["bid"]: (r["n_grams"], r["n_found"], r["found_ppm"], r["leaked"])
        for r in benchmark_overlap(corpus, bench).collect()
    }
    assert got == expect
    # truncation heads must leak, marker tails must not: strictly
    # partial overlap everywhere
    assert all(0 < p < 1_000_000 for (_, _, p, _) in got.values())


def test_c4_clean_handcrafted(spark):
    """Each C4 rule on a handcrafted doc set: terminal punctuation,
    min words per line, the javascript line drop, both page poisons
    (in published precedence order), the kept-line floor, and the
    cleaned-text md5."""
    import hashlib

    from podcast_crawler_spark.operators.curation import c4_clean

    good = "one two three four five."
    rows = [
        (1, "\n".join([good, good, good])),                  # kept, 3/3
        (2, "\n".join([good, "no terminal punct here", good, good])),
        (3, "\n".join([good, "short line.", good, good])),   # <5 words
        (4, "\n".join([good, "Enable JavaScript to view.", good, good])),
        (5, "\n".join([good, good, good, "has lorem ipsum inside."])),
        (6, "\n".join([good, good, good, "brace { here } now."])),
        # lorem beats brace in C4's order
        (7, "\n".join([good, good, good, "lorem ipsum { both }."])),
        (8, "\n".join([good, good])),                        # 2 < 3 kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in c4_clean(df).collect()}

    assert got[1]["kept"] and got[1]["n_kept"] == 3
    assert got[1]["clean_md5"] == hashlib.md5(
        "\n".join([good, good, good]).encode()
    ).hexdigest()
    for i in (2, 3, 4):  # one bad line dropped, page survives
        assert got[i]["kept"] and (got[i]["n_lines"], got[i]["n_kept"]) == (4, 3)
    assert got[2]["clean_md5"] == got[1]["clean_md5"]
    assert (got[5]["kept"], got[5]["reason"]) == (False, "lorem_ipsum")
    assert (got[6]["kept"], got[6]["reason"]) == (False, "brace")
    assert (got[7]["kept"], got[7]["reason"]) == (False, "lorem_ipsum")
    assert (got[8]["kept"], got[8]["reason"]) == (False, "too_few_lines")
    assert all(got[i]["clean_md5"] is None for i in (5, 6, 7, 8))


def test_gopher_rules_handcrafted(spark):
    """Each Gopher rule isolated on a handcrafted doc, in the paper's
    precedence order, plus a clean pass-through doc."""
    from podcast_crawler_spark.operators.curation import gopher_rules

    base = ("the cat and that dog have fun with them "
            "running around every single day outside")  # 14 words, alpha
    good = " ".join([base] * 5)  # 70 words, stopwords present
    rows = [
        (1, good),                                        # kept
        (2, "too short with the and"),                    # word_count
        (3, " ".join(["a"] * 60) + " the and"),           # mean len < 3
        (4, good + " " + " ".join(["#"] * 20)),           # symbol_ratio
        (5, good + "\n" + "\n".join(["- b c d"] * 9)),    # bullet 9/10
        (6, good + "\n" + "\n".join(["x y z w v..."] * 4)),  # 4/5 ellipsis
        (7, good + " " + " ".join(["123"] * 30)),         # alpha_words
        (8, " ".join(["alpha beta gamma delta"] * 20)),   # stopwords < 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["kept"], r["reason"]) for r in gopher_rules(df).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "word_count")
    assert got[3] == (False, "mean_word_len")
    assert got[4] == (False, "symbol_ratio")
    assert got[5] == (False, "bullet_lines")
    # doc 6: 4 of 5 lines end '...' (>= 30%) while the 4 ellipsis
    # SYMBOLS stay under the symbol-ratio bar (40 <= 90 words), so the
    # line rule — not the symbol rule — is what fires
    assert got[6] == (False, "ellipsis_lines")
    assert got[7] == (False, "alpha_words")
    assert got[8] == (False, "stopwords")


def test_c4_and_gopher_zero_exchange_plans(spark):
    """Both cleaning passes must be pure codegen projections — zero
    exchanges, so they compose with any upstream partitioning."""
    from podcast_crawler_spark.operators.curation import c4_clean, gopher_rules

    df = spark.createDataFrame(
        [(1, "the cat and that dog have fun with them today.")],
        "doc_id long, text string",
    )
    for op in (c4_clean, gopher_rules):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (op.__name__, plan)


def test_host_template_lines_rules_and_clean_md5(spark):
    """Per-host template rule: distinct-doc frequency vs the host's doc
    count (cross-multiplied), min_docs floor for tiny hosts, in-doc
    repeats vote once but drop together, and clean_md5 hashes the
    surviving lines in original order."""
    import hashlib

    from podcast_crawler_spark.operators.curation import (
        host_template_lines,
    )

    foot = "subscribe now."
    half = "cookie banner."
    rows = [
        # host A: 4 docs; foot on 4/4 (template), half on 2/4 (exactly
        # 50% = threshold → template), uniq lines kept
        (0, "A", f"alpha zero\n{foot}\n{half}"),
        (1, "A", f"alpha one\n{foot}"),
        # doc 2 repeats `half` twice: one df vote, both occurrences drop
        (2, "A", f"{half}\nalpha two\n{half}\n{foot}"),
        (3, "A", f"alpha three\n{foot}"),
        # host B: single doc — min_docs=2 keeps even its repeated foot
        (4, "B", f"beta zero\n{foot}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r.id: r
        for r in host_template_lines(df, min_frac_ppm=500_000).collect()
    }
    assert len(out) == 5
    # host A: foot + half are template
    assert out[0].n_template == 2 and out[0].n_lines == 3
    assert out[1].n_template == 1
    assert out[2].n_template == 3 and out[2].n_lines == 4  # half ×2 + foot
    assert out[3].n_template == 1
    # host B: nothing is template (min_docs floor)
    assert out[4].n_template == 0
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0].clean_md5 == md5("alpha zero")
    assert out[2].clean_md5 == md5("alpha two")
    assert out[4].clean_md5 == md5(f"beta zero\n{foot}")
    # all-template doc hashes the empty string, not NULL
    df2 = spark.createDataFrame(
        [(0, "C", foot), (1, "C", foot)], "doc_id long, host string, text string"
    )
    out2 = {r.id: r for r in host_template_lines(df2).collect()}
    assert out2[0].clean_md5 == md5("") and out2[0].template_ppm == 1_000_000


def test_host_template_min_frac_threshold(spark):
    """A line at 2/5 docs (400k ppm) is kept at the 50% threshold and
    template at a 40% threshold — the cross-multiplied rule is exact at
    the boundary."""
    from podcast_crawler_spark.operators.curation import (
        host_template_lines,
    )

    ln = "maybe template."
    rows = [(i, "H", (f"{ln}\n" if i < 2 else "") + f"uniq {i}")
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    at50 = host_template_lines(df, min_frac_ppm=500_000).collect()
    assert sum(r.n_template for r in at50) == 0
    at40 = host_template_lines(df, min_frac_ppm=400_000).collect()
    assert sum(r.n_template for r in at40) == 2


def test_holdout_allocation_exact_counts_and_ranks(spark):
    """Exactly holdout_total docs held out; per-stratum allocation is
    the largest-remainder apportionment; the distributed rank equals a
    naive per-stratum window; deterministic across runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.sampling import holdout_allocation

    rows = [(i, "en" if i % 7 else "fr", f"s{i % 3}") for i in range(97)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = holdout_allocation(df, holdout_total=20).toPandas()
    assert len(out) == 97
    assert int(out.is_holdout.sum()) == 20
    # largest remainder: strata counts → exact floors + remainders
    import collections
    cnt = collections.Counter((l, s) for _i, l, s in rows)
    n = 97
    floors = {k: 20 * v // n for k, v in cnt.items()}
    rems = {k: (20 * v) % n for k, v in cnt.items()}
    extra = 20 - sum(floors.values())
    order = sorted(cnt, key=lambda k: (-rems[k], "\x1f".join(k)))
    want = {k: floors[k] + (1 if i < extra else 0)
            for i, k in enumerate(order)}
    got = out[out.is_holdout].groupby(["lang", "source"]).size().to_dict()
    assert got == {k: v for k, v in want.items() if v > 0}
    # rank equivalence vs naive window on the same md5 key
    sk = F.concat_ws("\x1f", F.col("lang"), F.col("source"))
    naive = df.select(
        F.col("doc_id").alias("id"), "lang", "source",
        F.row_number().over(
            Window.partitionBy("lang", "source").orderBy(
                F.md5(F.concat_ws("\x1f", sk,
                                  F.col("doc_id").cast("string"))),
                "doc_id",
            )
        ).alias("rk_naive"),
    ).toPandas().set_index("id")
    for r in out.itertuples(index=False):
        assert int(r.rk) == int(naive.loc[r.id].rk_naive)
    # determinism
    again = holdout_allocation(df, holdout_total=20).toPandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = again.sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_holdout_allocation_bounds(spark):
    """holdout_total 0 and N are exact; out-of-range raises."""
    import pytest as _pytest

    from podcast_crawler_spark.operators.sampling import holdout_allocation

    df = spark.createDataFrame(
        [(i, "en", "s") for i in range(10)],
        "doc_id long, lang string, source string",
    )
    assert int(holdout_allocation(df, 0).toPandas().is_holdout.sum()) == 0
    assert int(holdout_allocation(df, 10).toPandas().is_holdout.sum()) == 10
    with _pytest.raises(ValueError):
        holdout_allocation(df, 11)


def test_filter_agreement_kappa_exact(spark):
    """Confusion cells and kappa ppm against a hand replay, including
    a negative kappa (systematic disagreement) and the NULL case
    (constant gate)."""
    from podcast_crawler_spark.operators.curation import filter_agreement

    rows = [
        # a b c: a == b mostly (high kappa), c anti-correlated with a
        (True, True, False),
        (True, True, False),
        (True, True, True),
        (False, False, True),
        (False, False, True),
        (False, True, True),
        (False, False, True),
        (True, True, False),
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    out = {(r.filter_a, r.filter_b): r
           for r in filter_agreement(df, gate_cols=("a", "b", "c")).collect()}
    n = len(rows)

    def kappa_ppm(x, y):
        n11 = sum(1 for r in rows if r[x] and r[y])
        p1 = sum(1 for r in rows if r[x]); q1 = sum(1 for r in rows if r[y])
        n00 = n - p1 - q1 + n11
        num = n * (n11 + n00) - p1 * q1 - (n - p1) * (n - q1)
        den = n * n - p1 * q1 - (n - p1) * (n - q1)
        return int(1_000_000 * num / den) if den else None

    idx = {"a": 0, "b": 1, "c": 2}
    for (fa, fb), r in out.items():
        want = kappa_ppm(idx[fa], idx[fb])
        assert r.kappa_ppm == want, (fa, fb, r.kappa_ppm, want)
        assert r.n == n and r.n11 + r.n10 + r.n01 + r.n00 == n
    assert out[("a", "b")].kappa_ppm > 700_000       # strong agreement
    assert out[("a", "c")].kappa_ppm < -500_000      # anti-correlated
    # ONE constant gate → kappa exactly 0 (chance-level, den > 0);
    # BOTH constant → den = 0 → NULL kappa, agree_ppm still defined
    df2 = spark.createDataFrame(
        [(True, True), (True, False)], "a boolean, b boolean"
    )
    r2 = filter_agreement(df2, gate_cols=("a", "b")).collect()[0]
    assert r2.kappa_ppm == 0 and r2.agree_ppm == 500_000
    df3 = spark.createDataFrame(
        [(True, True), (True, True)], "a boolean, b boolean"
    )
    r3 = filter_agreement(df3, gate_cols=("a", "b")).collect()[0]
    assert r3.kappa_ppm is None and r3.agree_ppm == 1_000_000


def test_self_dedup_keep_first_and_md5(spark):
    """Keep-first-occurrence semantics, order preservation, and the
    cleaned-text md5; a dup-free doc hashes to itself."""
    import hashlib

    from podcast_crawler_spark.operators.curation import self_dedup

    rows = [
        (0, "x\ny\nx\nz\ny\nx"),   # dups of x (×2) and y (×1)
        (1, "a\nb\nc"),            # clean
        (2, "s\ns\ns\ns"),         # all same → one survivor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in self_dedup(df).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0].n_lines == 6 and out[0].n_dupes == 3
    assert out[0].clean_md5 == md5("x\ny\nz")
    assert out[1].n_dupes == 0 and out[1].clean_md5 == md5("a\nb\nc")
    assert out[2].n_lines == 4 and out[2].n_dupes == 3
    assert out[2].clean_md5 == md5("s")
