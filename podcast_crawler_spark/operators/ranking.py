"""BM25 ranked search over the documents table.

The reference's search surface is an ILIKE substring scan
(``search_podcasts``, reference ``src/api/handlers.rs`` route — covered
by ``api/queries.py::search_ilike``); BM25 is the ranked upgrade a
training-data / retrieval pipeline actually runs at corpus scale.

Plan shape (the 100 TB argument):

- **Pass 1 (stats)**: one scan computing ``N``, ``sum(dl)`` and one
  document-frequency counter per query term — all map-side arithmetic on
  a per-doc token array (``split`` + ``filter``/``size``, no explode),
  folded by a single global aggregate whose exchange carries ONE partial
  row per task.  Collected: a handful of scalars.
- **Pass 2 (score)**: per-term ``idf`` and ``avgdl`` are baked in as
  literals, so the whole BM25 score is a map-side expression inside
  whole-stage codegen — the corpus is never shuffled, never exploded
  into a token table, and only docs containing ≥1 query term survive
  the filter.  The final top-k is ``orderBy … limit k`` which Catalyst
  plans as ``TakeOrderedAndProject`` (per-partition heap + driver merge
  of k·P rows, no global sort).

Determinism / oracle parity: ``dl`` sums are integers (exact in
float64), ``avgdl`` is a single exact division, ``idf = ln(1 + (N - df
+ 0.5)/(df + 0.5))`` is pure libm on exact inputs, and the per-doc
score is an explicit left-to-right ``+`` chain in query-term order on
both sides; scores round to 6 dp and ordering uses the rounded score
with a doc-id tie-break, so the DuckDB oracle reproduces the exact
row set.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(text_col: str):
    return F.filter(
        F.split(F.col(text_col), " "), lambda x: F.length(x) > 0
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by BM25 over whitespace tokens:
    ``(doc_id, score, rank)``, rank by (rounded score desc, doc_id)."""
    terms = list(terms)
    base = docs.select(
        F.col(id_col).alias("id"), _toks(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))

    tf_cols = [
        F.size(F.filter(F.col("toks"), lambda x: x == F.lit(t))).alias(
            f"tf_{i}"
        )
        for i, t in enumerate(terms)
    ]
    with_tf = base.select("id", "dl", *tf_cols)

    stats = (
        with_tf.agg(
            F.count("*").alias("n"),
            F.sum("dl").alias("sumdl"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
        .collect()[0]
    )
    n = int(stats["n"])
    avgdl = float(stats["sumdl"]) / n if n else 1.0
    idf = [
        math.log(1.0 + (n - int(stats[f"df_{i}"]) + 0.5) / (int(stats[f"df_{i}"]) + 0.5))
        for i in range(len(terms))
    ]

    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        score = score + F.lit(idf[i]) * tf * F.lit(k1 + 1.0) / (tf + norm)

    scored = (
        with_tf.withColumn("score", F.round(score, 6))
        .filter(sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0)
        .select(F.col("id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    # the rank window runs over the already-limited k rows (single tiny
    # partition), not the corpus — TakeOrderedAndProject did the heavy cut
    return scored.select(
        id_col,
        "score",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .alias("rank"),
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Search-index construction: one row per (term, top-ranked
    posting), ``(term, df, total_tf, rank, doc, tf)`` — the build-side
    counterpart of :func:`bm25_topk` (which scores query-time; this
    materializes the posting lists a real retrieval system serves
    from).

    Posting lists are CAPPED at *top_k* per term by (tf desc, doc asc)
    — the same discipline as the dedup shingle cap: a stop-word's full
    posting list is corpus-sized and nothing downstream should ever
    materialize it.  ``df``/``total_tf`` still count ALL postings (the
    aggregates need no list).

    Plan shape at 100 TB:

    - tokenize + explode is narrow; the ``(term, doc)`` tf count gets
      map-side combine, so the exchange carries one row per distinct
      (term, doc) per task;
    - term-level df/total_tf is a second partial-aggregated rollup of
      the already-counted postings (never the raw tokens);
    - the top-k filter plans as ``WindowGroupLimit Partial`` below the
      exchange / ``Final`` above (Spark 3.5+), so no task ever holds a
      hot term's full posting list.
    """
    postings = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(_toks(text_col)).alias("term"),
        )
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc"))
    top = (
        postings.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
    return top.join(stats, "term").select(
        "term", "df", "total_tf", "rank", "doc", "tf"
    )


def doc_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the top-*k* terms of each doc
    by tf-idf — ``(doc, term, tf, doc_freq, score, rank)`` — the
    routing/topic-tagging signal of a corpus pipeline (the reference
    exposes only whole-field ILIKE search, `podcast_repository.rs`
    search path; keywords are what a ranked index serves instead).

    Exact-integer discipline (the ``lm_surprisal`` no-libm rule):
    ``score = tf · bitlen(N div doc_freq)`` — ``bitlen`` is the
    binary-string length, an integer quantization of ``1+log2``, so
    idf damping is log-shaped yet every engine replays the value
    bit-for-bit.  Ties break (score desc, tf desc, term asc):
    deterministic output set.

    Plan shape: one map-side-combined ``(term, doc)`` tf count, a
    term-level df rollup of the already-counted postings, one
    token-keyed join of those two, the corpus-size scalar broadcast
    (1 row), and a per-doc ``row_number ≤ k`` that plans as
    ``WindowGroupLimit Partial`` below its exchange — no task ever
    holds a whole hot document's posting list, let alone the corpus.
    """
    postings = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(_toks(text_col)).alias("term"),
        )
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("_n")
    )
    scored = (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * F.length(F.bin(F.expr("_n div doc_freq"))),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("score"), F.desc("tf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc", "term", "tf", "doc_freq", "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
    k: int = 50,
) -> DataFrame:
    """Sparse pairwise document similarity (the inverted-index join of
    Elsayed et al. 2008): top-k doc pairs by tf-idf cosine, computed
    without ever materializing dense vectors.

    **Integer-exact by construction**: a float dot product summed
    across shuffle partitions is order-dependent and can't be oracled.
    Here the term weight is ``w = tf · idf_bits`` with ``idf_bits =
    bitlen(N) - bitlen(df)`` (whole bits, the ``lm_surprisal``
    quantization), the pair dot ``Σ w_a·w_b`` and the norms
    ``Σ w²`` are exact BIGINT sums, and the only float ops are the
    final ``dot / (sqrt(na)·sqrt(nb))`` — a fixed-order expression on
    deterministic integers, rounded to 6 dp.

    Scale shape: postings with df > *max_df* are dropped before the
    self-join (the shingle-cap discipline — a stop word's posting list
    would quadratically explode the term join); the term self-join
    carries ``(term, doc, w)`` triples only; the pair rollup has
    map-side combine; top-k is TakeOrderedAndProject.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(_toks(text_col)).alias("term"),
    )
    postings = toks.groupBy("term", "doc").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    nbits = len(bin(n_docs)) - 2
    stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        postings.join(stats, "term")
        .filter(F.col("df") <= max_df)
        .select(
            "term",
            "doc",
            (
                F.col("tf")
                * (F.lit(nbits) - F.length(F.bin(F.col("df"))))
            ).cast("long").alias("w"),
        )
        # zero-idf terms (df in N's bit-length class) carry no signal;
        # dropping them also removes the 0/0 cosine of docs made
        # entirely of such terms
        .filter(F.col("w") > 0)
    )
    norms = weighted.groupBy("doc").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    a = weighted.select(
        "term", F.col("doc").alias("id_a"), F.col("w").alias("wa")
    )
    b = weighted.select(
        "term", F.col("doc").alias("id_b"), F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_int"))
    )
    na = norms.select(
        F.col("doc").alias("id_a"), F.col("norm2").alias("na")
    )
    nb = norms.select(
        F.col("doc").alias("id_b"), F.col("norm2").alias("nb")
    )
    scored = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "dot_int",
            F.round(
                F.col("dot_int")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(
        F.desc("cosine"), F.asc("id_a"), F.asc("id_b")
    ).limit(k)
