"""HTML → text extraction (boilerplate strip) as a codegen regex chain.

The reference extracts text only from RSS/Atom XML via its parser state
machine (``rss.rs``; re-expressed in ``feedparse/`` with byte-identity
tests).  A webtext pipeline also needs the generic HTML case: strip
scripts/styles/comments/tags, decode the core entities, and normalize
whitespace — the "good enough at 100 TB" tag-soup extractor (the same
tolerant philosophy as ``feedparse/xmlscan.py``: never fail on
malformed input, degrade to policy-defined output).

POLICY (exact, applied in this order — the DuckDB oracle replays it or,
in the driver query, derives the expected output independently from the
synthesis components):

  1. ``(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>`` → ``' '``
     (lazy match, so an unclosed block drops to step 4's tag strip).
  2. ``(?s)<!--.*?-->`` → ``' '``.
  3. block-element closers ``</p|div|li|h1-6|tr|table|ul|ol|
     blockquote>`` and ``<br...>`` → ``'\\n'`` (line structure
     survives tag stripping).
  4. every remaining ``<[^>]*>`` → ``' '``.
  5. entities: ``&lt; &gt; &quot; &#39; &apos; &nbsp;`` decoded first,
     ``&amp;`` LAST (so ``&amp;lt;`` decodes to the literal ``&lt;``,
     not ``<`` — the standard double-decode guard).
  6. whitespace: horizontal runs → one space; spaces around newlines
     dropped; newline runs → one newline; trim.

Everything is ``regexp_replace``/``replace`` column expressions —
map-side, whole-stage codegen, zero shuffles, the HTML never leaves
the partition that scanned it.  Lazy quantifiers and ``(?is)`` flags
behave identically in Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_CLOSE_RE = (
    "(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)\\s*>|<br[^>]*>"
)
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST — double-decode guard
]


def html_text_expr(html: Column) -> Column:
    """The extraction policy as one column expression."""
    s = F.regexp_replace(
        html, "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " "
    )
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, _BLOCK_CLOSE_RE, "\n")
    s = F.regexp_replace(s, "<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, "[ \\t\\r\\f]+", " ")
    s = F.regexp_replace(s, " ?\\n ?", "\n")
    s = F.regexp_replace(s, "\\n+", "\n")
    return F.regexp_replace(s, "^\\s+|\\s+$", "")


def _block_text(b: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse for ONE block
    (no newline handling — block structure is gone by construction)."""
    t = F.regexp_replace(b, "<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, "\\s+", " "))


def main_content(
    pages: DataFrame,
    html_col: str = "html",
    keep_cols=("url",),
    min_chars: int = 20,
    max_link_density_pct: int = 30,
) -> DataFrame:
    """Main-content extraction (boilerplate-block removal), the
    justext/Arc90 family reduced to its deterministic core: split the
    page into blocks at block-element closers, score each block by
    text length and LINK DENSITY (chars of anchor text per char of
    text), keep blocks that are long enough and link-sparse enough,
    reassemble in document order.  Navigation bars, footers and
    related-links rails are link-dense and short — exactly what the
    rule drops; article paragraphs keep their inline links as long as
    the surrounding prose dominates.

    Classification is exact integer arithmetic (``100·anchor_chars ≤
    max_link_density_pct·text_chars``) so every decision is replayable
    by an independent engine.

    Output: ``(*keep_cols, main_text, n_blocks, n_content,
    anchor_chars, text_chars)`` — counts/totals over nonempty blocks.

    Scale shape: the whole operator is ONE map-side projection built
    from higher-order array functions (split → transform → filter →
    aggregate → array_join): no explode, no shuffle, no UDF — the page
    never leaves the partition that scanned it, and downstream stages
    see only the extracted text.  (The reference has no HTML pipeline;
    this extends ``html_to_text`` the way its RSS parser feeds
    ``extracted_text``, `rss.rs` text accumulation.)
    """
    s = F.regexp_replace(
        F.col(html_col).cast("string"),
        "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>",
        " ",
    )
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    blocks = F.split(s, _BLOCK_CLOSE_RE)

    def _anchor_len(b: Column) -> Column:
        inner = F.regexp_extract_all(
            b, F.lit("(?is)<a[^>]*>(.*?)</a\\s*>"), F.lit(1)
        )
        return F.aggregate(
            inner, F.lit(0), lambda acc, a: acc + F.length(_block_text(a))
        )

    stats = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                _block_text(b).alias("t"), _anchor_len(b).alias("al")
            ),
        ),
        lambda x: F.length(x["t"]) > 0,
    )
    content = F.filter(
        stats,
        lambda x: (F.length(x["t"]) >= F.lit(min_chars))
        & (x["al"] * 100 <= F.lit(max_link_density_pct) * F.length(x["t"])),
    )
    out = pages.select(
        *keep_cols,
        stats.alias("_s"),
        content.alias("_c"),
    )
    return out.select(
        *keep_cols,
        F.array_join(
            F.transform(F.col("_c"), lambda x: x["t"]), "\n"
        ).alias("main_text"),
        F.size("_s").cast("long").alias("n_blocks"),
        F.size("_c").cast("long").alias("n_content"),
        F.aggregate(
            F.col("_s"), F.lit(0), lambda acc, x: acc + x["al"]
        ).cast("long").alias("anchor_chars"),
        F.aggregate(
            F.col("_s"), F.lit(0), lambda acc, x: acc + F.length(x["t"])
        ).cast("long").alias("text_chars"),
    )


def html_to_text(
    pages: DataFrame,
    html_col: str = "html",
    keep_cols=("url",),
) -> DataFrame:
    """Extracted text per page: ``(*keep_cols, text, n_chars)``.

    ``html_col`` may be string or binary.  The HTML column itself is
    pruned from the output — downstream stages (quality, dedup,
    tokenize) shuffle extracted text, never raw pages.
    """
    txt = html_text_expr(F.col(html_col).cast("string"))
    return pages.select(
        *keep_cols,
        txt.alias("text"),
        F.length(txt).alias("n_chars"),
    )


_JSONLD_RE = (
    "(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"']"
    "[^>]*>(.*?)</script\\s*>"
)


def extract_jsonld(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Structured-data extraction: every ``<script
    type="application/ld+json">`` block in a page, with the schema.org
    fields a crawler routes on — ``(id, block_idx, raw, is_valid,
    ld_type, name, url)``.  Podcast pages carry PodcastSeries /
    PodcastEpisode JSON-LD (Google Podcasts required it); extracting it
    beats re-deriving feed metadata from tag soup, and at corpus scale
    the JSON-LD `@type` histogram is the page-type classifier.

    Semantics:
      - blocks are matched case-insensitively, any attribute order,
        lazy body (same tolerant-tag-soup policy as
        :func:`html_text_expr`); ``block_idx`` is the 0-based order of
        appearance.
      - ``raw`` is the trimmed block body.  ``is_valid`` / field
        extraction use JSON-path probes (``$['@type']``, ``$['name']``,
        ``$['url']``): malformed JSON yields ``is_valid = false`` and
        null fields but KEEPS the raw block (quarantine-not-drop, the
        ``sources/jsonl.py`` discipline).  A top-level JSON array
        (multi-entity blocks) is valid; its fields read from the first
        element.
      - pages with no blocks produce no rows (left-join back upstream
        to keep them).

    Scale shape: one ``regexp_extract_all`` + posexplode, then pure
    JSON-path expressions — map-side, zero shuffle, HTML never crosses
    an exchange.  Java regex and RE2 agree on the pattern; the oracle
    replays extraction with DuckDB's RE2 + JSON functions.
    """
    blocks = F.regexp_extract_all(
        F.col(html_col), F.lit(_JSONLD_RE), 1
    )
    out = df.select(
        F.col(id_col).alias("id"), F.posexplode(blocks).alias("block_idx", "raw0")
    ).select(
        "id",
        F.col("block_idx").cast("int").alias("block_idx"),
        F.trim(F.col("raw0")).alias("raw"),
    )
    first = F.when(
        F.get_json_object("raw", "$[0]").isNotNull()
        & F.col("raw").startswith("["),
        F.get_json_object("raw", "$[0]"),
    ).otherwise(F.col("raw"))
    return out.select(
        "id",
        "block_idx",
        "raw",
        F.get_json_object("raw", "$").isNotNull().alias("is_valid"),
        F.get_json_object(first, "$['@type']").alias("ld_type"),
        F.get_json_object(first, "$['name']").alias("name"),
        F.get_json_object(first, "$['url']").alias("url"),
    )


def jsonld_oracle_sql(pages_sql: str) -> str:
    """DuckDB recomputation of :func:`extract_jsonld` over any
    ``(id, html)``-shaped subquery — RE2 block extraction, positional
    unnest, json_valid-guarded field probes (DuckDB's json_extract
    THROWS on malformed input; Spark's get_json_object returns null —
    the guard aligns them)."""
    pat = _JSONLD_RE.replace("'", "''")
    return f"""
        with pages as (select * from ({pages_sql}) p),
        m as (select id,
                     regexp_extract_all(html, '{pat}', 1) bl
              from pages),
        e as (select id, unnest(range(len(bl))) bi, bl from m),
        r as (select id, bi::int block_idx, trim(bl[bi + 1]) raw from e),
        f as (select *, case when raw like '[%' and json_valid(raw)
                             then json_extract(raw, '$[0]')::varchar
                             else raw end fst
              from r)
        select id, block_idx, raw, json_valid(raw) as is_valid,
               case when json_valid(fst)
                    then json_extract_string(fst, '$."@type"')
               end as ld_type,
               case when json_valid(fst)
                    then json_extract_string(fst, '$.name')
               end as "name",
               case when json_valid(fst)
                    then json_extract_string(fst, '$.url')
               end as url
        from f
    """


def boilerplate_stats(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
    **mc_kwargs,
) -> DataFrame:
    """Per-host boilerplate economics over :func:`main_content`: how
    much of what a host serves is KEEPABLE prose vs navigation/footer
    chrome.  The crawl-value signal behind de-prioritizing template
    farms (a host at 5% kept-chars is mostly chrome — its fetch budget
    buys almost no training text) and the regression alarm for the
    extractor itself (a site redesign that halves kept_ppm shows up
    here first).

    Output per host: ``(host, n_pages, sum_text_chars, sum_kept_chars,
    kept_ppm)`` — text_chars is the block text the page contained,
    kept_chars the reassembled main text's length; ppm is the exact
    integer ratio.

    Scale shape: main_content is one map-side projection; this adds
    ONE map-side-combined aggregate keyed by host.  Nothing but four
    longs per host crosses the exchange.
    """
    mc = main_content(
        pages, html_col=html_col, keep_cols=(host_col,), **mc_kwargs
    )
    agg = mc.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("text_chars").alias("sum_text_chars"),
        F.sum(F.length("main_text")).alias("sum_kept_chars"),
    )
    return agg.withColumn(
        "kept_ppm",
        F.expr(
            "case when sum_text_chars > 0 then"
            " (1000000 * sum_kept_chars) div sum_text_chars"
            " else 0 end"
        ),
    )
