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
