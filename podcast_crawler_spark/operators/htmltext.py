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
