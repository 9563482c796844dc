"""Generic HTML outlink extraction + URL resolution (discovery).

The reference discovers URLs only from a typed link struct on the seed
record, filtered to ``name == 'rss'`` (``rss_fetcher.rs`` — its
frontier never grows from page content).  A web-scale crawler discovers
from the fetched HTML itself: extract every ``href``, resolve it
against the page URL, and hand the result to frontier admission
(``plans/epoch.admit_urls`` → the partitioned seen-set).  This operator
is that extractor.

Everything is whole-stage-codegen: ``regexp_extract_all`` pulls hrefs
(double- OR single-quoted), a ``transform`` lambda resolves each one,
``array_distinct`` dedups within the page before the explode, and the
final ``distinct`` dedups across pages.  No Python touches a row.

Resolution policy (documented simplification of RFC 3986 §5.2, applied
identically by the DuckDB oracle):

  * fragment is stripped from the href first; ``&amp;`` is decoded
    (the one entity that routinely appears inside attribute URLs).
  * empty / fragment-only hrefs -> dropped.
  * absolute ``http(s)://`` -> kept as-is; any OTHER scheme
    (``javascript:``, ``mailto:``, ``data:``, ``ftp:`` ...) -> dropped
    (same scheme allowlist as the production fetcher transport).
  * ``//host/path`` (protocol-relative) -> base scheme + ``:`` + href.
  * ``/path`` (root-relative) -> base origin + href.
  * anything else (directory-relative) -> base directory + href.
    Dot-segments (``../``) are NOT normalized — at admission time the
    canonicalizer treats path bytes as opaque (``urlfns`` module
    docstring), so two spellings of one resource are at worst two
    frontier entries, never a wrong fetch.

Scale shape: extraction and resolution are map-side over the page
partition that already holds the HTML — the only exchange is the final
``distinct`` on (page_url, link), which carries two strings per
candidate edge and feeds straight into the seen-set anti-join.  Blobs
never move: the HTML column is consumed in place and pruned from the
output schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HREF_DQ = 'href\\s*=\\s*"([^"]*)"'
_HREF_SQ = "href\\s*=\\s*'([^']*)'"
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"


def resolve_href(href: Column, base: Column) -> Column:
    """Resolve one raw href against a base URL per the module policy.

    Returns NULL for dropped hrefs (empty, fragment-only, non-http
    scheme).  Pure expression — composable inside ``transform``.
    """
    h = F.trim(F.replace(href, F.lit("&amp;"), F.lit("&")))
    h = F.element_at(F.split(h, "#", 2), 1)  # strip fragment
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    dir_match = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*/", 0)
    basedir = F.when(dir_match != "", dir_match).otherwise(
        F.concat(origin, F.lit("/"))
    )
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.rlike("(?i)^https?://"), h)
        .when(h.rlike(_SCHEME_RE), F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(basedir, h))
    )


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
) -> DataFrame:
    """All resolved outlinks per page: ``(base_col, link)``, distinct.

    ``html_col`` may be string or binary (cast in place).  Output is
    the candidate edge list for frontier admission / the host graph
    (``graph.pagerank`` / ``graph.anchor_stats``).
    """
    html = F.col(html_col).cast("string")
    hrefs = F.concat(
        F.regexp_extract_all(html, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_SQ), F.lit(1)),
    )
    resolved = F.array_distinct(
        F.filter(
            F.transform(hrefs, lambda h: resolve_href(h, F.col(base_col))),
            lambda x: x.isNotNull(),
        )
    )
    return (
        pages.select(F.col(base_col), F.explode(resolved).alias("link"))
        .distinct()
    )


def resolve_case_sql(href_expr: str, base_expr: str) -> str:
    """DuckDB CASE chain mirroring :func:`resolve_href` bit-for-bit
    (RE2 patterns are written to match Java-regex behavior here)."""
    h = (
        f"string_split(trim(replace({href_expr}, '&amp;', '&')), '#')[1]"
    )
    scheme = f"regexp_extract({base_expr}, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
    origin = f"regexp_extract({base_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')"
    dirm = f"regexp_extract({base_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*/')"
    return f"""
        CASE
          WHEN {h} = '' THEN NULL
          WHEN regexp_matches({h}, '(?i)^https?://') THEN {h}
          WHEN regexp_matches({h}, '{_SCHEME_RE}') THEN NULL
          WHEN {h} LIKE '//%' THEN {scheme} || ':' || {h}
          WHEN {h} LIKE '/%' THEN {origin} || {h}
          ELSE (CASE WHEN {dirm} <> '' THEN {dirm}
                     ELSE {origin} || '/' END) || {h}
        END
    """
