"""Sitemap (sitemaps.org protocol) scanning: XML → URL-frontier rows.

The discovery counterpart to the RSS seed scan: real crawls admit URLs
from ``robots.txt``-advertised sitemaps as well as from parsed feeds
(reference anchor: the seed list is the only admission channel in
`rss_fetcher.rs`; sitemaps are the standard upgrade and share the
frontier admission path `plans/epoch.admit_urls`).

The parser rides the SAME tolerant XML event scanner as the RSS parser
(`feedparse/xmlscan.py`) — one scanner, two grammars — and implements
the public protocol:

- ``<urlset><url>`` entries with ``loc`` (required), ``lastmod``,
  ``changefreq``, ``priority`` (optional, emitted as raw strings);
- ``<sitemapindex><sitemap>`` entries (``is_index=true``) whose locs
  are child sitemaps to fetch, not page URLs;
- entity-escaped locs are unescaped (the spec REQUIRES escaping, so
  ``&amp;`` in a loc must come back as ``&``);
- entries without a ``loc`` are skipped; unknown tags are ignored;
  namespace prefixes are stripped to the local name.

Spark side: ``mapInPandas`` over ``(url, xml)`` batches — map-side
only, the same Arrow-batch contract as ``parse_pages`` / the robots
parser; at 100 TB sitemap parsing is O(bytes scanned) with zero
shuffle, and the output feeds straight into the partitioned seen-set
anti-join.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from podcast_crawler_spark.feedparse.xmlscan import (
    XmlEscapeError,
    XmlScanError,
    scan,
    xml_unescape,
)

_ENTRY_TAGS = {"url": False, "sitemap": True}
_FIELD_TAGS = ("loc", "lastmod", "changefreq", "priority")

SITEMAP_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("pos", IntegerType()),
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", StringType()),
        StructField("is_index", BooleanType()),
    ]
)


def _local(name: str) -> str:
    return name.rsplit(":", 1)[-1].lower()


def parse_sitemap(doc: str) -> List[Dict[str, Optional[str]]]:
    """Parse one sitemap document into entry dicts (keys: loc, lastmod,
    changefreq, priority, is_index).  Entries without a loc are
    dropped; raises :class:`XmlScanError` on malformed XML."""
    entries: List[Dict[str, Optional[str]]] = []
    cur: Optional[Dict[str, Optional[str]]] = None
    field: Optional[str] = None
    buf: List[str] = []
    for ev in scan(doc):
        if ev.kind == "start":
            name = _local(ev.name)
            if name in _ENTRY_TAGS:
                cur = {k: None for k in _FIELD_TAGS}
                cur["is_index"] = _ENTRY_TAGS[name]  # type: ignore[assignment]
            elif cur is not None and name in _FIELD_TAGS:
                field = name
                buf = []
        elif ev.kind in ("text", "cdata"):
            if field is not None:
                if ev.kind == "text":
                    try:
                        buf.append(xml_unescape(ev.text))
                    except XmlEscapeError:
                        buf.append(ev.text)
                else:
                    buf.append(ev.text)
        elif ev.kind == "end":
            name = _local(ev.name)
            if field is not None and name == field:
                assert cur is not None
                cur[field] = "".join(buf).strip() or None
                field = None
            elif name in _ENTRY_TAGS and cur is not None:
                if cur.get("loc"):
                    entries.append(cur)
                cur = None
    return entries


def scan_sitemaps(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """``(url, xml)`` rows → :data:`SITEMAP_SCHEMA` rows, one per
    sitemap entry, ``pos`` = entry index within its document.
    Malformed documents contribute no rows (same contract as the robots
    parser: absence, not poison — the fetch layer records the error)."""
    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                if xml is None:
                    continue
                try:
                    entries = parse_sitemap(xml)
                except XmlScanError:
                    continue
                for i, e in enumerate(entries):
                    rows.append(
                        (
                            url,
                            i,
                            e["loc"],
                            e["lastmod"],
                            e["changefreq"],
                            e["priority"],
                            e["is_index"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(url_col, xml_col).mapInPandas(
        _run, schema=SITEMAP_SCHEMA
    )


def sitemap_coverage(
    entries: DataFrame,
    fetched: DataFrame,
    loc_col: str = "loc",
) -> DataFrame:
    """Discovery-completeness audit: how much of what each sitemap
    ADVERTISES has the crawl actually fetched — the complement of
    ``sitemap_refresh`` (that asks "is what we fetched stale?", this
    asks "what did we never fetch at all?").  A persistent gap means
    the frontier's budget/priority rules are starving a host the site
    itself asked us to index.

    *entries* is :func:`scan_sitemaps` output; *fetched* any relation
    with the fetched-URL column (the pages table, the frontier's
    parsed slice).  Index entries are excluded (they advertise other
    sitemaps, not content).  Output per sitemap document:
    ``(sitemap_url, n_advertised, n_fetched, n_missing,
    coverage_ppm)``.

    Scale shape: distinct advertised (sitemap_url, loc) pairs LEFT-join
    the distinct fetched set on loc — both sides narrow strings, one
    shuffle each — then a map-side-combined aggregate per sitemap.
    Exact integer oracle.
    """
    adv = (
        entries.filter(~F.col("is_index"))
        .select("sitemap_url", F.col(loc_col).alias("loc"))
        .distinct()
    )
    f = fetched.select(F.col(loc_col).alias("loc")).distinct().withColumn(
        "_f", F.lit(1).cast("long")
    )
    j = adv.join(f, "loc", "left")
    return (
        j.groupBy("sitemap_url")
        .agg(
            F.count(F.lit(1)).alias("n_advertised"),
            F.sum(F.coalesce(F.col("_f"), F.lit(0))).alias("n_fetched"),
        )
        .select(
            "sitemap_url",
            "n_advertised",
            "n_fetched",
            (F.col("n_advertised") - F.col("n_fetched")).alias("n_missing"),
            F.expr(
                "(1000000 * n_fetched) div n_advertised"
            ).alias("coverage_ppm"),
        )
    )


def coverage_oracle_sql(entries_sql: str, fetched_sql: str) -> str:
    """DuckDB replay of :func:`sitemap_coverage` — *entries_sql* must
    yield (sitemap_url, loc, is_index), *fetched_sql* a loc column."""
    return f"""
        WITH adv AS (
            SELECT DISTINCT sitemap_url, loc
            FROM ({entries_sql}) e WHERE NOT is_index
        ),
        f AS (SELECT DISTINCT loc FROM ({fetched_sql}) x),
        j AS (
            SELECT adv.sitemap_url,
                   (f.loc IS NOT NULL)::int AS hit
            FROM adv LEFT JOIN f ON adv.loc = f.loc
        )
        SELECT sitemap_url, COUNT(*) AS n_advertised,
               SUM(hit)::BIGINT AS n_fetched,
               (COUNT(*) - SUM(hit))::BIGINT AS n_missing,
               ((1000000 * SUM(hit)) // COUNT(*))::BIGINT AS coverage_ppm
        FROM j GROUP BY sitemap_url
    """


def expand_sitemaps(
    pages: DataFrame,
    seeds: DataFrame,
    max_depth: int = 5,
    url_col: str = "url",
    xml_col: str = "xml",
) -> DataFrame:
    """Recursive sitemap-index expansion: BFS the ``<sitemapindex>``
    tree from the robots-advertised roots down to the leaf ``<urlset>``
    entries, one fetch round per level — the discovery walk the
    protocol requires (an index's children are themselves sitemaps to
    fetch) and the reference never implements (its only admission
    channel is the seed list, `rss_fetcher.rs`).

    Returns every entry of every REACHED sitemap:
    ``(depth, sitemap_url, pos, loc, lastmod, changefreq, priority,
    is_index)`` — depth 0 = the seed documents' own entries.  Three
    real-world defenses are structural:

    - **cycle guard**: child locs already visited are never re-fetched
      (the anti-join against the seen set), so a malicious or broken
      index that lists an ancestor — a crawler trap — terminates the
      walk instead of looping; the cyclic ENTRY itself is still
      reported (is_index=true), only its re-expansion is suppressed;
    - **dangling children**: an advertised child with no fetched page
      contributes its entry and nothing below it (inner join against
      *pages* — absence, not poison);
    - **depth cap**: ``max_depth`` bounds adversarially deep nesting
      (the spec itself allows one level; real trees use 2-3).

    Scale shape: the frontier is sitemap URLs — bounded by the sitemap
    TREE (~10^6 rows for a 10^10-page crawl), orders of magnitude under
    the page corpus — so every per-level join is a small-side join
    against *pages* (bucketed/partitioned by url in the production
    layout, the same access path as the fetch join); parsing is the
    map-side ``scan_sitemaps`` Arrow pass; per-level eager checkpoints
    follow the loop discipline of PLANS.md (each level's entries feed
    BOTH the output union and the next frontier).
    """
    from functools import reduce

    p = pages.select(
        F.col(url_col).alias("url"), F.col(xml_col).alias("xml")
    )
    frontier = (
        seeds.select(F.col(url_col).alias("url"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seen = frontier
    levels = []
    for depth in range(int(max_depth)):
        if not frontier.take(1):
            break
        entries = (
            scan_sitemaps(frontier.join(p, "url"))
            .withColumn("depth", F.lit(depth).cast("int"))
            .localCheckpoint(eager=True)
        )
        levels.append(entries)
        frontier = (
            entries.filter(F.col("is_index") & F.col("loc").isNotNull())
            .select(F.col("loc").alias("url"))
            .distinct()
            .join(seen, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(frontier).localCheckpoint(eager=True)
    if not levels:
        empty = F.lit(None).cast("string")
        return seeds.select(
            F.lit(0).cast("int").alias("depth"),
            empty.alias("sitemap_url"),
            F.lit(None).cast("int").alias("pos"),
            empty.alias("loc"),
            empty.alias("lastmod"),
            empty.alias("changefreq"),
            empty.alias("priority"),
            F.lit(None).cast("boolean").alias("is_index"),
        ).limit(0)
    out = reduce(lambda a, b: a.unionByName(b), levels)
    return out.select(
        "depth",
        "sitemap_url",
        "pos",
        "loc",
        "lastmod",
        "changefreq",
        "priority",
        "is_index",
    )
