"""Sitemap parser and Spark plumbing tests."""

import pytest


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://example.com/a?x=1&amp;y=2</loc>
    <lastmod>2025-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://example.com/cdata&raw]]></loc></url>
  <url><lastmod>2024-12-31</lastmod></url>
  <unknown>ignored</unknown>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>https://example.com/s1.xml</loc>
           <lastmod>2025-02-01</lastmod></sitemap>
  <sitemap><loc>https://example.com/s2.xml</loc></sitemap>
  <sitemap></sitemap>
</sitemapindex>"""


def test_parse_urlset():
    from podcast_crawler_spark.operators.sitemap import parse_sitemap

    got = parse_sitemap(URLSET)
    assert len(got) == 2  # the loc-less entry is skipped
    assert got[0]["loc"] == "https://example.com/a?x=1&y=2"  # unescaped
    assert got[0]["lastmod"] == "2025-01-05"
    assert got[0]["changefreq"] == "daily"
    assert got[0]["priority"] == "0.8"
    assert got[0]["is_index"] is False
    # CDATA loc comes through verbatim (no entity processing in CDATA)
    assert got[1]["loc"] == "https://example.com/cdata&raw"
    assert got[1]["lastmod"] is None


def test_parse_sitemapindex():
    from podcast_crawler_spark.operators.sitemap import parse_sitemap

    got = parse_sitemap(INDEX)
    assert [e["loc"] for e in got] == [
        "https://example.com/s1.xml",
        "https://example.com/s2.xml",
    ]
    assert all(e["is_index"] is True for e in got)
    assert got[0]["lastmod"] == "2025-02-01"


def test_parse_namespace_prefix():
    from podcast_crawler_spark.operators.sitemap import parse_sitemap

    doc = (
        "<sm:urlset xmlns:sm='x'><sm:url><sm:loc>https://e.com/p"
        "</sm:loc></sm:url></sm:urlset>"
    )
    got = parse_sitemap(doc)
    assert [e["loc"] for e in got] == ["https://e.com/p"]


def test_parse_malformed_raises():
    from podcast_crawler_spark.feedparse.xmlscan import XmlScanError
    from podcast_crawler_spark.operators.sitemap import parse_sitemap

    with pytest.raises(XmlScanError):
        parse_sitemap("<urlset><url><loc>x</wrong></url></urlset>")


def test_scan_sitemaps_spark(spark):
    from podcast_crawler_spark.operators.sitemap import scan_sitemaps

    df = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", URLSET),
            ("https://b.com/sitemap.xml", INDEX),
            ("https://c.com/sitemap.xml", "<urlset><url></wrong>"),
            ("https://d.com/sitemap.xml", None),
        ],
        "url string, xml string",
    )
    rows = scan_sitemaps(df).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.sitemap_url, []).append(r)
    # malformed and null docs contribute nothing, they don't poison
    assert set(by_url) == {
        "https://a.com/sitemap.xml",
        "https://b.com/sitemap.xml",
    }
    a = sorted(by_url["https://a.com/sitemap.xml"], key=lambda r: r.pos)
    assert [r.pos for r in a] == [0, 1]
    assert a[0].loc == "https://example.com/a?x=1&y=2"
    assert a[0].is_index is False
    b = sorted(by_url["https://b.com/sitemap.xml"], key=lambda r: r.pos)
    assert [r.loc for r in b] == [
        "https://example.com/s1.xml",
        "https://example.com/s2.xml",
    ]
    assert all(r.is_index for r in b)


def test_sitemap_coverage_gap(spark):
    """Advertised-but-never-fetched locs are counted per sitemap; index
    entries never count as content; duplicate advertisements collapse."""
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.sitemap import sitemap_coverage

    entries = spark.createDataFrame(
        [
            ("s1", "https://h/a", False),
            ("s1", "https://h/a", False),  # duplicate advertisement
            ("s1", "https://h/b", False),
            ("s1", "https://h/child.xml", True),  # index: excluded
            ("s2", "https://h/c", False),
        ],
        "sitemap_url string, loc string, is_index boolean",
    )
    fetched = spark.createDataFrame(
        [("https://h/a",), ("https://h/x",)], "loc string"
    )
    out = {r.sitemap_url: r for r in
           sitemap_coverage(entries, fetched).collect()}
    s1 = out["s1"]
    assert (s1.n_advertised, s1.n_fetched, s1.n_missing) == (2, 1, 1)
    assert s1.coverage_ppm == 500_000
    assert out["s2"].coverage_ppm == 0


def test_expand_sitemaps_tree_walk(spark):
    """BFS over a hand-built 3-level tree: depth labels, the cycle
    guard (an index listing its ancestor is reported but never
    re-fetched), a dangling child (entry only, nothing below), and the
    depth cap."""
    from podcast_crawler_spark.operators.sitemap import expand_sitemaps

    idx = '<sitemapindex><sitemap><loc>{}</loc></sitemap>{}</sitemapindex>'
    pages = spark.createDataFrame(
        [
            # root -> child index + a leaf urlset
            ("https://h/root.xml",
             idx.format("https://h/mid.xml",
                        "<sitemap><loc>https://h/set1.xml</loc></sitemap>")),
            # mid lists a leaf AND the root again (cycle), AND a
            # dangling child never present in pages
            ("https://h/mid.xml",
             idx.format("https://h/set2.xml",
                        "<sitemap><loc>https://h/root.xml</loc></sitemap>"
                        "<sitemap><loc>https://h/gone.xml</loc></sitemap>")),
            ("https://h/set1.xml",
             "<urlset><url><loc>https://h/p1</loc></url></urlset>"),
            ("https://h/set2.xml",
             "<urlset><url><loc>https://h/p2</loc></url>"
             "<url><loc>https://h/p3</loc></url></urlset>"),
        ],
        "url string, xml string",
    )
    seeds = spark.createDataFrame([("https://h/root.xml",)], "url string")
    rows = expand_sitemaps(pages, seeds).collect()
    got = {(r.depth, r.sitemap_url, r.pos): (r.loc, r.is_index) for r in rows}
    assert got == {
        (0, "https://h/root.xml", 0): ("https://h/mid.xml", True),
        (0, "https://h/root.xml", 1): ("https://h/set1.xml", True),
        (1, "https://h/mid.xml", 0): ("https://h/set2.xml", True),
        # the cycle entry IS reported...
        (1, "https://h/mid.xml", 1): ("https://h/root.xml", True),
        (1, "https://h/mid.xml", 2): ("https://h/gone.xml", True),
        (1, "https://h/set1.xml", 0): ("https://h/p1", False),
        (2, "https://h/set2.xml", 0): ("https://h/p2", False),
        (2, "https://h/set2.xml", 1): ("https://h/p3", False),
    }
    # ...but the root was fetched exactly once (depth 0 only), and the
    # dangling child contributed no rows
    assert not any(r.sitemap_url == "https://h/root.xml" and r.depth > 0
                   for r in rows)
    assert not any(r.sitemap_url == "https://h/gone.xml" for r in rows)


def test_expand_sitemaps_depth_cap(spark):
    from podcast_crawler_spark.operators.sitemap import expand_sitemaps

    pages = spark.createDataFrame(
        [(f"https://h/l{i}.xml",
          f"<sitemapindex><sitemap><loc>https://h/l{i+1}.xml</loc>"
          "</sitemap></sitemapindex>") for i in range(10)],
        "url string, xml string",
    )
    seeds = spark.createDataFrame([("https://h/l0.xml",)], "url string")
    rows = expand_sitemaps(pages, seeds, max_depth=3).collect()
    assert {r.depth for r in rows} == {0, 1, 2}
    assert len(rows) == 3
