"""HTML outlink extraction + resolution (operators/links.py)."""

from pyspark.sql import functions as F

from podcast_crawler_spark.operators.links import extract_links, resolve_href


def _links(spark, base, html):
    df = spark.createDataFrame([(base, html)], "url string, html string")
    return sorted(r["link"] for r in extract_links(df).collect())


def test_resolution_policy_matrix(spark):
    base = "https://h.example/a/b/page.html?q=1"
    html = (
        '<a href="https://abs.example/x">a</a>'
        "<a href='/root/y'>b</a>"
        '<a href="//proto.example/z">c</a>'
        '<a href="rel/w.html">d</a>'
        '<a href="mailto:a@b">e</a>'
        '<a href="javascript:void(0)">f</a>'
        '<a href="#frag">g</a>'
        '<a href="">h</a>'
    )
    assert _links(spark, base, html) == [
        "https://abs.example/x",
        "https://h.example/a/b/rel/w.html",  # dir of base, query ignored
        "https://h.example/root/y",
        "https://proto.example/z",
    ]


def test_entity_decode_fragment_strip_and_case(spark):
    base = "http://h.example/p"
    html = (
        '<a href="HTTPS://UP.example/x?a=1&amp;b=2#sec">a</a>'
        '<a href="FTP://files.example/f">b</a>'
    )
    # https kept case-as-is, &amp; decoded, fragment stripped; ftp dropped
    assert _links(spark, base, html) == ["HTTPS://UP.example/x?a=1&b=2"]


def test_no_path_base_and_protocol_relative_scheme(spark):
    # base with no path: root- and dir-relative both join at origin/
    assert _links(spark, "http://h.example", '<a href="x.html">a</a>') == [
        "http://h.example/x.html"
    ]
    # protocol-relative inherits the BASE scheme (http here)
    assert _links(spark, "http://h.example", "<a href='//c.example/y'>a</a>") == [
        "http://c.example/y"
    ]


def test_dot_segments_kept_raw(spark):
    # documented policy: ../ not normalized (canonicalizer treats path
    # bytes as opaque)
    got = _links(
        spark, "https://h.example/a/b/p.html", '<a href="../up.html">a</a>'
    )
    assert got == ["https://h.example/a/b/../up.html"]


def test_within_page_and_cross_page_dedup(spark):
    rows = [
        ("https://h.example/p1", '<a href="/x">a</a><a href="/x">b</a>'),
        ("https://h.example/p2", '<a href="/x">c</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = extract_links(df).collect()
    # one row per (page, link): p1's duplicate collapses in-page
    assert sorted((r["url"], r["link"]) for r in out) == [
        ("https://h.example/p1", "https://h.example/x"),
        ("https://h.example/p2", "https://h.example/x"),
    ]


def test_binary_html_and_plan_stays_codegen(spark):
    df = spark.createDataFrame(
        [("https://h.example/p", bytearray(b'<a href="/x">a</a>'))],
        "url string, html binary",
    )
    out = extract_links(df)
    assert [r["link"] for r in out.collect()] == ["https://h.example/x"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(" in plan  # codegen stages present; no Python anywhere


def test_resolve_href_is_null_for_dropped(spark):
    df = spark.createDataFrame(
        [("https://h.example/p", "tel:123")], "url string, h string"
    )
    got = df.select(resolve_href(F.col("h"), F.col("url")).alias("r")).first()
    assert got["r"] is None
