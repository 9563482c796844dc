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


# ---------------------------------------------------------- directives


def test_page_directives_semantics(spark):
    from podcast_crawler_spark.operators.links import page_directives

    pages = [
        (1, '<head><meta content="noindex, nofollow" name="ROBOTS">'
            '<link rel="canonical" href="https://ex.io/a"></head>'
            '<a href="x" rel="nofollow">y</a><a href="z">w</a>'),
        (2, '<meta name="viewport" content="w"><a href="p">q</a>'),
        (3, "<META NAME='robots' CONTENT='INDEX, FOLLOW'>"),
        (4, '<link href="https://ex.io/c" rel="canonical">'
            '<a rel="me nofollow ugc" href="u">v</a>'),
        (5, "no tags at all"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {r["id"]: r.asDict() for r in page_directives(df).collect()}
    assert got[1]["noindex"] and got[1]["nofollow_meta"]
    assert got[1]["canonical_url"] == "https://ex.io/a"
    assert (got[1]["n_links"], got[1]["n_nofollow_links"]) == (2, 1)
    # non-robots meta ignored
    assert not got[2]["noindex"] and got[2]["robots_content"] == ""
    # case-insensitive tag + attrs; index,follow is not noindex
    assert got[3]["robots_content"] == "index, follow"
    assert not got[3]["noindex"]
    # attribute order reversed; rel list containing nofollow
    assert got[4]["canonical_url"] == "https://ex.io/c"
    assert got[4]["n_nofollow_links"] == 1
    assert got[5]["canonical_url"] is None


def test_page_directives_zero_exchange(spark):
    from podcast_crawler_spark.operators.links import page_directives

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    p = page_directives(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_page_directives_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.links import (
        directives_oracle_sql, page_directives,
    )

    pages = [
        (1, '<meta name="robots" content="noindex">'
            '<a rel="nofollow" href="a">x</a>'),
        (2, '<link rel="canonical" href="https://e.io/2">'),
        (3, "plain"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(tuple(r) for r in page_directives(df).collect())
    vals = ",".join(
        "(%d, '%s')" % (i, h.replace("'", "''")) for i, h in pages
    )
    osql = directives_oracle_sql(
        f"select * from (values {vals}) v(id, html)"
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    norm = lambda t: tuple(int(x) if isinstance(x, bool) else x for x in t)
    assert [norm(g) for g in got] == [norm(e) for e in exp]


# ------------------------------------------------------- autodiscovery


def test_feed_autodiscovery_semantics(spark):
    from podcast_crawler_spark.operators.links import feed_autodiscovery

    pages = [
        (1, '<link rel="alternate" type="application/rss+xml"'
            ' href="https://e.io/feed.xml" title="My Pod">'),
        (2, "<link type='application/atom+xml' rel='alternate'"
            " href='/atom.xml'>"),  # reversed attrs, relative href
        (3, '<link rel="alternate" type="text/html" href="m.html">'
            '<link rel="stylesheet" href="s.css">'),  # decoys
        (4, '<LINK REL="ALTERNATE" TYPE="application/RSS+xml"'
            ' HREF="up.xml">'),  # case-insensitive
        (5, '<link rel="alternate" type="application/rss+xml" href="a">'
            '<link rel="alternate" type="application/atom+xml" href="b">'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {
        (r["id"], r["feed_idx"]): (r["feed_url"], r["feed_type"], r["title"])
        for r in feed_autodiscovery(df).collect()
    }
    assert got[(1, 0)] == ("https://e.io/feed.xml", "rss", "My Pod")
    assert got[(2, 0)] == ("/atom.xml", "atom", None)
    assert not any(i == 3 for i, _ in got)
    assert got[(4, 0)] == ("up.xml", "rss", None)
    assert got[(5, 0)][1] == "rss" and got[(5, 1)][1] == "atom"


def test_feed_autodiscovery_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.links import (
        autodiscovery_oracle_sql, feed_autodiscovery,
    )

    pages = [
        (1, '<link rel="alternate" type="application/rss+xml" href="f1">'),
        (2, "<link href='f2' type='application/atom+xml'"
            " rel='alternate' title='T2'>"),
        (3, "none"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(tuple(r) for r in feed_autodiscovery(df).collect())
    vals = ",".join(
        "(%d, '%s')" % (i, h.replace("'", "''")) for i, h in pages
    )
    osql = autodiscovery_oracle_sql(
        f"select * from (values {vals}) v(id, html)"
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    assert [tuple(int(x) if isinstance(x, int) else x for x in g)
            for g in got] == [
        tuple(int(x) if isinstance(x, int) else x for x in e) for e in exp
    ]


# ------------------------------------------------------ scheme twins


def test_scheme_upgrades_detects_twins(spark):
    from podcast_crawler_spark.operators.links import scheme_upgrades

    urls = [
        ("http://a.io/x",), ("https://a.io/x",),   # twin
        ("http://a.io/only",),                      # http-only
        ("https://b.io/y",),                        # https-only
        ("ftp://a.io/x",),                          # decoy scheme
        ("HTTPS://c.io",), ("http://c.io",),        # case + bare path
        ("http://a.io/x?q=1",),                     # query stripped
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {
        (r["host"], r["path_key"]): (r["n_http"], r["n_https"])
        for r in scheme_upgrades(df).collect()
    }
    assert got[("a.io", "/x")] == (2, 1)  # ?q=1 collapses into /x
    assert got[("c.io", "/")] == (1, 1)
    assert ("a.io", "/only") not in got and ("b.io", "/y") not in got


def test_scheme_upgrades_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.links import (
        scheme_oracle_sql, scheme_upgrades,
    )

    urls = [
        (f"{'http' if i % 2 else 'https'}://h{i % 5}.io/p/{i % 7}",)
        for i in range(40)
    ]
    df = spark.createDataFrame(urls, "url string")
    got = sorted(tuple(r) for r in scheme_upgrades(df).collect())
    vals = ",".join(f"('{u}')" for (u,) in urls)
    osql = scheme_oracle_sql(f"select * from (values {vals}) v(url)")
    exp = sorted(
        tuple(int(x) if isinstance(x, int) else x for x in r)
        for r in duckdb.sql(osql).fetchall()
    )
    assert [tuple(int(x) if isinstance(x, int) else x for x in g)
            for g in got] == exp


def test_link_farm_stats_flags_low_diversity(spark):
    from podcast_crawler_spark.operators.links import link_farm_stats

    rows = (
        # farm host: 3 pages, 24 links, 2 distinct targets
        [("farm", f"p{i % 3}", f"d{i % 2}") for i in range(24)]
        # healthy host: 3 pages, 24 links, 20 distinct targets
        + [("ok", f"p{i % 3}", f"t{i % 20}") for i in range(24)]
        # tiny host: low diversity but under min_links -> not flagged
        + [("tiny", "p0", "d0") for _ in range(5)]
    )
    df = spark.createDataFrame(rows, "src_host string, page_id string, dst_host string")
    out = {r["host"]: r for r in link_farm_stats(df).collect()}
    assert out["farm"]["is_farm"]
    assert out["farm"]["diversity_ppm"] == 1_000_000 * 2 // 24
    assert out["farm"]["links_per_page_ppm"] == 1_000_000 * 24 // 3
    assert not out["ok"]["is_farm"]
    assert not out["tiny"]["is_farm"]
