"""HTML -> text extraction policy (operators/htmltext.py)."""

from podcast_crawler_spark.operators.htmltext import html_to_text


def _extract(spark, html):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    return html_to_text(df).first()["text"]


def test_script_style_comment_stripped_even_with_lt_inside(spark):
    html = (
        "<p>keep</p><script>if(1<2){x();}</script>"
        "<style>p{a:1}</style><!-- gone -->"
    )
    assert _extract(spark, html) == "keep"


def test_block_closers_become_newlines_inline_tags_spaces(spark):
    html = "<h1>Title</h1><p>one <b>bold</b> two</p><div>three</div>"
    assert _extract(spark, html) == "Title\none bold two\nthree"


def test_entities_decoded_amp_last(spark):
    html = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &nbsp; e &amp;lt;</p>"
    # &amp;lt; -> literal '&lt;' (double-decode guard)
    assert _extract(spark, html) == "a <b> \"c\" 'd' e &lt;"


def test_whitespace_normalization_and_trim(spark):
    html = "  <p>a\t\tb</p>\n\n<p>  c  </p>  "
    assert _extract(spark, html) == "a b\nc"


def test_unclosed_script_degrades_to_tag_strip(spark):
    # lazy block match finds no closer -> step-4 strips the tags, the
    # script BODY survives as text (tolerant policy, never an error)
    html = "<script>var x;<p>after</p>"
    assert _extract(spark, html) == "var x; after"


def test_binary_input_and_plan_map_side(spark):
    df = spark.createDataFrame(
        [("u", bytearray(b"<p>bin</p>"))], "url string, html binary"
    )
    out = html_to_text(df)
    assert out.first()["text"] == "bin"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_br_and_case_insensitive_blocks(spark):
    html = "<P>a<BR>b</P><LI>item</LI>"
    assert _extract(spark, html) == "a\nb\nitem"


def _mc(spark, html, **kw):
    from podcast_crawler_spark.operators.htmltext import main_content

    df = spark.createDataFrame([("u", html)], "url string, html string")
    return main_content(df, **kw).first()


def test_main_content_drops_nav_footer_keeps_prose(spark):
    html = (
        '<div><a href="/">home</a> <a href="/a">about us</a>'
        ' <a href="/c">contact</a></div>'
        "<p>this paragraph carries the actual article prose of the page"
        ' with an inline <a href="/r">reference link</a> inside it</p>'
        '<div><a href="/p">privacy</a> <a href="/t">terms</a></div>'
        "<div>c 2024</div>"
    )
    r = _mc(spark, html)
    assert r.main_text.startswith("this paragraph carries")
    assert "home" not in r.main_text and "privacy" not in r.main_text
    assert "c 2024" not in r.main_text  # too short
    assert "reference link" in r.main_text  # inline link text survives
    assert r.n_blocks == 4 and r.n_content == 1


def test_main_content_counts_and_density_rule(spark):
    # nav: text 21 chars, anchors 19 chars -> 1900 > 30*21 dropped;
    # prose: 40 chars, anchor 0 -> kept; exactly-at-threshold block kept
    prose = "x" * 40
    border = "<p>" + "<a>lnk</a>" + " " + "y" * 6 + "</p>"  # 3*100 <= 30*10
    html = (
        '<div><a>home</a> <a>about us</a> <a>contact</a></div>'
        f"<p>{prose}</p>{border}"
    )
    r = _mc(spark, html, min_chars=10)
    assert r.n_blocks == 3 and r.n_content == 2
    assert r.main_text == prose + "\nlnk " + "y" * 6
    assert r.anchor_chars == 19 + 3
    assert r.text_chars == 21 + 40 + 10


def test_main_content_script_and_comment_never_score(spark):
    html = (
        "<script>while(1){spam<a>fake</a>}</script><!-- <a>x</a> -->"
        "<p>real content long enough to be kept here</p>"
    )
    r = _mc(spark, html)
    assert r.main_text == "real content long enough to be kept here"
    assert r.anchor_chars == 0


def test_main_content_plan_pure_map_side(spark):
    from podcast_crawler_spark.operators.htmltext import main_content

    df = spark.createDataFrame([("u", "<p>x</p>")], "url string, html string")
    plan = main_content(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan, plan
    assert "Python" not in plan, plan


# ------------------------------------------------------------ JSON-LD


def test_extract_jsonld_fields_and_quarantine(spark):
    from podcast_crawler_spark.operators.htmltext import extract_jsonld

    pages = [
        (1, '<html><head><SCRIPT type="application/ld+json">'
            '{"@type":"PodcastSeries","name":"My Show",'
            '"url":"https://x.io"}</script></head></html>'),
        (2, "<script type='application/ld+json'>"
            '[{"@type":"PodcastEpisode","name":"Ep 1"},'
            '{"@type":"Other"}]</script>'),
        (3, '<script type="application/ld+json">{"@type": broken'
            "</script>"),
        (4, '<p>no ld</p><script type="text/javascript">var x=1;'
            "</script>"),
        (5, '<script async type="application/ld+json" id="a">'
            '{"name":"A"}</script>'
            '<script type="application/ld+json">{"name":"B"}</script>'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {
        (r["id"], r["block_idx"]): (
            r["is_valid"], r["ld_type"], r["name"], r["url"]
        )
        for r in extract_jsonld(df).collect()
    }
    assert got[(1, 0)] == (True, "PodcastSeries", "My Show",
                           "https://x.io")
    # array block: fields from the first entity
    assert got[(2, 0)] == (True, "PodcastEpisode", "Ep 1", None)
    # malformed: quarantined, raw kept, fields null
    assert got[(3, 0)] == (False, None, None, None)
    # javascript decoy and ld-free pages: no rows
    assert not any(i == 4 for i, _ in got)
    # multiple blocks in order
    assert got[(5, 0)] == (True, None, "A", None)
    assert got[(5, 1)] == (True, None, "B", None)


def test_extract_jsonld_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.htmltext import (
        extract_jsonld, jsonld_oracle_sql,
    )

    pages = [
        (1, '<script type="application/ld+json">'
            '{"@type":"T","name":"n1","url":"u1"}</script>'),
        (2, '<script type="application/ld+json">{bad</script>'),
        (3, '<script type="application/ld+json">'
            '[{"name":"arr"}]</script>'
            '<script type="application/ld+json">{"url":"u3"}</script>'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(tuple(r) for r in extract_jsonld(df).collect())
    vals = ",".join(
        "(%d, '%s')" % (i, h.replace("'", "''")) for i, h in pages
    )
    osql = jsonld_oracle_sql(
        f"select * from (values {vals}) v(id, html)"
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    assert got == exp


def test_boilerplate_stats_rollup(spark):
    """A chrome-heavy host reports a lower kept_ppm than a prose host;
    sums are exact over the real extraction chain."""
    from pyspark.sql import functions as F

    from podcast_crawler_spark.operators.htmltext import (
        boilerplate_stats,
        main_content,
    )

    prose = "word " * 40
    chrome = '<div><a href="/a">a</a> <a href="/b">b</a></div>' * 5
    pages = spark.createDataFrame(
        [
            ("good", f"<p>{prose}</p><p>{prose}</p>"),
            ("chromey", chrome + f"<p>{prose}</p>" + chrome),
        ],
        "host string, html string",
    )
    out = {r.host: r for r in boilerplate_stats(pages).collect()}
    assert out["good"].kept_ppm > out["chromey"].kept_ppm
    # exact cross-check against main_content itself
    mc = main_content(pages, keep_cols=("host",)).collect()
    for r in mc:
        s = out[r.host]
        if s.n_pages == 1:
            assert s.sum_text_chars == r.text_chars
            assert s.sum_kept_chars == len(r.main_text)
