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
