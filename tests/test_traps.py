"""Crawl-trap detector tests."""

from pyspark.sql import functions as F


def test_trap_detected_and_clean_host_not(spark):
    from podcast_crawler_spark.operators.traps import trap_stats

    rows = (
        # trap host: one template, 60 URLs
        [("trap.com", f"https://trap.com/cal?day={i}") for i in range(60)]
        # clean host: 60 URLs spread over 6 templates
        + [
            ("ok.com", f"https://ok.com/{kind}/{i}")
            for kind in ("a", "b", "c", "d", "e", "f")
            for i in range(10)
        ]
        # small host: dominated but under min_urls
        + [("tiny.com", f"https://tiny.com/x?p={i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r.host: r for r in trap_stats(df, min_urls=50).collect()}
    t = got["trap.com"]
    assert t.is_trap and t.n_templates == 1 and t.top_count == 60
    assert t.top_template == "https://trap.com/cal?day=N"
    o = got["ok.com"]
    assert not o.is_trap and o.n_templates == 6 and o.top_count == 10
    assert not got["tiny.com"].is_trap


def test_trap_top_template_tie_breaks_lexicographically(spark):
    from podcast_crawler_spark.operators.traps import trap_stats

    rows = [("h", "https://h/a/1"), ("h", "https://h/a/2"),
            ("h", "https://h/b/3"), ("h", "https://h/b/4")]
    df = spark.createDataFrame(rows, "host string, url string")
    r = trap_stats(df).collect()[0]
    assert r.top_template == "https://h/a/N"
    assert r.top_count == 2


def test_trap_rollup_no_window_partial_agg(spark):
    """The per-host argmax must be the struct-min aggregate with a
    map-side partial (struct min forces SortAggregate, whose
    intra-partition sort is fine) — never a per-host Window, which
    would put a whole host's template table in one task with no
    partial reduction."""
    from podcast_crawler_spark.operators.traps import trap_stats

    df = spark.createDataFrame(
        [("h", "https://h/a/1")], "host string, url string"
    )
    plan = trap_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min(struct" in plan, plan
