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


def test_dust_params_inert_vs_content(spark):
    """sid is inert (same digest across values); page changes content
    (counterexample kills it); support threshold gates sparse params."""
    from podcast_crawler_spark.operators.traps import dust_params

    rows = []
    for page in range(3):
        for sid in range(3):
            rows.append((
                f"http://a.com/x?page={page}&sid={sid}",
                f"digest-{page}",
            ))
    # a param seen in too few groups for min_support
    rows.append(("http://a.com/x?rare=1&page=0&sid=0", "digest-0"))
    df = spark.createDataFrame(rows, "url string, digest string")
    out = {r.param: r for r in dust_params(df, min_support=3).collect()}
    assert out["sid"].is_dust and out["sid"].n_clean == 3
    assert not out["page"].is_dust and out["page"].n_dirty >= 1
    assert not out["rare"].is_dust  # 1 group, below support


def test_dust_params_no_query_urls_ignored(spark):
    from podcast_crawler_spark.operators.traps import dust_params

    df = spark.createDataFrame(
        [("http://a.com/plain", "d1"), ("http://a.com/x?k=1", "d2")],
        "url string, digest string",
    )
    out = dust_params(df).collect()
    assert {r.param for r in out} == {"k"}


def test_dust_params_codegen_no_udf(spark):
    """Parse/strip/explode stay in codegen — no Python anywhere."""
    from podcast_crawler_spark.operators.traps import dust_params

    df = spark.createDataFrame(
        [("http://a.com/x?k=1", "d")], "url string, digest string"
    )
    plan = dust_params(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


# ------------------------------------------------------------ mirrors


def test_mirror_hosts_containment(spark):
    from podcast_crawler_spark.operators.traps import mirror_hosts

    # m1/m2 are exact mirrors of 4 digests; m3 shares 2 of them;
    # lone has 1 unique digest (no pairs)
    rows = []
    for d in ["a", "b", "c", "d"]:
        rows += [("m1", d), ("m2", d)]
    rows += [("m3", "a"), ("m3", "b"), ("m3", "x")]
    rows += [("lone", "z")]
    rows += [("m1", "a")]  # within-host duplicate collapses
    hd = spark.createDataFrame(rows, "host string, digest string")
    got = {
        (r["host_a"], r["host_b"]): (
            r["shared"], r["n_a"], r["n_b"], r["containment_pct"]
        )
        for r in mirror_hosts(hd, min_shared=2).collect()
    }
    assert got == {
        ("m1", "m2"): (4, 4, 4, 100),
        ("m1", "m3"): (2, 4, 3, 66),
        ("m2", "m3"): (2, 4, 3, 66),
    }


def test_mirror_hosts_hot_digest_capped(spark):
    # a digest on every host (boilerplate 404) must not pair everyone
    from podcast_crawler_spark.operators.traps import mirror_hosts

    rows = [(f"h{i}", "boiler") for i in range(20)]
    rows += [("h0", "real"), ("h1", "real"), ("h0", "r2"), ("h1", "r2")]
    hd = spark.createDataFrame(rows, "host string, digest string")
    got = mirror_hosts(hd, min_shared=2, max_digest_hosts=10).collect()
    assert len(got) == 1
    r = got[0]
    # shared counts only the cold digests; sizes count everything
    assert (r["host_a"], r["host_b"], r["shared"]) == ("h0", "h1", 2)
    assert r["n_a"] == 3 and r["n_b"] == 3


def test_mirror_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.traps import (
        mirror_hosts, mirror_oracle_sql,
    )

    rows = [
        (f"h{i % 5}", f"d{(i * 7) % 13}") for i in range(60)
    ]
    hd = spark.createDataFrame(rows, "host string, digest string")
    got = sorted(
        tuple(r) for r in mirror_hosts(hd, min_shared=2).collect()
    )
    vals = ",".join(f"('{h}','{d}')" for h, d in rows)
    osql = mirror_oracle_sql(
        f"select * from (values {vals}) t(host, digest)", min_shared=2
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    assert got == exp


def test_soft404_heuristics(spark):
    """200 + phrase + (tiny or headline-position) => soft; honest 404s,
    long late-phrase pages, and tiny clean pages are all negative."""
    from podcast_crawler_spark.operators.traps import soft404_stats

    filler = "real content " * 30
    rows = [
        ("h", "https://h/1", 200, "Page Not Found - error 404"),
        ("h", "https://h/2", 404, "page not found"),          # honest
        ("h", "https://h/3", 200, filler + " page not found"),  # late
        ("h", "https://h/4", 200, "tiny"),                    # clean tiny
        ("h", "https://h/5", 200, "page not found: " + filler),  # headline
        ("h", "https://h/6", 200, filler),                    # clean
    ]
    df = spark.createDataFrame(
        rows, "host string, url string, http_status int, text string"
    )
    r = soft404_stats(df).collect()[0]
    assert (r.n_pages, r.n_ok, r.n_soft404) == (6, 5, 2)
    assert r.soft404_ppm == 400_000


def test_ip_rotation_stats(spark):
    """A host cycling addresses flags as rotating with an exact
    fixed-point rate; a stable host never flags; a single-observation
    host divides by the span floor, not zero."""
    from podcast_crawler_spark.operators.traps import ip_rotation_stats

    rows = (
        [("flux", f"10.1.0.{i}", 1000 + i * 100) for i in range(10)]
        + [("stable", "10.0.0.1", 1000 + i * 100) for i in range(10)]
        + [("once", "10.2.0.1", 5000)]
    )
    df = spark.createDataFrame(rows, "host string, ip string, seen_unix long")
    out = {r.host: r for r in ip_rotation_stats(df).collect()}
    f = out["flux"]
    assert f.n_ips == 10 and f.rotating
    assert f.span_s == 900
    assert f.ips_per_day_x1000 == (86400 * 1000 * 9) // 900
    assert out["stable"].n_ips == 1 and not out["stable"].rotating
    assert out["once"].span_s == 0
    assert out["once"].ips_per_day_x1000 == 0  # (1-1) numerator
