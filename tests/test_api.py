"""Read-side query API tests — the seven reference routes (SURVEY.md
§2.12) over a real crawl state, checked against the output tables."""

import pytest

from pyspark.sql import functions as F

from podcast_crawler_spark.api.queries import PodcastQueryAPI
from podcast_crawler_spark.operators.frontier import CrawlConfig
from podcast_crawler_spark.plans.epoch import run_crawl
from podcast_crawler_spark.sources.pagesgen import (
    EPOCH0,
    gen_pages,
    gen_robots,
    gen_seeds,
)

N = 120
CFG = CrawlConfig(per_host_budget=1000, max_retries=1, num_partitions=8)


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apicrawl"))
    state = run_crawl(
        spark,
        root,
        gen_seeds(spark, N, partitions=4),
        gen_pages(spark, N, partitions=4),
        gen_robots(spark, N),
        epochs=1,
        epoch0=EPOCH0,
        cfg=CFG,
    )
    return PodcastQueryAPI(spark, state)


def test_metrics_route(api):
    rows = api.metrics().collect()
    assert len(rows) == 1
    assert rows[0].epoch == 1 and rows[0].scheduled > 0


def test_search_ilike(api):
    # every generated title contains "Show"; ILIKE must be case-insensitive
    total = api.podcast_count()
    assert api.search("shOW").count() == total
    assert api.search("no-such-title-xyz").count() == 0


def test_podcast_by_title_point_lookup(api):
    some = api.podcasts().select("title").first().title
    rows = api.podcast_by_title(some).collect()
    assert len(rows) >= 1 and rows[0].title == some


def test_pagination_covers_all_exactly_once(api):
    total = api.podcast_count()
    per_page = 7
    seen = []
    page = 1
    while True:
        rows = api.podcasts_page(page, per_page).collect()
        if not rows:
            break
        seen.extend(r.podcast_id for r in rows)
        page += 1
    assert len(seen) == total
    assert len(set(seen)) == total
    assert seen == sorted(seen)


def test_episodes_page_newest_first(api):
    pod = (
        api.podcasts(include_episodes=True)
        .filter(F.size("episodes") >= 3)
        .first()
    )
    rows = api.episodes_page(pod.podcast_id, 1, 2).collect()
    assert len(rows) == 2
    dates = [r.pub_date for r in rows]
    assert dates == sorted(dates, reverse=True)
    assert api.episode_count(pod.podcast_id) == len(pod.episodes)


def test_include_episodes_join(api):
    joined = api.podcasts(include_episodes=True)
    n_eps = joined.select(F.explode("episodes")).count()
    assert n_eps == api._episodes().count()


def test_add_task_appends_frontier(api, spark):
    before = api.state.frontier.read(spark).count()
    api.add_task("https://newhost.example/feeds/brand-new.xml", priority=1)
    after = api.state.frontier.read(spark)
    assert after.count() == before + 1
    row = after.filter(F.col("url") == "https://newhost.example/feeds/brand-new.xml").first()
    assert row.state == "pending" and row.host == "newhost.example"
    # idempotent: same canonical URL is not added twice
    api.add_task("https://newhost.example/feeds/brand-new.xml", priority=9)
    assert api.state.frontier.read(spark).count() == before + 1


# ------------------------------------------------------------- url scrub


def test_scrub_url_matrix(spark):
    from podcast_crawler_spark.functions.urlfns import scrub_url

    cases = [
        # tracking dropped, survivors byte-sorted
        ("https://h/p?utm_source=a&b=2&a=1", "https://h/p?a=1&b=2"),
        # everything tracking -> '?' disappears
        ("https://h/p?gclid=1&fbclid=2", "https://h/p"),
        # no query untouched
        ("https://h/p", "https://h/p"),
        # dangling '?' dropped; fragment preserved
        ("https://h/p?", "https://h/p"),
        ("https://h/p?ref=x#sec", "https://h/p#sec"),
        ("https://h/p?z=1&utm_x#sec", "https://h/p?z=1#sec"),
        # empty params dropped; valueless non-tracking kept
        ("https://h/p?a&&b=1", "https://h/p?a&b=1"),
        # 'refx' is NOT the tracking param 'ref' (anchored match)
        ("https://h/p?refx=1", "https://h/p?refx=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["s"]
        for r in df.select(
            scrub_url(F.col("url")).alias("s")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_scrub_url_unsorted_preserves_order(spark):
    from podcast_crawler_spark.functions.urlfns import scrub_url

    df = spark.createDataFrame(
        [("https://h/p?b=2&utm_source=x&a=1",)], "url string"
    )
    got = df.select(
        scrub_url(F.col("url"), sort_params=False).alias("s")
    ).first()["s"]
    assert got == "https://h/p?b=2&a=1"


def test_surt_host_and_key(spark):
    from podcast_crawler_spark.functions.urlfns import surt_host, surt_key

    cases = [
        ("https://www.Example.ORG/a/b?x=1#f",
         "org,example", "org,example)/a/b?x=1"),
        ("http://feeds.pod.example.org/x", "org,example,pod,feeds",
         "org,example,pod,feeds)/x"),
        ("https://host.net:8443/y", "net,host", "net,host)/y"),
        # www only stripped as a LEADING label
        ("https://www2.example.com/", "com,example,www2",
         "com,example,www2)/"),
        ("https://wwwx.example.com", "com,example,wwwx",
         "com,example,wwwx)"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        surt_host(F.col("url")).alias("h"), surt_key(F.col("url")).alias("k")
    ).collect()
    assert [(r["h"], r["k"]) for r in got] == [(h, k) for _, h, k in cases]


def test_surt_orders_domain_contiguously(spark):
    from podcast_crawler_spark.functions.urlfns import surt_host

    urls = [
        "https://a.example.org/",
        "https://z.example.org/",
        "https://b.other.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    s = sorted(r["h"] for r in df.select(surt_host(F.col("url")).alias("h")).collect())
    # both example.org subdomains adjacent under SURT order
    assert s[0].startswith("com,other")
    assert s[1].startswith("org,example") and s[2].startswith("org,example")


def test_registered_domain_psl_lite(spark):
    from pyspark.sql import functions as F

    from podcast_crawler_spark.functions.urlfns import (
        registered_domain,
        registered_domain_sql,
    )

    cases = {
        "www.megapod.co.uk": "megapod.co.uk",
        "feeds.x.com": "x.com",
        "a.b.pod.com.au": "pod.com.au",
        "pod.org": "pod.org",
        "co.uk": "co.uk",          # bare suffix: unchanged
        "localhost": "localhost",  # single label: unchanged
        "deep.sub.site.org.nz": "site.org.nz",
        "x.gov.br": "x.gov.br",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.rd
        for r in df.select(
            "host", registered_domain(F.col("host")).alias("rd")
        ).collect()
    }
    assert got == cases
    # the SQL replay agrees with the column expression
    import duckdb

    con = duckdb.connect()
    con.execute("create table t(host varchar)")
    con.executemany("insert into t values (?)", [(h,) for h in cases])
    sql_got = dict(
        con.sql(f"select host, {registered_domain_sql('host')} from t").fetchall()
    )
    assert sql_got == cases


def test_keyset_page_walks_whole_table(spark):
    """Walking pages by cursor visits every row exactly once in order,
    including ties resumed mid-key; the plan is Filter +
    TakeOrderedAndProject, never a window."""
    rows = [(k, t) for k in (1, 2, 2, 2, 3) for t in range(3)]
    rows = [(k, i, k * 100 + i) for i, (k, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k long, tie long, payload long")
    from podcast_crawler_spark.api.queries import keyset_page

    seen, after, tie = [], None, None
    while True:
        page = keyset_page(
            df, "k", after, per_page=4, tiebreak_col="tie", after_tie=tie
        ).collect()
        if not page:
            break
        seen.extend((r.k, r.tie) for r in page)
        after, tie = page[-1].k, page[-1].tie
    assert seen == sorted((r[0], r[1]) for r in rows)
    assert len(seen) == len(rows)
    p = keyset_page(df, "k", 2, 4, "tie", 1)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
