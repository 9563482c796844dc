"""Frontier growth: episode-URL discovery + Bloom-gated admission —
the seen set spans feed AND episode URLs (north star)."""

import pytest

from pyspark.sql import functions as F

from podcast_crawler_spark.operators.frontier import CrawlConfig
from podcast_crawler_spark.plans.epoch import (
    admit_urls,
    discovered_urls,
    run_crawl,
)
from podcast_crawler_spark.sources.pagesgen import (
    EPOCH0,
    gen_pages,
    gen_robots,
    gen_seeds,
)

N = 80
CFG = CrawlConfig(per_host_budget=1000, max_retries=1, num_partitions=4)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("disc"))
    state = run_crawl(
        spark,
        root,
        gen_seeds(spark, N, partitions=2),
        gen_pages(spark, N, partitions=2),
        gen_robots(spark, N, partitions=2),
        epochs=1,
        epoch0=EPOCH0,
        cfg=CFG,
    )
    return state


def test_discovered_urls_canonical(spark, crawled):
    d = discovered_urls(crawled, spark)
    rows = d.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.canonical_url.startswith("https://")
        assert isinstance(r.url_hash, int)


def test_admit_discovered_bloom_vs_exact(spark, crawled):
    """Bloom-accelerated admission must admit exactly the same URL set as
    the plain anti-join (FPs verified away), and be idempotent."""
    d = discovered_urls(crawled, spark).cache()
    before = crawled.frontier.read(spark)
    n_before = before.count()

    # exact expected set: distinct canonical urls not already in frontier
    expected_new = (
        d.select("canonical_url")
        .distinct()
        .join(before.select("canonical_url"), "canonical_url", "left_anti")
        .count()
    )

    admit_urls(spark, crawled, d, EPOCH0, CFG, use_bloom=True)
    after = crawled.frontier.read(spark)
    assert after.count() == n_before + expected_new
    # frontier still keyed by canonical_url
    assert after.count() == after.select("canonical_url").distinct().count()
    # epoch counter untouched by admission
    assert crawled.completed_epochs() == 1

    # idempotent: second admit adds nothing
    admit_urls(spark, crawled, d, EPOCH0, CFG, use_bloom=True)
    assert crawled.frontier.read(spark).count() == n_before + expected_new


def test_admitted_urls_schedule_after_seeds(spark, crawled):
    """Discovered URLs carry low priority: within a host, seeds rank
    before discovered rows in the politeness queue."""
    from podcast_crawler_spark.operators.frontier import schedule_epoch

    robots = gen_robots(spark, N, partitions=2)
    frontier = crawled.frontier.read(spark)
    # force everything due now
    due = frontier.withColumn("next_fetch_ts", F.lit(EPOCH0).cast("timestamp")).withColumn(
        "state", F.lit("pending")
    )
    sched = schedule_epoch(due, robots, EPOCH0, CFG)
    joined = sched.select("url", "host", "host_seq", "priority")
    per_host = joined.groupBy("host").agg(
        F.min(F.when(F.col("priority") >= 1_000_000, F.col("host_seq"))).alias(
            "first_disc"
        ),
        F.max(F.when(F.col("priority") < 1_000_000, F.col("host_seq"))).alias(
            "last_seed"
        ),
    )
    bad = per_host.filter(
        F.col("first_disc").isNotNull()
        & F.col("last_seed").isNotNull()
        & (F.col("first_disc") < F.col("last_seed"))
    )
    assert bad.count() == 0
