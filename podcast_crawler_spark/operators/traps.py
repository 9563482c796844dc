"""Crawl-trap detection: per-host URL-template explosion stats.

Crawler traps (calendar pages, session-id links, faceted search) show
up as one URL *template* generating unbounded concrete URLs on a host.
The standard defense is to template URLs (digit runs → ``N``) and flag
hosts where a single template dominates — those hosts then get a
frontier admission cap or a deny rule (the reference has no trap logic;
its frontier is a fixed seed list, ``rss_fetcher.rs`` — this is the
required upgrade once discovery admits arbitrary URLs via
``plans/epoch.admit_urls`` / sitemap scan).

Scale shape: templating is a map-side ``regexp_replace``; the first
groupBy (host, template) has map-side combine (traps collapse into ONE
row per template — the bigger the trap, the smaller its aggregate), and
the per-host rollup aggregates the already-tiny template table.  The
deterministic "top template" uses ``min(struct(-cnt, template))`` — an
argmax without a window, so there is no per-host sort task.

Every output is an integer, a string, or an integer comparison — exact
SQL oracle, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEMPLATE_PATTERN = "[0-9]+"


def url_template(url):
    """Digit runs collapsed to ``N`` — '/ep/123?d=2025' and
    '/ep/456?d=2024' are the same template."""
    return F.regexp_replace(url, TEMPLATE_PATTERN, "N")


def trap_stats(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    min_urls: int = 50,
    dominance_num: int = 9,
    dominance_den: int = 10,
) -> DataFrame:
    """Per-host template stats: ``(host, n_urls, n_templates,
    top_template, top_count, is_trap)``.

    ``is_trap`` = host has >= *min_urls* URLs AND its top template
    covers >= dominance_num/dominance_den of them (defaults: 50 URLs,
    90%) — integer arithmetic only (``top_count*den >= n_urls*num``).
    Ties on top_count break to the lexicographically smallest template.
    """
    per_template = (
        df.select(
            F.col(host_col).alias("host"),
            url_template(F.col(url_col)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rolled = per_template.groupBy("host").agg(
        F.sum("cnt").alias("n_urls"),
        F.count(F.lit(1)).alias("n_templates"),
        F.min(
            F.struct(
                (-F.col("cnt")).alias("nc"), F.col("template").alias("t")
            )
        ).alias("best"),
    )
    return rolled.select(
        "host",
        "n_urls",
        "n_templates",
        F.col("best.t").alias("top_template"),
        (-F.col("best.nc")).cast("long").alias("top_count"),
        (
            (F.col("n_urls") >= min_urls)
            & (
                -F.col("best.nc") * dominance_den
                >= F.col("n_urls") * dominance_num
            )
        ).alias("is_trap"),
    )
