"""robots.txt parsing: raw fetched robots bodies → the rules table the
scheduler's J4 broadcast join consumes (``operators/frontier.robots_filter``).

The reference does not fetch or honor robots.txt at all (its politeness
is only the global 2 req/s governor, ``/root/reference/src/crawler/
rate_limiter.rs:34-41``); the north rule adds per-host robots rules, and
this operator closes the loop from raw crawled ``robots.txt`` bytes to
the ``(host, user_agent, disallow_prefixes, crawl_delay_s)`` table.

Grammar (the practical subset, per the original 1994 REP and RFC 9309's
group model, simplified to one User-agent line per group — the shape the
deterministic corpus generates):

* lines are ``key: value``; ``#`` starts a comment; blank lines ignored
* ``User-agent:`` starts a group; subsequent ``Disallow`` /
  ``Crawl-delay`` lines belong to it
* the group for OUR exact user-agent wins over the ``*`` group; a host
  with neither yields no rules row (crawl with defaults)
* empty ``Disallow:`` means "allow all" and adds no prefix

Parsing is line-oriented per host — a pandas-batched map over the
(small: one row per host) robots table, same Arrow-UDF pattern as the
feed parser.  At 10^10 URLs the robots table is ~10^7 hosts — one
map-side pass, no shuffle, then broadcast into scheduling.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .frontier import USER_AGENT

RULES_SCHEMA = StructType([
    StructField("host", StringType(), False),
    StructField("user_agent", StringType(), False),
    StructField("disallow_prefixes", ArrayType(StringType()), False),
    StructField("crawl_delay_s", DoubleType(), True),
])


def parse_robots_text(body: str, user_agent: str = USER_AGENT) -> Optional[dict]:
    """Parse one robots.txt body; returns the applicable group's rules
    (exact-UA group preferred over ``*``) or None if neither exists."""
    groups: dict = {}
    cur = None
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            cur = groups.setdefault(val, {"disallow": [], "delay": None})
        elif cur is not None:
            if key == "disallow" and val:
                cur["disallow"].append(val)
            elif key == "crawl-delay":
                try:
                    cur["delay"] = float(val)
                except ValueError:
                    pass
    for ua in (user_agent, "*"):
        if ua in groups:
            g = groups[ua]
            return {
                "user_agent": ua,
                "disallow_prefixes": g["disallow"],
                "crawl_delay_s": g["delay"],
            }
    return None


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = USER_AGENT,
) -> DataFrame:
    """Robots bodies → rules table (RULES_SCHEMA).  Hosts whose file has
    no applicable group emit no row — the scheduler's left join then
    applies defaults, exactly as for hosts with no robots.txt at all."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                r = parse_robots_text(body or "", user_agent)
                if r is not None:
                    rows.append(
                        (
                            host,
                            r["user_agent"],
                            r["disallow_prefixes"],
                            r["crawl_delay_s"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RULES_SCHEMA.fields]
            )

    return df.select(host_col, body_col).mapInPandas(_run, schema=RULES_SCHEMA)


def sitemap_directives(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Extract ``Sitemap:`` directives from raw robots.txt bodies —
    the discovery bridge from the politeness layer to the sitemap
    scanner (``operators/sitemap.py``): per the robots.txt convention
    the directive is group-independent, case-insensitive, and may
    appear any number of times.

    Output ``(host, pos, sitemap_url)`` with ``pos`` the directive's
    order within its file.  Unlike :func:`parse_robots` (a pandas UDF
    implementing the stateful UA-group grammar), this is a stateless
    line filter — pure JVM array expressions (split → filter →
    posexplode), zero Python, zero shuffle, and exactly reproducible
    in the SQL oracle."""
    # ltrim/trim strip spaces only — robots files use tabs too, so
    # whitespace handling goes through anchored regexes
    def _lstrip(l):
        return F.regexp_replace(l, r"^[ \t\r]+", "")

    def _strip(l):
        return F.regexp_replace(l, r"^[ \t\r]+|[ \t\r]+$", "")

    lines = F.split(F.col(body_col), "\n")
    sm = F.filter(
        lines,
        lambda l: F.substring(F.lower(_lstrip(l)), 1, 8)
        == F.lit("sitemap:"),
    )
    urls = F.transform(
        sm, lambda l: _strip(F.substring(_lstrip(l), 9, 100000))
    )
    return df.select(
        F.col(host_col).alias("host"), F.posexplode(urls)
    ).select(
        "host", F.col("pos").cast("int").alias("pos"),
        F.col("col").alias("sitemap_url"),
    )
