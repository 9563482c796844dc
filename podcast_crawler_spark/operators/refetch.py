"""Adaptive refetch scheduling: per-feed change-rate estimation.

The reference recrawls every known feed on a fixed cycle — the task
loop re-enqueues ALL feeds each interval regardless of how often a
feed actually publishes (``task_management_system.rs:272-296``; the
interval is a process constant).  At a 10^10-URL frontier that policy
wastes almost the whole fetch budget on dormant feeds.  This operator
is the freshness-aware upgrade (Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003): estimate each feed's
publication rate from the item timestamps observed in its OWN parsed
history, and schedule the next fetch one estimated inter-arrival after
the newest item.

Design for 10^10 feeds:
  * ONE aggregation — three BIGINT partials per feed (count / min /
    max epoch-seconds) with map-side combine; the shuffle carries
    O(feeds) rows of four longs, never item rows.
  * Everything downstream of the agg is a map-side expression (integer
    arithmetic only: `div` floor-division, greatest/least clamps), so
    the whole derivation is engine-exact and a DuckDB oracle replays
    it bit-for-bit — no float crosses the exchange.
  * The due-set selection (`overdue`) composes with the politeness
    priority queue (`frontier.schedule_epoch`): feeds whose
    ``next_fetch_ts`` has passed re-enter the frontier, the rest are
    skipped this epoch — fetch budget flows to feeds that publish.

Semantics (all epoch seconds, BIGINT):
  interval_s    = clamp((last - first) div (n - 1), min_interval_s,
                  max_interval_s); feeds with < 2 timestamped items
                  get max_interval_s (nothing to estimate — poll at
                  the floor rate).
  next_fetch_ts = last_pub_ts + interval_s
  overdue       = next_fetch_ts <= now_ts
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refetch_schedule(
    items: DataFrame,
    feed_col: str = "url",
    ts_col: str = "pub_date",
    now_ts: int = 0,
    min_interval_s: int = 3600,
    max_interval_s: int = 7 * 86400,
) -> DataFrame:
    """Per-feed refetch schedule from observed item timestamps.

    ``items`` is one row per parsed item (episode); rows with a null
    timestamp are ignored (they carry no rate evidence).  Returns one
    row per feed: (feed_col, n_items, last_pub_ts, interval_s,
    next_fetch_ts, overdue).
    """
    ep = F.col(ts_col).cast("timestamp").cast("long")
    agg = (
        items.filter(F.col(ts_col).isNotNull())
        .groupBy(feed_col)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(ep).alias("first_pub_ts"),
            F.max(ep).alias("last_pub_ts"),
        )
    )
    raw = F.when(
        F.col("n_items") >= 2,
        F.expr("(last_pub_ts - first_pub_ts) div (n_items - 1)"),
    ).otherwise(F.lit(max_interval_s).cast("long"))
    interval = F.greatest(
        F.lit(min_interval_s).cast("long"),
        F.least(F.lit(max_interval_s).cast("long"), raw),
    )
    return (
        agg.withColumn("interval_s", interval)
        .withColumn(
            "next_fetch_ts", (F.col("last_pub_ts") + F.col("interval_s"))
        )
        .withColumn("overdue", F.col("next_fetch_ts") <= F.lit(int(now_ts)))
        .drop("first_pub_ts")
    )


def refetch_oracle_sql(
    items_sql: str,
    feed_col: str = "url",
    ts_col: str = "pub_date",
    now_ts: int = 0,
    min_interval_s: int = 3600,
    max_interval_s: int = 7 * 86400,
) -> str:
    """DuckDB SQL replaying the exact integer derivation over
    ``items_sql`` (a relation with feed_col + ts_col)."""
    return f"""
        WITH it AS (
            SELECT {feed_col} AS feed,
                   CAST(epoch({ts_col}) AS BIGINT) AS ep
            FROM ({items_sql})
            WHERE {ts_col} IS NOT NULL
        ),
        a AS (
            SELECT feed, COUNT(*) AS n_items,
                   MIN(ep) AS first_pub_ts, MAX(ep) AS last_pub_ts
            FROM it GROUP BY feed
        ),
        b AS (
            SELECT feed, n_items, last_pub_ts,
                   GREATEST({min_interval_s}, LEAST({max_interval_s},
                       CASE WHEN n_items >= 2
                            THEN (last_pub_ts - first_pub_ts)
                                 // (n_items - 1)
                            ELSE {max_interval_s} END)) AS interval_s
            FROM a
        )
        SELECT feed AS {feed_col}, n_items, last_pub_ts, interval_s,
               last_pub_ts + interval_s AS next_fetch_ts,
               (last_pub_ts + interval_s) <= {int(now_ts)} AS overdue
        FROM b
    """
