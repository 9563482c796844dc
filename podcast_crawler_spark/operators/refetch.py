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

from pyspark.sql import DataFrame, Window
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


def aimd_concurrency(
    obs: DataFrame,
    epochs: int,
    init: int = 1,
    max_c: int = 64,
    host_col: str = "host",
    epoch_col: str = "epoch",
    failures_col: str = "failures",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-host adaptive concurrency by AIMD (additive-increase /
    multiplicative-decrease — TCP's congestion rule, the standard
    adaptive-politeness controller): replay ``epochs`` epochs of fetch
    outcomes and evolve each host's parallel-connection budget:

        clean epoch (0 failures)  → c ← min(max_c, c + 1)
        dirty epoch (≥1 failure)  → c ← max(1, c div 2)
        no traffic that epoch     → c unchanged

    The reference fixes ``max_concurrent_tasks`` per host uniformly
    (``config/crawler.rs:55-63``); AIMD is the upgrade that probes
    fast hosts up and backs off overloaded ones without per-host
    config.  Output: ``(host, concurrency)`` after the last epoch.

    Integer state + fixed iteration count ⇒ the whole trajectory is
    deterministic and the DuckDB oracle (:func:`aimd_oracle_sql`)
    replays it as an unrolled CTE chain (the ``graph.pagerank``
    discipline; a closed-form/window formulation doesn't exist because
    halving compounds on prior state).

    Scale shape: state is one row per host; each epoch is a left join
    of state with that epoch's (already aggregated) observations —
    O(hosts) per epoch, ``localCheckpoint`` truncates lineage.  ``obs``
    rows must be unique per (host, epoch) — aggregate upstream.
    """
    o = obs.select(
        F.col(host_col).alias("host"),
        F.col(epoch_col).alias("epoch"),
        F.col(failures_col).alias("failures"),
    )
    if checkpoint:
        o = o.localCheckpoint(eager=True)
    state = (
        o.select("host")
        .distinct()
        .select("host", F.lit(init).cast("long").alias("c"))
    )
    for t in range(epochs):
        ot = o.filter(F.col("epoch") == t).select(
            F.col("host").alias("o_host"), "failures"
        )
        state = state.join(
            ot, state["host"] == ot["o_host"], "left"
        ).select(
            "host",
            F.when(F.col("failures").isNull(), F.col("c"))
            .when(
                F.col("failures") > 0,
                F.greatest(F.lit(1), F.expr("c div 2")),
            )
            .otherwise(F.least(F.lit(max_c).cast("long"), F.col("c") + 1))
            .cast("long")
            .alias("c"),
        )
        if checkpoint:
            state = state.localCheckpoint(eager=True)
    return state.select("host", F.col("c").alias("concurrency"))


def aimd_oracle_sql(
    obs_sql: str,
    epochs: int,
    init: int = 1,
    max_c: int = 64,
) -> str:
    """DuckDB recomputation of :func:`aimd_concurrency` — unrolled
    epoch chain over any ``(host, epoch, failures)`` subquery."""
    parts = [
        f"with obs as ({obs_sql})",
        f"s0 as (select distinct host, {init}::BIGINT c from obs)",
    ]
    for t in range(epochs):
        parts.append(
            f"s{t + 1} as (select s.host,"
            " case when o.failures is null then s.c"
            "      when o.failures > 0 then greatest(1, s.c // 2)"
            f"      else least({max_c}, s.c + 1) end::BIGINT c"
            f" from s{t} s left join (select * from obs where epoch = {t}) o"
            " on s.host = o.host)"
        )
    joined = ",\n".join(parts)
    return (
        f"{joined}\n"
        f"select host, c as concurrency from s{epochs}"
    )


def circuit_state(
    obs: DataFrame,
    k_open: int = 3,
    max_backoff: int = 64,
    host_col: str = "host",
    epoch_col: str = "epoch",
    failures_col: str = "failures",
) -> DataFrame:
    """Per-host circuit breaker from epoch outcome history — the gating
    rule next to :func:`aimd_concurrency`'s rate rule: AIMD shrinks
    concurrency on a flaky host; the breaker STOPS fetching a dead one
    (DNS gone, permanent 5xx) and schedules a probe instead of burning
    budget every epoch (the reference retries each task up to
    ``max_retries`` with no host-level memory, ``rss_fetcher.rs``
    retry loop — per-host memory is the fleet-scale upgrade).

    Per host: ``last_ok`` = newest epoch with 0 failures, ``consec_fail``
    = number of failing epochs after it (all epochs, if it never
    succeeded).  ``state = 'open'`` when ``consec_fail >= k_open`` —
    with ``retry_epoch = last_epoch + min(2^consec_fail, max_backoff)``
    (exponential probe backoff, integer shiftleft); else ``'closed'``
    with null ``retry_epoch``.

    Scale shape: ONE exchange — the window and the groupBy share the
    host key, so Spark reuses the partitioning; everything else is
    conditional aggregates.  Exact integer oracle.
    """
    from pyspark.sql import Window

    o = obs.select(
        F.col(host_col).alias("host"),
        F.col(epoch_col).alias("epoch"),
        F.col(failures_col).alias("failures"),
    )
    w = Window.partitionBy("host")
    with_ok = o.withColumn(
        "last_ok",
        F.max(F.when(F.col("failures") == 0, F.col("epoch"))).over(w),
    )
    agg = with_ok.groupBy("host").agg(
        F.max("epoch").alias("last_epoch"),
        F.first("last_ok").alias("last_ok"),
        F.sum(
            (
                (F.col("failures") > 0)
                & (F.col("epoch") > F.coalesce("last_ok", F.lit(-1)))
            ).cast("long")
        ).alias("consec_fail"),
    )
    is_open = F.col("consec_fail") >= k_open
    return agg.select(
        "host",
        F.col("last_ok").cast("long").alias("last_ok"),
        F.col("consec_fail").cast("long").alias("consec_fail"),
        F.when(is_open, F.lit("open")).otherwise(F.lit("closed")).alias(
            "state"
        ),
        F.when(
            is_open,
            F.col("last_epoch")
            + F.least(
                F.expr("shiftleft(1L, cast(least(consec_fail, 32) as int))"),
                F.lit(max_backoff).cast("long"),
            ),
        )
        .cast("long")
        .alias("retry_epoch"),
    )


def circuit_oracle_sql(
    obs_sql: str, k_open: int = 3, max_backoff: int = 64
) -> str:
    """DuckDB recomputation of :func:`circuit_state`."""
    return f"""
        with obs as ({obs_sql}),
        wk as (select host, epoch, failures,
                      max(case when failures = 0 then epoch end)
                        over (partition by host) last_ok
               from obs),
        agg as (select host,
                       max(epoch) last_epoch,
                       any_value(last_ok) last_ok,
                       sum((failures > 0 and
                            epoch > coalesce(last_ok, -1))::int)::BIGINT
                         consec_fail
                from wk group by 1)
        select host,
               last_ok::BIGINT as last_ok,
               consec_fail,
               case when consec_fail >= {k_open} then 'open'
                    else 'closed' end as state,
               case when consec_fail >= {k_open} then
                 (last_epoch + least(
                    1::BIGINT << least(consec_fail, 32)::int,
                    {max_backoff}))::BIGINT
               end as retry_epoch
        from agg
    """


def host_latency_profile(
    obs: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    min_n: int = 20,
    min_delay_ms: int = 100,
    max_delay_ms: int = 10000,
) -> DataFrame:
    """Adaptive politeness from OBSERVED latency: per-host exact p50 /
    p95 fetch latency and a recommended inter-request delay
    ``clamp(floor(2·p95), min, max)`` — the "don't hit a struggling
    server at full rate" rule (the reference uses one global governor
    delay, ``rate_limiter.rs:34-41``; latency-adaptive per-host delays
    are the fleet-scale refinement, and pair with
    :func:`aimd_concurrency` / :func:`circuit_state` as the third leg
    of the adaptation stack: rate, gating, spacing).

    ``low_sample`` marks hosts with fewer than ``min_n`` observations —
    their delay is still computed but a scheduler should prefer the
    global prior.  ``floor`` (not cast) before the clamp: Spark's
    double→long cast truncates while DuckDB's ``::BIGINT`` rounds —
    the explicit floor makes both engines exact (the
    ``sampling._threshold`` lesson).

    Scale shape: ONE host-keyed exchange into exact grouped
    percentiles (Spark's ``percentile`` aggregate — sort-based within
    group, fine for per-host fetch-log cardinalities; use
    ``hist_quantiles`` when a host's log itself is huge).
    """
    return (
        obs.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.expr(f"percentile({latency_col}, 0.5)"), 6
            ).alias("p50_ms"),
            F.round(
                F.expr(f"percentile({latency_col}, 0.95)"), 6
            ).alias("p95_ms"),
        )
        .select(
            "host",
            "n",
            "p50_ms",
            "p95_ms",
            F.least(
                F.lit(max_delay_ms).cast("long"),
                F.greatest(
                    F.lit(min_delay_ms).cast("long"),
                    F.floor(2 * F.col("p95_ms")).cast("long"),
                ),
            ).alias("delay_ms"),
            (F.col("n") < min_n).alias("low_sample"),
        )
    )


def latency_oracle_sql(
    obs_sql: str,
    min_n: int = 20,
    min_delay_ms: int = 100,
    max_delay_ms: int = 10000,
) -> str:
    """DuckDB recomputation of :func:`host_latency_profile` —
    ``quantile_cont`` matches Spark's ``percentile`` interpolation
    (the ``stats_median`` precedent)."""
    return f"""
        with obs as ({obs_sql}),
        a as (select host, count(*)::BIGINT n,
                     round(quantile_cont(latency_ms, 0.5), 6) p50_ms,
                     round(quantile_cont(latency_ms, 0.95), 6) p95_ms
              from obs group by 1)
        select host, n, p50_ms, p95_ms,
               least({max_delay_ms},
                     greatest({min_delay_ms},
                              floor(2 * p95_ms)::BIGINT))::BIGINT delay_ms,
               (n < {min_n}) as low_sample
        from a
    """


_MAXAGE_RE = "(?i)(?:^|[,\\s])max-age\\s*=\\s*([0-9]+)"
_SMAXAGE_RE = "(?i)(?:^|[,\\s])s-maxage\\s*=\\s*([0-9]+)"
_NOSTORE_RE = "(?i)(?:^|[,\\s])(no-store|no-cache)(?:$|[,\\s=])"


def cache_ttl(
    df: DataFrame,
    cc_col: str = "cache_control",
    url_col: str = "url",
    fetch_ts_col: str = "fetch_unix",
    default_ttl_s: int = 3600,
    min_ttl_s: int = 60,
    max_ttl_s: int = 604800,
) -> DataFrame:
    """HTTP freshness → refetch TTL: parse each response's
    ``Cache-Control`` and derive when the URL may be refetched —
    the header-driven leg of the refetch stack (RFC 9111 §5.2;
    :func:`refetch_schedule` infers rates from CONTENT history,
    this consumes what the server DECLARES).  Returns ``(url,
    max_age_s, no_store, ttl_s, refetch_unix)``:

      - ``s-maxage`` wins over ``max-age`` (shared-cache rule — a
        crawler is a shared cache); absent both → ``default_ttl_s``.
      - ``no-store`` / ``no-cache`` ⇒ ``no_store = true`` and the
        DEFAULT ttl (a polite crawler still rate-limits refetches of
        uncacheable resources; it just must not serve them stale).
      - ttl clamps to [min, max] — a ``max-age=31536000`` feed is
        refetched weekly regardless (feeds lie), ``max-age=0`` floors
        at a minute.

    Directive grammar is token-boundary regex (``max-age`` must not
    match ``s-maxage``'s tail — hence the leading boundary class),
    identical in Java regex and RE2.  Map-side, zero shuffle; exact
    integer oracle.
    """
    cc = F.coalesce(F.col(cc_col), F.lit(""))
    maxage = F.nullif(F.regexp_extract(cc, _MAXAGE_RE, 1), F.lit(""))
    smaxage = F.nullif(F.regexp_extract(cc, _SMAXAGE_RE, 1), F.lit(""))
    age = F.coalesce(
        smaxage.cast("long"), maxage.cast("long")
    )
    no_store = F.regexp_extract(cc, _NOSTORE_RE, 1) != ""
    ttl = F.when(no_store | age.isNull(), F.lit(default_ttl_s).cast("long")).otherwise(
        F.least(
            F.lit(max_ttl_s).cast("long"),
            F.greatest(F.lit(min_ttl_s).cast("long"), age),
        )
    )
    return df.select(
        F.col(url_col).alias("url"),
        age.alias("max_age_s"),
        no_store.alias("no_store"),
        ttl.alias("ttl_s"),
        (F.col(fetch_ts_col).cast("long") + ttl).alias("refetch_unix"),
    )


def cache_ttl_oracle_sql(
    rows_sql: str,
    default_ttl_s: int = 3600,
    min_ttl_s: int = 60,
    max_ttl_s: int = 604800,
) -> str:
    """DuckDB recomputation of :func:`cache_ttl` over any
    ``(url, cache_control, fetch_unix)`` subquery."""

    def q(p: str) -> str:
        return p.replace("'", "''").replace("\\", "\\")

    return f"""
        with r as (select url, coalesce(cache_control, '') cc,
                          fetch_unix
                   from ({rows_sql}) t),
        p as (select url, fetch_unix,
                     nullif(regexp_extract(cc,
                       '{q(_SMAXAGE_RE)}', 1), '')::BIGINT sm,
                     nullif(regexp_extract(cc,
                       '{q(_MAXAGE_RE)}', 1), '')::BIGINT ma,
                     regexp_extract(cc, '{q(_NOSTORE_RE)}', 1) <> ''
                       no_store
              from r),
        d as (select url, fetch_unix, no_store,
                     coalesce(sm, ma) age
              from p)
        select url, age as max_age_s, no_store,
               (case when no_store or age is null then {default_ttl_s}
                     else least({max_ttl_s},
                                greatest({min_ttl_s}, age)) end)::BIGINT
                 as ttl_s,
               (fetch_unix::BIGINT
                + case when no_store or age is null then {default_ttl_s}
                       else least({max_ttl_s},
                                  greatest({min_ttl_s}, age)) end
               )::BIGINT as refetch_unix
        from d
    """


def validator_stats(
    df: DataFrame,
    host_col: str = "host",
    etag_col: str = "etag",
    lastmod_col: str = "last_modified",
) -> DataFrame:
    """Conditional-revalidation capability per host: how many of a
    host's responses carry an ETag and/or Last-Modified — the planning
    table for If-None-Match / If-Modified-Since refetching (a host at
    90% validator coverage refetches nearly free on 304s; one at 0%
    pays full bodies forever, so its refetch interval should stretch).
    Weak ETags (``W/"..."`` prefix) are counted separately — they
    validate byte-range-free refetches only.

    Output: ``(host, n, n_etag, n_weak_etag, n_lastmod, n_any,
    revalidation_pct)`` with integer percent.  One map-side-combine
    groupBy; exact oracle.
    """
    etag = F.col(etag_col)
    lm = F.col(lastmod_col)
    has_etag = etag.isNotNull() & (etag != "")
    weak = has_etag & etag.startswith("W/")
    has_lm = lm.isNotNull() & (lm != "")
    return (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(has_etag.cast("long")).alias("n_etag"),
            F.sum(weak.cast("long")).alias("n_weak_etag"),
            F.sum(has_lm.cast("long")).alias("n_lastmod"),
            F.sum((has_etag | has_lm).cast("long")).alias("n_any"),
        )
        .select(
            "*",
            F.expr("(100 * n_any) div n").alias("revalidation_pct"),
        )
    )


def validator_oracle_sql(rows_sql: str) -> str:
    """DuckDB recomputation of :func:`validator_stats`."""
    return f"""
        with r as (select * from ({rows_sql}) t),
        a as (select host, count(*)::BIGINT n,
                sum((etag is not null and etag <> '')::int)::BIGINT
                  n_etag,
                sum((etag is not null and etag <> ''
                     and starts_with(etag, 'W/'))::int)::BIGINT
                  n_weak_etag,
                sum((last_modified is not null
                     and last_modified <> '')::int)::BIGINT n_lastmod,
                sum(((etag is not null and etag <> '')
                     or (last_modified is not null
                         and last_modified <> ''))::int)::BIGINT n_any
              from r group by 1)
        select *, ((100 * n_any) // n)::BIGINT revalidation_pct from a
    """


def change_rate_schedule(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_unix",
    digest_col: str = "content_digest",
    min_interval_s: int = 3600,
    max_interval_s: int = 7 * 86400,
) -> DataFrame:
    """Observed-change-rate revisit policy (Cho & Garcia-Molina '03,
    "Effective page refresh policies for web crawlers"): estimate how
    often a page ACTUALLY changes from its fetch history and schedule
    the next visit at the observed change cadence — the third leg of
    the refetch stack (:func:`refetch_schedule` infers from what the
    feed PUBLISHES, :func:`cache_ttl` from what the server DECLARES;
    this one from what the crawler OBSERVED).

    *fetches* is the fetch log ``(url, fetch_unix, content_digest)``,
    one row per completed fetch.  Per URL, consecutive digests are
    compared in fetch order; with ``n_changes`` changes over the
    observed ``span_s = last−first``:

      - ``interval_s = clamp(span_s div n_changes)`` — the mean
        observed time between changes (the paper's ``T/X`` estimator,
        kept as EXACT integer division; the Poisson-MLE refinement
        ``−ln(1−X/n)`` needs libm and buys little at crawl noise
        levels);
      - never-changed URLs back off to ``max_interval_s``;
      - ``change_ppm = 10^6·n_changes div n_intervals`` — the
        change fraction as an exact integer, for host-level rollups.

    Output: ``(url, n_obs, n_changes, change_ppm, first_ts, last_ts,
    interval_s, next_fetch_ts)``.  Single-observation URLs carry no
    evidence and also take ``max_interval_s``.

    Scale shape: one exchange — the per-URL lag window; the groupBy
    that follows is keyed by the same column, so it rides the window's
    partitioning (partial aggregation map-side either way).  All
    integer arithmetic; the oracle replays lag + aggregate exactly.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    lagged = fetches.withColumn("_prev", F.lag(digest_col).over(w))
    agg = lagged.groupBy(url_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(
            (
                F.col("_prev").isNotNull()
                & (F.col("_prev") != F.col(digest_col))
            ).cast("long")
        ).alias("n_changes"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    interval = F.when(
        F.col("n_changes") > 0,
        F.greatest(
            F.lit(min_interval_s).cast("long"),
            F.least(
                F.lit(max_interval_s).cast("long"),
                F.expr("(last_ts - first_ts) div n_changes"),
            ),
        ),
    ).otherwise(F.lit(max_interval_s).cast("long"))
    ppm = F.when(
        F.col("n_obs") >= 2,
        F.expr("(1000000 * n_changes) div (n_obs - 1)"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        agg.withColumn("change_ppm", ppm)
        .withColumn("interval_s", interval)
        .withColumn("next_fetch_ts", F.col("last_ts") + F.col("interval_s"))
        .select(
            url_col, "n_obs", "n_changes", "change_ppm", "first_ts",
            "last_ts", "interval_s", "next_fetch_ts",
        )
    )


def change_rate_oracle_sql(
    fetches_sql: str,
    min_interval_s: int = 3600,
    max_interval_s: int = 7 * 86400,
) -> str:
    """DuckDB replay of :func:`change_rate_schedule` — lag window,
    change counting, exact integer interval/ppm derivation."""
    return f"""
        WITH f AS (SELECT * FROM ({fetches_sql})),
        l AS (
            SELECT url, fetch_unix, content_digest,
                   LAG(content_digest) OVER (
                       PARTITION BY url ORDER BY fetch_unix
                   ) AS prev
            FROM f
        ),
        a AS (
            SELECT url, COUNT(*) AS n_obs,
                   SUM(CASE WHEN prev IS NOT NULL
                             AND prev <> content_digest
                            THEN 1 ELSE 0 END)::BIGINT AS n_changes,
                   MIN(fetch_unix) AS first_ts,
                   MAX(fetch_unix) AS last_ts
            FROM l GROUP BY url
        ),
        b AS (
            SELECT *,
                   CASE WHEN n_obs >= 2
                        THEN (1000000 * n_changes) // (n_obs - 1)
                        ELSE 0 END AS change_ppm,
                   CASE WHEN n_changes > 0
                        THEN GREATEST({min_interval_s}, LEAST(
                            {max_interval_s},
                            (last_ts - first_ts) // n_changes))
                        ELSE {max_interval_s} END AS interval_s
            FROM a
        )
        SELECT url, n_obs, n_changes, change_ppm, first_ts, last_ts,
               interval_s, last_ts + interval_s AS next_fetch_ts
        FROM b
    """


def refetch_decision(
    df: DataFrame,
    now_unix: int,
    cc_col: str = "cache_control",
    url_col: str = "url",
    fetch_ts_col: str = "fetch_unix",
    etag_col: str = "etag",
    lm_col: str = "last_modified",
    bytes_col: str = "n_bytes",
    **ttl_kwargs,
) -> DataFrame:
    """Per-URL refetch action plan — the composition the fetch loop
    actually executes each epoch, built on :func:`cache_ttl`:

      - cache still fresh (``now < refetch_unix``)      → ``skip``
      - stale, response carried an ETag or Last-Modified → ``revalidate``
        (conditional GET: If-None-Match / If-Modified-Since — a 304
        costs headers only, so ``saved_bytes`` = the stored body size)
      - stale, no validator                              → ``full_fetch``

    ``no_store`` responses are never served from cache, but the polite
    refetch cadence (cache_ttl's clamped TTL) still gates WHEN they are
    refetched; they revalidate if a validator exists (RFC 9110 §13.1.2
    permits conditional requests regardless of cacheability).

    Output: ``(url, refetch_unix, decision, saved_bytes)``.  Pure
    map-side composition — cache_ttl's regex parse plus three
    conditionals; zero shuffle at any scale.  The oracle nests the
    cache_ttl oracle and replays the decision rule.
    """
    ttl = cache_ttl(
        df, cc_col=cc_col, url_col=url_col, fetch_ts_col=fetch_ts_col,
        **ttl_kwargs,
    ).select(url_col, "refetch_unix")
    has_validator = (
        F.col(etag_col).isNotNull() | F.col(lm_col).isNotNull()
    )
    base = df.select(
        url_col, F.col(etag_col), F.col(lm_col),
        F.col(bytes_col).cast("long").alias("_nb"),
    ).join(ttl, url_col)
    decision = (
        F.when(F.lit(int(now_unix)) < F.col("refetch_unix"), F.lit("skip"))
        .when(has_validator, F.lit("revalidate"))
        .otherwise(F.lit("full_fetch"))
    )
    return base.select(
        url_col,
        "refetch_unix",
        decision.alias("decision"),
        F.when(decision == "revalidate", F.col("_nb"))
        .otherwise(F.lit(0).cast("long"))
        .alias("saved_bytes"),
    )


def decision_oracle_sql(
    cache_ttl_sql: str,
    rows_sql: str,
    now_unix: int,
) -> str:
    """DuckDB replay of :func:`refetch_decision`: *cache_ttl_sql* is the
    already-built :func:`cache_ttl_oracle_sql` over the same rows (the
    nesting pins the composition, not just the final rule)."""
    return f"""
        WITH t AS (SELECT url, refetch_unix FROM ({cache_ttl_sql}) x),
        r AS (SELECT * FROM ({rows_sql})),
        j AS (
            SELECT r.url, t.refetch_unix,
                   (r.etag IS NOT NULL
                    OR r.last_modified IS NOT NULL) AS hv,
                   r.n_bytes
            FROM r JOIN t ON r.url = t.url
        ),
        d AS (
            SELECT url, refetch_unix,
                   CASE WHEN {int(now_unix)} < refetch_unix THEN 'skip'
                        WHEN hv THEN 'revalidate'
                        ELSE 'full_fetch' END AS decision,
                   n_bytes
            FROM j
        )
        SELECT url, refetch_unix, decision,
               CASE WHEN decision = 'revalidate'
                    THEN n_bytes ELSE 0 END::BIGINT AS saved_bytes
        FROM d
    """


_IMF_FIXDATE_RE = (
    r"^[A-Za-z]{3}, \d{2} [A-Za-z]{3} \d{4} \d{2}:\d{2}:\d{2} GMT$"
)
# weekday token stripped before parsing: Spark 3+ forbids day-of-week
# fields in datetime PARSE patterns (redundant with the date), so the
# grammar gate is the regex above and the parse runs on the tail
_RETRY_AFTER_DATE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def retry_after(
    df: DataFrame,
    now_unix: int,
    header_col: str = "retry_after",
    url_col: str = "url",
    max_delay_s: int = 86400,
) -> DataFrame:
    """``Retry-After`` header parsing (RFC 9110 §10.2.3) — the server's
    EXPLICIT back-pressure signal on 429/503 responses, which a polite
    crawler must honor above its own backoff heuristics
    (:func:`aimd_concurrency` / the circuit breaker infer; this header
    DECLARES).  Both grammars:

      - delay-seconds: ``Retry-After: 120``
      - HTTP-date:     ``Retry-After: Wed, 21 Oct 2015 07:28:00 GMT``
        (IMF-fixdate, the only format a server SHOULD send)

    Output: ``(url, delay_s, not_before_unix, parsed)`` — ``delay_s``
    clamped to [0, max_delay_s] (a hostile ``Retry-After: 10^9`` must
    not park a URL forever), ``parsed=false`` rows (garbage header)
    fall back to delay 0 so the caller's own backoff governs.

    Map-side only: one digits-regex probe, one fixed-format timestamp
    parse (``EEE, dd MMM yyyy HH:mm:ss GMT`` — locale-independent
    day/month tokens, identical in JVM SimpleDateFormat semantics and
    DuckDB ``strptime``), two clamps.  Zero shuffle.
    """
    h = F.trim(F.coalesce(F.col(header_col), F.lit("")))
    secs = F.nullif(F.regexp_extract(h, r"^(\d{1,9})$", 1), F.lit(""))
    # try_to_timestamp: malformed headers are EXPECTED input — under
    # ANSI mode (Spark 4 default) the non-try parse would throw
    dt = F.when(
        h.rlike(_IMF_FIXDATE_RE),
        F.try_to_timestamp(
            F.substring(h, 6, 100), F.lit(_RETRY_AFTER_DATE_FMT)
        ).cast("long"),
    )
    raw = F.coalesce(
        secs.cast("long"),
        dt - F.lit(int(now_unix)),
    )
    # least/greatest IGNORE nulls in both Spark and DuckDB — an
    # unparsed (null) raw would silently clamp to max_delay_s; gate the
    # clamp on parse success so garbage falls back to 0 as documented
    clamped = F.when(
        raw.isNotNull(),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(int(max_delay_s)).cast("long"), raw),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return df.select(
        url_col,
        clamped.alias("delay_s"),
        (F.lit(int(now_unix)) + clamped).alias("not_before_unix"),
        raw.isNotNull().alias("parsed"),
    )


def retry_after_oracle_sql(
    rows_sql: str,
    now_unix: int,
    max_delay_s: int = 86400,
) -> str:
    """DuckDB replay of :func:`retry_after` — same digits grammar, same
    IMF-fixdate parse (``try_strptime``), same clamps."""
    return f"""
        WITH r AS (SELECT * FROM ({rows_sql})),
        p AS (
            SELECT url, trim(coalesce(retry_after, '')) AS h FROM r
        ),
        x AS (
            SELECT url,
                   CASE WHEN regexp_matches(h, '^\\d{{1,9}}$')
                        THEN h::BIGINT
                        WHEN regexp_matches(h,
                            '^[A-Za-z]{{3}}, \\d{{2}} [A-Za-z]{{3}}'
                            || ' \\d{{4}} \\d{{2}}:\\d{{2}}:\\d{{2}} GMT$')
                        THEN epoch(try_strptime(substr(h, 6),
                             '%d %b %Y %H:%M:%S GMT'))::BIGINT
                             - {int(now_unix)}
                   END AS raw
            FROM p
        ),
        c AS (
            SELECT url,
                   CASE WHEN raw IS NOT NULL
                        THEN GREATEST(0, LEAST({int(max_delay_s)}, raw))
                        ELSE 0 END AS cl,
                   raw IS NOT NULL AS parsed
            FROM x
        )
        SELECT url, cl AS delay_s,
               {int(now_unix)} + cl AS not_before_unix,
               parsed
        FROM c
    """


def effective_delay(
    robots_delays: DataFrame,
    latency_delays: DataFrame,
    retry_delays: DataFrame,
    default_delay_s: int = 1,
    max_delay_s: int = 3600,
) -> DataFrame:
    """Politeness-delay resolver: ONE per-host crawl delay from the
    three independent signals the stack computes —

      - ``robots``  (host, robots_delay_s): what the site ASKS
        (Crawl-delay, :mod:`robots`),
      - ``latency`` (host, latency_delay_s): what its observed
        responsiveness SUGGESTS (:func:`host_latency_profile`),
      - ``retry``   (host, retry_delay_s): what the server DEMANDED
        on its last 429/503 (:func:`retry_after`, rolled up per host).

    The most conservative wins: ``delay_s = clamp(max(signals,
    default))``, and ``source`` names which signal bound it (ties to
    the strongest-claim order retry > robots > latency > default — a
    server demand outranks a static hint).  Hosts present in ANY input
    appear (full outer composition); missing signals simply don't
    constrain.

    Host-level tables in, host-level table out: two small outer joins +
    map-side arithmetic.  At 10^8 hosts these are narrow 2-column
    relations co-keyed on host — one shuffle each at most, no corpus
    anywhere.  Exact integer oracle.
    """
    r = robots_delays.select("host", F.col("robots_delay_s").cast("long"))
    l = latency_delays.select(
        "host", F.col("latency_delay_s").cast("long")
    )
    t = retry_delays.select("host", F.col("retry_delay_s").cast("long"))
    j = (
        r.join(l, "host", "full_outer")
        .join(t, "host", "full_outer")
    )
    eff = F.greatest(
        F.coalesce(F.col("robots_delay_s"), F.lit(0).cast("long")),
        F.coalesce(F.col("latency_delay_s"), F.lit(0).cast("long")),
        F.coalesce(F.col("retry_delay_s"), F.lit(0).cast("long")),
        F.lit(int(default_delay_s)).cast("long"),
    )
    clamped = F.least(F.lit(int(max_delay_s)).cast("long"), eff)
    # provenance binds to the PRE-clamp max: a hostile Retry-After that
    # the clamp cut must still read as 'retry', not 'default'
    source = (
        F.when(
            F.coalesce(F.col("retry_delay_s"), F.lit(-1)) == eff,
            F.lit("retry"),
        )
        .when(
            F.coalesce(F.col("robots_delay_s"), F.lit(-1)) == eff,
            F.lit("robots"),
        )
        .when(
            F.coalesce(F.col("latency_delay_s"), F.lit(-1)) == eff,
            F.lit("latency"),
        )
        .otherwise(F.lit("default"))
    )
    return j.select(
        "host",
        clamped.alias("delay_s"),
        source.alias("source"),
        "robots_delay_s",
        "latency_delay_s",
        "retry_delay_s",
    )


def effective_delay_oracle_sql(
    robots_sql: str,
    latency_sql: str,
    retry_sql: str,
    default_delay_s: int = 1,
    max_delay_s: int = 3600,
) -> str:
    """DuckDB replay of :func:`effective_delay` — same outer joins,
    same clamp, same provenance precedence."""
    return f"""
        WITH r AS (SELECT host, robots_delay_s::BIGINT AS robots_delay_s
                   FROM ({robots_sql})),
        l AS (SELECT host, latency_delay_s::BIGINT AS latency_delay_s
              FROM ({latency_sql})),
        t AS (SELECT host, retry_delay_s::BIGINT AS retry_delay_s
              FROM ({retry_sql})),
        j AS (
            SELECT COALESCE(r.host, l.host, t.host) AS host,
                   r.robots_delay_s, l.latency_delay_s, t.retry_delay_s
            FROM r
            FULL OUTER JOIN l ON r.host = l.host
            FULL OUTER JOIN t ON COALESCE(r.host, l.host) = t.host
        ),
        e AS (
            SELECT *,
                   GREATEST(
                       COALESCE(robots_delay_s, 0),
                       COALESCE(latency_delay_s, 0),
                       COALESCE(retry_delay_s, 0),
                       {int(default_delay_s)}) AS eff
            FROM j
        )
        SELECT host, LEAST({int(max_delay_s)}, eff) AS delay_s,
               CASE WHEN COALESCE(retry_delay_s, -1) = eff
                        THEN 'retry'
                    WHEN COALESCE(robots_delay_s, -1) = eff
                        THEN 'robots'
                    WHEN COALESCE(latency_delay_s, -1) = eff
                        THEN 'latency'
                    ELSE 'default' END AS source,
               robots_delay_s, latency_delay_s, retry_delay_s
        FROM e
    """


def delay_compliance(
    fetch_log: DataFrame,
    declared: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_unix",
    delay_col: str = "crawl_delay_s",
) -> DataFrame:
    """Politeness compliance audit: did the crawler's ACTUAL fetch
    spacing honor each host's declared crawl delay?  The scheduler
    plans compliant timestamps (`schedule_epoch`'s planned_fetch_ts);
    retries, queue drain-order and clock drift can still violate them
    in production — this measures the ground truth from the fetch log,
    per host:

      ``(host, n_fetches, n_gaps, min_gap_s, n_violations,
      violation_ppm, declared_delay_s)``

    where a violation is a consecutive-fetch gap strictly below the
    declared delay (equal is compliant), and hosts with no declared
    delay audit against 0 (never violated — nothing was promised).

    Scale shape: one per-host lag window (same key as every politeness
    op), a broadcast join for the declared-delay dim, one
    map-side-combined aggregate.  Exact integer oracle.
    """
    w = Window.partitionBy(host_col).orderBy(ts_col)
    gaps = fetch_log.withColumn(
        "_gap", F.col(ts_col) - F.lag(ts_col).over(w)
    )
    d = declared.select(
        host_col, F.col(delay_col).cast("long").alias("_delay")
    ).distinct()
    j = gaps.join(F.broadcast(d), host_col, "left").withColumn(
        "_delay", F.coalesce(F.col("_delay"), F.lit(0).cast("long"))
    )
    return j.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col("_gap").isNotNull().cast("long")).alias("n_gaps"),
        F.min("_gap").alias("min_gap_s"),
        F.sum(
            (F.col("_gap").isNotNull() & (F.col("_gap") < F.col("_delay")))
            .cast("long")
        ).alias("n_violations"),
        F.max("_delay").alias("declared_delay_s"),
    ).withColumn(
        "violation_ppm",
        F.expr(
            "case when n_gaps > 0"
            " then (1000000 * n_violations) div n_gaps else 0 end"
        ),
    )


def compliance_oracle_sql(
    fetch_sql: str, declared_sql: str
) -> str:
    """DuckDB replay of :func:`delay_compliance`."""
    return f"""
        WITH f AS (SELECT * FROM ({fetch_sql})),
        g AS (
            SELECT host, fetch_unix,
                   fetch_unix - LAG(fetch_unix) OVER (
                       PARTITION BY host ORDER BY fetch_unix
                   ) AS gap
            FROM f
        ),
        d AS (
            SELECT DISTINCT host, crawl_delay_s::BIGINT AS delay
            FROM ({declared_sql})
        ),
        j AS (
            SELECT g.host, g.gap, COALESCE(d.delay, 0) AS delay
            FROM g LEFT JOIN d ON g.host = d.host
        )
        SELECT host, COUNT(*) AS n_fetches,
               SUM((gap IS NOT NULL)::int)::BIGINT AS n_gaps,
               MIN(gap) AS min_gap_s,
               SUM((gap IS NOT NULL AND gap < delay)::int)::BIGINT
                   AS n_violations,
               MAX(delay) AS declared_delay_s,
               CASE WHEN SUM((gap IS NOT NULL)::int) > 0
                    THEN (1000000 * SUM((gap IS NOT NULL
                              AND gap < delay)::int))
                         // SUM((gap IS NOT NULL)::int)
                    ELSE 0 END::BIGINT AS violation_ppm
        FROM j GROUP BY host
    """


def host_scorecard(
    latency: DataFrame,
    validators: DataFrame,
    changes: DataFrame,
) -> DataFrame:
    """The per-host operational scorecard — ONE table answering "how
    should the scheduler treat this host next epoch?", composed from
    the three independent (and independently oracled) adaptation
    chains:

      - *latency*   = :func:`host_latency_profile` output
        (responsiveness → spacing),
      - *validators* = :func:`validator_stats` output
        (revalidation capability → refetch cost),
      - *changes*   = a host-level rollup of
        :func:`change_rate_schedule` (``(host, change_ppm)`` —
        freshness value).

    ``score`` ∈ [0,100], exact integers:

      - up to 40 for freshness value (``min(40, change_ppm div
        25000)`` — a host changing 100% of the time maxes out),
      - up to 30 for revalidation capability
        (``revalidation_pct · 30 div 100``),
      - up to 30 for responsiveness (full marks at p95 ≤ 1000 ms,
        minus 1 per 300 ms beyond, floored at 0).

    Hosts appear if ANY chain saw them (full-outer composition);
    absent signals contribute 0 — unknown is never rewarded.  Three
    host-keyed narrow tables, two outer joins, map-side arithmetic;
    the oracle nests all three chains and replays the join + score.
    """
    l = latency.select("host", "p95_ms")
    v = validators.select("host", "revalidation_pct")
    c = changes.select("host", "change_ppm")
    j = l.join(v, "host", "full_outer").join(c, "host", "full_outer")
    fresh = F.least(
        F.lit(40).cast("long"),
        F.expr("coalesce(change_ppm, 0) div 25000"),
    )
    reval = F.expr("(coalesce(revalidation_pct, 0) * 30) div 100")
    # p95 is a double (exact percentile); floor -> long BEFORE the
    # integer scoring (floor, not cast: Spark's double->long cast
    # truncates where DuckDB's rounds -- the host_latency pitfall)
    resp = F.when(F.col("p95_ms").isNull(), F.lit(0).cast("long")).otherwise(
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(30).cast("long")
            - F.expr(
                "greatest(0, cast(floor(p95_ms) as bigint) - 1000)"
                " div 300"
            ),
        )
    )
    return j.select(
        "host",
        F.col("p95_ms"),
        F.col("revalidation_pct"),
        F.col("change_ppm"),
        fresh.alias("s_fresh"),
        reval.alias("s_reval"),
        resp.alias("s_resp"),
        (fresh + reval + resp).alias("score"),
    )


def scorecard_oracle_sql(
    latency_sql: str,
    validators_sql: str,
    changes_sql: str,
) -> str:
    """DuckDB replay of :func:`host_scorecard` over the three chains'
    SQL (each itself a full oracle of its operator)."""
    return f"""
        WITH l AS (SELECT host, p95_ms FROM ({latency_sql}) a),
        v AS (SELECT host, revalidation_pct FROM ({validators_sql}) b),
        c AS (SELECT host, change_ppm FROM ({changes_sql}) d),
        j AS (
            SELECT COALESCE(l.host, v.host, c.host) AS host,
                   l.p95_ms, v.revalidation_pct, c.change_ppm
            FROM l
            FULL OUTER JOIN v ON l.host = v.host
            FULL OUTER JOIN c ON COALESCE(l.host, v.host) = c.host
        ),
        s AS (
            SELECT *,
                   LEAST(40, COALESCE(change_ppm, 0) // 25000)
                       AS s_fresh,
                   (COALESCE(revalidation_pct, 0) * 30) // 100
                       AS s_reval,
                   CASE WHEN p95_ms IS NULL THEN 0
                        ELSE GREATEST(0, 30 -
                            GREATEST(0, floor(p95_ms)::BIGINT - 1000)
                                // 300) END
                       AS s_resp
            FROM j
        )
        SELECT host, p95_ms, revalidation_pct, change_ppm,
               s_fresh::BIGINT AS s_fresh, s_reval::BIGINT AS s_reval,
               s_resp::BIGINT AS s_resp,
               (s_fresh + s_reval + s_resp)::BIGINT AS score
        FROM s
    """


def url_tombstones(
    fetches: DataFrame,
    url_col: str = "url",
    epoch_col: str = "epoch",
    status_col: str = "status",
    max_404: int = 3,
    max_backoff_epochs: int = 64,
) -> DataFrame:
    """Per-URL dead-link lifecycle from the fetch history — the
    negative cache a frontier needs so dead URLs stop consuming
    politeness slots (Heritrix's no-retry status classes; the
    reference retries every failure identically,
    `crawler/rss_fetcher.rs` retry loop, because its seed list is
    curated — a discovery frontier meets rot at scale and must
    classify it):

    - any **451** → ``legal_block`` (kept distinct from rot: it is a
      compliance record, not a dead link);
    - else any **410 Gone** → ``tombstone_gone`` (the server said
      permanent — believe it);
    - else last status < 400 → ``alive``;
    - else: ``trailing_run`` = consecutive trailing failed fetches;
      if the last status is 404/403 and the run has reached *max_404*
      → ``tombstone_404`` (soft rot confirmed); otherwise ``retry``
      with ``next_retry_epoch = last_epoch + min(2^run,
      max_backoff_epochs)`` — the same doubling discipline as
      :func:`circuit_state`, per URL instead of per host.

    Scale shape: ONE ``groupBy(url)`` exchange of (epoch, status)
    pairs; the trailing-run scan is an array fold over the URL's own
    bounded fetch history (a URL is fetched dozens of times, not
    corpus-many) — same in-group array discipline as
    ``curation.repetition_scores``.  Output: ``(url, n_fetches,
    last_epoch, last_status, trailing_run, state,
    next_retry_epoch)``.
    """
    hist = F.sort_array(
        F.collect_list(F.struct(F.col("e").alias("e"),
                                F.col("s").alias("s")))
    )
    rev = F.reverse(hist)
    run = F.aggregate(
        rev,
        F.struct(F.lit(0).cast("long").alias("run"),
                 F.lit(False).alias("stopped")),
        lambda acc, x: F.struct(
            F.when(~acc.stopped & (x.s >= 400), acc.run + 1)
            .otherwise(acc.run).alias("run"),
            (acc.stopped | (x.s < 400)).alias("stopped"),
        ),
        lambda acc: acc.run,
    )
    g = fetches.select(
        F.col(url_col).alias("url"),
        F.col(epoch_col).cast("long").alias("e"),
        F.col(status_col).cast("int").alias("s"),
    ).groupBy("url").agg(
        F.count("*").alias("n_fetches"),
        F.max("e").alias("last_epoch"),
        F.max_by("s", "e").alias("last_status"),
        F.max((F.col("s") == 410).cast("int")).alias("_gone"),
        F.max((F.col("s") == 451).cast("int")).alias("_legal"),
        run.alias("trailing_run"),
    )
    backoff = F.expr(
        f"least(shiftleft(cast(1 as bigint),"
        f" cast(least(trailing_run, 20) as int)),"
        f" cast({int(max_backoff_epochs)} as bigint))"
    )
    state = (
        F.when(F.col("_legal") == 1, F.lit("legal_block"))
        .when(F.col("_gone") == 1, F.lit("tombstone_gone"))
        .when(F.col("last_status") < 400, F.lit("alive"))
        .when(
            F.col("last_status").isin(403, 404)
            & (F.col("trailing_run") >= int(max_404)),
            F.lit("tombstone_404"),
        )
        .otherwise(F.lit("retry"))
    )
    return g.select(
        "url", "n_fetches", "last_epoch", "last_status", "trailing_run",
        state.alias("state"),
        F.when(state == "retry", F.col("last_epoch") + backoff)
        .otherwise(F.lit(None).cast("long")).alias("next_retry_epoch"),
    )


def tombstone_oracle_sql(
    fetches_sql: str,
    max_404: int = 3,
    max_backoff_epochs: int = 64,
) -> str:
    """DuckDB replay of :func:`url_tombstones`: the trailing failed
    run via last-success position, the same precedence chain and the
    shifted backoff.  *fetches_sql* must yield (url, epoch, status)
    with per-url unique epochs."""
    return f"""
        WITH f AS ({fetches_sql}),
        a AS (
          SELECT url,
                 count(*)::BIGINT n_fetches,
                 max(epoch)::BIGINT last_epoch,
                 max_by(status, epoch)::INT last_status,
                 max(CASE WHEN status = 410 THEN 1 ELSE 0 END) gone,
                 max(CASE WHEN status = 451 THEN 1 ELSE 0 END) legal,
                 max(CASE WHEN status < 400 THEN epoch END) last_ok
          FROM f GROUP BY url
        ),
        t AS (
          SELECT a.*,
                 (SELECT count(*) FROM f
                  WHERE f.url = a.url
                    AND f.epoch > coalesce(a.last_ok, -1))::BIGINT
                     trailing_run
          FROM a
        ),
        s AS (
          SELECT *,
                 CASE WHEN legal = 1 THEN 'legal_block'
                      WHEN gone = 1 THEN 'tombstone_gone'
                      WHEN last_status < 400 THEN 'alive'
                      WHEN last_status IN (403, 404)
                           AND trailing_run >= {int(max_404)}
                          THEN 'tombstone_404'
                      ELSE 'retry' END state
          FROM t
        )
        SELECT url, n_fetches, last_epoch, last_status, trailing_run,
               state,
               CASE WHEN state = 'retry'
                    THEN last_epoch
                         + least(1::BIGINT
                                 << least(trailing_run, 20)::INT,
                                 {int(max_backoff_epochs)})
               END::BIGINT next_retry_epoch
        FROM s
    """
