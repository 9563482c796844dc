"""Adaptive refetch scheduling (operators/refetch.py)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from podcast_crawler_spark.operators.refetch import refetch_schedule


def _ts(day, hour=0):
    return datetime(2025, 1, day, hour, tzinfo=timezone.utc)


NOW = int(datetime(2025, 1, 20, tzinfo=timezone.utc).timestamp())


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, pub_date timestamp")
    out = refetch_schedule(df, now_ts=NOW, **kw).orderBy("url")
    return {r["url"]: r.asDict() for r in out.collect()}


def test_mean_interarrival_estimate(spark):
    # 3 items, 2 days apart -> interval = 2 days exactly
    rows = [("a", _ts(1)), ("a", _ts(3)), ("a", _ts(5))]
    got = _run(spark, rows)["a"]
    assert got["n_items"] == 3
    assert got["interval_s"] == 2 * 86400
    assert got["next_fetch_ts"] == int(_ts(5).timestamp()) + 2 * 86400
    # last pub Jan 5 + 2d = Jan 7 <= Jan 20 now -> overdue
    assert got["overdue"] is True


def test_interval_floor_division_is_exact_integer(spark):
    # span 7 s over 3 gaps -> 7 div 3 = 2 (floor), never a float
    base = _ts(10)
    rows = [("b", base)] + [
        ("b", datetime.fromtimestamp(base.timestamp() + s, tz=timezone.utc))
        for s in (3, 5, 7)
    ]
    got = _run(spark, rows, min_interval_s=1)["b"]
    assert got["interval_s"] == 2


def test_single_item_and_clamps(spark):
    rows = [
        ("one", _ts(19)),          # 1 item -> max interval
        ("fast", _ts(19, 0)), ("fast", _ts(19, 1)),   # 1h apart < min
        ("slow", _ts(1)), ("slow", _ts(19)),          # 18d apart > max
    ]
    got = _run(spark, rows, min_interval_s=7200, max_interval_s=5 * 86400)
    assert got["one"]["interval_s"] == 5 * 86400
    assert got["one"]["n_items"] == 1
    assert got["fast"]["interval_s"] == 7200      # clamped up to min
    assert got["slow"]["interval_s"] == 5 * 86400  # clamped down to max


def test_null_timestamps_carry_no_evidence(spark):
    rows = [("c", _ts(1)), ("c", None), ("c", _ts(3)), ("d", None)]
    got = _run(spark, rows)
    assert got["c"]["n_items"] == 2
    assert got["c"]["interval_s"] == 2 * 86400
    assert "d" not in got  # all-null feed has no schedule row


def test_fresh_feed_not_overdue(spark):
    # last pub yesterday + 7d default max... use explicit: pub Jan 19,
    # interval 2d -> next Jan 21 > Jan 20 now -> not overdue
    rows = [("e", _ts(17)), ("e", _ts(19))]
    got = _run(spark, rows)["e"]
    assert got["next_fetch_ts"] == int(_ts(21).timestamp())
    assert got["overdue"] is False


def test_plan_is_one_partial_agg_no_join(spark):
    rows = [("a", _ts(1)), ("a", _ts(3))]
    df = spark.createDataFrame(rows, "url string, pub_date timestamp")
    plan = refetch_schedule(df, now_ts=NOW)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # one keyed shuffle of partials
    assert "partial_count" in plan or "partial" in plan.lower()


# ------------------------------------------------------------- breaker


def test_circuit_opens_after_consecutive_failures(spark):
    from podcast_crawler_spark.operators.refetch import circuit_state

    obs = [
        # ok at 0, then 3 failing epochs -> open, retry = 3 + 2^3 = 11
        ("dead", 0, 0), ("dead", 1, 2), ("dead", 2, 1), ("dead", 3, 5),
        # flaky but recovered: failure then success -> closed
        ("flaky", 0, 1), ("flaky", 1, 0),
        # never succeeded, 2 failures < k_open=3 -> closed
        ("young", 0, 1), ("young", 1, 1),
        # never succeeded, 4 failures -> open from the start
        ("never", 0, 1), ("never", 1, 1), ("never", 2, 1), ("never", 3, 1),
    ]
    df = spark.createDataFrame(obs, "host string, epoch long, failures long")
    got = {
        r["host"]: (r["last_ok"], r["consec_fail"], r["state"],
                    r["retry_epoch"])
        for r in circuit_state(df, k_open=3, max_backoff=64).collect()
    }
    assert got["dead"] == (0, 3, "open", 3 + 8)
    assert got["flaky"] == (1, 0, "closed", None)
    assert got["young"] == (None, 2, "closed", None)
    assert got["never"] == (None, 4, "open", 3 + 16)


def test_circuit_backoff_capped(spark):
    from podcast_crawler_spark.operators.refetch import circuit_state

    obs = [("h", e, 1) for e in range(20)]
    df = spark.createDataFrame(obs, "host string, epoch long, failures long")
    r = circuit_state(df, k_open=3, max_backoff=64).collect()[0]
    assert r["state"] == "open" and r["retry_epoch"] == 19 + 64


def test_circuit_single_exchange(spark):
    # window + groupBy share the host key -> one hashpartitioning
    from podcast_crawler_spark.operators.refetch import circuit_state

    df = spark.createDataFrame(
        [("h", 0, 1)], "host string, epoch long, failures long"
    )
    p = circuit_state(df)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p


def test_circuit_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.refetch import (
        circuit_state, circuit_oracle_sql,
    )

    obs = [
        (f"h{h}", e, (h * 5 + e) % 4 // 3)
        for h in range(10) for e in range(8)
    ]
    df = spark.createDataFrame(obs, "host string, epoch long, failures long")
    got = sorted(tuple(r) for r in circuit_state(df, k_open=2).collect())
    vals = ",".join(f"('{h}',{e},{f})" for h, e, f in obs)
    osql = circuit_oracle_sql(
        f"select * from (values {vals}) o(host, epoch, failures)", k_open=2
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    norm = lambda t: tuple(
        int(x) if isinstance(x, int) else x for x in t
    )
    assert [norm(g) for g in got] == [norm(e) for e in exp]


# ------------------------------------------------------------- latency


def test_host_latency_profile_delay_rule(spark):
    from podcast_crawler_spark.operators.refetch import (
        host_latency_profile,
    )

    rows = (
        [("fast", float(i % 5 + 1)) for i in range(40)]
        + [("slow", float(3000 + i)) for i in range(40)]
        + [("rare", 50.0)] * 3
    )
    df = spark.createDataFrame(rows, "host string, latency_ms double")
    got = {r["host"]: r.asDict() for r in
           host_latency_profile(df, min_n=20).collect()}
    # fast host clamps up to the floor delay
    assert got["fast"]["delay_ms"] == 100
    # slow host: 2*p95 within range
    assert 6000 <= got["slow"]["delay_ms"] <= 10000
    assert not got["fast"]["low_sample"] and got["rare"]["low_sample"]


def test_host_latency_clamps_at_max(spark):
    from podcast_crawler_spark.operators.refetch import (
        host_latency_profile,
    )

    df = spark.createDataFrame(
        [("h", 99999.0)] * 25, "host string, latency_ms double"
    )
    r = host_latency_profile(df).collect()[0]
    assert r["delay_ms"] == 10000


def test_host_latency_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.refetch import (
        host_latency_profile, latency_oracle_sql,
    )

    rows = [
        (f"h{i % 5}", float((i * 37) % 400 + 1)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "host string, latency_ms double")
    got = sorted(tuple(r) for r in
                 host_latency_profile(df, min_n=15).collect())
    vals = ",".join(f"('{h}',{v})" for h, v in rows)
    osql = latency_oracle_sql(
        "select host, latency_ms::DOUBLE as latency_ms"
        f" from (values {vals}) o(host, latency_ms)",
        min_n=15,
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    norm = lambda t: tuple(
        float(x) if not isinstance(x, (str, bool)) else x for x in t
    )
    assert [norm(g) for g in got] == [norm(e) for e in exp]


# --------------------------------------------------------------- TTLs


def test_cache_ttl_directive_grammar(spark):
    from podcast_crawler_spark.operators.refetch import cache_ttl

    rows = [
        ("u1", "public, max-age=1200", 1000),
        ("u2", "max-age=60, s-maxage=7200", 1000),   # s-maxage wins
        ("u3", "no-store", 1000),
        ("u4", "private, no-cache, max-age=900", 1000),
        ("u5", None, 1000),
        ("u6", "max-age=31536000", 1000),            # clamps to max
        ("u7", "max-age=0", 1000),                   # floors at min
        ("u8", "s-maxage=500", 1000),                # alone
        ("u9", "Max-Age=300", 1000),                 # case-insensitive
    ]
    df = spark.createDataFrame(
        rows, "url string, cache_control string, fetch_unix long"
    )
    got = {r["url"]: (r["max_age_s"], r["no_store"], r["ttl_s"],
                      r["refetch_unix"])
           for r in cache_ttl(df).collect()}
    assert got["u1"] == (1200, False, 1200, 2200)
    assert got["u2"] == (7200, False, 7200, 8200)
    assert got["u3"] == (None, True, 3600, 4600)
    assert got["u4"] == (900, True, 3600, 4600)  # no-cache dominates
    assert got["u5"] == (None, False, 3600, 4600)
    assert got["u6"] == (31536000, False, 604800, 605800)
    assert got["u7"] == (0, False, 60, 1060)
    assert got["u8"] == (500, False, 500, 1500)
    assert got["u9"][0] == 300


def test_cache_ttl_oracle_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.refetch import (
        cache_ttl, cache_ttl_oracle_sql,
    )

    rows = [
        (f"u{i}",
         ["max-age=120", "no-store", None, "s-maxage=999, max-age=5",
          "weird, max-age=40"][i % 5],
         1000 + i)
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "url string, cache_control string, fetch_unix long"
    )
    got = sorted(tuple(r) for r in cache_ttl(df).collect())
    vals = ",".join(
        "('%s', %s, %d)" % (u, "NULL" if c is None else f"'{c}'", t)
        for u, c, t in rows
    )
    osql = cache_ttl_oracle_sql(
        f"select * from (values {vals}) v(url, cache_control, fetch_unix)"
    )
    exp = sorted(tuple(r) for r in duckdb.sql(osql).fetchall())
    norm = lambda t: tuple(
        int(x) if isinstance(x, (int, bool)) else x for x in t
    )
    assert [norm(g) for g in got] == [norm(e) for e in exp]


def test_validator_stats_counts(spark):
    from podcast_crawler_spark.operators.refetch import validator_stats

    rows = [
        ("h1", '"e1"', None),
        ("h1", 'W/"w1"', "Wed, 04 Dec 2024 10:06:00 GMT"),
        ("h1", None, None),
        ("h1", "", "Thu, 05 Dec 2024 10:06:00 GMT"),
        ("h2", None, None),
    ]
    df = spark.createDataFrame(
        rows, "host string, etag string, last_modified string"
    )
    got = {r["host"]: r.asDict() for r in validator_stats(df).collect()}
    h1 = got["h1"]
    assert (h1["n"], h1["n_etag"], h1["n_weak_etag"]) == (4, 2, 1)
    assert (h1["n_lastmod"], h1["n_any"], h1["revalidation_pct"]) == (
        2, 3, 75
    )
    assert got["h2"]["revalidation_pct"] == 0


def test_change_rate_schedule_intervals(spark):
    """Pinned history: 2 changes over a 400 s span -> interval = 200 s
    (unclamped), next fetch 200 s after the last observation; a
    never-changing URL and a single-observation URL both back off to
    max_interval_s."""
    from podcast_crawler_spark.operators.refetch import (
        change_rate_schedule,
    )

    rows = (
        [("a", t, d) for t, d in
         [(0, "x"), (100, "x"), (200, "y"), (300, "y"), (400, "z")]]
        + [("b", t, "same") for t in (0, 100, 200)]
        + [("c", 50, "once")]
    )
    df = spark.createDataFrame(
        rows, "url string, fetch_unix long, content_digest string"
    )
    out = {
        r.url: r
        for r in change_rate_schedule(
            df, min_interval_s=1, max_interval_s=10_000
        ).collect()
    }
    a = out["a"]
    assert (a.n_obs, a.n_changes, a.interval_s, a.next_fetch_ts) == (
        5, 2, 200, 600
    )
    assert a.change_ppm == 500_000  # 2 changes / 4 intervals
    assert out["b"].n_changes == 0
    assert out["b"].interval_s == 10_000
    assert out["c"].n_obs == 1
    assert out["c"].interval_s == 10_000
    assert out["c"].change_ppm == 0


def test_refetch_decision_three_way(spark):
    """Fresh → skip; stale with a validator → revalidate (body bytes
    saved); stale bare → full fetch.  no-store is never 'fresh' past
    its clamped cadence but still revalidates when a validator exists."""
    from podcast_crawler_spark.operators.refetch import refetch_decision

    now = 2_000_000
    rows = [
        # url, cc, fetch, etag, lm, bytes
        ("fresh", "max-age=900000", 1_500_000, None, None, 100),
        ("stale-etag", "max-age=60", 1_000_000, '"abc"', None, 7777),
        ("stale-lm", "max-age=60", 1_000_000, None, "Mon GMT", 500),
        ("stale-bare", "max-age=60", 1_000_000, None, None, 9),
        ("nostore-etag", "no-store", 1_000_000, '"x"', None, 42),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, cache_control string, fetch_unix long,"
        " etag string, last_modified string, n_bytes long",
    )
    out = {r.url: r for r in refetch_decision(df, now_unix=now).collect()}
    assert out["fresh"].decision == "skip"
    assert out["fresh"].saved_bytes == 0
    assert out["stale-etag"].decision == "revalidate"
    assert out["stale-etag"].saved_bytes == 7777
    assert out["stale-lm"].decision == "revalidate"
    assert out["stale-bare"].decision == "full_fetch"
    assert out["nostore-etag"].decision == "revalidate"


def test_retry_after_grammars_and_clamps(spark):
    """delay-seconds and IMF-fixdate both parse; hostile delays clamp;
    past dates floor at zero; garbage falls back unparsed."""
    from podcast_crawler_spark.operators.refetch import retry_after

    now = 1_700_000_000  # 2023-11-14 22:13:20 UTC
    rows = [
        ("secs", "120"),
        ("future", "Wed, 15 Nov 2023 06:25:24 GMT"),
        ("past", "Mon, 13 Nov 2023 06:25:24 GMT"),
        ("hostile", "999999999"),
        ("junk", "soon"),
        ("absent", None),
    ]
    df = spark.createDataFrame(rows, "url string, retry_after string")
    out = {r.url: r for r in retry_after(df, now_unix=now).collect()}
    assert out["secs"].delay_s == 120 and out["secs"].parsed
    assert out["future"].delay_s == 1_700_029_524 - now
    assert out["past"].delay_s == 0 and out["past"].parsed
    assert out["hostile"].delay_s == 86_400
    assert not out["junk"].parsed and out["junk"].delay_s == 0
    assert not out["absent"].parsed
    assert out["secs"].not_before_unix == now + 120


def test_effective_delay_precedence_and_clamp(spark):
    """Most conservative signal wins; provenance follows the
    strongest-claim order retry > robots > latency > default; hostile
    retry delays clamp; hosts missing everywhere still get the
    default."""
    from podcast_crawler_spark.operators.refetch import effective_delay

    mk = lambda rows, col: spark.createDataFrame(
        rows, f"host string, {col} long"
    )
    r = mk([("a", 10), ("b", 2), ("zero", 0)], "robots_delay_s")
    l = mk([("a", 4), ("c", 7)], "latency_delay_s")
    t = mk([("b", 2), ("d", 99999)], "retry_delay_s")
    out = {
        x.host: x for x in effective_delay(r, l, t).collect()
    }
    assert out["a"].delay_s == 10 and out["a"].source == "robots"
    # tie robots==retry at 2 -> retry outranks
    assert out["b"].delay_s == 2 and out["b"].source == "retry"
    assert out["c"].delay_s == 7 and out["c"].source == "latency"
    # clamp cuts the value but provenance still names the binding signal
    assert out["d"].delay_s == 3600 and out["d"].source == "retry"
    assert out["zero"].delay_s == 1 and out["zero"].source == "default"


def test_delay_compliance_gaps(spark):
    """Strict-below gaps violate, equal gaps comply, undeclared hosts
    never violate; min gap and ppm are exact."""
    from podcast_crawler_spark.operators.refetch import delay_compliance

    log = spark.createDataFrame(
        [("a", 0), ("a", 5), ("a", 15), ("a", 16), ("b", 0), ("b", 1)],
        "host string, fetch_unix long",
    )
    declared = spark.createDataFrame(
        [("a", 5)], "host string, crawl_delay_s long"
    )
    out = {r.host: r for r in delay_compliance(log, declared).collect()}
    a = out["a"]  # gaps 5,10,1 -> one violation (1 < 5); 5 == 5 complies
    assert (a.n_fetches, a.n_gaps, a.min_gap_s, a.n_violations) == (
        4, 3, 1, 1
    )
    assert a.violation_ppm == 333_333
    assert out["b"].n_violations == 0 and out["b"].declared_delay_s == 0


def test_host_scorecard_composition(spark):
    """Exact score arithmetic across present/absent signals: a fresh,
    revalidating, fast host maxes the parts; a host seen by no chain
    but one still appears with the others zeroed."""
    from podcast_crawler_spark.operators.refetch import host_scorecard

    lat = spark.createDataFrame(
        [("a", 800.0), ("b", 2500.0)], "host string, p95_ms double"
    )
    val = spark.createDataFrame(
        [("a", 100), ("c", 50)], "host string, revalidation_pct long"
    )
    chg = spark.createDataFrame(
        [("a", 1_000_000), ("b", 100_000)], "host string, change_ppm long"
    )
    out = {r.host: r for r in host_scorecard(lat, val, chg).collect()}
    a = out["a"]  # fresh 40 + reval 30 + resp 30 (800 <= 1000)
    assert (a.s_fresh, a.s_reval, a.s_resp, a.score) == (40, 30, 30, 100)
    b = out["b"]  # fresh 4, reval 0, resp 30 - 1500//300 = 25
    assert (b.s_fresh, b.s_reval, b.s_resp, b.score) == (4, 0, 25, 29)
    c = out["c"]  # only validators saw it
    assert (c.s_fresh, c.s_reval, c.s_resp, c.score) == (0, 15, 0, 15)


def test_url_tombstones_precedence_and_backoff(spark):
    """Every lifecycle state from handcrafted histories: precedence
    (451 > 410 > alive), the trailing-run count, the 404 cap, and the
    shifted-capped retry schedule."""
    from podcast_crawler_spark.operators.refetch import url_tombstones

    rows = [
        # alive: fails then recovers
        ("a", 1, 404), ("a", 2, 500), ("a", 3, 200),
        # retry: one trailing 404 (run 1 < 3) → next = 5 + 2
        ("b", 4, 200), ("b", 5, 404),
        # tombstone_404: three straight 404s
        ("c", 1, 404), ("c", 2, 404), ("c", 3, 404),
        # gone beats a later 200
        ("d", 1, 410), ("d", 2, 200),
        # legal beats gone
        ("e", 1, 410), ("e", 2, 451), ("e", 3, 200),
        # retry on 5xx even after many: run 4 → next = 9 + 16
        ("f", 5, 503), ("f", 6, 503), ("f", 7, 503), ("f", 8, 503),
        ("f", 9, 503),
        # backoff cap: 8 trailing 5xx → 2^8=256 capped at 64
        *[("g", 10 + i, 500) for i in range(8)],
    ]
    df = spark.createDataFrame(rows, "url string, epoch int, status int")
    out = {r.url: r for r in url_tombstones(df).collect()}
    assert out["a"].state == "alive" and out["a"].trailing_run == 0
    assert out["a"].next_retry_epoch is None
    assert out["b"].state == "retry" and out["b"].trailing_run == 1
    assert out["b"].next_retry_epoch == 5 + 2
    assert out["c"].state == "tombstone_404" and out["c"].trailing_run == 3
    assert out["d"].state == "tombstone_gone"
    assert out["e"].state == "legal_block"
    assert out["f"].state == "retry" and out["f"].trailing_run == 5
    assert out["f"].next_retry_epoch == 9 + 32
    assert out["g"].state == "retry"
    assert out["g"].next_retry_epoch == 17 + 64  # capped
