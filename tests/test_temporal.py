"""Temporal operator tests: as-of join vs handcrafted + python mirrors,
sessionization gap semantics, and plan shape (one keyed exchange)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_asof_join_handcrafted(spark):
    from podcast_crawler_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts(10)),  # right at 05 and 10 -> equal-ts 10 wins
            (2, 10, _ts(4)),   # before any right -> null
            (3, 20, _ts(30)),  # key with one earlier right
            (4, 99, _ts(30)),  # key with no rights at all
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(5), "a"),
            (101, 10, _ts(10), "b"),
            (102, 10, _ts(11), "c"),  # after every left -> never matched
            (103, 20, _ts(7), "d"),
        ],
        "rid long, k long, ts timestamp, tag string",
    )
    got = {
        r.id: r
        for r in asof_join(left, right, on="k", right_cols=["rid", "tag"]).collect()
    }
    assert (got[1].right_rid, got[1].right_tag) == (101, "b")  # inclusive <=
    assert got[1].right_ts == _ts(10)
    assert got[2].right_rid is None and got[2].right_ts is None
    assert (got[3].right_rid, got[3].right_tag) == (103, "d")
    assert got[4].right_rid is None
    # left columns pass through untouched
    assert got[3].k == 20 and got[3].ts == _ts(30)


def test_asof_join_tolerance(spark):
    from podcast_crawler_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 5, _ts(10)), (2, 5, _ts(59))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, 5, _ts(9))], "rid long, k long, ts timestamp"
    )
    got = {
        r.id: r
        for r in asof_join(
            left, right, on="k", right_cols=["rid"], tolerance_s=120.0
        ).collect()
    }
    assert got[1].right_rid == 7          # 60s old, within tolerance
    assert got[2].right_rid is None       # 50min old, beyond tolerance


def test_asof_join_matches_python_mirror(events):
    """purchases asof-joined to signups per user == per-row python scan."""
    from podcast_crawler_spark.operators.temporal import asof_join

    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    got = {
        r.event_id: (r.right_rid, r.right_ts)
        for r in asof_join(
            left, right, on="user_id", right_cols=["rid"]
        ).collect()
    }
    rights = sorted(
        ((r.user_id, r.ts, r.rid) for r in right.collect()),
        key=lambda t: (t[0], t[1]),
    )
    for l in left.collect():
        best = None
        for (u, ts, rid) in rights:
            if u == l.user_id and ts <= l.ts:
                best = (rid, ts)
        assert got[l.event_id] == (best if best else (None, None)), l
    assert len(got) == left.count()


def test_asof_join_single_keyed_exchange(events):
    """The union-tag-window formulation shuffles ONCE on the key — no
    join node, no range-condition nested loop anywhere in the plan."""
    from podcast_crawler_spark.operators.temporal import asof_join

    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    plan = (
        asof_join(left, right, on="user_id", right_cols=["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(_k") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_sessionize_handcrafted(spark):
    from podcast_crawler_spark.operators.temporal import sessionize

    rows = [
        (1, 7, _ts(0)),
        (2, 7, _ts(10)),        # 600s gap, same session
        (3, 7, _ts(45)),        # 2100s gap > 1800 -> new session
        (4, 7, _ts(46)),
        (5, 8, _ts(0)),         # other key independent
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r for r in sessionize(df, gap_s=1800.0).collect()}
    assert [got[i].session_idx for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
    assert got[5].session_idx == 1
    assert got[3].session_id == "7:2"


def test_session_stats_rollup(spark):
    from podcast_crawler_spark.operators.temporal import session_stats

    rows = [
        (1, 7, _ts(0)),
        (2, 7, _ts(10)),
        (3, 7, _ts(45)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_idx): r
        for r in session_stats(df, gap_s=1800.0).collect()
    }
    s1 = got[(7, 1)]
    assert s1.n_events == 2 and s1.duration_s == 600.0
    assert s1.start_ts == _ts(0) and s1.end_ts == _ts(10)
    assert got[(7, 2)].n_events == 1 and got[(7, 2)].duration_s == 0.0


def test_sessionize_single_window_exchange(events):
    """Both windows (lag flag + cumulative sum) share partitioning and
    ordering: ONE hash exchange on the key, one sort."""
    from podcast_crawler_spark.operators.temporal import sessionize

    plan = (
        sessionize(events.select("event_id", "user_id", "ts"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_range_join_handcrafted(spark):
    """Inclusive bounds both ends; multi-grain intervals match once per
    point; out-of-range and wrong-key points drop."""
    from podcast_crawler_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [
            (1, 7, _ts(0)),            # == start (inclusive)
            (2, 7, _ts(30)),           # strictly inside, later grain
            (3, 7, _ts(59, 59)),       # just inside end
            (4, 7, dt.datetime(2024, 1, 1, 1, 0, 1)),  # past end
            (5, 8, _ts(30)),           # other key, no interval
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ivl = spark.createDataFrame(
        [(7, 101, _ts(0), dt.datetime(2024, 1, 1, 1, 0, 0))],
        "user_id long, ivl_id long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        r.event_id: r.ivl_ivl_id
        for r in range_join(
            pts, ivl, on="user_id", grain_s=600,
            interval_cols=["ivl_id"],
        ).collect()
    }
    assert got == {1: 101, 2: 101, 3: 101}


def test_range_join_matches_sessions(events):
    """Self-consistency: range-joining events into their own session
    intervals reproduces the sessionize assignment exactly (sessions
    partition each user's timeline, so containment is 1:1)."""
    from podcast_crawler_spark.operators.temporal import (
        range_join,
        session_stats,
        sessionize,
    )

    ev = events.select("event_id", "user_id", "ts")
    ivls = session_stats(ev, gap_s=1800.0)
    got = {
        r.event_id: (r.user_id, r.ivl_session_idx)
        for r in range_join(
            ev, ivls, on="user_id", grain_s=3600,
            interval_cols=["session_idx"],
        ).collect()
    }
    want = {
        r.event_id: (r.user_id, r.session_idx)
        for r in sessionize(ev, gap_s=1800.0).collect()
    }
    assert got == want


def test_range_join_no_nested_loop(events):
    """The grid formulation must plan as an equi-join on (key, grain) —
    never a nested-loop / cartesian range join."""
    from podcast_crawler_spark.operators.temporal import (
        range_join,
        session_stats,
    )

    ev = events.select("event_id", "user_id", "ts")
    plan = (
        range_join(
            ev, session_stats(ev), on="user_id",
            interval_cols=["session_idx"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_burst_detection_rule(spark):
    """Cross-multiplied rule on a pinned series: a 10× spike flags, a
    flat series never does, the first window has no history, and a gap
    dilutes the trailing mean through the RANGE frame."""
    from podcast_crawler_spark.operators.temporal import burst_detection

    def ev(host, win, n):
        return [(host, win * 100 + i) for i in range(n)]

    rows = (
        ev("a", 0, 2) + ev("a", 1, 2) + ev("a", 2, 20)   # spike at win 2
        + ev("b", 0, 5) + ev("b", 1, 5) + ev("b", 2, 5)  # flat
        + ev("c", 0, 2) + ev("c", 6, 2)                  # gap: 5 empty wins
    )
    df = spark.createDataFrame(rows, "host string, event_unix long")
    out = {
        (r.key, r.win): r
        for r in burst_detection(
            df, window_s=100, trailing=6, factor_x10=30
        ).collect()
    }
    assert not out[("a", 0)].burst  # no history (span 0)
    assert not out[("a", 1)].burst  # span 1: 2 vs 2 -- flat, not burst
    assert out[("a", 2)].burst      # span 2: 20 vs trailing sum 4
    assert not any(out[("b", w)].burst for w in range(3))
    # c: win 6 has full span 6, trailing sum 2 (five empty windows
    # zero-fill inside the frame) -> 10*6*2=120 > 30*2=60 -> burst
    assert out[("c", 6)].burst and out[("c", 6)].span == 6
