"""Consistent-hash ring placement + AIMD concurrency tests."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _naive(ring, key):
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    cands = [pw for pw in ring if pw[0] >= h]
    return cands[0] if cands else ring[0]


def test_consistent_assign_equals_naive_rule(spark):
    from podcast_crawler_spark.operators.placement import (
        consistent_assign, ring_vnodes,
    )

    workers = [f"w{i}" for i in range(8)]
    keys = [(f"host{i}.example",) for i in range(300)]
    df = spark.createDataFrame(keys, "host string")
    ring = ring_vnodes(workers, 16)
    got = sorted(
        (r["host"], r["ring_pos"], r["worker"])
        for r in consistent_assign(df, workers, vnodes=16).collect()
    )
    exp = sorted((k, *_naive(ring, k)) for (k,) in keys)
    assert got == exp


def test_consistent_assign_wraparound_and_bucket_boundaries(spark):
    # tiny ring + coarse buckets forces cross-bucket successor lookups
    # and the wrap-to-minimum path
    from podcast_crawler_spark.operators.placement import (
        consistent_assign, ring_vnodes,
    )

    workers = ["a", "b"]
    keys = [(f"k{i}",) for i in range(200)]
    df = spark.createDataFrame(keys, "host string")
    ring = ring_vnodes(workers, 2)
    got = {
        r["host"]: (r["ring_pos"], r["worker"])
        for r in consistent_assign(
            df, workers, vnodes=2, bucket_bits=3
        ).collect()
    }
    for (k,) in keys:
        assert got[k] == _naive(ring, k)
    # with only 4 vnodes in 8 buckets, some key MUST wrap
    assert any(got[k][0] == ring[0][0] for (k,) in keys)


def test_rebalance_moves_about_one_over_n(spark):
    from podcast_crawler_spark.operators.placement import rebalance_stats

    workers = [f"w{i}" for i in range(8)]
    df = spark.createDataFrame(
        [(f"host{i}",) for i in range(400)], "host string"
    )
    r = rebalance_stats(df, workers, workers + ["w8"], vnodes=32).collect()[0]
    assert r["n_keys"] == 400
    # ring property: ~1/9 ≈ 11% moved; assert well under modulo's ~89%
    assert 0 < r["moved_pct"] <= 25


def test_empty_workers_raises(spark):
    from podcast_crawler_spark.operators.placement import consistent_assign

    df = spark.createDataFrame([("x",)], "host string")
    with pytest.raises(ValueError):
        consistent_assign(df, [])


# ---------------------------------------------------------------- AIMD


def _py_aimd(obs, epochs, init, max_c):
    hosts = {h for h, _, _ in obs}
    by = {(h, e): f for h, e, f in obs}
    c = {h: init for h in hosts}
    for t in range(epochs):
        for h in hosts:
            f = by.get((h, t))
            if f is None:
                continue
            c[h] = max(1, c[h] // 2) if f > 0 else min(max_c, c[h] + 1)
    return c


def test_aimd_matches_python(spark):
    from podcast_crawler_spark.operators.refetch import aimd_concurrency

    obs = []
    for h in range(12):
        for e in range(5):
            if (h + e) % 4 == 0:
                continue  # idle epoch: hold
            obs.append((f"h{h}", e, 1 if (h * e) % 3 == 0 else 0))
    df = spark.createDataFrame(obs, "host string, epoch int, failures long")
    got = {
        r["host"]: r["concurrency"]
        for r in aimd_concurrency(df, epochs=5, init=2, max_c=6).collect()
    }
    assert got == _py_aimd(obs, 5, 2, 6)


def test_aimd_halving_floor_and_cap(spark):
    from podcast_crawler_spark.operators.refetch import aimd_concurrency

    # all-clean host rails at max_c; all-dirty host floors at 1
    obs = [("clean", e, 0) for e in range(10)] + [
        ("dirty", e, 3) for e in range(10)
    ]
    df = spark.createDataFrame(obs, "host string, epoch int, failures long")
    got = {
        r["host"]: r["concurrency"]
        for r in aimd_concurrency(df, epochs=10, init=1, max_c=4).collect()
    }
    assert got == {"clean": 4, "dirty": 1}


def test_aimd_oracle_sql_matches(spark):
    import duckdb
    from podcast_crawler_spark.operators.refetch import (
        aimd_concurrency, aimd_oracle_sql,
    )

    obs = [
        (f"h{h}", e, (h * 7 + e) % 5 // 4) for h in range(9) for e in range(6)
    ]
    df = spark.createDataFrame(obs, "host string, epoch int, failures long")
    got = sorted(
        (r["host"], r["concurrency"])
        for r in aimd_concurrency(df, epochs=6, init=1, max_c=8).collect()
    )
    vals = ",".join(f"('{h}',{e},{f})" for h, e, f in obs)
    osql = aimd_oracle_sql(
        f"select * from (values {vals}) o(host, epoch, failures)",
        epochs=6, init=1, max_c=8,
    )
    exp = sorted((a, int(b)) for a, b in duckdb.sql(osql).fetchall())
    assert got == exp


def test_ip_asn_longest_prefix(spark):
    """Nested ranges resolve to the most specific block; addresses
    outside every range are absent; dotted-quad parsing is exact."""
    from podcast_crawler_spark.operators.placement import ip_asn_lookup

    ips = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.1.5",), ("192.168.1.1",)], "ip string"
    )
    #  /8 supernet + one /24 inside it
    ranges = spark.createDataFrame(
        [
            (10 * 16777216, 10 * 16777216 + 16777215, 999, "SUPER"),
            (10 * 16777216, 10 * 16777216 + 255, 64500, "SPECIFIC"),
        ],
        "start_ip long, end_ip long, asn long, asn_name string",
    )
    out = {r.ip: r for r in ip_asn_lookup(ips, ranges).collect()}
    assert out["10.0.0.5"].asn == 64500     # most specific wins
    assert out["10.0.0.5"].ip_long == 10 * 16777216 + 5
    assert out["10.0.1.5"].asn == 999       # only the supernet contains
    assert "192.168.1.1" not in out


def test_epsilon_greedy_deterministic_and_balanced(spark):
    """X3 ε-greedy: assignments are a pure function of (task, seed);
    exploit rows all go to the shortest-queue/highest-similarity worker;
    explore fraction tracks eps_ppm; explore picks hit every worker."""
    from podcast_crawler_spark.operators.placement import (
        epsilon_greedy_assign,
    )

    tasks = spark.createDataFrame(
        [(f"t{i}",) for i in range(2000)], "task_id string"
    )
    workers = spark.createDataFrame(
        [("w0", 5, 0.9), ("w1", 2, 0.4), ("w2", 2, 0.8), ("w3", 7, 0.99)],
        "worker_id string, queue_len int, similarity double",
    )
    out = epsilon_greedy_assign(tasks, workers, eps_ppm=400_000).collect()
    assert len(out) == 2000
    by = {r.task_id: r for r in out}
    # best = shortest queue (2), tie -> higher similarity => w2
    assert all(r.best_worker == "w2" for r in out)
    assert all(
        (r.assigned_worker == "w2") or r.explored for r in out
    )
    # ε=0.4 over 2000 md5 coins: expect ~800, allow wide noise band
    n_explored = sum(r.explored for r in out)
    assert 700 < n_explored < 900, n_explored
    # explore picks cover all workers roughly uniformly
    from collections import Counter

    picks = Counter(r.assigned_worker for r in out if r.explored)
    assert set(picks) == {"w0", "w1", "w2", "w3"}
    assert min(picks.values()) > n_explored / 4 * 0.7
    # determinism: a second run returns byte-identical assignments
    again = {
        r.task_id: r
        for r in epsilon_greedy_assign(
            tasks, workers, eps_ppm=400_000
        ).collect()
    }
    assert all(
        by[t].assigned_worker == again[t].assigned_worker
        and by[t].explored == again[t].explored
        for t in by
    )
    # different seed reshuffles the coin flips
    other = epsilon_greedy_assign(
        tasks, workers, eps_ppm=400_000, seed="s1"
    ).collect()
    assert any(
        by[r.task_id].explored != r.explored for r in other
    )


def test_epsilon_greedy_matches_duckdb_oracle(spark):
    import duckdb

    from podcast_crawler_spark.operators.placement import (
        epsilon_greedy_assign,
        epsilon_greedy_oracle_sql,
    )

    tasks = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "task_id string"
    )
    workers = spark.createDataFrame(
        [("a", 3, 0.1), ("b", 1, 0.2), ("c", 1, 0.9)],
        "worker_id string, queue_len int, similarity double",
    )
    got = sorted(
        (r.task_id, r.assigned_worker, r.explored, r.best_worker)
        for r in epsilon_greedy_assign(tasks, workers).collect()
    )
    sql = epsilon_greedy_oracle_sql(
        "select 'u' || i::varchar as task_id from range(500) t(i)",
        "select * from (values ('a', 3, 0.1), ('b', 1, 0.2),"
        " ('c', 1, 0.9)) w(worker_id, queue_len, similarity)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_epsilon_greedy_no_task_shuffle(spark):
    """Tasks are never exchanged: both joins broadcast metadata."""
    from podcast_crawler_spark.operators.placement import (
        epsilon_greedy_assign,
    )

    tasks = spark.range(1000).select(
        F.col("id").cast("string").alias("task_id")
    )
    workers = spark.createDataFrame(
        [("a", 3, 0.1), ("b", 1, 0.2)],
        "worker_id string, queue_len int, similarity double",
    )
    plan = (
        epsilon_greedy_assign(tasks, workers)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the only exchanges allowed are broadcast / single-partition
    # metadata sorts — never a hash exchange of the task ids
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "task_id" not in line, line


# --------------------------------------------------------------------------
# UCB1 host selection
# --------------------------------------------------------------------------


def _py_ucb(rewards: dict, epochs: int, m: int):
    """Straight-line UCB1 simulator mirroring ucb_host_select: integer
    micro means, folded ln literals, floor(sqrt) bonus."""
    import math

    from podcast_crawler_spark.operators.placement import UCB_INF_MICRO

    hosts = sorted({h for h, _ in rewards})
    n = {h: 0 for h in hosts}
    s = {h: 0 for h in hosts}
    log = []
    for t in range(1, epochs + 1):
        big_t = max(1, m * (t - 1))
        bonus_num = 2 * round(math.log(big_t) * 1_000_000) * 1_000_000
        scored = []
        for h in hosts:
            if n[h] == 0:
                sc = UCB_INF_MICRO
            else:
                sc = s[h] // n[h] + int(
                    math.floor(math.sqrt(bonus_num // n[h]))
                )
            scored.append((h, sc))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for h, sc in scored[:m]:
            pay = rewards.get((h, t - 1), 0)
            log.append((t, h, n[h], sc, pay))
            n[h] += 1
            s[h] += pay
    return log


def test_ucb_python_simulator_equality(spark):
    from podcast_crawler_spark.operators.placement import ucb_host_select

    rows = [
        (f"h{i}", e, ((i * 37 + e * 11) % 9) * 100_000)
        for i in range(6)
        for e in range(8)
    ]
    rewards = spark.createDataFrame(
        rows, "host string, epoch long, reward_micro long"
    )
    got = sorted(
        tuple(r)
        for r in ucb_host_select(rewards, epochs=8, m=2).collect()
    )
    want = sorted(_py_ucb({(h, e): r for h, e, r in rows}, 8, 2))
    assert got == want


def test_ucb_explores_then_exploits(spark):
    """4 arms, m=1: the first 4 epochs pull each arm once (host-asc
    sentinel ties), after which the clearly-best arm dominates."""
    from podcast_crawler_spark.operators.placement import ucb_host_select

    rows = [
        ("a", e, 100_000) for e in range(12)
    ] + [
        ("b", e, 900_000) for e in range(12)
    ] + [
        ("c", e, 150_000) for e in range(12)
    ] + [
        ("d", e, 120_000) for e in range(12)
    ]
    rewards = spark.createDataFrame(
        rows, "host string, epoch long, reward_micro long"
    )
    log = ucb_host_select(rewards, epochs=12, m=1).collect()
    by_epoch = {r.epoch: r.host for r in log}
    assert [by_epoch[t] for t in (1, 2, 3, 4)] == ["a", "b", "c", "d"]
    exploit = [by_epoch[t] for t in range(5, 13)]
    # the 9x-reward arm takes a plurality of exploit pulls (5 of 8 —
    # the sqrt bonus still forces revisits of the weak arms, which is
    # exactly UCB1's logarithmic-regret exploration)
    assert exploit.count("b") == 5
    assert exploit.count("b") > max(
        exploit.count(h) for h in ("a", "c", "d")
    )


def test_ucb_topm_is_take_ordered(spark):
    """The per-epoch selection must be TakeOrderedAndProject (map-side
    partial top-m), never a global single-task window over the arms."""
    from podcast_crawler_spark.operators.placement import ucb_host_select

    rewards = spark.range(200).select(
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias(
            "host"
        ),
        (F.col("id") % 4).cast("long").alias("epoch"),
        (F.col("id") * 1000 % 1000000).cast("long").alias("reward_micro"),
    )
    out = ucb_host_select(rewards, epochs=2, m=3, checkpoint=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
