"""Consistent-hash placement: host → worker assignment that survives
cluster resizes.

The reference distributes tasks to workers by simple modulo placement
(``distributor.rs`` round-robin / hash placement; re-expressed as the
``partition_balance`` pmod query).  Modulo placement reassigns ~100% of
keys when the worker count changes — on a 1000-executor crawl that
means every politeness queue, seen-shard and rate-limiter state migrates
on every scale event.  A consistent-hash ring (Karger et al. '97) with
``V`` virtual nodes per worker moves only ~1/(N+1) of keys when a
worker joins — the elasticity property a long-running frontier needs.

Determinism/oracle: vnode positions and key positions are md5-derived
60-bit integers (first 15 hex chars — the repo-wide convention, e.g.
``sampling.key_hash32``), so DuckDB recomputes every assignment from
the same worker list with the naive successor rule.

Scale shape: the ring is cluster metadata (workers × V rows — KBs),
never data.  The naive successor rule is "min vnode position ≥ key
position, else min position on the ring" — a per-key scan of all
W·V vnodes.  :func:`consistent_assign` instead precomputes, per
``2^bucket_bits`` ring bucket, the within-bucket vnode list and the
next vnode AFTER the bucket; each key then does ONE broadcast hash
join on its bucket plus an O(vnodes-in-bucket) array probe — O(1)
expected per key, zero corpus shuffles (broadcast join only).  The
bucket table is built driver-side from the worker list (the k-means
centroid-handoff precedent: config-sized state may transit the driver;
corpus-sized state never does).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RING_BITS = 60  # 15 hex chars of md5 — fits BIGINT, positive


def _pos(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def ring_vnodes(workers: list[str], vnodes: int = 64) -> list[tuple[int, str]]:
    """Sorted (position, worker) vnode list for a worker set.  Vnode i
    of worker w sits at md5(f"{w}#{i}") — collisions (astronomically
    unlikely in 60 bits) resolve to the lexically smaller worker so
    the ring is a deterministic function of the set."""
    ring = sorted(
        (_pos(f"{w}#{i}"), w) for w in workers for i in range(vnodes)
    )
    return ring


def consistent_assign(
    df: DataFrame,
    workers: list[str],
    key_col: str = "host",
    vnodes: int = 64,
    bucket_bits: int = 12,
) -> DataFrame:
    """Assign each row's key to a worker by ring successor.  Returns
    the input plus ``(ring_pos, worker)``.

    Per-key cost is one broadcast-hash-join probe on the key's ring
    bucket + an array scan of that bucket's (few) vnodes — not a scan
    of all W·V vnodes.  Equivalence of the bucketized lookup to the
    naive successor rule is pinned by tests and by the DuckDB oracle
    (:func:`assign_oracle_sql` uses the naive rule).
    """
    if not workers:
        raise ValueError("consistent_assign: empty worker set")
    spark = df.sparkSession
    ring = ring_vnodes(workers, vnodes)
    shift = RING_BITS - bucket_bits
    n_buckets = 1 << bucket_bits
    by_bucket: dict[int, list[tuple[int, str]]] = {}
    for p, w in ring:
        by_bucket.setdefault(p >> shift, []).append((p, w))
    # successor AFTER each bucket (wrapping to the ring minimum)
    nxt: list[tuple[int, str]] = [None] * n_buckets  # type: ignore
    cur = ring[0]
    for b in range(n_buckets - 1, -1, -1):
        nxt[b] = cur
        if b in by_bucket:
            cur = by_bucket[b][0]
    rows = [
        (
            b,
            [list(pw) for pw in by_bucket.get(b, [])],
            nxt[b][0],
            nxt[b][1],
        )
        for b in range(n_buckets)
        if b in by_bucket or True
    ]
    # only buckets that can be probed matter; ship all (4096 rows, KBs)
    btab = spark.createDataFrame(
        rows,
        "bucket long, vns array<array<string>>, nxt_pos long, nxt_w string",
    )
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    out = df.withColumn("_h", h).withColumn(
        "_b", (F.col("_h") / F.lit(1 << shift)).cast("long")
    )
    joined = out.join(F.broadcast(btab), out["_b"] == btab["bucket"])
    in_bucket = F.filter(
        F.col("vns"), lambda v: v[0].cast("long") >= F.col("_h")
    )
    pick = F.try_element_at(in_bucket, F.lit(1))
    return joined.select(
        *[F.col(c) for c in df.columns],
        F.coalesce(pick[0].cast("long"), F.col("nxt_pos")).alias(
            "ring_pos"
        ),
        F.coalesce(pick[1], F.col("nxt_w")).alias("worker"),
    )


def _ring_sql(workers: list[str], vnodes: int) -> str:
    w_vals = ",".join(f"('{w}')" for w in workers)
    return f"""
        (select try_cast('0x' || substr(md5(w || '#' || i::varchar),
                                        1, 15) as BIGINT) pos, w
         from (select * from (values {w_vals}) ws(w))
         cross join (select unnest(range({vnodes})) i))
    """


def assign_oracle_sql(
    keys_sql: str,
    workers: list[str],
    vnodes: int = 64,
) -> str:
    """DuckDB recomputation of :func:`consistent_assign` with the
    NAIVE successor rule over the full vnode table — independent of the
    bucketization, so a bucket-boundary bug reds the row.  ``keys_sql``
    must select the original output columns plus a ``key`` column the
    ring position is derived from."""
    return f"""
        with ring as {_ring_sql(workers, vnodes)},
        keys as (select *,
                   try_cast('0x' || substr(md5(key::varchar), 1, 15)
                            as BIGINT) h
                 from ({keys_sql}) t),
        succ as (select k.key, min(r.pos) sp
                 from keys k join ring r on r.pos >= k.h
                 group by 1),
        base as (select min(pos) mp from ring)
        select k.* exclude (h, key),
               coalesce(s.sp, b.mp) as ring_pos,
               (select r.w from ring r
                where r.pos = coalesce(s.sp, b.mp) limit 1) as worker
        from keys k
        left join succ s on k.key = s.key
        cross join base b
    """


def rebalance_stats(
    df: DataFrame,
    workers_before: list[str],
    workers_after: list[str],
    key_col: str = "host",
    vnodes: int = 64,
) -> DataFrame:
    """The resize-stability audit: assign the same keys under two
    worker sets and report ``(n_keys, moved, moved_pct)`` — for a ring,
    adding one worker to N moves ~100/(N+1) percent; modulo placement
    moves ~100·N/(N+1).  Integer percent, exact across engines."""
    a = consistent_assign(
        df.select(key_col).distinct(), workers_before, key_col, vnodes
    ).select(F.col(key_col).alias("k"), F.col("worker").alias("w_a"))
    b = consistent_assign(
        df.select(key_col).distinct(), workers_after, key_col, vnodes
    ).select(F.col(key_col).alias("k"), F.col("worker").alias("w_b"))
    return (
        a.join(b, "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(
                (F.col("w_a") != F.col("w_b")).cast("long")
            ).alias("moved"),
        )
        .select(
            "n_keys",
            "moved",
            F.expr("(100 * moved) div n_keys").alias("moved_pct"),
        )
    )


def rebalance_oracle_sql(
    keys_sql: str,
    workers_before: list[str],
    workers_after: list[str],
    vnodes: int = 64,
) -> str:
    """DuckDB recomputation of :func:`rebalance_stats` — naive rule,
    both worker sets.  ``keys_sql`` selects one ``key`` column."""

    def one(workers: list[str], alias: str) -> str:
        return f"""
        {alias}_ring as {_ring_sql(workers, vnodes)},
        {alias}_succ as (select k.key,
                    coalesce(min(r.pos) filter (r.pos >= k.h),
                             (select min(pos) from {alias}_ring)) sp
                 from keys k, {alias}_ring r
                 group by k.key, k.h),
        {alias}_asn as (select s.key,
                   (select r.w from {alias}_ring r where r.pos = s.sp
                    limit 1) w
                from {alias}_succ s)
        """

    return f"""
        with keys as (select distinct key,
                   try_cast('0x' || substr(md5(key::varchar), 1, 15)
                            as BIGINT) h
                 from ({keys_sql}) t),
        {one(workers_before, 'a')},
        {one(workers_after, 'b')}
        select count(*)::BIGINT n_keys,
               sum((a.w <> b.w)::int)::BIGINT moved,
               ((100 * sum((a.w <> b.w)::int)) // count(*))::BIGINT
                 moved_pct
        from a_asn a join b_asn b using (key)
    """


def ip_asn_lookup(
    ips: DataFrame,
    ranges: DataFrame,
    ip_col: str = "ip",
) -> DataFrame:
    """IP→ASN/network lookup: map each resolved address onto the
    containing CIDR-style range — politeness-by-network
    (:func:`frontier.ip_politeness` keys queues by address; hosts
    spread across ONE provider's range are still one operational
    neighbor), geo/compliance routing, abuse attribution.

    This is GLOBAL interval containment (no join key at all — the
    naive plan is a broadcast-nested-loop against every range), made
    an equi-join by the same gridding as ``temporal.range_join``:
    ranges replicate once per covered /8 bucket (``sequence(start div
    2^24, end div 2^24)`` — bounded by range width), addresses map to
    their single /8, join on the bucket, residual ``start ≤ ip ≤ end``
    filter.  Overlapping ranges resolve to the MOST SPECIFIC
    (smallest) one — longest-prefix-match semantics — via a per-ip
    min-struct aggregate (no window needed: ties break on asn).

    *ranges* carries ``(start_ip, end_ip, asn, asn_name)`` as integer
    addresses; dotted-quad parsing is exact integer arithmetic in both
    engines.  Output: ``(ip, ip_long, asn, asn_name, range_size)``;
    unmatched addresses are absent (left-join variant: union them back
    upstream).
    """
    oct_ = lambda i: F.element_at(F.split(F.col(ip_col), r"\."), i).cast(
        "long"
    )
    ip_long = (
        oct_(1) * 16777216 + oct_(2) * 65536 + oct_(3) * 256 + oct_(4)
    )
    pts = ips.select(
        F.col(ip_col).alias("ip"), ip_long.alias("ip_long")
    ).withColumn("bkt", F.expr("ip_long div 16777216"))
    rng = ranges.select(
        "start_ip", "end_ip", "asn", "asn_name",
        F.explode(
            F.sequence(
                F.expr("start_ip div 16777216"),
                F.expr("end_ip div 16777216"),
            )
        ).alias("bkt"),
    )
    j = pts.join(rng, "bkt").filter(
        (F.col("ip_long") >= F.col("start_ip"))
        & (F.col("ip_long") <= F.col("end_ip"))
    )
    best = j.groupBy("ip", "ip_long").agg(
        F.min(
            F.struct(
                (F.col("end_ip") - F.col("start_ip")).alias("range_size"),
                F.col("asn").alias("asn"),
                F.col("asn_name").alias("asn_name"),
            )
        ).alias("m")
    )
    return best.select(
        "ip",
        "ip_long",
        F.col("m.asn").alias("asn"),
        F.col("m.asn_name").alias("asn_name"),
        F.col("m.range_size").alias("range_size"),
    )


def asn_oracle_sql(ips_sql: str, ranges_sql: str) -> str:
    """DuckDB replay of :func:`ip_asn_lookup` — same integer parse,
    containment, and most-specific (min struct) resolution."""
    return f"""
        WITH p AS (
            SELECT ip,
                   CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                 + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                 + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                 + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_long
            FROM ({ips_sql}) i
        ),
        j AS (
            SELECT p.ip, p.ip_long,
                   r.end_ip - r.start_ip AS range_size,
                   r.asn, r.asn_name
            FROM p JOIN ({ranges_sql}) r
              ON p.ip_long >= r.start_ip AND p.ip_long <= r.end_ip
        ),
        b AS (
            SELECT ip, ip_long,
                   MIN(struct_pack(range_size := range_size,
                                   asn := asn,
                                   asn_name := asn_name)) AS m
            FROM j GROUP BY ip, ip_long
        )
        SELECT ip, ip_long, m.asn AS asn, m.asn_name AS asn_name,
               m.range_size AS range_size
        FROM b
    """


def epsilon_greedy_assign(
    tasks: DataFrame,
    workers: DataFrame,
    eps_ppm: int = 400_000,
    seed: str = "s0",
    task_col: str = "task_id",
    worker_col: str = "worker_id",
    queue_col: str = "queue_len",
    sim_col: str = "similarity",
) -> DataFrame:
    """X3: ε-greedy worker selection — the reference's
    ``find_best_worker`` (``crawler_refactor/distributor.rs:44-92``;
    its call site is commented out at ``distributor.rs:101-102``, so
    round-robin ships instead — implemented here anyway to close the
    inventory).  Per task: with probability ε (default 0.4, the
    reference's hard-coded ``epsilon``) EXPLORE a uniform-random
    worker; otherwise EXPLOIT the best worker = shortest queue, tie →
    highest similarity (the comment's stated intent at
    ``distributor.rs:73`` — the Rust ``min_by`` actually takes the
    LOWER similarity on ties, a latent bug we do not reproduce), tie →
    lowest worker_id.

    Determinism/oracle: both coin flips are md5-derived 32-bit integers
    (``h32(task#flag#seed)`` for the ε test in ppm, ``h32(task#pick#
    seed) mod n_workers`` for the explore pick) — the repo-wide
    derandomization convention (``sampling.key_hash32``), so DuckDB
    replays every assignment exactly.

    Scale shape: *workers* is cluster metadata (N workers — KBs), so
    the global best and the rank index are metadata-sized plans
    broadcast to the task side; tasks are never shuffled (two broadcast
    hash joins on a uniform hash key).  The per-task work is O(1)
    regardless of frontier size.

    Output: ``(task_col, assigned_worker, explored, best_worker)``.
    """
    from pyspark.sql import Window

    def h32(suffix: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col(task_col).cast("string"), F.lit(suffix))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    # metadata-sized: rank index for the explore pick + global argmin
    # for the exploit pick (single-partition window over KBs of cluster
    # state — the k-means centroid precedent)
    ranked = workers.select(
        F.col(worker_col).cast("string").alias("_w"),
        F.row_number()
        .over(Window.orderBy(F.col(worker_col).cast("string")))
        .alias("_rn"),
    ).withColumn("_rn", F.col("_rn") - 1)
    n_workers = ranked.count()
    best = (
        workers.orderBy(
            F.col(queue_col).asc(),
            F.col(sim_col).desc(),
            F.col(worker_col).cast("string").asc(),
        )
        .limit(1)
        .select(F.col(worker_col).cast("string").alias("best_worker"))
    )

    flipped = (
        tasks.select(task_col)
        .withColumn(
            "explored",
            F.pmod(h32(f"#flag#{seed}"), F.lit(1_000_000)) < F.lit(eps_ppm),
        )
        .withColumn(
            "_rn", F.pmod(h32(f"#pick#{seed}"), F.lit(n_workers)).cast("int")
        )
    )
    return (
        flipped.join(
            F.broadcast(ranked.withColumnRenamed("_w", "explore_worker")),
            "_rn",
        )
        .crossJoin(F.broadcast(best))
        .select(
            task_col,
            F.when(F.col("explored"), F.col("explore_worker"))
            .otherwise(F.col("best_worker"))
            .alias("assigned_worker"),
            "explored",
            "best_worker",
        )
    )


def epsilon_greedy_oracle_sql(
    tasks_sql: str,
    workers_sql: str,
    eps_ppm: int = 400_000,
    seed: str = "s0",
) -> str:
    """DuckDB replay of :func:`epsilon_greedy_assign` — same md5 coin
    flips, rank index, and exploit ordering."""
    return f"""
        WITH t AS (SELECT task_id FROM ({tasks_sql}) tt),
        w AS (SELECT worker_id::VARCHAR AS worker_id, queue_len,
                     similarity
              FROM ({workers_sql}) ww),
        r AS (SELECT worker_id,
                     ROW_NUMBER() OVER (ORDER BY worker_id) - 1 AS rn
              FROM w),
        b AS (SELECT worker_id AS best_worker FROM w
              ORDER BY queue_len ASC, similarity DESC, worker_id ASC
              LIMIT 1),
        n AS (SELECT COUNT(*) AS n FROM w),
        x AS (SELECT task_id,
                     ('0x' || substr(md5(task_id::VARCHAR ||
                         '#flag#{seed}'), 1, 8))::BIGINT % 1000000
                         < {int(eps_ppm)} AS explored,
                     ('0x' || substr(md5(task_id::VARCHAR ||
                         '#pick#{seed}'), 1, 8))::BIGINT
                         % (SELECT n FROM n) AS rn
              FROM t)
        SELECT x.task_id,
               CASE WHEN x.explored THEN r.worker_id
                    ELSE b.best_worker END AS assigned_worker,
               x.explored, b.best_worker
        FROM x JOIN r USING (rn) CROSS JOIN b
    """


UCB_INF_MICRO = 10**12  # unplayed-arm sentinel: > any mean+bonus (<= ~4e6)


def ucb_host_select(
    rewards: DataFrame,
    epochs: int = 8,
    m: int = 4,
    host_col: str = "host",
    epoch_col: str = "epoch",
    reward_col: str = "reward_micro",
    checkpoint: bool = True,
) -> DataFrame:
    """UCB1 host scheduling (Auer, Cesa-Bianchi & Fischer, ML '02) —
    the principled version of the bandit the reference's ε-greedy
    ``find_best_worker`` gestures at (``distributor.rs:44-92``): each
    epoch pull the *m* hosts maximizing ``mean + sqrt(2·ln T / n)``,
    so exploration decays as arms accumulate evidence instead of
    wasting a flat ε of fetch budget forever.  The crawl reading: arms
    are hosts, a pull is an epoch's fetch allocation, reward is the
    host's observed yield that epoch (useful-fetch ppm) — the frontier
    learns WHICH hosts pay without a separate modeling pass.

    Fully deterministic (UCB1 has no coin), hence fully oracle-able:
    means are integer micro-units (``s div n``); the bonus is
    ``floor(sqrt(2 · ln(T)µ · 10^6 div n))`` where ``ln(T)µ`` is a
    Python-folded integer literal per epoch — the sqrt input is an
    exact integer < 2^53 and IEEE sqrt is correctly rounded, so Spark
    and DuckDB agree bit-for-bit.  Unplayed arms score a sentinel
    (played-once-first, ties → host asc).

    *rewards* is ``(host, epoch, reward_micro)`` — what each arm WOULD
    pay that epoch, observed only when pulled (hosts absent from an
    epoch pay 0).  Returns the full selection log ``(epoch [1-based],
    host, n_before, score_micro, reward_micro)`` — m rows per epoch.

    Scale shape: state is two BIGINTs per host; per epoch the top-m is
    ``orderBy(score).limit(m)`` = TakeOrderedAndProject (map-side
    partial top-m, O(m) per task — never a global window over 10^6+
    hosts), the reward lookup joins m rows against the epoch's yield
    table, and the state update is one broadcast join of the m-row
    selection.  localCheckpoint per epoch truncates the loop lineage,
    as in ``graph.opic``.
    """
    import math

    if checkpoint:
        # the loop slices `rewards` once per epoch and the final log
        # union replays every epoch's slice — if rewards is a live
        # aggregation plan (it usually is: a groupBy over the events
        # table), that's epochs× recomputes of the corpus pass, some of
        # them as concurrent broadcast-subquery jobs.  One eager
        # truncation up front: O(hosts × epochs) narrow rows.
        rewards = rewards.localCheckpoint(eager=True)
    arms = rewards.select(F.col(host_col).alias("host")).distinct()
    if checkpoint:
        arms = arms.localCheckpoint(eager=True)
    state = arms.select(
        "host",
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("s"),
    )
    logs = []
    for t in range(1, epochs + 1):
        big_t = max(1, m * (t - 1))
        # 2 · ln(T)µ · 10^6 folded in Python: one exact BIGINT literal
        # per epoch (an inline 32-bit literal product would overflow)
        bonus_num = 2 * round(math.log(big_t) * 1_000_000) * 1_000_000
        scored = state.select(
            "host",
            "n",
            "s",
            F.when(F.col("n") == 0, F.lit(UCB_INF_MICRO))
            .otherwise(
                F.expr("s div n")
                + F.floor(F.sqrt(F.expr(f"{bonus_num}L div n")))
            )
            .cast("long")
            .alias("score_micro"),
        )
        sel = scored.orderBy(F.desc("score_micro"), F.asc("host")).limit(m)
        epoch_rewards = rewards.filter(
            F.col(epoch_col) == t - 1
        ).select("host", F.col(reward_col).alias("_r"))
        pulled = sel.join(epoch_rewards, "host", "left").select(
            "host",
            F.col("n").alias("n_before"),
            "score_micro",
            F.coalesce(F.col("_r"), F.lit(0)).cast("long").alias("_pay"),
        )
        if checkpoint:
            # m rows; consumed by the log union AND the broadcast state
            # update — truncate so epoch t's top-m selection job runs
            # once, not once per consumer of every later epoch's lineage
            pulled = pulled.localCheckpoint(eager=True)
        logs.append(
            pulled.select(
                F.lit(t).cast("long").alias("epoch"),
                "host",
                "n_before",
                "score_micro",
                F.col("_pay").alias("reward_micro"),
            )
        )
        state = (
            state.join(
                F.broadcast(pulled.select("host", "_pay")), "host", "left"
            )
            .select(
                "host",
                (
                    F.col("n")
                    + F.when(F.col("_pay").isNotNull(), 1).otherwise(0)
                ).cast("long").alias("n"),
                (F.col("s") + F.coalesce(F.col("_pay"), F.lit(0)))
                .cast("long")
                .alias("s"),
            )
        )
        if checkpoint:
            state = state.localCheckpoint(eager=True)
    out = logs[0]
    for lg in logs[1:]:
        out = out.unionByName(lg)
    return out


def ucb_oracle_sql(
    rewards_sql: str, epochs: int = 8, m: int = 4
) -> str:
    """DuckDB replay of :func:`ucb_host_select`: epochs unrolled, the
    same integer means, ln-literals, correctly-rounded sqrt bonus and
    (score desc, host asc) top-m ranks."""
    import math

    parts = [
        f"with rewards as ({rewards_sql})",
        "arms as (select distinct host from rewards)",
        "s0 as (select host, 0::BIGINT n, 0::BIGINT s from arms)",
    ]
    for t in range(1, epochs + 1):
        big_t = max(1, m * (t - 1))
        bonus_num = 2 * round(math.log(big_t) * 1_000_000) * 1_000_000
        parts.append(
            f"sc{t} as (select host, n, s,"
            f" (case when n = 0 then {UCB_INF_MICRO}"
            f"       else s // n + floor(sqrt("
            f"            ({bonus_num} // n)::DOUBLE"
            f"            ))::BIGINT end)::BIGINT score_micro"
            f" from s{t - 1})"
        )
        parts.append(
            f"rk{t} as (select host, n, score_micro, row_number() over"
            f" (order by score_micro desc, host) rn from sc{t})"
        )
        parts.append(
            f"log{t} as (select {t}::BIGINT epoch, k.host,"
            f" k.n::BIGINT n_before, k.score_micro,"
            f" coalesce(r.reward_micro, 0)::BIGINT reward_micro"
            f" from rk{t} k left join"
            f" (select host, reward_micro from rewards"
            f"  where epoch = {t - 1}) r using (host)"
            f" where k.rn <= {m})"
        )
        parts.append(
            f"s{t} as (select p.host,"
            f" (p.n + case when l.host is not null then 1 else 0 end)"
            f"::BIGINT n,"
            f" (p.s + coalesce(l.reward_micro, 0))::BIGINT s"
            f" from s{t - 1} p left join log{t} l using (host))"
        )
    sel = " union all ".join(
        f"select epoch, host, n_before, score_micro, reward_micro"
        f" from log{t}"
        for t in range(1, epochs + 1)
    )
    return ",\n".join(parts) + "\n" + sel
