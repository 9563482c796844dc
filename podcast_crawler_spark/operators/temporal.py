"""Temporal operators over event streams: as-of join, range (interval
containment) join, and sessionization.

Spark has no native AS OF join (Databricks/Flink/kdb all grew one); the
distributed-classic formulation here needs nothing beyond DataFrame ops:

    union(left tagged 1, right tagged 0)
      → Window.partitionBy(key).orderBy(ts, side, seq)
      → last(right payload, ignorenulls) over unbounded-preceding
      → filter side = left

Each left row picks up the LATEST right row with ``right.ts <= left.ts``
for its key — exactly DuckDB's ``ASOF JOIN`` semantics (the oracle runs
the native one), with rights sorting before lefts at equal ``ts`` so the
<= bound is inclusive.  ONE shuffle on the join key, no range explosion,
no per-row search: the window scan is linear in the partition.  This is
the shape that survives 10^10 events — a naive ``left.ts >= right.ts``
theta-join is quadratic per key.

Sessionization (the other canonical event-time pass) is the standard
gap-cut: a boolean ``gap > G`` lag flag cumulatively summed into a
per-key session index.

Skew note, both operators: work is keyed by the entity id, so one
pathological key (a bot user with 10^8 events) serializes into one task.
The mitigation mirrors ``curation._bucketed_prefix_sum``: cut each key's
timeline into time-range buckets, run the window per (key, bucket), and
fold boundary state (last right payload / last ts per bucket) in a
second metadata-sized pass.  Not wired here — the fold term differs per
aggregate — but the decomposition is mechanical because both operators
reduce to prefix scans.

Reference anchor: the crawler keeps per-host ``last_crawl_ts`` and joins
frontier rows to the most recent host state (`task_management_system.rs`
epoch scheduling); ``asof_join`` is that "latest state at or before t"
lookup as a general operator.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Epoch seconds as double; the leading cast makes TIMESTAMP_NTZ
    columns (parquet default here) castable — a no-op for TIMESTAMP."""
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: Optional[List[str]] = None,
    tolerance_s: Optional[float] = None,
) -> DataFrame:
    """For every *left* row: the latest *right* row of the same ``on``
    key with ``right.ts <= left.ts`` (inclusive).  Output = all left
    columns + ``right_<c>`` for each requested right column +
    ``right_ts`` (null when no prior right row exists, or when it is
    older than ``tolerance_s`` seconds).

    Determinism: right rows tied on ``ts`` resolve by the LAST row in
    ``(ts, seq)`` order where seq is a stable per-side row tag built
    from the payload struct's hash — callers wanting a specific
    tie-break should pre-dedup the right side per (key, ts).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_rp"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))
    u = l.unionByName(r.select("_k", "_t", "_side", "_rp", "_lp"))
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.xxhash64("_rp"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        out = out.withColumn(
            "_m",
            F.when(
                _epoch_s(F.col("_t")) - _epoch_s(F.col("_m._ts"))
                <= tolerance_s,
                F.col("_m"),
            ),
        )
    cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_m._ts").alias("right_ts"))
    cols.extend(F.col(f"_m.{c}").alias(f"right_{c}") for c in right_cols)
    return out.select(*cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    grain_s: int = 3600,
    interval_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Keyed interval containment join: every *points* row paired with
    each *intervals* row of the same ``on`` key whose
    ``[start, end]`` (inclusive) contains the point's ``ts``.  Output =
    all point columns + ``ivl_<c>`` for the requested interval columns.

    Spark plans a raw ``start <= ts AND ts <= end`` predicate as a
    broadcast-nested-loop / cartesian per key — quadratic.  The classic
    distributed formulation grids time at ``grain_s``: intervals
    replicate once per covered grain (``sequence(floor(start/g),
    floor(end/g))`` — bounded by interval length / grain), points map to
    their single containing grain, and the join becomes an EQUI-join on
    ``(key, grain)`` + a residual range filter.  Each matching pair
    meets in exactly one grain (the point's), so no post-join dedup.
    Pick ``grain_s`` ≈ typical interval length: replication factor stays
    O(1) while each grain cell holds only co-temporal rows — at 10^10
    events this is an ordinary hash join with bounded build rows per
    key-grain.
    """
    interval_cols = interval_cols or [
        c for c in intervals.columns if c != on
    ]
    g = F.lit(int(grain_s))
    ivl = intervals.select(
        F.col(on).alias("_k"),
        F.struct(*[F.col(c) for c in interval_cols]).alias("_ivl"),
        _epoch_s(F.col(start_col)).alias("_s"),
        _epoch_s(F.col(end_col)).alias("_e"),
    ).withColumn(
        "_grain",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / g), F.floor(F.col("_e") / g)
            )
        ),
    )
    pts = points.withColumn(
        "_grain", F.floor(_epoch_s(F.col(ts_col)) / g)
    ).withColumn("_k", F.col(on))
    joined = pts.join(ivl, ["_k", "_grain"]).filter(
        (_epoch_s(F.col(ts_col)) >= F.col("_s"))
        & (_epoch_s(F.col(ts_col)) <= F.col("_e"))
    )
    cols = [F.col(c) for c in points.columns]
    cols.extend(F.col(f"_ivl.{c}").alias(f"ivl_{c}") for c in interval_cols)
    return joined.select(*cols)


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Gap-based sessionization: events of one key more than ``gap_s``
    seconds apart start a new session.  Output = input + ``session_idx``
    (1-based per key) and ``session_id`` (``key || ':' || idx``).

    One shuffle on ``key_col``; the two windows (lag flag, cumulative
    sum) share the same partitioning/ordering, so Catalyst plans a
    single Window node over one exchange + sort.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    gap = _epoch_s(F.col(ts_col)) - F.lag(_epoch_s(F.col(ts_col))).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_new")
        .withColumn(
            "session_id",
            F.concat_ws(":", F.col(key_col).cast("string"), F.col("session_idx")),
        )
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Per-session rollup of :func:`sessionize` — ``(key, session_idx,
    n_events, start_ts, end_ts, duration_s)``.  The rollup groupBy
    reuses the sessionize exchange partitioning (same key prefix), so
    AQE keeps it map-side-heavy."""
    s = sessionize(df, key_col, ts_col, order_col, gap_s)
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.round(
            F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col))),
            6,
        ).alias("duration_s"),
    )


def burst_detection(
    events: DataFrame,
    window_s: int = 3600,
    trailing: int = 6,
    factor_x10: int = 30,
    key_col: str = "host",
    ts_col: str = "event_unix",
) -> DataFrame:
    """Publication-burst detection (Kleinberg-lite, integer form): per
    key, bucket events into fixed windows and flag a window whose count
    exceeds ``factor_x10/10 ×`` the mean of the *trailing* previous
    windows — the podcast-release-surge / breaking-news signal a crawl
    scheduler uses to temporarily raise a feed's budget (the inverse of
    :func:`refetch.change_rate_schedule`'s slow adaptation).

    Exact integer rule: ``burst ⟺ 10·trailing·count >
    factor_x10·trailing_sum`` (cross-multiplied, no division at all) —
    and the trailing sum only counts windows that EXIST (sparse keys:
    missing windows are zero activity and DO dilute the mean, so the
    frame is over the win index, not row order... which a row-frame
    cannot express; instead the trailing sum is a RANGE frame over the
    integer window index, giving exactly the zero-filled semantics).
    Windows with no history (first window per key) never flag.

    Output: ``(key, win, n_events, trailing_sum, burst)`` per active
    window.  One groupBy (map-side combine) + one per-key range window
    — two narrow exchanges on the same key.
    """
    win = F.expr(f"{ts_col} div {int(window_s)}")
    counts = events.groupBy(
        F.col(key_col).alias("key"), win.alias("win")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("key")
        .orderBy("win")
        .rangeBetween(-int(trailing), -1)
    )
    t = F.sum("n_events").over(w)
    first = F.min("win").over(Window.partitionBy("key"))
    # span = how much history the frame REALLY covers (capped at
    # trailing, zero-filled inside it): a key's warm-up windows compare
    # against their short history instead of a zero-diluted full frame
    # -- otherwise every second window of a new key reads as a burst
    span = F.least(F.lit(int(trailing)).cast("long"), F.col("win") - first)
    return counts.select(
        "key",
        "win",
        "n_events",
        F.coalesce(t, F.lit(0)).cast("long").alias("trailing_sum"),
        span.alias("span"),
        (
            t.isNotNull()
            & (span > 0)
            & (
                F.lit(10) * span * F.col("n_events")
                > F.lit(int(factor_x10)) * t
            )
        ).alias("burst"),
    )


def burst_oracle_sql(
    events_sql: str,
    window_s: int = 3600,
    trailing: int = 6,
    factor_x10: int = 30,
) -> str:
    """DuckDB replay of :func:`burst_detection` over (host,
    event_unix) rows — same range frame, same cross-multiplied rule."""
    return f"""
        WITH c AS (
            SELECT host AS key, event_unix // {int(window_s)} AS win,
                   COUNT(*) AS n_events
            FROM ({events_sql}) e
            GROUP BY 1, 2
        ),
        t AS (
            SELECT *,
                   SUM(n_events) OVER (
                       PARTITION BY key ORDER BY win
                       RANGE BETWEEN {int(trailing)} PRECEDING
                             AND 1 PRECEDING
                   ) AS ts,
                   LEAST({int(trailing)},
                         win - MIN(win) OVER (PARTITION BY key)) AS span
            FROM c
        )
        SELECT key, win, n_events,
               COALESCE(ts, 0)::BIGINT AS trailing_sum,
               span::BIGINT AS span,
               (ts IS NOT NULL AND span > 0
                AND 10 * span * n_events
                    > {int(factor_x10)} * ts) AS burst
        FROM t
    """
