"""The crawl epoch — one deterministic micro-batch of the crawl loop.

Spark mapping of the reference's production lifecycle (SURVEY.md §3.1):

    select-due → politeness window → fetch join → parse UDF → explode
    episodes → validate → upsert podcasts/episodes → update frontier
    (retries, reschedule) → commit snapshots + per-partition lineage +
    metrics

Driver = distributor; executors = workers; the hash shuffle replaces the
broadcast task bus; the snapshot commit replaces the Postgres transaction.
The reference's continuous tokio loop has no event-time semantics
(SURVEY.md §2.10), so discrete epochs with deterministic timestamps give
exact resume + reproducible ordering; the same ``run_epoch`` body plugs
into Structured Streaming ``foreachBatch`` unchanged
(``podcast_crawler_spark.streaming``).

Upsert semantics (D1/D2): podcast identity = ``rss_feed_url``, episode
identity = ``guid`` — the batch-path conflict keys of
``/root/reference/src/infrastructure/persistence/repositories/
podcast_repository.rs:178-183,212-218``; ``DO UPDATE`` = last-write-wins,
implemented as union + per-key ``row_number`` keeping the newest epoch.
In production these two become Iceberg ``MERGE INTO``; the snapshot-table
rewrite here has identical semantics at sandbox scale.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.udfs import explode_episodes, parse_pages
from ..functions.urlfns import (
    canonicalize_url,
    host_hash,
    is_valid_url,
    url_hash,
    url_host,
)
from ..operators.frontier import (
    PARSED,
    CrawlConfig,
    apply_epoch_results,
    build_frontier,
    fetch_join,
    salted,
    schedule_epoch,
)
from ..operators.stats import ERROR_TYPES, categorize_error
from .checkpoint import SnapshotTable, resolve_lww

PASSTHROUGH = [
    "url",
    "url_hash",
    "host",
    "host_hash",
    "priority",
    "host_seq",
    "planned_fetch_ts",
    "fetch_ok",
]


@dataclass
class CrawlState:
    root: str
    frontier: SnapshotTable
    podcasts: SnapshotTable
    episodes: SnapshotTable
    metrics: SnapshotTable
    # persisted D3 seen index: one bloom-bits row per key shard
    # (pmod(url_hash, S)), bootstrapped once from the frontier and folded
    # incrementally on every admission (``update_bloom_shards``) — the
    # cross-epoch seen set the reference keeps implicitly in Postgres
    # unique indexes (podcast_repository.rs:178-183,212-218).  INVARIANT:
    # frontier membership only ever grows through ``init_crawl`` (seeds,
    # pre-bootstrap) and ``admit_urls`` (which folds what it admits), so
    # the shard bits always cover every frontier key — a Bloom false
    # negative (the one failure the exact-verify join can't catch) cannot
    # occur unless a caller writes frontier rows out-of-band.
    seen_shards: SnapshotTable

    @classmethod
    def open(cls, root: str) -> "CrawlState":
        return cls(
            root=root,
            frontier=SnapshotTable(root, "frontier"),
            podcasts=SnapshotTable(root, "podcasts"),
            episodes=SnapshotTable(root, "episodes"),
            metrics=SnapshotTable(root, "metrics"),
            seen_shards=SnapshotTable(root, "seen_shards"),
        )

    def completed_epochs(self) -> int:
        """Epochs committed so far — read from the frontier manifest's
        ``epoch`` metric (snapshot ids can't be used directly: streaming
        admission commits extra frontier snapshots between epochs)."""
        man = self.frontier.manifest()
        if man is None:
            return 0
        ep = man["metrics"].get("epoch")
        return ep if ep is not None else man["snapshot_id"] - 1


def init_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    state_dir: str,
    epoch0: datetime,
    cfg: CrawlConfig = CrawlConfig(),
) -> CrawlState:
    """Build the initial frontier snapshot from the seed list (idempotent:
    an existing initialized state dir is reopened, not rebuilt)."""
    state = CrawlState.open(state_dir)
    if state.frontier.current_snapshot_id() is None:
        frontier = build_frontier(seeds, epoch0, cfg).repartition(
            cfg.num_partitions, "host_hash"
        )
        state.frontier.commit(frontier, metrics={"epoch": 0})
    return state


def _upsert(
    existing: Optional[DataFrame],
    updates: DataFrame,
    key: str,
    order_col: str = "_epoch",
) -> DataFrame:
    """Last-write-wins merge on *key* (ON CONFLICT ... DO UPDATE parity).

    LWW is an argmax per key, so it runs as ``max_by(struct(*), order)``
    hash aggregation — one exchange, no sort, and map-side partial
    aggregation collapses duplicate keys before the shuffle (a window
    ``row_number`` would shuffle everything and then sort every
    partition; at 10^10-row tables the sort is the dominant cost).

    The epoch loop itself no longer materializes this merge per commit —
    output tables use merge-on-read delta commits
    (``SnapshotTable.commit_delta``; same resolution applied at read) so
    a steady-state epoch writes O(delta), not O(table).  This helper
    remains the within-epoch dedup + the semantic reference."""
    merged = updates if existing is None else existing.unionByName(updates)
    return resolve_lww(merged, key, order_col)


def run_epoch(
    spark: SparkSession,
    state: CrawlState,
    pages: DataFrame,
    robots: DataFrame,
    epoch_ts: datetime,
    cfg: CrawlConfig = CrawlConfig(),
    fetcher=None,
) -> Dict:
    """Run one epoch; commits frontier/podcasts/episodes/metrics snapshots
    atomically (frontier last — its snapshot id is the epoch counter, so a
    crash before it re-runs the whole epoch idempotently: upserts are
    keyed, re-insertion converges to the same state).

    *fetcher*: optional production fetch swap-in (S2) — a callable
    ``scheduled -> DataFrame`` with ``fetch_join``'s output schema, e.g.
    ``operators.fetcher.live_fetch`` bound to a transport.  When given,
    the pages-table join is bypassed and everything downstream (parse,
    upserts, frontier update, metrics) runs unchanged."""
    t0 = time.time()
    epoch_no = state.completed_epochs() + 1
    frontier = state.frontier.read(spark)
    debug = os.environ.get("EPOCH_DEBUG_TIMING")

    def _tick(name, t):
        if debug:
            print(f"[epoch-{epoch_no}] {name}: {round(time.time() - t, 1)}s")
        return time.time()

    # 1-2. due selection + politeness priority queue (W4/W5) + robots (J4).
    # Prune the frontier to the scheduling columns first: the politeness
    # window shuffles its input, and dragging the stages lineage array /
    # error text through that exchange doubles its bytes for nothing (the
    # frontier update below works off the full snapshot scan + outcome
    # keys, not off the scheduled slice).
    frontier_sched = frontier.select(
        "url", "url_hash", "host", "host_hash", "priority",
        "next_fetch_ts", "state",
    )
    scheduled = schedule_epoch(frontier_sched, robots, epoch_ts, cfg)

    # 3. "fetch" = join against pages (J3).  No salt exchange here: the
    # join's own hash(url) distribution already spreads hot-host URLs
    # uniformly (url hashes are uniform even when hosts are not), so a
    # salted repartition after the join would re-shuffle the multi-KB html
    # payloads purely to reproduce a distribution the join just gave us —
    # measured ~60s/1.5M rows of pure waste.  ``salted`` (X6) remains the
    # tool for host-keyed stages that inherit a skewed host partitioning.
    # Epoch-sized slices take the broadcast fetch path (html never
    # shuffles); the gate uses the frontier row count as a cheap upper
    # bound on the scheduled slice.
    if fetcher is not None:
        fetched = fetcher(scheduled)
    elif cfg.pages_bucketed_table:
        from ..sources.bucketed import fetch_join_bucketed

        fetched = fetch_join_bucketed(scheduled, spark, cfg.pages_bucketed_table)
    else:
        man = state.frontier.manifest()
        frontier_rows = (man or {}).get("row_count") or 0
        fetched = fetch_join(
            scheduled,
            pages,
            broadcast_scheduled=0 < frontier_rows <= cfg.broadcast_fetch_max_rows,
        )

    # 4. parse stage (P1-P12) — Arrow-batched, frontier bookkeeping passes
    # through so no re-join afterwards.  All scalar epoch metrics (A3/A4/A7)
    # ride along as an Observation and are collected while the parse output
    # is materialized — costing ZERO extra Spark jobs (the reference's
    # Prometheus counters similarly piggyback on the task flow,
    # src/metrics.rs:47-116).
    #
    # The parse output materializes ONCE — it has three downstream
    # consumers (podcast upsert, episode explode, frontier update) and must
    # never be parsed twice.  Two scratch strategies, both columnar with
    # column pruning on re-read:
    #   * persist (default): Spark's columnar cache at DISK_ONLY, over a
    #     column subset pruned to exactly what the three consumers read.
    #     DISK_ONLY (not MEMORY_AND_DISK) is a measured choice: building
    #     the in-memory cache contends on the unified storage pool under
    #     32 concurrent tasks (+3.7 s over the bare parse at local[32],
    #     +0 at local[8] — tools/persist_experiment.py), i.e. the memory
    #     tier ANTI-SCALES with parallelism, while DISK_ONLY writes
    #     straight to spark.local.dir with zero pool accounting and
    #     measured ZERO overhead over the uncached parse.  On a real
    #     cluster local dirs are node-local SSD/tmpfs and the same
    #     reasoning holds per-executor.  The pruned select drops
    #     extracted_text + politeness bookkeeping (heavy, never read
    #     after the parse) so the scratch bytes are output-sized, not
    #     parse-sized; pruning below the cache is impossible for a
    #     mapInPandas stage (Python emits the full schema), so the
    #     select above it is what keeps those bytes out of the scratch.
    #   * parquet (cfg.scratch_parquet / huge epochs): an explicit lz4
    #     dataset — the natural choice when one epoch is far larger than
    #     cluster local storage and block eviction would thrash.
    from pyspark.sql import Observation

    obs = Observation(f"epoch-{epoch_no}")
    err_type = categorize_error(F.col("parse_error_message"))
    parse_ok_c = F.col("fetch_ok") & F.col("parse_error_kind").isNull()
    scratch_dir = os.path.join(state.root, "_scratch", f"epoch-{epoch_no}")
    observed = parse_pages(fetched, passthrough=PASSTHROUGH).observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum(F.col("fetch_ok").cast("long")), F.lit(0)).alias(
            "n_fetch_ok"
        ),
        F.coalesce(F.sum(parse_ok_c.cast("long")), F.lit(0)).alias(
            "n_parse_ok"
        ),
        *[
            F.coalesce(F.sum((err_type == t).cast("long")), F.lit(0)).alias(
                f"err_{t}"
            )
            for t in ERROR_TYPES
        ],
    )
    # exactly the columns the three consumers below read — everything
    # else (extracted_text, host/priority/host_seq politeness bookkeeping)
    # is parse/schedule working state that must not hit the scratch
    scratch_cols = [
        "url",
        "url_hash",
        "fetch_ok",
        "podcast",
        "episodes",
        "parse_error_kind",
        "parse_error_message",
    ]
    if cfg.scratch_parquet:
        observed.select(*scratch_cols).write.mode("overwrite").option(
            "compression", "lz4"
        ).parquet(scratch_dir)
        parsed = spark.read.parquet(scratch_dir)
    else:
        from pyspark import StorageLevel

        parsed = observed.select(*scratch_cols).persist(StorageLevel.DISK_ONLY)
        # materialize now so the Observation is complete and every consumer
        # below hits the cache instead of re-running the parse
        parsed.write.format("noop").mode("overwrite").save()
    t = _tick("schedule+fetch+parse scratch", t0)
    # the scratch write (the epoch's first action) has completed, so the
    # observed metrics are already available
    m = obs.get

    ok = parsed.filter(F.col("parse_error_kind").isNull())

    # 5. outputs: podcasts (J2 key = xxhash64(rss_feed_url)) + episodes.
    # Within-epoch LWW dedup only — the cross-epoch merge (D1/D2, ON
    # CONFLICT DO UPDATE parity) is carried by merge-on-read delta
    # commits: each epoch writes O(delta) rows and readers resolve
    # ``max_by(_epoch)`` per key across segments.  Rewriting the whole
    # episodes table per epoch (copy-on-write) would make every
    # steady-state epoch O(corpus) — measured 14s to apply an EMPTY delta
    # to 4.7M rows at sandbox scale, and fatal at 10^10.
    epoch_lit = F.lit(epoch_no)
    podcasts_new = resolve_lww(
        ok.select(
            F.xxhash64("podcast.rss_feed_url").alias("podcast_id"),
            F.col("podcast.*"),
            epoch_lit.alias("_epoch"),
        ),
        "rss_feed_url",
        "_epoch",
    )
    episodes_new = resolve_lww(
        explode_episodes(parsed).withColumn("_epoch", epoch_lit),
        "guid",
        "_epoch",
    )

    # 6. frontier update (R1-R3) + per-row stage lineage for this epoch.
    # The outcome set is O(epoch), tiny next to a 10^10-row frontier —
    # broadcast it below the threshold so the frontier is never shuffled
    # for this join (it already lives hash-partitioned by host).
    outcomes = parsed.select(
        "url_hash", "fetch_ok", "parse_error_kind", "parse_error_message"
    )
    if m["total"] <= cfg.broadcast_outcomes_max_rows:
        outcomes = F.broadcast(outcomes)
    new_frontier = apply_epoch_results(frontier, outcomes, epoch_ts, cfg)
    new_frontier = _stamp_stages(new_frontier, epoch_ts)

    # 7. commit podcasts/episodes + PREPARE the frontier, all overlapped.
    # Row counts and per-partition lineage come from the committed parquet
    # footers — metrics cost no extra Spark jobs.  The three writers are
    # independent jobs reading the same scratch, so they run concurrently
    # from separate driver threads across the same executors.  The
    # epoch-boundary protocol only requires the outputs to be DURABLE
    # before the frontier manifest PUBLISHES — and the commit point of a
    # snapshot is the manifest rename, not the data write, so the
    # frontier's (large) parquet write overlaps the output commits and
    # only its manifest waits (two-phase prepare/publish,
    # plans/checkpoint.py).  An epoch with nothing parsed has an empty
    # delta — skip both output commits (the parent snapshots remain
    # current; retry-only epochs cost zero output writes).
    from concurrent.futures import ThreadPoolExecutor

    # frontier file layout decision must precede the write (see the
    # comment at the bottom of this function for the rationale)
    if m["total"] > cfg.broadcast_outcomes_max_rows:
        new_frontier = new_frontier.repartition(cfg.num_partitions, "host_hash")

    def _commit_out(table, updates, key):
        if table.current_snapshot_id() is None:
            table.commit(updates, metrics={"epoch": epoch_no})
        else:
            table.commit_delta(
                updates, key, "_epoch", metrics={"epoch": epoch_no}
            )
        # periodic rewrite: resolve cost is amortized, read
        # amplification stays bounded by cfg.compact_segments
        if table.num_segments() >= cfg.compact_segments:
            table.compact(spark, metrics={"epoch": epoch_no})

    # Scoped AQE override (see CrawlConfig.commit_advisory_bytes): the
    # commit writers are shuffle-final jobs over O(delta) bytes; size-
    # based coalescing keeps their file count proportional to delta
    # bytes instead of cluster parallelism.  Only the commit jobs plan
    # under these values — restored before any other work runs.
    _scoped = {}
    if cfg.commit_advisory_bytes:
        for k, v in (
            (
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                cfg.commit_advisory_bytes,
            ),
            (
                "spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false",
            ),
        ):
            _scoped[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_front = pool.submit(state.frontier.prepare, new_frontier)
            if m["n_parse_ok"] > 0:
                f_pod = pool.submit(
                    _commit_out, state.podcasts, podcasts_new, "rss_feed_url"
                )
                f_ep = pool.submit(
                    _commit_out, state.episodes, episodes_new, "guid"
                )
                f_pod.result()
                f_ep.result()
            frontier_staged = f_front.result()
    finally:
        for k, old in _scoped.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    t = _tick("podcasts+episodes commit + frontier prepare", t)
    pod_man = state.podcasts.manifest() or {}
    ep_man = state.episodes.manifest() or {}
    # manifest row_count is the RAW segment total (delta segments include
    # superseded rows until compaction), i.e. an upper bound on the
    # resolved table — the metric keys say so explicitly so A1-style
    # dashboards don't read it as the live row count
    pod_rows = pod_man.get("row_count", 0)
    ep_rows = ep_man.get("row_count", 0)

    total, n_fetch_ok, n_parse_ok = m["total"], m["n_fetch_ok"], m["n_parse_ok"]
    err_hist = {
        t: m[f"err_{t}"] for t in ERROR_TYPES if m[f"err_{t}"]
    }

    metrics = {
        "epoch": epoch_no,
        "epoch_ts": epoch_ts.isoformat(),
        "scheduled": total,
        "fetched": n_fetch_ok,
        "parsed": n_parse_ok,
        "fetch_failures": total - n_fetch_ok,
        "parse_failures": n_fetch_ok - n_parse_ok,
        "error_histogram": err_hist,
        "podcast_rows_raw": pod_rows,
        "episode_rows_raw": ep_rows,
        "partition_lineage": ep_man.get("files", []),
        "wall_s": None,  # filled below
    }

    # metrics table: one row per epoch — committed driver-side via pyarrow
    # (a Spark job per epoch for one row is pure scheduling overhead)
    import pyarrow as pa

    metrics_arrow_schema = pa.schema(
        [
            pa.field("epoch", pa.int32()),
            pa.field("epoch_ts", pa.timestamp("us")),
            pa.field("scheduled", pa.int64()),
            pa.field("fetched", pa.int64()),
            pa.field("parsed", pa.int64()),
            pa.field("fetch_failures", pa.int64()),
            pa.field("parse_failures", pa.int64()),
        ]
    )
    state.metrics.commit_local(
        [
            (
                epoch_no,
                epoch_ts.replace(tzinfo=None),
                total,
                n_fetch_ok,
                n_parse_ok,
                total - n_fetch_ok,
                n_fetch_ok - n_parse_ok,
            )
        ],
        metrics_arrow_schema,
        metrics={"epoch": epoch_no},
    )
    t = _tick("metrics commit", t)
    metrics["wall_s"] = round(time.time() - t0, 3)
    # Layout note (decision made before the overlapped write above): when
    # the outcome join was broadcast the whole frontier-update plan is
    # narrow over the snapshot scan, so the stored host_hash file layout is
    # preserved as-is and re-bucketing would be a full-frontier shuffle for
    # nothing (the politeness window runs its own host_hash exchange
    # regardless).  Only re-bucket when a shuffled outcome join (or a
    # production bucketed-table contract) actually disturbed the layout.
    # The epoch boundary = this manifest publish (outputs are durable).
    state.frontier.publish(frontier_staged, metrics=metrics)
    _tick("frontier publish", t)
    if cfg.scratch_parquet:
        import shutil

        shutil.rmtree(scratch_dir, ignore_errors=True)
    else:
        parsed.unpersist()
    return metrics


def _stamp_stages(frontier: DataFrame, epoch_ts: datetime) -> DataFrame:
    """Per-row lineage for rows touched this epoch, mirroring the Task
    stages vec (``task.rs:33-41``; names ``src/metrics.rs:105``).  Bounded:
    the row keeps only its latest epoch's stages; cross-epoch lineage lives
    in the snapshot manifests."""
    ts = F.lit(epoch_ts).cast("timestamp")
    touched = F.col("state").isin(PARSED, "failed") | (
        (F.col("retries") > 0) & (F.col("state") == "pending")
    )
    fetch_status = F.when(
        F.col("error_kind") == "network", F.lit("Failed")
    ).otherwise(F.lit("Completed"))
    parse_status = (
        F.when(F.col("error_kind") == "network", F.lit("Pending"))
        .when(F.col("error_kind").isNotNull(), F.lit("Failed"))
        .otherwise(F.lit("Completed"))
    )
    insert_status = F.when(F.col("state") == PARSED, F.lit("Completed")).otherwise(
        F.lit("Pending")
    )

    def stage(name, status):
        return F.struct(
            F.lit(name).alias("name"),
            status.alias("status"),
            ts.alias("start_ts"),
            ts.alias("end_ts"),
            F.col("last_error").alias("error"),
        )

    stages = F.array(
        stage("distribution", F.lit("Completed")),
        stage("fetching", fetch_status),
        stage("parsing", parse_status),
        stage("inserting", insert_status),
    )
    return frontier.withColumn(
        "stages", F.when(touched, stages).otherwise(F.col("stages"))
    )


def run_crawl(
    spark: SparkSession,
    state_dir: str,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    epochs: int,
    epoch0: datetime,
    epoch_interval_s: int = 60,
    cfg: CrawlConfig = CrawlConfig(),
) -> CrawlState:
    """Run (or **resume**) the crawl until *epochs* epochs are committed.
    Epoch timestamps are deterministic (epoch0 + i·interval), so resuming a
    killed run reproduces byte-identical outputs (tested)."""
    state = init_crawl(spark, seeds, state_dir, epoch0, cfg)
    while state.completed_epochs() < epochs:
        i = state.completed_epochs()
        epoch_ts = epoch0 + timedelta(seconds=i * epoch_interval_s)
        run_epoch(spark, state, pages, robots, epoch_ts, cfg)
    return state


def seen_shards_current(
    spark: SparkSession, state: CrawlState, cfg: CrawlConfig = CrawlConfig()
) -> DataFrame:
    """The persisted seen-shard table (one bloom-bits row per
    ``pmod(url_hash, S)`` shard), bootstrapping it from the current
    frontier on first use.

    Bootstrap sizing: bloom bits never resize, so the filters are sized
    for the crawl's TARGET key count (``cfg.seen_expected_keys``), not
    today's frontier — default 8× the current frontier as growth
    headroom.  Undersizing only degrades the pre-filter's pruning rate
    (more maybes reach the exact verify); it never drops a URL.
    """
    existing = state.seen_shards.read(spark)
    if existing is not None:
        return existing
    man = state.frontier.manifest() or {}
    expected = cfg.seen_expected_keys or max(
        (man.get("row_count") or 0) * 8, 100_000
    )
    from ..operators.seen import build_bloom_shards

    shards = build_bloom_shards(
        state.frontier.read(spark).select("url_hash"),
        "url_hash",
        cfg.num_partitions,
        expected_keys=expected,
    )
    state.seen_shards.commit(
        shards,
        metrics={
            "op": "seen_bootstrap",
            "epoch": state.completed_epochs(),
            "expected_keys": expected,
            # the shard count is PART OF THE INDEX LAYOUT: probes and
            # folds must use the bootstrap-time count forever — reopening
            # the crawl with a different cfg.num_partitions would
            # mis-shard the cogroup and turn bloom false negatives into
            # duplicate admissions (the invariant is "never a false
            # negative").  _seen_num_shards reads this back.
            "num_shards": cfg.num_partitions,
        },
    )
    return state.seen_shards.read(spark)


def _seen_num_shards(state: CrawlState, cfg: CrawlConfig) -> int:
    """The shard count the persisted seen index was BUILT with — the
    only count that probes/folds may use (see bootstrap metrics note).
    Falls back to ``cfg.num_partitions`` for pre-existing state dirs
    whose bootstrap predates the ``num_shards`` manifest field."""
    man = state.seen_shards.manifest() or {}
    return (man.get("metrics") or {}).get("num_shards") or cfg.num_partitions


def admit_urls(
    spark: SparkSession,
    state: CrawlState,
    urls: DataFrame,
    epoch_ts: datetime,
    cfg: CrawlConfig = CrawlConfig(),
    priority: int = 1_000_000,
    use_bloom: bool = True,
) -> int:
    """Frontier growth: admit discovered URLs (e.g. episode links found by
    parsing — ``discovered_urls``) that are NOT already in the frontier.

    The seen check is the D3 discipline over the PERSISTED shard index
    (``state.seen_shards`` — bootstrapped once, folded incrementally):

    * **probe** — candidates cogroup against the S persisted shard rows
      (``seen.bloom_probe_partitioned``); cost O(candidates + S), the
      frontier is not touched.  Definite-negatives (the vast majority of
      genuinely-new URLs) are admitted with NO frontier access at all.
    * **exact verify** — bloom "maybe" rows are verified against the
      frontier key column without shuffling it: the frontier scan
      semi-joins a *broadcast* of the maybe keys (a narrow, column-pruned
      pass over the snapshot — the only O(frontier) cost, IO not
      shuffle), and the resulting hit set (≤ maybes, tiny) broadcasts
      back into an anti-join.  False positives therefore only cost join
      rows, never a wrongly-dropped URL.  Above
      ``cfg.verify_broadcast_max_rows`` maybes the verify falls back to
      a plain anti-join (shuffle both sides) — the safe path when an
      admission batch is almost entirely duplicates at 10^9+ scale.
    * **fold** — after the frontier commit the candidate keys are OR-ed
      into the shard table (``seen.update_bloom_shards``: one cogroup of
      O(new keys + S rows)) and committed as the next ``seen_shards``
      snapshot.  Never a rebuild over the full frontier — the r2 design
      rebuilt the shards from the frontier on every call, O(frontier)
      per admission.

    *urls* needs a ``url`` column; returns the new frontier snapshot id.
    Discovered URLs get a low priority (crawled after all seeds at equal
    due-time) and the standard retry budget.
    """
    frontier = state.frontier.read(spark)
    cand = (
        urls.select("url")
        .filter(is_valid_url(F.col("url")))
        .withColumn("canonical_url", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("canonical_url")))
    )
    w = Window.partitionBy("canonical_url").orderBy("url")
    cand = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    if use_bloom:
        shards = seen_shards_current(spark, state, cfg)
        fresh, probed = _unseen_via_shards(
            frontier, cand, shards, cfg, num_shards=_seen_num_shards(state, cfg)
        )
        try:
            snap = _commit_admission(
                state, frontier, cand, fresh, epoch_ts, cfg, priority
            )
        finally:
            probed.unpersist()
        return snap
    fresh = cand.join(frontier.select("url_hash"), "url_hash", "left_anti")
    return _commit_admission(state, frontier, cand, fresh, epoch_ts, cfg, priority)


def _unseen_via_shards(
    frontier: DataFrame,
    cand: DataFrame,
    shards: DataFrame,
    cfg: CrawlConfig,
    num_shards: int | None = None,
):
    """The shard-probe + exact-verify lineage (see ``admit_urls``).
    Returns ``(fresh, probed)`` — *probed* is persisted; the caller
    unpersists it once *fresh* has been consumed.  *num_shards* must be
    the index's BUILD-time shard count (``_seen_num_shards``); it
    defaults to ``cfg.num_partitions`` only for direct test callers
    that built the shards with that same count."""
    from ..operators.seen import bloom_probe_partitioned

    probed = bloom_probe_partitioned(
        cand, shards, "url_hash", num_shards or cfg.num_partitions
    ).persist()
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    # cheap after the persist above — gates the verify strategy
    n_maybes = maybes.count()
    seen_keys = frontier.select("url_hash")
    if n_maybes == 0:
        fresh = definite_new
    elif n_maybes <= cfg.verify_broadcast_max_rows:
        hits = seen_keys.join(
            F.broadcast(maybes.select("url_hash")), "url_hash", "left_semi"
        )
        fresh = definite_new.unionByName(
            maybes.join(F.broadcast(hits), "url_hash", "left_anti")
        )
    else:
        fresh = definite_new.unionByName(
            maybes.join(seen_keys, "url_hash", "left_anti")
        )
    return fresh, probed


def _commit_admission(
    state: CrawlState,
    frontier: DataFrame,
    cand: DataFrame,
    fresh: DataFrame,
    epoch_ts: datetime,
    cfg: CrawlConfig,
    priority: int,
) -> int:
    from ..operators.seen import update_bloom_shards

    rows = fresh.select(
        "url",
        "canonical_url",
        "url_hash",
        url_host(F.col("url")).alias("host"),
        host_hash(url_host(F.col("url"))).alias("host_hash"),
        F.lit(priority).cast("int").alias("priority"),
        F.lit(epoch_ts).cast("timestamp").alias("next_fetch_ts"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(cfg.max_retries).cast("int").alias("max_retries"),
        F.lit("pending").alias("state"),
        F.lit(None).cast("string").alias("last_error"),
        F.lit(None).cast("string").alias("error_kind"),
        F.lit(None)
        .cast(
            "array<struct<name:string,status:string,start_ts:timestamp,"
            "end_ts:timestamp,error:string>>"
        )
        .alias("stages"),
    )
    # Fold the admission's keys into the persisted shard index so the next
    # admission probes a complete seen set.  Folding ALL candidate keys
    # (not just the admitted subset) is equivalent and cheaper: a
    # candidate either was admitted (must fold) or was already in the
    # frontier (its bits are already set — OR is idempotent), and it
    # avoids re-running the probe+verify lineage just to isolate the
    # admitted keys.  Runs whenever the shard table exists (even on the
    # use_bloom=False path) so the index never goes stale.
    #
    # ORDER MATTERS: the fold commits BEFORE the frontier commit.  A
    # crash between the two then leaves bloom bits set for keys that
    # never landed in the frontier — harmless false positives that the
    # exact verify resolves.  The reverse order (frontier first) would
    # leave frontier keys ABSENT from the bloom after a crash: false
    # negatives that skip the exact verify and re-admit duplicates.
    spark = frontier.sparkSession
    if state.seen_shards.current_snapshot_id() is not None:
        man = state.seen_shards.manifest() or {}
        expected = (man.get("metrics") or {}).get("expected_keys") or 100_000
        num_shards = _seen_num_shards(state, cfg)
        new_shards = update_bloom_shards(
            state.seen_shards.read(spark),
            cand.select("url_hash"),
            "url_hash",
            num_shards,
            expected_keys_per_shard=max(1, expected // num_shards),
        )
        state.seen_shards.commit(
            new_shards,
            metrics={
                "op": "seen_fold",
                "epoch": state.completed_epochs(),
                "expected_keys": expected,
                "num_shards": num_shards,
            },
        )
    return state.frontier.commit(
        frontier.unionByName(rows.select(*frontier.columns)).repartition(
            cfg.num_partitions, "host_hash"
        ),
        metrics={"epoch": state.completed_epochs(), "op": "admit_discovered"},
    )


def discovered_urls(state: CrawlState, spark: SparkSession) -> DataFrame:
    """Frontier growth: episode enclosure/link URLs discovered by parsing,
    canonicalized + hashed — candidates for seen-set filtering before
    admission (north-star: seen set over feed **and** episode URLs)."""
    eps = state.episodes.read(spark)
    if eps is None:
        raise ValueError("no episodes snapshot yet")
    urls = (
        eps.select(F.col("enclosure_url").alias("url"))
        .unionByName(eps.select(F.col("link").alias("url")))
        .filter(F.col("url").isNotNull())
    )
    return urls.select(
        "url",
        canonicalize_url(F.col("url")).alias("canonical_url"),
    ).select("url", "canonical_url", url_hash(F.col("canonical_url")).alias("url_hash"))
