"""Per-prefix attribution of the epoch at scale, matching run_epoch's
EXACT plan (shuffle fetch join, Arrow parse with passthrough, pruned
DISK_ONLY scratch, then each commit job separately from the cache).

profile_phases.py uses the broadcast fetch path; the production epoch
defaults to the shuffle join (broadcast_fetch_max_rows=0), so its
numbers don't attribute the real plan.  This one does.

Usage: python tools/profile_epoch_prefix.py <cpus> <n_feeds> <corpus_dir>
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
N = int(sys.argv[2])
CORPUS = sys.argv[3]

from pyspark.sql import SparkSession

FAST = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(2 * CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.join.preferSortMergeJoin", "false")
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.local.dir", os.path.join(FAST, "spark-prof-local"))
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from podcast_crawler_spark.functions.udfs import explode_episodes, parse_pages
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig,
    apply_epoch_results,
    fetch_join,
    schedule_epoch,
)
from podcast_crawler_spark.plans.checkpoint import resolve_lww
from podcast_crawler_spark.plans.epoch import PASSTHROUGH, init_crawl
from podcast_crawler_spark.sources.pagesgen import (
    EPOCH0,
    gen_pages,
    gen_robots,
    gen_seeds,
)

cfg = CrawlConfig(per_host_budget=10**9, num_partitions=2 * CPUS)
pp = f"{CORPUS}/pages-{N}"
sp = f"{CORPUS}/seeds-{N}"
if not os.path.exists(f"{pp}/_SUCCESS"):
    gen_pages(spark, N, partitions=max(64, 2 * CPUS)).write.mode(
        "overwrite"
    ).parquet(pp)
    gen_seeds(spark, N, partitions=max(64, 2 * CPUS)).write.mode(
        "overwrite"
    ).parquet(sp)
pages = spark.read.parquet(pp)
seeds = spark.read.parquet(sp)
robots = gen_robots(spark, N, partitions=2 * CPUS)

tmp = tempfile.mkdtemp(dir=FAST)
state = init_crawl(spark, seeds, f"{tmp}/state", EPOCH0, cfg)
frontier = state.frontier.read(spark)
frontier_sched = frontier.select(
    "url", "url_hash", "host", "host_hash", "priority", "next_fetch_ts", "state"
)


def warm_min(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[{CPUS}] {name}: {round(best, 2)}", flush=True)
    return best


def noop(df):
    return lambda: df.write.format("noop").mode("overwrite").save()


sched = schedule_epoch(frontier_sched, robots, EPOCH0, cfg)
fetched = fetch_join(sched, pages, broadcast_scheduled=False)
parsed_full = parse_pages(fetched, passthrough=PASSTHROUGH)
scratch_cols = [
    "url", "url_hash", "fetch_ok", "podcast", "episodes",
    "parse_error_kind", "parse_error_message",
]

warm_min("pages scan", noop(pages))
warm_min("schedule", noop(sched))
warm_min("schedule+fetch (shuffle join)", noop(fetched))
warm_min("schedule+fetch+parse (noop)", noop(parsed_full.select(*scratch_cols)))

# the epoch's actual scratch: pruned DISK_ONLY persist, materialized once
parsed = parsed_full.select(*scratch_cols).persist(StorageLevel.DISK_ONLY)
t0 = time.time()
parsed.write.format("noop").mode("overwrite").save()
print(f"[{CPUS}] scratch materialize (cold): {round(time.time() - t0, 2)}", flush=True)

ok = parsed.filter(F.col("parse_error_kind").isNull())
podcasts_new = resolve_lww(
    ok.select(
        F.xxhash64("podcast.rss_feed_url").alias("podcast_id"),
        F.col("podcast.*"),
        F.lit(1).alias("_epoch"),
    ),
    "rss_feed_url",
    "_epoch",
)
episodes_new = resolve_lww(
    explode_episodes(parsed).withColumn("_epoch", F.lit(1)), "guid", "_epoch"
)
outcomes = F.broadcast(
    parsed.select("url_hash", "fetch_ok", "parse_error_kind", "parse_error_message")
)
new_frontier = apply_epoch_results(frontier, outcomes, EPOCH0, cfg)

warm_min("podcasts LWW (from cache, noop)", noop(podcasts_new))
warm_min("episodes explode+LWW (from cache, noop)", noop(episodes_new))
warm_min("frontier rewrite (bcast outcomes, noop)", noop(new_frontier))

# real parquet writes (what prepare/commit actually pay)
wdir = f"{tmp}/w"
warm_min(
    "frontier rewrite parquet write",
    lambda: new_frontier.write.mode("overwrite").parquet(f"{wdir}/f"),
)
warm_min(
    "episodes parquet write",
    lambda: episodes_new.write.mode("overwrite").parquet(f"{wdir}/e"),
)
parsed.unpersist()
