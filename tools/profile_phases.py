"""Warm per-phase-prefix timings: run each prefix job twice, keep the min,
so Python-worker startup and page-cache fill don't pollute phase attribution
(profile_epoch.py runs each prefix once, cold).

Usage: python tools/profile_phases.py <cpus> <n_feeds> <corpus_dir>
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

from podcast_crawler_spark.functions.udfs import explode_episodes, parse_pages
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig,
    fetch_join,
    schedule_epoch,
)
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
    gen_pages(spark, N, partitions=64).write.mode("overwrite").parquet(pp)
    gen_seeds(spark, N, partitions=64).write.mode("overwrite").parquet(sp)
pages = spark.read.parquet(pp)
seeds = spark.read.parquet(sp)
robots = gen_robots(spark, N, partitions=2 * CPUS)

tmp = tempfile.mkdtemp(dir=FAST)
state = init_crawl(spark, seeds, f"{tmp}/state", EPOCH0, cfg)
frontier = state.frontier.read(spark).select(
    "url", "url_hash", "host", "host_hash", "priority", "next_fetch_ts", "state"
)


def warm_min(name, df, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[{CPUS}] {name}: {round(best, 2)}", flush=True)
    return best


sched = schedule_epoch(frontier, robots, EPOCH0, cfg)
fetched = fetch_join(sched, pages, broadcast_scheduled=True)
parsed = parse_pages(fetched, passthrough=PASSTHROUGH)

t_pages = warm_min("pages scan only", pages)
t_sched = warm_min("schedule only", sched)
t_fetch = warm_min("schedule+fetch", fetched)
t_parse = warm_min("schedule+fetch+parse (noop)", parsed)

# persist-materialize variant (what the epoch actually does)
p = parsed.persist()
t0 = time.time()
p.write.format("noop").mode("overwrite").save()
print(f"[{CPUS}] +persist materialize: {round(time.time() - t0, 2)}", flush=True)
t0 = time.time()
explode_episodes(p).write.format("noop").mode("overwrite").save()
print(f"[{CPUS}] explode from cache: {round(time.time() - t0, 2)}", flush=True)
p.unpersist()
