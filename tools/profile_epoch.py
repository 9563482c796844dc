"""Per-phase epoch profiling at a given parallelism.

Usage: python tools/profile_epoch.py <cpus> <n_feeds> <corpus_dir>
Corpus is generated into <corpus_dir> if absent (shared across runs).
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

from pyspark.sql import functions as F

from podcast_crawler_spark.functions.udfs import explode_episodes, parse_pages
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig,
    fetch_join,
    schedule_epoch,
)
from podcast_crawler_spark.plans.epoch import PASSTHROUGH, init_crawl, run_epoch
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
frontier = state.frontier.read(spark)


def noop(name, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"[{CPUS}] {name}: {round(time.time() - t0, 1)}")


sched = schedule_epoch(frontier, robots, EPOCH0, cfg)
noop("schedule", sched)
fetched = fetch_join(sched, pages)
noop("+fetch", fetched)
parsed = parse_pages(fetched, passthrough=PASSTHROUGH)
noop("+parse", parsed)
noop("+explode", explode_episodes(parsed))

t0 = time.time()
m = run_epoch(spark, state, pages, robots, EPOCH0, cfg)
print(f"[{CPUS}] full epoch: {round(time.time() - t0, 1)} wall_s={m['wall_s']}")
