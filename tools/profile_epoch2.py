"""Steady-state per-phase epoch profile at a given parallelism, mirroring
bench.py's crawl leg exactly: fresh state per repeat, same JVM (so repeat 2+
has warm Python workers, like the bench's min-of-k), EPOCH_DEBUG_TIMING on.
Complements profile_epoch.py (which measures phase *prefixes* via noop sinks
and so conflates warm-up with phase cost).

Usage: python tools/profile_epoch2.py <cpus> <n_feeds> <corpus_dir> [repeats]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["EPOCH_DEBUG_TIMING"] = "1"

CPUS = int(sys.argv[1])
N = int(sys.argv[2])
CORPUS = sys.argv[3]
REPEATS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

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

from podcast_crawler_spark.operators.frontier import CrawlConfig
from podcast_crawler_spark.plans.epoch import init_crawl, run_epoch
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

for r in range(REPEATS):
    tmp = tempfile.mkdtemp(dir=FAST)
    state = init_crawl(spark, seeds, f"{tmp}/state", EPOCH0, cfg)
    t0 = time.time()
    m = run_epoch(spark, state, pages, robots, EPOCH0, cfg)
    print(
        f"[{CPUS}] repeat{r+1}: wall={m['wall_s']} "
        f"sched={m['scheduled']} parsed={m['parsed']} "
        f"tp={round(m['scheduled'] / m['wall_s'], 1)} urls/s",
        flush=True,
    )
