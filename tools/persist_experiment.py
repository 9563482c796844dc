"""Isolate the 8->32 anti-scaling in the epoch's parse-scratch persist.

Runs ONE variant per invocation (fresh JVM) so heap/GC state can't leak
across variants:

  python tools/persist_experiment.py <cpus> <n_feeds> <corpus_dir> <variant>

variants:
  noop          parse -> noop sink (no scratch), the lower bound
  persist       parsed.persist() full schema            (current default)
  persist_mem   same but driver.memory=48g              (GC-pressure test)
  persist_b1k   same but inMemoryColumnarStorage.batchSize=1000
  persist_disk  StorageLevel.DISK_ONLY (local.dir is /dev/shm)
  persist_prune drop extracted_text + unread passthrough cols pre-persist
  parquet       lz4 parquet scratch write (what cfg.scratch_parquet does)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
N = int(sys.argv[2])
CORPUS = sys.argv[3]
VARIANT = sys.argv[4]

from pyspark.sql import SparkSession

FAST = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
b = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(2 * CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.join.preferSortMergeJoin", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.local.dir", os.path.join(FAST, "spark-pex-local"))
    .config("spark.driver.memory", "48g" if VARIANT == "persist_mem" else "16g")
)
if VARIANT == "persist_b1k":
    b = b.config("spark.sql.inMemoryColumnarStorage.batchSize", "1000")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from podcast_crawler_spark.functions.udfs import parse_pages
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig,
    fetch_join,
    schedule_epoch,
)
from podcast_crawler_spark.plans.epoch import PASSTHROUGH, init_crawl
from podcast_crawler_spark.sources.pagesgen import EPOCH0, gen_pages, gen_robots, gen_seeds

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
sched = schedule_epoch(frontier, robots, EPOCH0, cfg)
fetched = fetch_join(sched, pages, broadcast_scheduled=True)
parsed = parse_pages(fetched, passthrough=PASSTHROUGH)

# one warm pass (python workers, page cache) that no variant times
parsed.write.format("noop").mode("overwrite").save()

NEEDED = [
    "url",
    "url_hash",
    "fetch_ok",
    "podcast",
    "episodes",
    "parse_error_kind",
    "parse_error_message",
]


def run_once():
    t0 = time.time()
    if VARIANT == "noop":
        parsed.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
    elif VARIANT in ("persist", "persist_mem", "persist_b1k"):
        p = parsed.persist()
        p.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        p.unpersist()
    elif VARIANT == "persist_disk":
        from pyspark import StorageLevel

        p = parsed.persist(StorageLevel.DISK_ONLY)
        p.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        p.unpersist()
    elif VARIANT == "persist_prune":
        p = parsed.select(*NEEDED).persist()
        p.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        p.unpersist()
    elif VARIANT == "parquet":
        d = tempfile.mkdtemp(dir=FAST)
        parsed.write.mode("overwrite").option("compression", "lz4").parquet(d)
        dt = time.time() - t0
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    else:
        raise SystemExit(f"unknown variant {VARIANT}")
    return dt


times = [run_once() for _ in range(2)]
print(f"RESULT cpus={CPUS} variant={VARIANT} times={[round(t,2) for t in times]} min={round(min(times),2)}", flush=True)
