"""Isolate the parse-stage 8->32 scaling gap (BENCH.md w23: raw E 0.595
with probe ceiling 0.944 -> the gap is engine-side).

Variables, one fresh JVM per invocation:
  * mode=joined    schedule -> shuffle fetch_join -> parse (the epoch plan)
  * mode=scan      parse_pages directly over the pages scan (no schedule,
                   no shuffle) -- the pure Arrow+Python parse path
  * mode=fetchonly schedule -> shuffle fetch_join, html materialized by a
                   noop sink (no Python) -- JVM-side ceiling of the join
  * mode=bucketed  schedule -> fetch_join_bucketed over a url-bucketed
                   pages table (one-time ingest, untimed) -> parse; html
                   never crosses an exchange
  * heap / gc      -Xmx and collector overrides, to test whether a single
                   16g G1 heap's GC is the core-invariant serial fraction

Usage:
  python tools/parse_stage_experiment.py <cpus> <n_feeds> <corpus_dir> \
      <mode> [heap] [gcflag]
Prints one JSON line: {cpus, mode, heap, gc, best_s, gc_ms, reps:[...]}
GC time is read from the JVM's GarbageCollectorMXBeans via py4j before
and after the timed region, so the pause attribution is data, not guess.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
N = int(sys.argv[2])
CORPUS = sys.argv[3]
MODE = sys.argv[4]
HEAP = sys.argv[5] if len(sys.argv) > 5 else "16g"
GC = sys.argv[6] if len(sys.argv) > 6 else ""

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
    .config("spark.local.dir", os.path.join(FAST, "spark-exp-local"))
    .config("spark.sql.warehouse.dir", os.path.join(FAST, "spark-exp-wh"))
    .config("spark.driver.memory", HEAP)
)
if GC:
    b = b.config("spark.driver.extraJavaOptions", GC)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from podcast_crawler_spark.functions.udfs import parse_pages
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig,
    fetch_join,
    schedule_epoch,
)
from podcast_crawler_spark.plans.epoch import PASSTHROUGH, init_crawl
from podcast_crawler_spark.sources.pagesgen import EPOCH0, gen_robots, gen_seeds

cfg = CrawlConfig(per_host_budget=10**9, num_partitions=2 * CPUS)
pages = spark.read.parquet(f"{CORPUS}/pages-{N}")

SCRATCH_COLS = [
    "url", "url_hash", "fetch_ok", "podcast", "episodes",
    "parse_error_kind", "parse_error_message",
]

if MODE == "scan":
    # pure parse path: scan -> mapInPandas -> noop; bookkeeping synthesized
    src = pages.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.lit(True).alias("fetch_ok"),
        "html",
    )
    df = parse_pages(src, passthrough=["url", "url_hash", "fetch_ok"]).select(
        *SCRATCH_COLS
    )
else:
    seeds = spark.read.parquet(f"{CORPUS}/seeds-{N}")
    robots = gen_robots(spark, N, partitions=2 * CPUS)
    tmp = tempfile.mkdtemp(dir=FAST)
    state = init_crawl(spark, seeds, f"{tmp}/state", EPOCH0, cfg)
    frontier = state.frontier.read(spark).select(
        "url", "url_hash", "host", "host_hash", "priority",
        "next_fetch_ts", "state",
    )
    sched = schedule_epoch(frontier, robots, EPOCH0, cfg)
    if MODE == "bucketed":
        from podcast_crawler_spark.sources.bucketed import (
            fetch_join_bucketed,
            write_bucketed_pages,
        )

        from podcast_crawler_spark.sources.bucketed import register_bucketed_pages

        buckets = 64  # fixed table property: same layout must serve every leg
        loc = os.path.join(FAST, "spark-exp-wh", "pages_bucketed_exp")
        if not os.path.exists(os.path.join(loc, "_SUCCESS")):
            write_bucketed_pages(
                pages, "pages_bucketed_exp", buckets=buckets,
                one_file_per_bucket=True,
            )
        else:
            register_bucketed_pages(
                spark, loc, "pages_bucketed_exp", buckets=buckets
            )
        fetched = fetch_join_bucketed(sched, spark, "pages_bucketed_exp")
        fetched.explain("formatted")
        df = parse_pages(fetched, passthrough=PASSTHROUGH).select(*SCRATCH_COLS)
    else:
        fetched = fetch_join(sched, pages, broadcast_scheduled=False)
        if MODE == "fetchonly":
            df = fetched.select("url", "url_hash", "fetch_ok", "html")
        else:  # joined
            df = parse_pages(fetched, passthrough=PASSTHROUGH).select(
                *SCRATCH_COLS
            )


def gc_ms():
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


reps = []
gcs = []
for _ in range(2):
    g0 = gc_ms()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    reps.append(round(time.time() - t0, 2))
    gcs.append(gc_ms() - g0)

print(
    json.dumps(
        {
            "cpus": CPUS,
            "mode": MODE,
            "heap": HEAP,
            "gc_flags": GC,
            "best_s": min(reps),
            "reps": reps,
            "gc_ms": gcs,
        }
    ),
    flush=True,
)
