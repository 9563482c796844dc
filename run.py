"""spark-submit entrypoint for the crawl engine.

Cluster usage (north rule: multi-executor via --py-files):

    python tools/package.py           # -> dist/podcast_crawler_spark.zip
    spark-submit --py-files dist/podcast_crawler_spark.zip \\
        --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \\
        run.py --state s3://bucket/crawl-state \\
        --pages s3://bucket/pages --seeds s3://bucket/seeds \\
        --robots s3://bucket/robots --epochs 24

(ParallelGC: the conventional stop-the-world throughput collector for
batch work.  An interleaved A/B on the sandbox box measured it NEUTRAL
vs G1 — see PLANS.md round-5 notes; on a real cluster measure per
workload before committing either way.)

Local smoke (sandbox):

    python run.py --n-feeds 500 --epochs 2 --state /tmp/crawlstate

The session is created WITHOUT a hard-coded master so spark-submit's
--master/--deploy-mode (YARN, k8s, standalone) apply; running directly
under plain python falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from podcast_crawler_spark.operators.frontier import CrawlConfig
from podcast_crawler_spark.plans.epoch import CrawlState, run_crawl


def main() -> None:
    ap = argparse.ArgumentParser(description="podcast_crawler_spark crawl run")
    ap.add_argument("--state", required=True, help="crawl state (warehouse) dir")
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument("--seeds", help="seeds table path (parquet)")
    ap.add_argument("--robots", help="robots table path (parquet)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--epoch-interval-s", type=int, default=3600)
    ap.add_argument("--per-host-budget", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=200)
    ap.add_argument(
        "--n-feeds", type=int, default=0,
        help="synthesize a deterministic corpus of this size instead of "
             "reading --pages/--seeds/--robots (sandbox/CI smoke)",
    )
    args = ap.parse_args()

    builder = (
        SparkSession.builder.appName("podcast_crawler_spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = CrawlConfig(
        per_host_budget=args.per_host_budget,
        num_partitions=args.partitions,
        fetch_interval_s=args.epoch_interval_s,
    )
    epoch0 = datetime(2025, 1, 1, tzinfo=timezone.utc)

    if args.n_feeds:
        from podcast_crawler_spark.sources.pagesgen import (
            gen_pages,
            gen_robots,
            gen_seeds,
        )

        pages = gen_pages(spark, args.n_feeds, partitions=cfg.num_partitions)
        seeds = gen_seeds(spark, args.n_feeds, partitions=cfg.num_partitions)
        robots = gen_robots(spark, args.n_feeds, partitions=cfg.num_partitions)
    else:
        if not (args.pages and args.seeds and args.robots):
            ap.error("--pages/--seeds/--robots required without --n-feeds")
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        robots = spark.read.parquet(args.robots)

    state = run_crawl(
        spark,
        args.state,
        seeds,
        pages,
        robots,
        epochs=args.epochs,
        epoch0=epoch0,
        epoch_interval_s=args.epoch_interval_s,
        cfg=cfg,
    )
    man = state.frontier.manifest()
    print(json.dumps({"completed_epochs": state.completed_epochs(),
                      "last_epoch_metrics": man["metrics"]}, default=str))


if __name__ == "__main__":
    main()
