"""North-rule deployment contract: the engine runs via
``spark-submit --py-files dist/podcast_crawler_spark.zip`` with the
package imported ONLY from the zip (no repo on sys.path)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
from podcast_crawler_spark.operators.frontier import (
    CrawlConfig, build_frontier, schedule_epoch)
from podcast_crawler_spark.sources.pagesgen import EPOCH0, gen_robots, gen_seeds
import podcast_crawler_spark
assert ".zip" in podcast_crawler_spark.__file__, podcast_crawler_spark.__file__
cfg = CrawlConfig(per_host_budget=5, num_partitions=4)
n = schedule_epoch(
    build_frontier(gen_seeds(spark, 100, partitions=4), EPOCH0, cfg),
    gen_robots(spark, 100), EPOCH0, cfg,
).count()
print(f"SUBMIT_OK scheduled={n}")
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "podcast_crawler_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), zip_path],
        check=True,
        capture_output=True,
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"),
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(job),
        ],
        cwd=str(tmp_path),  # repo NOT on sys.path — imports come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert "SUBMIT_OK scheduled=85" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
