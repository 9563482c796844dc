"""Bucketed pages layout: the production fetch-join contract.

``fetch_join`` (J3) left-joins the scheduled frontier slice against the
pages table on ``url``.  At 10^10-page scale the pages side carries
multi-KB html blobs — the one column that must NEVER cross an exchange.
The production answer (noted in ``operators/frontier.fetch_join``) is a
pages table **bucketed by url**: Spark's bucketing pre-hashes the rows
into B files per partition at WRITE time, so every later equi-join on
``url`` reads each bucket co-located and only the (narrow) probe side
shuffles — the html blobs move zero times.

This module materializes that contract with ``DataFrameWriter.bucketBy``
(Hive-style bucketed table in the session catalog — on a cluster this is
the Iceberg/Hive table the ingest job maintains) and provides the join
that exploits it.  ``tests/test_plans.py`` asserts the physical plan:
no Exchange above the bucketed pages scan, shuffle only on the
scheduled side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_pages(
    pages: DataFrame,
    table: str = "pages_bucketed",
    buckets: int = 32,
) -> None:
    """Persist the pages table bucketed by url (sorted within buckets so
    the join side is merge-ready).  One-time ingest cost: the ONLY time
    the html column ever crosses an exchange."""
    (
        pages.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )


def fetch_join_bucketed(
    scheduled: DataFrame, spark: SparkSession, table: str = "pages_bucketed"
) -> DataFrame:
    """J3 against the bucketed pages table: the scheduled (narrow) side
    shuffles into the pages bucketing; the html side is read in place.
    Output schema matches ``operators/frontier.fetch_join``."""
    pg = spark.table(table).select("url", "html", "warc_ts")
    joined = scheduled.join(pg, "url", "left")
    return joined.withColumn("fetch_ok", F.col("html").isNotNull())
