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
    one_file_per_bucket: bool = False,
) -> None:
    """Persist the pages table bucketed by url (sorted within buckets so
    the join side is merge-ready).  One-time ingest cost: the ONLY time
    the html column ever crosses an exchange.

    *one_file_per_bucket*: pre-shuffle the rows into the bucket layout
    (``repartition(buckets, url)`` uses the same Murmur3 ``pmod`` as the
    bucket assignment, so each write task holds exactly one bucket) —
    each bucket lands in ONE sorted file, which is the condition under
    which Spark trusts the persisted ``sortBy`` and plans the merge join
    with NO sort on the pages leg.  Multi-file buckets (the default
    many-tasks write) are re-sorted at read time."""
    w = pages
    if one_file_per_bucket:
        w = pages.repartition(buckets, "url")
    (
        w.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )


def register_bucketed_pages(
    spark: SparkSession,
    location: str,
    table: str = "pages_bucketed",
    buckets: int = 32,
    schema: str = "url string, warc_ts timestamp, html binary, "
    "text string, lang string",
) -> None:
    """Re-attach an existing bucketed parquet layout to a fresh session.

    ``bucketBy`` metadata lives in the session catalog; with the default
    in-memory catalog a new JVM forgets it even though the files (whose
    names encode the bucket id) are intact.  This DDL re-declares the
    bucket spec over the existing LOCATION — no data moves — so separate
    bench legs / resumed jobs reuse one ingest.  On a production cluster
    the Iceberg/Hive metastore carries this spec durably; this is the
    local stand-in for that durability."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema}) USING parquet "
        f"CLUSTERED BY (url) SORTED BY (url) INTO {buckets} BUCKETS "
        f"LOCATION '{location}'"
    )


def fetch_join_bucketed(
    scheduled: DataFrame, spark: SparkSession, table: str = "pages_bucketed"
) -> DataFrame:
    """J3 against the bucketed pages table: the scheduled (narrow) side
    shuffles into the pages bucketing; the html side is read in place.
    Output schema matches ``operators/frontier.fetch_join``.

    The ``SHUFFLE_HASH`` hint on the *scheduled* side pins the hash-map
    build there (build-left left-outer SHJ): without it the planner
    builds on the right leg, i.e. copies every html blob into a hash
    map before probing — measured 59 s vs 45 s for the whole
    join+parse prefix at 1.2M feeds/local[32]
    (tools/parse_stage_experiment.py).  With build-left the html side
    STREAMS from the bucket files straight into the parse."""
    pg = spark.table(table).select("url", "html", "warc_ts")
    joined = scheduled.hint("shuffle_hash").join(pg, "url", "left")
    return joined.withColumn("fetch_ok", F.col("html").isNotNull())


def z_order_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of the low *bits* of two non-negative
    integer columns — the multi-dimensional layout key behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)``: sorting a table by
    ``z_order_key(host_hash, ts_bucket)`` before write gives min/max
    file statistics that prune on BOTH columns, where a plain sort
    prunes only the leading one.

    Pure unrolled integer bit arithmetic (``2*bits`` masked shifts
    folded into whole-stage codegen — no UDF, and exactly reproducible
    in ANSI SQL), so it composes with ``repartitionByRange`` /
    ``sortWithinPartitions`` at any scale."""
    a = (F.col(a) if isinstance(a, str) else a).cast("long")
    b = (F.col(b) if isinstance(b, str) else b).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(a, i) % 2, 2 * i)
        out = out + F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1)
    return out


def z_order_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton key as an ANSI-SQL expression (DuckDB `>>`
    / `<<` / `%` on BIGINT) — used by the driver oracle."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({a}::BIGINT >> {i}) % 2) << {2 * i})"
        )
        terms.append(
            f"((({b}::BIGINT >> {i}) % 2) << {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"
