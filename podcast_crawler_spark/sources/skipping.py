"""Zone-map file skipping: min/max statistics + scan-set planning.

At 100 TB the fastest scan is the file you never open.  Columnar
formats (parquet footers, Iceberg/Delta manifests) carry per-file
min/max/null-count statistics; a reader with a range predicate opens
only the files whose zone intersects it.  This module materializes
both halves as ordinary DataFrame ops:

- ``file_stats``  — the WRITE-side stats a manifest would persist:
  per-file ``row_count`` plus ``min_/max_/nulls_`` for the requested
  columns.  One groupBy over the file id with map-side partial
  aggregation — the only exchange carries ~files×columns partials,
  never rows.
- ``prune_files`` — the READ-side planner: conjunctive range
  predicates against the stats, ``scan = AND_c (max_c >= lo AND
  min_c <= hi AND some-non-null)``.  Pure map-side expression over the
  (tiny) stats table; a file whose rows are all NULL in a predicated
  column is skipped (a range predicate never matches NULL).

Composes with the layout writers in this package: ``z_order_key``
layouts give zones that are tight in BOTH interleaved dimensions, so
a 2-D rectangle predicate prunes multiplicatively, where a linear
(single-column sort) layout prunes only its leading column — the
driver query ``file_skipping`` demonstrates exactly that on the same
rows under both layouts, and the oracle recomputes every zone and
every decision.

The reference crawler scans its whole Postgres table per query
(`podcast_repository.rs` list/search paths); this is the scale path
that replaces those full scans for range-shaped access.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Range = tuple[Optional[object], Optional[object]]


def file_stats(
    df: DataFrame, file_col: str, stat_cols: Sequence[str]
) -> DataFrame:
    """Per-file zone statistics: ``(file_id, row_count, min_c, max_c,
    nulls_c ...)`` — what a parquet footer / Iceberg manifest records
    at write time.  min/max ignore NULLs (SQL aggregate semantics);
    ``nulls_c`` makes the all-NULL zone distinguishable."""
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)


def _zone_may_match(stats_cols: set, col: str, rng: Range) -> Column:
    lo, hi = rng
    for needed in (f"min_{col}", f"max_{col}", f"nulls_{col}"):
        if needed not in stats_cols:
            raise ValueError(f"no zone stats for column {col!r} ({needed})")
    # a range predicate is NULL-rejecting: a zone with zero non-null
    # values can never contain a match.
    cond = F.col(f"nulls_{col}") < F.col("row_count")
    if lo is not None:
        cond = cond & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}") <= F.lit(hi))
    return cond


def prune_files(stats: DataFrame, ranges: dict[str, Range]) -> DataFrame:
    """Scan-set planning: conjoin per-column zone-overlap tests into a
    ``scan`` boolean on the stats table.  ``ranges`` maps column ->
    ``(lo, hi)`` (either bound may be None for a half-open predicate).
    False negatives are impossible (min/max bound every value in the
    file); false positives just cost a scan — identical contract to
    parquet row-group pruning."""
    cols = set(stats.columns)
    cond = F.lit(True)
    for c, rng in ranges.items():
        cond = cond & _zone_may_match(cols, c, rng)
    return stats.withColumn("scan", cond)
