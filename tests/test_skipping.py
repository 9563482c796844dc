"""Zone-map file skipping: stats semantics, null handling, plan shape."""

import pytest
from pyspark.sql import functions as F

from podcast_crawler_spark.sources.skipping import file_stats, prune_files


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "file_id long, a long, b long")
    return file_stats(df, "file_id", ["a", "b"])


def test_stats_and_prune_bounds(spark):
    rows = [
        (0, 1, 10), (0, 5, 20),        # zone a:[1,5] b:[10,20]
        (1, 6, 30), (1, 9, 35),        # zone a:[6,9] b:[30,35]
        (2, 100, 1), (2, 200, 2),      # zone a:[100,200] b:[1,2]
    ]
    out = {
        r.file_id: r
        for r in prune_files(_stats(spark, rows), {"a": (4, 8)}).collect()
    }
    assert out[0].scan and out[1].scan and not out[2].scan
    assert out[0].min_a == 1 and out[0].max_a == 5 and out[0].row_count == 2
    # half-open bounds
    lo_only = {
        r.file_id: r.scan
        for r in prune_files(_stats(spark, rows), {"a": (100, None)}).collect()
    }
    assert lo_only == {0: False, 1: False, 2: True}
    # conjunction across columns: zone 1 passes a but fails b
    both = {
        r.file_id: r.scan
        for r in prune_files(
            _stats(spark, rows), {"a": (4, 8), "b": (10, 25)}
        ).collect()
    }
    assert both == {0: True, 1: False, 2: False}


def test_all_null_zone_skipped(spark):
    # a range predicate never matches NULL: a file whose predicated
    # column is entirely NULL must be skipped even though min/max are
    # NULL (which would otherwise make the overlap test indeterminate).
    df = spark.createDataFrame(
        [(0, None, 1), (0, None, 2), (1, 5, 3)],
        "file_id long, a long, b long",
    )
    out = {
        r.file_id: r.scan
        for r in prune_files(
            file_stats(df, "file_id", ["a"]), {"a": (0, 100)}
        ).collect()
    }
    assert out == {0: False, 1: True}


def test_missing_stats_raise(spark):
    st = _stats(spark, [(0, 1, 1)])
    with pytest.raises(ValueError, match="no zone stats"):
        prune_files(st, {"missing_col": (0, 1)})


def test_stats_plan_partial_agg_and_mapside_prune(spark):
    # stats: one exchange, map-side partial aggregation below it (the
    # exchange carries files x columns partials, never rows); prune:
    # zero additional exchanges, no Python anywhere.
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("file_id"),
        F.col("id").alias("a"),
        (F.col("id") * 3).alias("b"),
    )
    planned = prune_files(file_stats(df, "file_id", ["a", "b"]), {"a": (1, 2)})
    plan = planned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan
    assert "Python" not in plan, plan
