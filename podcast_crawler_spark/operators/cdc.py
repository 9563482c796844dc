"""Generic snapshot diff — the change-data-capture view between two
versions of a keyed table.

`crawl_retry_diff` already time-travels two *frontier* snapshots; this
is the generic operator: given OLD and NEW snapshots and a key, emit
one row per changed key with ``change_type ∈ {insert, delete,
update}`` and the row-content digests on both sides.  It's the
merge-on-read delta chain's audit view (``plans/checkpoint.py`` commits
deltas; this recomputes "what actually changed" between any two
published snapshots — reference anchor: the upsert semantics in
``podcast_repository.rs:178-218``, whose effect this makes queryable).

Scale shape: ONE co-keyed full-outer hash join; each side is first
collapsed map-side to ``(key, 16-byte digest)`` so row width never
crosses the exchange, and unchanged keys are filtered immediately after
the join (at 10^10 rows the output is O(churn), not O(table)).
Determinism: the digest is md5 over the ``|``-joined compare columns
cast to string with an explicit null sentinel — exactly reproducible in
the SQL oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00null\x00"


def _digest(cols: Sequence[str]):
    return F.md5(
        F.concat_ws(
            "|",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
                for c in cols
            ],
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """``(*key_cols, change_type, old_md5, new_md5)`` for every key that
    was inserted, deleted, or updated between *old* and *new*.
    *compare_cols* defaults to all shared non-key columns (sorted by
    name, so the digest layout is stable)."""
    keys = list(key_cols)
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(keys))
    cmp_cols = list(compare_cols)
    o = old.select(*keys, _digest(cmp_cols).alias("old_md5"))
    n = new.select(*keys, _digest(cmp_cols).alias("new_md5"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("old_md5").isNull(), F.lit("insert"))
        .when(F.col("new_md5").isNull(), F.lit("delete"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", "old_md5", "new_md5")
    )
