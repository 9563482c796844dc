"""Mergeable sketch operators: HyperLogLog distinct-count and count-min
heavy hitters.

Spark ships `approx_count_distinct` / `count_min_sketch`, but their
register contents are engine-internal — useless when the pipeline must
persist sketches, merge them across crawl epochs, or verify them against
an independent engine.  These operators materialize the sketch STATE as
ordinary rows (a register table / a counter table), so it can be stored
in the checkpoint tables, merged across batches with a plain groupBy,
and recomputed bit-for-bit by an ANSI-SQL oracle.

Cross-engine exactness is by construction:

- hashes are md5-hex slices converted via base-16 parse (the same trick
  as ``sampling.key_hash32``), never engine-native hash functions;
- the HLL harmonic mean ``sum(2^-reg)`` is computed in scaled *integer*
  arithmetic (``2^(50-reg)`` as BIGINT) so the sum is exact and
  order-independent — a naive double sum is partition-order dependent
  and can't be oracled;
- count-min counters are plain integer counts.

At 100 TB both sketches follow the canonical distributed pattern: a
map-side combine collapses every partition to at most ``m`` (HLL) or
``depth·width`` (CM) rows before the single exchange, so the shuffle is
O(sketch size · partitions), never O(rows).  The sketch tables are tiny
and broadcast-able for probing.

Reference anchor: the reference keeps exact per-epoch counters only
(`src/metrics.rs`); sketches are the scale path for the same metrics
when the frontier hits 10^10 URLs (SURVEY.md §7.3 training-data tier).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

HLL_P_BITS = 8                # 2 hex chars -> m = 256 registers
HLL_M = 1 << HLL_P_BITS
_VALUE_BITS = 60              # 15 hex chars of the md5 after the bucket
_RHO_MAX = _VALUE_BITS + 1    # all-zero value
_HARMONIC_SHIFT = 50          # sum(2^(50-reg)) as exact BIGINT

# alpha_m * m^2 * 2^50 as ONE Python-folded double literal.  Python,
# Spark and DuckDB all evaluate the same left-associated IEEE-double
# expression, so embedding repr() of the Python value into both engines
# guarantees the identical constant.
HLL_ALPHA_SCALED = (
    0.7213 / (1.0 + 1.079 / float(HLL_M))
    * float(HLL_M * HLL_M)
    * float(1 << _HARMONIC_SHIFT)
)


def _hll_register_cols(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) from the md5 of *key*: bucket = first 8 bits, rho =
    1 + leading-zero count of the next 60 bits (61 when they are all
    zero).  ``61 - length(bin(v))`` is the leading-zero identity — both
    Spark's ``bin`` and DuckDB's ``printf('%b',·)`` render without
    leading zeros and render 0 as '0'."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    v = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(v))
    )
    return bucket, rho.cast("long")


def hll_registers(
    df: DataFrame, key_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """The sketch STATE: ``(*group_cols, bucket, reg)`` with one row per
    non-empty register.  ``groupBy(...).max(rho)`` gets a map-side
    partial max, so each task emits <= m rows regardless of input size;
    merging two epochs' sketches is the same groupBy-max over the union
    (HLL registers are a semilattice)."""
    bucket, rho = _hll_register_cols(F.col(key_col))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(regs: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge HLL register tables across epochs/batches: registers are a
    max-semilattice, so the union sketch is ``groupBy(bucket).max(reg)``
    over the stacked per-epoch states — the property that makes the
    O(m)-row sketch the 10^10-scale path for cross-epoch distinct
    counts (persist each crawl epoch's registers in the checkpoint
    metrics table, merge on read; never re-scan history)."""
    return regs.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Estimate stage over a register table (from :func:`hll_registers`
    or :func:`hll_merge`): exact-integer harmonic sum, linear-counting
    correction, 4-dp rounding — identical math to what the DuckDB
    oracles replay.  Output: ``(*group_cols, n_zero_regs,
    harmonic_scaled, hll_estimate)``."""
    group = list(group_cols)
    # pyspark's F.shiftleft only takes a literal shift amount — the
    # column-exponent form goes through the SQL function directly
    per_reg_term = F.when(
        F.col("reg") <= _HARMONIC_SHIFT,
        F.expr(f"shiftleft(1L, {_HARMONIC_SHIFT} - reg)"),
    ).otherwise(F.lit(0).cast("long"))
    sketch = regs.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(per_reg_term).alias("harmonic_present"),
    )
    n_zero = (F.lit(HLL_M) - F.col("n_buckets")).cast("long")
    harmonic = (
        F.col("harmonic_present")
        + n_zero * F.lit(1 << _HARMONIC_SHIFT).cast("long")
    ).cast("long")
    raw_est = F.lit(HLL_ALPHA_SCALED) / harmonic
    lin_est = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_zero)
    est = F.round(
        F.when((n_zero > 0) & (raw_est <= 2.5 * HLL_M), lin_est).otherwise(
            raw_est
        ),
        4,
    )
    return sketch.select(
        *group,
        n_zero.alias("n_zero_regs"),
        harmonic.alias("harmonic_scaled"),
        est.alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate with the exact count
    alongside (the exact side is the audit column; at 10^10 keys a user
    drops it and keeps only the O(m)-state estimate).

    Output: ``(*group_cols, n_exact, n_zero_regs, harmonic_scaled,
    hll_estimate, rel_err)``.  ``harmonic_scaled`` is the exact integer
    ``sum(2^(50-reg))`` over all m registers (absent buckets count as
    reg=0 -> 2^50), capped at reg=50 (rho>50 needs ~2^50 keys per
    bucket; the dropped term is below double precision anyway).  The
    estimate applies the standard small-range linear-counting
    correction when raw <= 2.5m and zero registers remain.
    """
    group = list(group_cols)
    regs = hll_registers(df, key_col, group)
    sketch = hll_estimate_from_registers(regs, group)
    exact = df.groupBy(*group).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    # both sides are one row per group — a broadcast-able reconciliation
    # join, never a corpus shuffle
    joined = (
        sketch.join(F.broadcast(exact), on=group)
        if group
        else sketch.crossJoin(F.broadcast(exact))
    )
    return joined.select(
        *group,
        "n_exact",
        "n_zero_regs",
        "harmonic_scaled",
        "hll_estimate",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters
# --------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_col(token: Column, row: int, width: int) -> Column:
    """Counter column for salt row *row*: first 20 md5 bits of the
    salted token, mod width.  Salt 'r<row>:' keeps the d hash functions
    pairwise independent enough for the CM guarantee."""
    h = F.md5(F.concat(F.lit(f"r{row}:"), token))
    return (
        F.conv(F.substring(h, 1, 5), 16, 10).cast("long") % width
    ).alias("col")


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    tok = F.explode(F.split(F.col(text_col), " ")).alias("token")
    return df.select(tok).filter(F.length("token") > 0)


def cm_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """The counter table ``(row, col, c)`` — at most depth*width rows.
    The groupBy count gets a map-side combine, so each task contributes
    <= depth*width partial rows to the single exchange; sketches from
    two batches merge by summing counters (groupBy row,col sum(c))."""
    toks = _tokens(df, text_col)
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cm_col(F.col("token"), r, width),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row", "cell.col")
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("c"))


def cm_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Top-k tokens by exact count, with the count-min estimate
    alongside: ``(token, n_exact, cm_est, overcount)``.

    ``cm_est >= n_exact`` always (count-min never undercounts), so
    ``overcount`` is the per-token audit of the sketch's collision
    error.  The exact side is a token groupBy (map-side combine) with a
    TakeOrderedAndProject top-k — no global sort; the probe joins the
    candidates against the BROADCAST counter table (<= depth*width
    rows), so nothing corpus-sized crosses a join boundary.
    """
    toks = _tokens(df, text_col)
    sketch = cm_sketch(df, text_col, depth, width)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), F.asc("token")).limit(k)
    probes = topk.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cm_col(F.col("token"), r, width),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("token", "n_exact", "cell.row", "cell.col")
    est = (
        probes.join(F.broadcast(sketch), on=["row", "col"])
        .groupBy("token")
        .agg(F.max("n_exact").alias("n_exact"), F.min("c").alias("cm_est"))
    )
    return est.select(
        "token",
        "n_exact",
        "cm_est",
        (F.col("cm_est") - F.col("n_exact")).alias("overcount"),
    )


# --------------------------------------------------------------------------
# Mergeable fixed-bin histogram + quantile estimation
# --------------------------------------------------------------------------

HIST_BINS = 64


def histogram_bins(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """The sketch STATE: ``(bin, c)`` integer counts over fixed bins of
    ``[lo, hi]`` (values clamped to the edge bins).  Like the HLL
    register table: map-side combine collapses every partition to
    <= n_bins rows before the single exchange, and two epochs' sketches
    merge by summing counts."""
    width = (hi - lo) / float(n_bins)
    v = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("long"),
        ),
    )
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile estimates from the mergeable histogram: for each q the
    bin holding the ceil(q·N)-th value, linearly interpolated within
    the bin.  Output ``(q, k, bin, cum_before, bin_count, est)`` — all
    integers except ``est`` (one fixed-order double expression, rounded
    to 6 dp), so the DuckDB oracle recomputes every row.

    This is the bounded-state alternative to the exact
    ``percentile``/``quantile_cont`` (see ``stats_median``): exact
    percentiles sort each group; this is O(n_bins) state per group and
    mergeable across epochs/partitions — the 10^10-row path.  ``lo``/
    ``hi`` are caller-supplied plan constants (a prior min/max pass or
    domain knowledge), so the whole derivation is deterministic.
    """
    if not quantiles:
        raise ValueError("histogram_quantiles: empty quantile list")
    width = (hi - lo) / float(n_bins)
    bins = histogram_bins(df, value_col, lo, hi, n_bins)
    # running totals over <= n_bins rows: the window input is the sketch,
    # never the data
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "bin",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("cum_before"),
        F.sum("c").over(w).alias("cum"),
    )
    total = bins.agg(F.sum("c").alias("n"))
    out = None
    for q in quantiles:
        k = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(float(q)) * F.col("n")).cast("long"),
        )
        hit = (
            cum.crossJoin(F.broadcast(total))
            .filter(
                (F.col("cum_before") < k) & (k <= F.col("cum"))
            )
            .select(
                F.lit(float(q)).alias("q"),
                k.alias("k"),
                "bin",
                "cum_before",
                F.col("c").alias("bin_count"),
                F.round(
                    F.lit(lo)
                    + (
                        F.col("bin").cast("double")
                        + (k - F.col("cum_before")).cast("double")
                        / F.col("c").cast("double")
                    )
                    * F.lit(width),
                    6,
                ).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out
