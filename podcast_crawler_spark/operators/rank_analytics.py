"""Rank-analytics tier over the reference's ``episode_rank`` table —
the LAST table of the reference data model without a repo counterpart
(``/root/reference/src/schema.rs:3-21``: per-episode play/comment/
subscription counters + the two derived Float8 columns ``open_rate``
and ``last_release_date_day_count``).  The reference crawler itself
never reads ``episode_rank`` (analytics-only: model definition with no
repository consumer), so these operators define the analytics a user
of that table would actually run: ingest-normalize with the derived
metrics, top-played-per-genre, and the per-podcast rollup that
produces exactly the ``avg_*`` columns of ``podcast_rank``
(``src/schema.rs:54-75``).

Float discipline: the reference types ``open_rate`` / ``active_rate``
as Float8; here every ratio is exact integer ppm (``1e6·a div b``) so
the DuckDB oracle replays bit-for-bit — the same micro-unit convention
as the rest of the package (see ``operators/stats.py``).

Scale shape: ingest is a pure codegen projection (zero exchanges);
top-by-genre is a ``row_number ≤ k`` that plans as ``WindowGroupLimit
Partial`` below the genre exchange (each map task forwards ≤ k rows
per genre); the rollup is ONE map-side-combined aggregate keyed on
podcast_id.  Nothing here ever holds more than O(k·genres) or
O(podcasts) rows per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def episode_rank_ingest(
    raw: DataFrame,
    now_date: str = "2024-06-01",
) -> DataFrame:
    """Normalize a raw episode-rank crawl batch into the
    ``episode_rank`` model shape (``schema.rs:3-21``) with the two
    derived columns computed here instead of upstream:

    - ``open_rate_ppm`` = ``1e6·play_count div subscription`` (the
      integer-exact form of the model's Float8 ``open_rate``);
    - ``last_release_day_count`` = days from ``post_time`` to
      *now_date* (the model's ``last_release_date_day_count``).

    Validation mirrors the ingest gate every rank crawler needs: rows
    with a NULL title, NULL podcast_id, or non-positive subscription
    are dropped (the reference model types all three nullable because
    Postgres does; an analytics row without them is unusable).

    Input columns: ``(id, title, podcast_id, podcast_name, genre,
    play_count, comment_count, subscription, duration, post_time,
    total_episodes_count)``.  Pure projection + filter — zero
    exchanges, embarrassingly parallel.
    """
    return (
        raw.filter(
            F.col("title").isNotNull()
            & F.col("podcast_id").isNotNull()
            & (F.col("subscription") > 0)
        )
        .select(
            F.col("id").cast("long").alias("id"),
            "title",
            "podcast_id",
            "podcast_name",
            F.col("genre").alias("primary_genre_name"),
            F.col("play_count").cast("long").alias("play_count"),
            F.col("comment_count").cast("long").alias("comment_count"),
            F.col("subscription").cast("long").alias("subscription"),
            F.col("duration").cast("long").alias("duration"),
            "post_time",
            F.col("total_episodes_count").cast("long")
            .alias("total_episodes_count"),
            F.expr(
                "1000000 * cast(play_count as bigint)"
                " div cast(subscription as bigint)"
            ).alias("open_rate_ppm"),
            F.datediff(F.lit(now_date).cast("date"),
                       F.col("post_time").cast("date"))
            .cast("long").alias("last_release_day_count"),
        )
    )


def episode_rank_ingest_oracle_sql(
    raw_sql: str, now_date: str = "2024-06-01"
) -> str:
    """DuckDB replay of :func:`episode_rank_ingest` — same filter,
    same integer ppm, same date arithmetic."""
    return f"""
        WITH raw AS ({raw_sql})
        SELECT id::BIGINT AS id, title, podcast_id, podcast_name,
               genre AS primary_genre_name,
               play_count::BIGINT AS play_count,
               comment_count::BIGINT AS comment_count,
               subscription::BIGINT AS subscription,
               duration::BIGINT AS duration,
               post_time,
               total_episodes_count::BIGINT AS total_episodes_count,
               (1000000 * play_count::BIGINT // subscription::BIGINT)
                   ::BIGINT AS open_rate_ppm,
               datediff('day', post_time::DATE, DATE '{now_date}')
                   ::BIGINT AS last_release_day_count
        FROM raw
        WHERE title IS NOT NULL AND podcast_id IS NOT NULL
          AND subscription > 0
    """


def rank_top_by_genre(rank: DataFrame, k: int = 3) -> DataFrame:
    """Top-*k* episodes per genre by play count — the chart query the
    ``episode_rank`` table exists to serve.  Ties break (play desc,
    comment desc, id asc) so the output set is deterministic.

    Plan shape: ``row_number ≤ k`` plans as ``WindowGroupLimit
    Partial`` below the genre exchange — the shuffle carries
    O(tasks·genres·k) rows, never the table.
    """
    w = Window.partitionBy("primary_genre_name").orderBy(
        F.desc("play_count"), F.desc("comment_count"), F.asc("id")
    )
    return (
        rank.withColumn("genre_rank", F.row_number().over(w))
        .filter(F.col("genre_rank") <= int(k))
        .select(
            "primary_genre_name",
            F.col("genre_rank").cast("long").alias("genre_rank"),
            "id", "title", "podcast_name", "play_count",
            "comment_count", "open_rate_ppm",
        )
    )


def rank_top_by_genre_oracle_sql(rank_sql: str, k: int = 3) -> str:
    """DuckDB replay of :func:`rank_top_by_genre`."""
    return f"""
        WITH r AS ({rank_sql}),
        t AS (
          SELECT *, row_number() OVER (
              PARTITION BY primary_genre_name
              ORDER BY play_count DESC, comment_count DESC, id ASC
          )::BIGINT AS genre_rank
          FROM r
        )
        SELECT primary_genre_name, genre_rank, id, title, podcast_name,
               play_count, comment_count, open_rate_ppm
        FROM t WHERE genre_rank <= {int(k)}
    """


def podcast_rank_rollup(
    rank: DataFrame, active_window_days: int = 90
) -> DataFrame:
    """Roll ``episode_rank`` rows up to the ``podcast_rank`` metric
    columns (``schema.rs:54-75``): per podcast —

    - ``track_count`` (episodes seen), ``last_release_date`` (max
      post_time), ``avg_duration`` / ``avg_play_count`` /
      ``avg_comment_count`` (integer div, matching the reference's
      Int4 typing of the averages),
    - ``avg_open_rate_ppm`` — mean of the per-episode ppm rates,
    - ``active_rate_ppm`` — fraction of episodes whose
      ``last_release_day_count`` ≤ *active_window_days* (the model's
      Float8 ``active_rate``, integer-exact).

    ONE aggregate keyed on podcast_id, map-side combined — partitions
    collapse to O(podcasts) rows before the exchange.
    """
    active = (
        F.col("last_release_day_count") <= int(active_window_days)
    ).cast("long")
    agg = rank.groupBy("podcast_id", "podcast_name").agg(
        F.count(F.lit(1)).alias("track_count"),
        F.max("post_time").alias("last_release_date"),
        F.sum("duration").alias("_dur"),
        F.sum("play_count").alias("_play"),
        F.sum("comment_count").alias("_comment"),
        F.sum("open_rate_ppm").alias("_open"),
        F.sum(active).alias("_active"),
    )
    n = F.col("track_count")
    return agg.select(
        "podcast_id",
        "podcast_name",
        n.cast("long").alias("track_count"),
        "last_release_date",
        F.expr("_dur div track_count").alias("avg_duration"),
        F.expr("_play div track_count").alias("avg_play_count"),
        F.expr("_comment div track_count").alias("avg_comment_count"),
        F.expr("_open div track_count").alias("avg_open_rate_ppm"),
        F.expr("1000000 * _active div track_count")
        .alias("active_rate_ppm"),
    )


def podcast_rank_rollup_oracle_sql(
    rank_sql: str, active_window_days: int = 90
) -> str:
    """DuckDB replay of :func:`podcast_rank_rollup`."""
    return f"""
        WITH r AS ({rank_sql})
        SELECT podcast_id, podcast_name,
               count(*)::BIGINT AS track_count,
               max(post_time) AS last_release_date,
               (sum(duration) // count(*))::BIGINT AS avg_duration,
               (sum(play_count) // count(*))::BIGINT AS avg_play_count,
               (sum(comment_count) // count(*))::BIGINT
                   AS avg_comment_count,
               (sum(open_rate_ppm) // count(*))::BIGINT
                   AS avg_open_rate_ppm,
               (1000000 * sum(
                   CASE WHEN last_release_day_count
                            <= {int(active_window_days)}
                        THEN 1 ELSE 0 END)::BIGINT
                // count(*))::BIGINT AS active_rate_ppm
        FROM r
        GROUP BY podcast_id, podcast_name
    """


def rank_momentum(obs: DataFrame) -> DataFrame:
    """Epoch-over-epoch chart movement — the trend view the reference's
    rank columns exist to feed (``podcast_rank.rank``,
    ``schema.rs:54-75``: the crawler re-scrapes the chart every run;
    what a consumer wants is who moved): per (podcast_id, epoch) —
    ``prev_rank`` (the podcast's rank at its previous OBSERVED epoch),
    ``delta`` (positive = climbed, rank numbers shrink upward) and
    ``status`` ∈ ``new`` (first observation) / ``up`` / ``down`` /
    ``flat``.

    Input: ``(podcast_id, epoch, rank)`` observations.  One window
    keyed on podcast_id over per-epoch rows — a podcast has O(epochs)
    rows, so window tasks are bounded; the only exchange is the
    podcast_id hash partitioning.
    """
    w = Window.partitionBy("podcast_id").orderBy("epoch")
    return (
        obs.select(
            "podcast_id",
            F.col("epoch").cast("long").alias("epoch"),
            F.col("rank").cast("long").alias("rank"),
        )
        .withColumn("prev_rank", F.lag("rank").over(w))
        .select(
            "podcast_id",
            "epoch",
            "rank",
            "prev_rank",
            (F.col("prev_rank") - F.col("rank")).alias("delta"),
            F.when(F.col("prev_rank").isNull(), F.lit("new"))
            .when(F.col("prev_rank") > F.col("rank"), F.lit("up"))
            .when(F.col("prev_rank") < F.col("rank"), F.lit("down"))
            .otherwise(F.lit("flat"))
            .alias("status"),
        )
    )


def rank_momentum_oracle_sql(obs_sql: str) -> str:
    """DuckDB replay of :func:`rank_momentum`."""
    return f"""
        WITH o AS ({obs_sql}),
        l AS (
          SELECT podcast_id, epoch::BIGINT AS epoch, rank::BIGINT AS rank,
                 lag(rank::BIGINT) OVER (
                     PARTITION BY podcast_id ORDER BY epoch
                 ) AS prev_rank
          FROM o
        )
        SELECT podcast_id, epoch, rank, prev_rank,
               (prev_rank - rank)::BIGINT AS delta,
               CASE WHEN prev_rank IS NULL THEN 'new'
                    WHEN prev_rank > rank THEN 'up'
                    WHEN prev_rank < rank THEN 'down'
                    ELSE 'flat' END AS status
        FROM l
    """
