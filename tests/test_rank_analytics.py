"""episode_rank analytics tier (reference schema.rs:3-21 / 54-75):
ingest gate + derived metrics, per-genre chart, podcast rollup."""

import datetime as dt

from pyspark.sql import functions as F

from podcast_crawler_spark.operators import rank_analytics as ra


def _raw(spark):
    ts = dt.datetime(2024, 3, 1)
    rows = [
        # id, title, podcast_id, name, genre, play, comment, sub,
        # dur, post_time, total
        (1, "a", "p1", "P1", "tech", 1000, 10, 100, 600, ts, 5),
        (2, "b", "p1", "P1", "tech", 500, 50, 100, 700,
         dt.datetime(2024, 5, 25), 5),
        (3, "c", "p2", "P2", "news", 9, 1, 3, 800,
         dt.datetime(2023, 1, 1), 2),
        # invalid: null title / null podcast_id / zero subscription
        (4, None, "p2", "P2", "news", 7, 0, 10, 100, ts, 2),
        (5, "e", None, "P3", "news", 7, 0, 10, 100, ts, 2),
        (6, "f", "p3", "P3", "news", 7, 0, 0, 100, ts, 2),
    ]
    return spark.createDataFrame(
        rows,
        "id long, title string, podcast_id string, podcast_name string,"
        " genre string, play_count long, comment_count long,"
        " subscription long, duration long, post_time timestamp,"
        " total_episodes_count long",
    )


def test_ingest_gate_and_derived_columns(spark):
    out = ra.episode_rank_ingest(_raw(spark)).toPandas().set_index("id")
    # the three invalid rows are dropped
    assert sorted(out.index) == [1, 2, 3]
    # open_rate_ppm = 1e6*play div sub
    assert int(out.loc[1].open_rate_ppm) == 10_000_000
    assert int(out.loc[3].open_rate_ppm) == 3_000_000
    # last_release_day_count vs 2024-06-01
    assert int(out.loc[1].last_release_day_count) == 92
    assert int(out.loc[2].last_release_day_count) == 7
    assert out.loc[1].primary_genre_name == "tech"


def test_top_by_genre_order_and_limit(spark):
    ranked = ra.episode_rank_ingest(_raw(spark))
    top = ra.rank_top_by_genre(ranked, k=1).toPandas()
    by_genre = {r.primary_genre_name: r for r in top.itertuples()}
    assert by_genre["tech"].id == 1  # 1000 plays beats 500
    assert by_genre["news"].id == 3
    assert (top.genre_rank == 1).all()


def test_podcast_rollup_metrics(spark):
    ranked = ra.episode_rank_ingest(_raw(spark))
    roll = (
        ra.podcast_rank_rollup(ranked, active_window_days=90)
        .toPandas().set_index("podcast_id")
    )
    p1 = roll.loc["p1"]
    assert int(p1.track_count) == 2
    assert int(p1.avg_play_count) == 750
    assert int(p1.avg_duration) == 650
    assert int(p1.avg_open_rate_ppm) == 7_500_000
    # only the 2024-05-25 episode is within 90 days of 2024-06-01
    assert int(p1.active_rate_ppm) == 500_000
    assert p1.last_release_date == dt.datetime(2024, 5, 25)
    assert int(roll.loc["p2"].active_rate_ppm) == 0


def test_ingest_is_shuffle_free(spark):
    plan = ra.episode_rank_ingest(_raw(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_rank_momentum_statuses(spark):
    """new / up / down / flat all derived from the lag window; delta
    sign convention: positive = climbed (rank number shrank)."""
    obs = spark.createDataFrame(
        [
            ("a", 0, 10), ("a", 1, 4), ("a", 2, 7), ("a", 3, 7),
            ("b", 2, 50),  # first seen mid-crawl
        ],
        "podcast_id string, epoch long, rank long",
    )
    out = (
        ra.rank_momentum(obs).toPandas()
        .set_index(["podcast_id", "epoch"]).sort_index()
    )
    assert out.loc[("a", 0)].status == "new"
    assert out.loc[("a", 1)].status == "up" and out.loc[("a", 1)].delta == 6
    assert out.loc[("a", 2)].status == "down" and out.loc[("a", 2)].delta == -3
    assert out.loc[("a", 3)].status == "flat" and out.loc[("a", 3)].delta == 0
    assert out.loc[("b", 2)].status == "new"
    import pandas as pd
    assert pd.isna(out.loc[("a", 0)].prev_rank)
