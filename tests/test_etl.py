"""Unit tests for the rebuilt reference ETL surface (SURVEY §5.2.4):
upsert idempotence (the property the reference intended and broke,
§2.9 B1), surrogate-key continuation (B3), time-dim completeness (B8).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.etl import (
    LOG_SCHEMA,
    SONG_SCHEMA,
    build_songs,
    build_time_dim,
    build_users,
    prepare_log_events,
    run_etl,
)
from data_lake_with_spark_spark.sources.writers import (
    next_surrogate_key_base,
    try_read_existing,
    upsert_parquet,
)

SONG_ROWS = [
    ("A1", 35.0, "LA", -118.0, "Artist One", 200.5, 1, "S1", "Song One", 2001),
    ("A1", 35.0, "LA", -118.0, "Artist One", 180.0, 1, "S2", "Song Two", 2003),
    ("A2", None, "NYC", None, "Artist Two", 120.0, 1, "S3", "Song Three", 0),
    # exact duplicate record → must collapse in the dim
    ("A2", None, "NYC", None, "Artist Two", 120.0, 1, "S3", "Song Three", 0),
]

LOG_ROWS = [
    ("u1", "Ann", "Lee", "F", "free", "Song One", "Artist One", 7, "LA", "UA1", "NextSong", 1_541_000_000_000),
    ("u1", "Ann", "Lee", "F", "paid", "Song Two", "Artist One", 7, "LA", "UA1", "NextSong", 1_541_000_100_000),
    ("u2", "Bob", "Kim", "M", "free", "Unknown Song", "Nobody", 9, "NY", "UA2", "NextSong", 1_541_000_200_000),
    ("u2", "Bob", "Kim", "M", "free", None, None, 9, "NY", "UA2", "Home", 1_541_000_300_000),
]


@pytest.fixture()
def song_df(spark):
    return spark.createDataFrame(SONG_ROWS, SONG_SCHEMA)


@pytest.fixture()
def log_df(spark):
    return spark.createDataFrame(LOG_ROWS, LOG_SCHEMA)


def test_upsert_is_idempotent(spark, song_df, tmp_path):
    path = str(tmp_path / "songs")
    songs = build_songs(song_df)
    n1 = upsert_parquet(spark, songs, path, keys=["song_id"], partition_by=("year",))
    n2 = upsert_parquet(spark, songs, path, keys=["song_id"], partition_by=("year",))
    assert n1 == 3  # S3's duplicate source record collapsed
    assert n2 == 0
    stored = spark.read.parquet(path)
    assert stored.count() == 3
    assert stored.select("song_id").distinct().count() == 3


def test_upsert_appends_only_new_keys(spark, song_df, tmp_path):
    path = str(tmp_path / "songs")
    songs = build_songs(song_df)
    upsert_parquet(spark, songs, path, keys=["song_id"])
    more = spark.createDataFrame(
        [("A9", None, None, None, "Artist Nine", 99.0, 1, "S9", "Song Nine", 2020)],
        SONG_SCHEMA,
    )
    n = upsert_parquet(spark, build_songs(songs.sparkSession.createDataFrame(
        more.collect(), SONG_SCHEMA)), path, keys=["song_id"])
    assert n == 1
    assert spark.read.parquet(path).count() == 4


def test_full_etl_twice_no_duplicates(spark, song_df, log_df, tmp_path):
    out = str(tmp_path / "lake")
    r1 = run_etl(spark, song_df, log_df, out)
    assert (r1.songs, r1.artists, r1.users) == (3, 2, 2)
    assert r1.songplays == 3  # NextSong rows only (Home filtered)
    r2 = run_etl(spark, song_df, log_df, out)
    assert (r2.songs, r2.artists, r2.users, r2.time, r2.songplays) == (0, 0, 0, 0, 0)
    plays = spark.read.parquet(f"{out}/songplays")
    assert plays.count() == 3
    # enrichment: matched play got song/artist ids, unmatched kept with nulls
    matched = plays.where(F.col("song_id").isNotNull())
    assert matched.count() == 2
    # partition columns survived the write
    assert {"year", "month"} <= set(plays.columns)


def test_surrogate_keys_continue_from_existing(spark, song_df, log_df, tmp_path):
    out = str(tmp_path / "lake")
    run_etl(spark, song_df, log_df, out)
    plays = try_read_existing(spark, f"{out}/songplays")
    base = next_surrogate_key_base(plays, "songplays_id")
    assert base == plays.agg(F.max("songplays_id")).first()[0] + 1
    # new batch continues above existing ids (B3 fixed)
    new_log = spark.createDataFrame(
        [("u3", "Cy", "Wu", "M", "paid", "Song One", "Artist One", 11, "SF", "UA3", "NextSong", 1_541_100_000_000)],
        LOG_SCHEMA,
    )
    run_etl(spark, song_df, new_log, out)
    plays2 = spark.read.parquet(f"{out}/songplays")
    assert plays2.count() == 4
    assert plays2.select("songplays_id").distinct().count() == 4


def test_users_latest_level_wins(spark, log_df):
    users = build_users(prepare_log_events(log_df))
    rows = {r["userId"]: r for r in users.collect()}
    assert len(rows) == 2
    assert rows["u1"]["level"] == "paid"  # later ts wins over 'free'


def test_time_dim_has_weekday_and_all_fields(spark, log_df):
    tdim = build_time_dim(prepare_log_events(log_df))
    assert set(tdim.columns) == {"start_time", "hour", "day", "week", "month", "year", "weekday"}
    assert tdim.count() == 3  # distinct NextSong timestamps
    assert tdim.where(F.col("weekday").isNull()).count() == 0


def test_try_read_existing_missing_path(spark, tmp_path):
    assert try_read_existing(spark, str(tmp_path / "nope")) is None
