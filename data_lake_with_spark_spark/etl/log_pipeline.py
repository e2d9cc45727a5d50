"""Log-feed builders: users & time dims + songplays fact (reference
process_log_data, etl.py:159-294)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_log_events(log_df: DataFrame) -> DataFrame:
    """Filter to playback events and derive start_time from epoch-ms.

    Replaces the reference's row-at-a-time Python UDF
    (etl.py:173-177: datetime.fromtimestamp + strftime + cast) with
    the JVM builtin ``timestamp_millis`` — identical semantics under
    UTC session TZ, no Python worker round trip (SURVEY §2.6 F1).
    The NextSong page filter is the canonical project's intent; the
    reference dropped it silently.
    """
    events = log_df
    if "page" in log_df.columns:
        events = events.where(F.col("page") == "NextSong")
    return events.withColumn("start_time", F.timestamp_millis(F.col("ts")))


def build_users(log_df: DataFrame) -> DataFrame:
    """users(userId, firstName, lastName, gender, level) — latest level
    wins per user (deterministic via max ts), fixing the reference's
    arbitrary-row distinct (etl.py:182: a user appearing with both
    'free' and 'paid' yields two rows)."""
    w_latest = (
        log_df.groupBy("userId")
        .agg(F.max_by(F.struct("firstName", "lastName", "gender", "level"), "ts").alias("u"))
    )
    return w_latest.select(
        "userId",
        F.col("u.firstName").alias("firstName"),
        F.col("u.lastName").alias("lastName"),
        F.col("u.gender").alias("gender"),
        F.col("u.level").alias("level"),
    )


def build_time_dim(events: DataFrame) -> DataFrame:
    """time(start_time, hour, day, week, month, year, weekday) —
    distinct timestamps exploded to calendar fields (reference
    etl.py:209-211), including the ``weekday`` the reference's README
    declared but never computed (SURVEY §2.9 B8)."""
    return (
        events.select("start_time")
        .distinct()
        .select(
            "start_time",
            F.hour("start_time").alias("hour"),
            F.dayofmonth("start_time").alias("day"),
            F.weekofyear("start_time").alias("week"),
            F.month("start_time").alias("month"),
            F.year("start_time").alias("year"),
            F.dayofweek("start_time").alias("weekday"),
        )
    )


def build_songplays(events: DataFrame, songs: DataFrame, artists: DataFrame) -> DataFrame:
    """songplays fact: left-outer enrichment of plays with song/artist
    dims, keeping unmatched plays (nulls) — the reference's intent
    (etl.py:244-247). Join condition is (title AND artist_name), not
    title alone (§2.9 B9: title-only produces ambiguous matches).
    Includes (year, month) partition columns (etl.py:246-247)."""
    s = songs.alias("s")
    a = artists.alias("a")
    dim = s.join(a, F.col("s.artist_id") == F.col("a.artist_id")).select(
        F.col("s.song_id").alias("song_id"),
        F.col("s.artist_id").alias("artist_id"),
        F.col("s.title").alias("title"),
        F.col("a.artist_name").alias("artist_name"),
    )
    e = events.alias("e")
    return (
        e.join(
            F.broadcast(dim).alias("d"),
            (F.col("e.song") == F.col("d.title"))
            & (F.col("e.artist") == F.col("d.artist_name")),
            "left_outer",
        )
        .select(
            F.col("e.start_time").alias("start_time"),
            F.col("e.userId").alias("userId"),
            F.col("e.level").alias("level"),
            F.col("d.song_id").alias("song_id"),
            F.col("d.artist_id").alias("artist_id"),
            F.col("e.sessionId").alias("sessionId"),
            F.col("e.location").alias("location"),
            F.col("e.userAgent").alias("userAgent"),
            F.year("e.start_time").alias("year"),
            F.month("e.start_time").alias("month"),
        )
    )
