"""Song-feed dimension builders (reference process_song_data,
etl.py:62-156)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def build_songs(song_df: DataFrame) -> DataFrame:
    """songs(song_id, title, artist_id, year, duration) — projection +
    distinct (reference etl.py:102). Partition advice for the sink:
    (year) only — the reference's (year, artist_id) (etl.py:125)
    explodes directory counts at scale (SURVEY §4.3)."""
    return song_df.select("song_id", "title", "artist_id", "year", "duration").distinct()


def build_artists(song_df: DataFrame) -> DataFrame:
    """artists(artist_id, artist_name, artist_location, artist_latitude,
    artist_longitude) (reference etl.py:132)."""
    return song_df.select(
        "artist_id",
        "artist_name",
        "artist_location",
        "artist_latitude",
        "artist_longitude",
    ).distinct()
