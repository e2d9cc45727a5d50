"""End-to-end ETL from actual JSON feeds (the reference's real input
shape, S1/S2 + the full pipeline): write song/log JSON files, read them
schema-armed, run the incremental load twice."""

from __future__ import annotations

import json

from data_lake_with_spark_spark.etl import LOG_SCHEMA, SONG_SCHEMA, run_etl
from data_lake_with_spark_spark.sources import read_json

SONGS = [
    {"artist_id": "A1", "artist_name": "Artist One", "artist_location": "LA",
     "artist_latitude": 35.0, "artist_longitude": -118.0, "duration": 200.5,
     "num_songs": 1, "song_id": "S1", "title": "Song One", "year": 2001},
    {"artist_id": "A2", "artist_name": "Artist Two", "duration": 120.0,
     "num_songs": 1, "song_id": "S2", "title": "Song Two", "year": 0},
]

LOGS = [
    {"userId": "u1", "firstName": "Ann", "lastName": "Lee", "gender": "F",
     "level": "paid", "song": "Song One", "artist": "Artist One",
     "sessionId": 7, "location": "LA", "userAgent": "UA", "page": "NextSong",
     "ts": 1541000000000},
    {"userId": "u1", "firstName": "Ann", "lastName": "Lee", "gender": "F",
     "level": "paid", "song": None, "artist": None, "sessionId": 7,
     "location": "LA", "userAgent": "UA", "page": "Home", "ts": 1541000100000},
]


def test_etl_from_json_feeds_twice(spark, tmp_path):
    song_dir = tmp_path / "song_data"
    log_dir = tmp_path / "log_data"
    song_dir.mkdir(), log_dir.mkdir()
    (song_dir / "a.json").write_text("\n".join(json.dumps(r) for r in SONGS))
    (log_dir / "b.json").write_text("\n".join(json.dumps(r) for r in LOGS))

    song_df = read_json(spark, str(song_dir), SONG_SCHEMA)
    log_df = read_json(spark, str(log_dir), LOG_SCHEMA)
    out = str(tmp_path / "lake")
    r1 = run_etl(spark, song_df, log_df, out)
    assert (r1.songs, r1.artists, r1.users, r1.time, r1.songplays) == (2, 2, 1, 1, 1)
    r2 = run_etl(spark, song_df, log_df, out)
    assert (r2.songs, r2.artists, r2.users, r2.time, r2.songplays) == (0, 0, 0, 0, 0)
    plays = spark.read.parquet(f"{out}/songplays")
    row = plays.collect()[0]
    assert row["song_id"] == "S1" and row["artist_id"] == "A1"
