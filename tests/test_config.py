"""Config surface for external storage (the reference's dl.cfg intent,
reference etl.py:15-20,305-306): logical roots → physical URIs, with a
local directory standing in for a bucket."""

from __future__ import annotations

import json

import pytest

from data_lake_with_spark_spark.config import (
    ENV_INPUT_ROOT,
    ENV_OUTPUT_ROOT,
    LakeConfig,
    load_lake_config,
)
from data_lake_with_spark_spark.etl import run_etl_from_config

SONGS = [
    {"artist_id": "A1", "artist_name": "Artist One", "artist_location": "LA",
     "artist_latitude": 35.0, "artist_longitude": -118.0, "duration": 200.5,
     "num_songs": 1, "song_id": "S1", "title": "Song One", "year": 2001},
]

LOGS = [
    {"userId": "u1", "firstName": "Ann", "lastName": "Lee", "gender": "F",
     "level": "paid", "song": "Song One", "artist": "Artist One",
     "sessionId": 7, "location": "LA", "userAgent": "UA", "page": "NextSong",
     "ts": 1541000000000},
]


def test_load_config_file_env_precedence(tmp_path):
    cfg_file = tmp_path / "dl.cfg"
    cfg_file.write_text(
        "[paths]\n"
        "input_root = /from/file/in\n"
        "output_root = /from/file/out\n"
        "[spark]\n"
        "spark.hadoop.fs.s3a.endpoint = http://example:9000\n"
    )
    # file only
    cfg = load_lake_config(str(cfg_file), env={})
    assert cfg.input_root == "/from/file/in"
    assert cfg.spark_conf == {"spark.hadoop.fs.s3a.endpoint": "http://example:9000"}
    # env overrides file
    cfg2 = load_lake_config(str(cfg_file), env={ENV_INPUT_ROOT: "/env/in"})
    assert cfg2.input_root == "/env/in"
    assert cfg2.output_root == "/from/file/out"
    # no roots anywhere → explicit error
    with pytest.raises(ValueError, match="input_root"):
        load_lake_config(None, env={})
    # URIs compose without double slashes
    assert cfg.table_uri("songs") == "/from/file/out/songs"
    assert cfg.input_uri("song_data") == "/from/file/in/song_data"


def test_run_etl_against_configured_root(spark, tmp_path):
    """run_etl targets a configured non-default root unchanged — the
    local 'bucket' directory is only ever reached through LakeConfig."""
    bucket = tmp_path / "bucket"
    (bucket / "raw" / "song_data").mkdir(parents=True)
    (bucket / "raw" / "log_data").mkdir(parents=True)
    (bucket / "raw" / "song_data" / "a.json").write_text(
        "\n".join(json.dumps(r) for r in SONGS)
    )
    (bucket / "raw" / "log_data" / "b.json").write_text(
        "\n".join(json.dumps(r) for r in LOGS)
    )
    cfg_file = tmp_path / "dl.cfg"
    cfg_file.write_text(
        f"[paths]\ninput_root = {bucket}/raw\noutput_root = {bucket}/lake\n"
    )
    cfg = load_lake_config(str(cfg_file), env={})
    r1 = run_etl_from_config(spark, cfg)
    assert (r1.songs, r1.artists, r1.users, r1.time, r1.songplays) == (1, 1, 1, 1, 1)
    # idempotent re-run against the same configured root
    r2 = run_etl_from_config(spark, cfg)
    assert (r2.songs, r2.artists, r2.users, r2.time, r2.songplays) == (0, 0, 0, 0, 0)
    stored = spark.read.parquet(cfg.table_uri("songplays"))
    assert stored.count() == 1


def test_apply_spark_conf_reaches_hadoop_layer(spark):
    from data_lake_with_spark_spark.config import apply_spark_conf

    cfg = LakeConfig(
        "/in", "/out", {"spark.hadoop.fs.s3a.test.marker": "configured"}
    )
    apply_spark_conf(spark, cfg)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    assert hconf.get("fs.s3a.test.marker") == "configured"
