"""The reference's ETL surface (Sparkify star-schema data lake),
rebuilt with *intended* semantics — reference bugs (SURVEY §2.9) are
fixed, not ported: left-anti upserts that actually dedup, explicit
schemas that are actually used, builtin time functions instead of the
row-at-a-time Python UDF."""

from data_lake_with_spark_spark.etl.schemas import LOG_SCHEMA, SONG_SCHEMA
from data_lake_with_spark_spark.etl.song_pipeline import build_artists, build_songs
from data_lake_with_spark_spark.etl.log_pipeline import (
    build_songplays,
    build_time_dim,
    build_users,
    prepare_log_events,
)
from data_lake_with_spark_spark.etl.pipeline import run_etl, run_etl_from_config

__all__ = [
    "run_etl_from_config",
    "LOG_SCHEMA",
    "SONG_SCHEMA",
    "build_artists",
    "build_songs",
    "build_songplays",
    "build_time_dim",
    "build_users",
    "prepare_log_events",
    "run_etl",
]
