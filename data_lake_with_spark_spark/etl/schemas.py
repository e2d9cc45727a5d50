"""Explicit source schemas.

The reference DECLARED a song schema but accidentally read with
inference (its schema-armed read is commented out — reference
``etl.py:75-86,95-96``, SURVEY §2.9 B7). Here explicit schemas are the
only path: no inference job, no type drift.
"""

from pyspark.sql import types as T

# Song feed — field-for-field the reference's SongSchema
# (reference etl.py:75-86).
SONG_SCHEMA = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), True),
        T.StructField("artist_latitude", T.DoubleType(), True),
        T.StructField("artist_location", T.StringType(), True),
        T.StructField("artist_longitude", T.DoubleType(), True),
        T.StructField("artist_name", T.StringType(), True),
        T.StructField("duration", T.DoubleType(), True),
        T.StructField("num_songs", T.IntegerType(), True),
        T.StructField("song_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
    ]
)

# Log feed — the 11 columns the reference projects from the event log
# (reference etl.py:175-176), declared instead of inferred
# (reference etl.py:170 inferred).
LOG_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType(), True),
        T.StructField("firstName", T.StringType(), True),
        T.StructField("lastName", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("song", T.StringType(), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("sessionId", T.LongType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("userAgent", T.StringType(), True),
        T.StructField("page", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch millis
    ]
)
