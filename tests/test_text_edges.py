"""Edge cases for the text expression layer (empty/short inputs must
not divide by zero or crash under ANSI mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions import text as TXT


def test_text_functions_on_edge_inputs(spark):
    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, "one two"),
            (5, "one two three"),
            (6, "!!! ??? ..."),
        ],
        ["id", "text"],
    )
    out = df.select(
        "id",
        TXT.token_count("text").alias("ntok"),
        F.size(TXT.word_shingles("text", 3)).alias("nsh"),
        F.round(TXT.punct_ratio("text"), 4).alias("punct"),
        TXT.quality_score("text").alias("q"),
        TXT.lang_guess("text").alias("lang"),
        TXT.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["ntok"] == 0 and by_id[1]["nsh"] == 0
    assert by_id[2]["ntok"] == 0
    assert by_id[3]["nsh"] == 0  # fewer than 3 tokens → no shingles
    assert by_id[4]["nsh"] == 0
    assert by_id[5]["nsh"] == 1
    assert by_id[1]["punct"] == 0.0  # guarded division
    assert by_id[6]["punct"] > 0.5
    assert all(0.0 <= r["q"] <= 1.0 for r in out)
    assert by_id[1]["lang"] == "und"
    # fingerprint of whitespace-only normalizes to fingerprint of ""
    assert by_id[1]["fp"] == by_id[2]["fp"]


def test_vacuum_drops_pre_base_history(spark, tmp_path):
    from data_lake_with_spark_spark.sources.versioned import (
        compact,
        vacuum,
        versioned_append,
        versioned_read,
    )
    import pytest as _pytest

    path = str(tmp_path / "t")
    versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    versioned_append(spark.createDataFrame([(2, "b")], "k long, v string"), path)
    compact(spark, path)
    removed = vacuum(path)
    assert removed == [0, 1]
    assert versioned_read(spark, path).count() == 2  # current intact
    with _pytest.raises(Exception):  # pre-base history is gone
        versioned_read(spark, path, version=0).collect()
