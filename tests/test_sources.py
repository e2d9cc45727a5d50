"""Source/sink coverage: schema-armed JSON/CSV reads (SURVEY §2.1
S1/S2 — the reads the reference intended) and partitioned writes with
partition pruning on re-read (S4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_lake_with_spark_spark.etl.schemas import SONG_SCHEMA
from data_lake_with_spark_spark.sources import read_csv, read_json, write_partitioned

ROWS = [
    {"artist_id": "A1", "artist_name": "One", "duration": 10.5, "num_songs": 1,
     "song_id": "S1", "title": "T1", "year": 2001},
    {"artist_id": "A2", "artist_name": "Two", "duration": 20.5, "num_songs": 1,
     "song_id": "S2", "title": "T2", "year": 2002},
]


def test_read_json_with_explicit_schema(spark, tmp_path):
    p = tmp_path / "feed"
    p.mkdir()
    (p / "a.json").write_text("\n".join(json.dumps(r) for r in ROWS))
    df = read_json(spark, str(p), SONG_SCHEMA)
    assert df.schema == SONG_SCHEMA  # declared, not inferred
    got = {r["song_id"]: r for r in df.collect()}
    assert got["S1"]["duration"] == 10.5
    assert got["S2"]["artist_latitude"] is None  # missing field → null, no crash


def test_read_json_path_list(spark, tmp_path):
    paths = []
    for i, row in enumerate(ROWS):
        f = tmp_path / f"part{i}.json"
        f.write_text(json.dumps(row))
        paths.append(str(f))
    df = read_json(spark, paths, SONG_SCHEMA)
    assert df.count() == 2


def test_read_csv_with_schema(spark, tmp_path):
    f = tmp_path / "c.csv"
    f.write_text("song_id,title,year\nS1,T1,2001\nS2,T2,2002\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("song_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("year", T.IntegerType()),
        ]
    )
    df = read_csv(spark, str(f), schema)
    assert [r["year"] for r in df.orderBy("song_id").collect()] == [2001, 2002]


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/scan: values survive a round trip and a filtered
    re-read pushes the predicate into the ORC scan."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.sources import read_orc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    want = orders.agg(F.sum("o_orderkey").alias("s")).first()["s"]
    assert back.agg(F.sum("o_orderkey").alias("s")).first()["s"] == want
    plan = (
        back.where(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:120]


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    """JSON-lines round trip with declared schema (no inference)."""
    import json as _json

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.sources import read_jsonl
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").limit(50)
    f = tmp_path / "docs.jsonl"
    f.write_text(
        "\n".join(_json.dumps(r.asDict()) for r in docs.collect()) + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = read_jsonl(spark, str(f), schema)
    assert back.schema == schema
    assert back.count() == 50
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    from data_lake_with_spark_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, partition_by=("order_year",), mode="overwrite")
    back = spark.read.parquet(out).where(F.col("order_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PartitionFilters: [isnotnull(order_year" in plan.replace("#", "order_year#") or "order_year" in (
        [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    )
    assert back.count() == orders.where(F.col("order_year") == 1995).count()


def test_write_with_metrics_single_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources.writers import write_with_metrics

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "observed")
    got = write_with_metrics(
        df,
        path,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.col("v").isNull().cast("long")),
            "max_id": F.max("id"),
        },
    )
    assert got == {"n_rows": 1000, "n_null_v": 100, "max_id": 999}
    # the write itself is intact and re-readable
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.where(F.col("v").isNull()).count() == 100


def test_python_datasource_reads_partitioned_and_pruned(spark):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import pydatasource as PDS

    PDS.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 200)
        .option("partitions", 5)
        .load()
    )
    assert df.columns == ["doc_id", "text", "lang"]
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 5
    # rows are the documented pure function of doc_id
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in df.where(F.col("doc_id") < 5).collect()}
    for i in range(5):
        _, text, lang = PDS.synth_row(i)
        assert got[i] == (text, lang)


def test_python_datasource_filter_pushdown_prunes_generation(spark):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import pydatasource as PDS

    PDS.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 1000)
        .option("partitions", 4)
        .load()
        .where((F.col("doc_id") >= 100) & (F.col("doc_id") < 110))
    )
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(100, 110))
    # the range reached the reader: the post-scan Filter keeps only the
    # isnotnull guard — the >= / < comparisons were absorbed by
    # pushFilters, so rows outside [100, 110) are never generated
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan synthetic_docs" in plan
    assert ">= 100" not in plan and "< 110" not in plan


def test_write_rebalanced_collapses_small_files(spark, tmp_path):
    """REBALANCE-before-write (optimizeWrite analog): a many-partition
    skewed frame writes few, evenly-sized files per hive dir instead of
    one file per task per value."""
    import glob

    from data_lake_with_spark_spark.sources.writers import (
        write_partitioned,
        write_rebalanced,
    )

    df = (
        spark.range(0, 20_000)
        .selectExpr("id", "CAST(id % 3 AS STRING) AS day")
        .repartition(32)  # simulates an upstream shuffled stage
    )
    naive = str(tmp_path / "naive")
    write_partitioned(df, naive, ("day",), mode="overwrite")
    n_naive = len(glob.glob(f"{naive}/day=*/*.parquet"))

    opt = str(tmp_path / "opt")
    write_rebalanced(df, opt, ("day",), mode="overwrite")
    n_opt = len(glob.glob(f"{opt}/day=*/*.parquet"))

    assert n_opt < n_naive, (n_opt, n_naive)
    assert n_opt <= 6  # few files across 3 hive dirs, not 32×3
    # identical content
    a = spark.read.parquet(naive).orderBy("id").collect()
    b = spark.read.parquet(opt).orderBy("id").collect()
    assert a == b


def test_versioned_partition_evolution(spark, tmp_path):
    """Partition-spec evolution (Iceberg-style): each version dir owns
    its own layout — v0 flat, v1 hive-partitioned — and reads merge
    transparently; the partition column survives as a normal column."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "pevo")
    flat = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    V.versioned_append(flat, path)  # v0: unpartitioned
    nxt = spark.range(100, 200).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    V.versioned_append(nxt, path, partition_by=("bucket",))  # v1: hive layout
    now = V.versioned_read(spark, path)
    assert now.count() == 200
    assert set(now.columns) == {"k", "bucket"}
    # both layouts contribute; values round-trip identically
    got = {r["k"]: r["bucket"] for r in now.collect()}
    assert got[5] == "1" and got[150] == "2"
    # time travel to the flat era
    assert V.versioned_read(spark, path, version=0).count() == 100


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Writer half of the Python DataSource seam: append + overwrite
    with manifest accounting, round-trip fidelity, and no visible
    output without a commit."""
    import glob
    import json
    import os

    from data_lake_with_spark_spark.sources import pydatasource as PDS

    PDS.register(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).selectExpr("id", "CAST(id % 7 AS STRING) AS tag")
    df.repartition(4).write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == 100
    assert len(manifest["files"]) == 4
    # no staged garbage; files listed = files present
    assert not glob.glob(f"{out}/_tmp-*")
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/part-*.jsonl"))
    assert parts == sorted(f["file"] for f in manifest["files"])
    back = spark.read.json(f"{out}/part-*.jsonl")
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))

    # append accumulates and renumbers past existing parts
    df.limit(10).repartition(1).write.format("jsonl_sink").option(
        "path", out
    ).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == 110 and len(manifest["files"]) == 5

    # overwrite replaces everything
    df.limit(3).repartition(1).write.format("jsonl_sink").option(
        "path", out
    ).mode("overwrite").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == 3 and len(manifest["files"]) == 1
    assert len(glob.glob(f"{out}/part-*.jsonl")) == 1


def test_jsonl_sink_failed_job_leaves_no_output(spark, tmp_path):
    import glob
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import pydatasource as PDS

    PDS.register(spark)
    out = str(tmp_path / "sink_fail")

    @F.udf("long")
    def boom(x):
        raise RuntimeError("injected task failure")

    bad = spark.range(0, 10).select(boom("id").alias("id"))
    with _pytest.raises(Exception):
        bad.write.format("jsonl_sink").option("path", out).mode("append").save()
    # aborted job: no manifest, no committed parts
    assert not os.path.isfile(os.path.join(out, "_MANIFEST.json"))
    assert not glob.glob(f"{out}/part-*.jsonl")
