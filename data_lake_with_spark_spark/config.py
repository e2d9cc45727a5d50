"""Typed storage configuration — the rebuild of the reference's
``dl.cfg`` surface (reference ``etl.py:15-20``: configparser-loaded
credentials; ``etl.py:305-306``: hardcoded s3a input/output roots).

A :class:`LakeConfig` maps the two logical roots the engine needs —
where source feeds live, where the lake writes — to physical URIs
(local paths, ``s3a://``, ``abfs://``, anything Spark's Hadoop
filesystem layer resolves), plus optional Spark/Hadoop conf entries
(e.g. ``spark.hadoop.fs.s3a.access.key``) applied at session level.
``run_etl_from_config`` and ``catalog.load_table`` then target any
store unchanged: the engine never hardcodes a scheme.

Precedence: explicit env vars > config file > defaults. The file
format is INI (what the reference used)::

    [paths]
    input_root = s3a://my-bucket/raw
    output_root = s3a://my-bucket/lake

    [spark]
    spark.hadoop.fs.s3a.endpoint = http://minio:9000
"""

from __future__ import annotations

import configparser
import os
from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

ENV_INPUT_ROOT = "DATA_LAKE_INPUT_ROOT"
ENV_OUTPUT_ROOT = "DATA_LAKE_OUTPUT_ROOT"
ENV_CONFIG_FILE = "DATA_LAKE_CONFIG"


@dataclass(frozen=True)
class LakeConfig:
    """Physical locations for the lake's logical roots."""

    input_root: str
    output_root: str
    spark_conf: Mapping[str, str] = field(default_factory=dict)

    def input_uri(self, relative: str) -> str:
        return f"{self.input_root.rstrip('/')}/{relative.lstrip('/')}"

    def table_uri(self, table: str) -> str:
        """Physical URI of a lake (output) table."""
        return f"{self.output_root.rstrip('/')}/{table.lstrip('/')}"


def load_lake_config(
    path: str | None = None, env: Mapping[str, str] = os.environ
) -> LakeConfig:
    """Build a LakeConfig from an INI file and/or environment.

    ``path`` defaults to ``$DATA_LAKE_CONFIG`` when set. Roots given
    via ``$DATA_LAKE_INPUT_ROOT`` / ``$DATA_LAKE_OUTPUT_ROOT`` override
    the file. Raises if neither source provides a root — an engine
    pointed nowhere is a config error, not a default."""
    file_paths: dict[str, str] = {}
    spark_conf: dict[str, str] = {}
    cfg_path = path or env.get(ENV_CONFIG_FILE)
    if cfg_path:
        parser = configparser.ConfigParser()
        # preserve case of Spark conf keys (ConfigParser lowercases by default)
        parser.optionxform = str
        if not parser.read(cfg_path):
            raise FileNotFoundError(f"lake config file not readable: {cfg_path}")
        if parser.has_section("paths"):
            file_paths = dict(parser.items("paths"))
        if parser.has_section("spark"):
            spark_conf = dict(parser.items("spark"))
    input_root = env.get(ENV_INPUT_ROOT) or file_paths.get("input_root")
    output_root = env.get(ENV_OUTPUT_ROOT) or file_paths.get("output_root")
    if not input_root or not output_root:
        raise ValueError(
            "lake config needs input_root and output_root "
            f"(file [paths] section or ${ENV_INPUT_ROOT}/${ENV_OUTPUT_ROOT})"
        )
    return LakeConfig(input_root, output_root, spark_conf)


def apply_spark_conf(spark: SparkSession, config: LakeConfig) -> SparkSession:
    """Apply the config's Spark/Hadoop entries to a live session.

    Filesystem conf (``spark.hadoop.*``) is runtime-settable through
    the Hadoop configuration even where ``spark.conf.set`` would
    reject a static key."""
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    for k, v in config.spark_conf.items():
        if k.startswith("spark.hadoop."):
            hadoop_conf.set(k[len("spark.hadoop.") :], v)
        else:
            spark.conf.set(k, v)
    return spark
