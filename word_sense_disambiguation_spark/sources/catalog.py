"""Catalog helpers: driver testdata parquet + synthetic world materialization.

The sandbox image has no Iceberg jars, so the "Iceberg-style" contract
(atomic per-stage commits, snapshot manifests, resume) is provided by
:mod:`word_sense_disambiguation_spark.plans.checkpoint` over plain parquet —
the table *layout* and commit protocol are ours, the file format is parquet.
On a real cluster, swap ``write_table``/``read_table`` for
``df.writeTo(...).append()`` on an Iceberg catalog; nothing upstream changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
