"""Scan-split / shuffle-partition sizing (tuning.py): the wave-alignment
fix for the below-knee scaling gap (round-4 verdict #2). GB-scale
intermediates at Spark's default 128 MB splits yield fewer tasks than the
session has core-waves; these helpers bound split size / pin partition
counts so every stage fills its cores."""

import pytest
from pyspark.sql import functions as F

from osmquadtree_bin_spark.tuning import (
    DEFAULT_SPLIT_BYTES,
    MIN_SPLIT_BYTES,
    input_bytes,
    scan_splits_for,
    shuffle_partitions_for,
    split_bytes,
)

KEY = "spark.sql.files.maxPartitionBytes"


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tuning") / "t")
    # ~10-20 MB across 8 files: big enough that wave-sizing beats the floor
    spark.range(0, 2_000_000, 1, 8).withColumn(
        "pad", F.concat(F.lit("x"), F.col("id").cast("string"))
    ).write.parquet(p)
    return spark.read.parquet(p)


def test_split_bytes_bounded(spark, table):
    assert input_bytes(table) > 0
    sb = split_bytes(table)
    assert MIN_SPLIT_BYTES <= sb <= DEFAULT_SPLIT_BYTES
    # non-file sources can't be sized — default split, wave-bound partitions
    assert split_bytes(spark.range(10)) == DEFAULT_SPLIT_BYTES


def test_scan_splits_scope_and_restore(spark, table):
    before = spark.conf.get(KEY, None)
    outside = table.rdd.getNumPartitions()
    with scan_splits_for(table):
        assert spark.conf.get(KEY) == str(split_bytes(table))
        inside = spark.read.parquet(*{f[5:].rsplit("/", 1)[0]
                                      for f in table.inputFiles()}).rdd.getNumPartitions()
    # conf restored exactly (the apply_diff session-leak lesson)
    assert spark.conf.get(KEY, None) == before
    # the scoped scan gets at least as many (and normally more) splits
    assert inside >= outside


def test_shuffle_partitions_wave_floor(spark, table):
    cores = spark.sparkContext.defaultParallelism
    assert shuffle_partitions_for(table) >= cores * 4
    assert shuffle_partitions_for(spark.range(10)) == cores * 4


def test_shuffle_partitions_byte_bound_dominates_at_scale(spark, table):
    # with a 1-byte target, the byte bound must take over the wave floor
    n = shuffle_partitions_for(table, target_bytes=1024)
    assert n >= input_bytes(table) // 1024
