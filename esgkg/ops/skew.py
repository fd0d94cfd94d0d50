"""Skew-handling utilities (SURVEY.md §4): explicit salting for hot keys.

AQE's skew-join splitting covers joins, but a skewed ``groupBy`` still
funnels a hot key into one reducer. ``salted_agg`` is the standard two-phase
fix: spray each key over `salt` sub-keys (partial aggregate per sub-key),
then combine the partials — same result, bounded per-task input.

Used for hub surfaces in LSH bucket counting and hub vertices in degree
aggregation when key skew exceeds what a map-side partial aggregate absorbs
(extremely hot keys with high-cardinality payloads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_cols: list[str],
                 salt: int = 16) -> DataFrame:
    """groupBy(key).count() with two-phase salting: identical output,
    per-reducer input bounded to ~1/salt of the hottest key."""
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count("*").alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("count")
    )


def salted_sum(df: DataFrame, key_cols: list[str], value: Column,
               out_name: str = "sum", salt: int = 16) -> DataFrame:
    """groupBy(key).sum(value) with two-phase salting."""
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % F.lit(salt)).cast("int")
    ).withColumn("_v", value)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum("_v").alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_name))


def top_hot_keys(df: DataFrame, key_cols: list[str], n: int = 20) -> DataFrame:
    """Skew diagnostic: the n hottest keys and their row counts."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        .limit(n)
    )
