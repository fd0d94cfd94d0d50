"""Storage adapter (SURVEY.md risk R1).

The target layout is Iceberg (`pages` partitioned by days(warc_ts), `triples`
by pred, `nodes`/`edges` bucketed by entity hash) with MERGE-upsert. The
sandbox's pyspark 4.1.2 has no iceberg-spark-runtime jar and no network, so
this adapter exposes one API with a parquet backend that preserves the same
layouts; MERGE is emulated as union + dropDuplicates + partition overwrite.
Swapping in the Iceberg backend is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, base: str):
        self.base = base

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def exists(self, spark: SparkSession, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def write(self, df: DataFrame, name: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def merge(self, spark: SparkSession, updates: DataFrame, name: str,
              keys: list[str],
              partition_by: list[str] | None = None) -> None:
        """MERGE-upsert emulation: new rows win on key collision
        (Iceberg: MERGE INTO name USING updates ON keys; reference semantics:
        Neo4j MERGE, /root/reference/src/knowledge_graph/neo4j_manager.py:62,91)."""
        if not self.exists(spark, name):
            self.write(updates, name, partition_by)
            return
        current = self.read(spark, name)
        merged = updates.unionByName(current).dropDuplicates(keys)
        # materialize before overwriting the directory we read from
        merged = merged.localCheckpoint(eager=True)
        self.write(merged, name, partition_by)
