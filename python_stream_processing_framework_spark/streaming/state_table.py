"""Interactive state queries — the reference's REST state-serving
layer (pspf/api/cluster_api.py:13-141: GET /state/{key} routed to the
partition leader) re-expressed the Spark way.

Spark's state store isn't a serving layer; the pattern is to
MATERIALIZE aggregates from `foreachBatch` into a keyed table and
serve lookups from that. Here the table is keep-last-per-key parquet
(swap the merge step for Delta/Iceberg MERGE INTO or a KV store in
production; the contract — upsert on key, read-your-writes after each
batch — is the semantics the reference exposes).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class StateTable:
    """Keyed upsert table served from parquet."""

    def __init__(self, spark: SparkSession, path: str, key_col: str):
        self.spark = spark
        self.path = str(path)
        self.key = key_col

    def _exists(self) -> bool:
        p = Path(self.path)
        return p.exists() and any(p.glob("*.parquet"))

    def upsert(self, batch: DataFrame) -> None:
        """Merge a micro-batch: new rows win over stored rows per key.

        Production note: this read-union-write is the parquet stand-in
        for MERGE INTO; it is atomic enough for foreachBatch (one
        writer) and keeps the serving path a plain scan.
        """
        batch = batch.withColumn("_gen", F.lit(1))
        if self._exists():
            current = self.spark.read.parquet(self.path).withColumn("_gen", F.lit(0))
            unioned = current.unionByName(batch)
        else:
            unioned = batch
        w = Window.partitionBy(self.key).orderBy(F.col("_gen").desc())
        merged = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        # two-phase write: parquet can't overwrite a path being read.
        tmp = self.path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)

    def writer(self):
        """foreachBatch hook: `.writeStream.foreachBatch(table.writer())`."""

        def write(batch: DataFrame, _batch_id: int) -> None:
            self.upsert(batch)

        return write

    def get(self, key) -> Row | None:
        """Point lookup (reference GET /state/{key})."""
        if not self._exists():
            return None
        rows = self.spark.read.parquet(self.path).filter(F.col(self.key) == key).collect()
        return rows[0] if rows else None

    def snapshot(self) -> DataFrame:
        if not self._exists():
            raise FileNotFoundError(self.path)
        return self.spark.read.parquet(self.path)
