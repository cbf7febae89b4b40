"""Interactive state queries — the reference's REST state-serving
layer (pspf/api/cluster_api.py:13-141: GET /state/{key} routed to the
partition leader) re-expressed the Spark way.

Spark's state store isn't a serving layer; the pattern is to
MATERIALIZE aggregates from `foreachBatch` into a keyed table and
serve lookups from that. Here the table is keep-last-per-key parquet,
hash-BUCKETED on the key with the same crc32 partitioner the
reference routes queries by (cluster_api.py:42 —
`zlib.crc32(key) % num_partitions`): a point lookup prunes to ONE
bucket directory instead of scanning the table, which is the
difference between O(table) and O(table/buckets) at serving time.
(Swap the merge step for Delta/Iceberg MERGE INTO or a KV store in
production; the contract — upsert on key, read-your-writes after each
batch — is the semantics the reference exposes.)
"""

from __future__ import annotations

import zlib
from pathlib import Path

from pyspark.sql import Column, DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class StateTable:
    """Keyed upsert table served from bucket-partitioned parquet."""

    def __init__(self, spark: SparkSession, path: str, key_col: str, buckets: int = 16):
        self.spark = spark
        self.path = str(path)
        self.key = key_col
        self.buckets = buckets

    def _exists(self) -> bool:
        p = Path(self.path)
        return p.exists() and any(p.rglob("*.parquet"))

    def _bucket_col(self) -> Column:
        # Spark's crc32 == zlib.crc32 (standard CRC-32), so the engine-
        # side bucket matches `bucket_of` computed driver-side.
        return F.pmod(
            F.crc32(F.col(self.key).cast("string").cast("binary")),
            F.lit(self.buckets),
        ).cast("int")

    def bucket_of(self, key) -> int:
        """Driver-side partitioner — the reference's routing function
        (cluster_api.py:42)."""
        return zlib.crc32(str(key).encode()) % self.buckets

    def upsert(self, batch: DataFrame) -> None:
        """Merge a micro-batch: new rows win over stored rows per key.

        The merge is PARTITION-SCOPED: only the buckets the batch
        actually touches are read, merged, and rewritten (dynamic
        partition overwrite) — untouched buckets' files are never
        listed or rewritten, so a batch costs O(batch + touched
        buckets), not O(table). At 100 TB the state table dwarfs any
        micro-batch; a full-table rewrite per batch would be the
        topology's bottleneck. The touched-bucket set is at most
        `self.buckets` small ints, so the driver-side `distinct`
        collect is bounded and tiny.

        Production note: this read-union-write is the parquet stand-in
        for MERGE INTO; it is atomic enough for foreachBatch (one
        writer) and keeps the serving path a pruned scan.
        """
        batch = batch.withColumn("_gen", F.lit(1)).withColumn(
            "_bucket", self._bucket_col()
        )
        if self._exists():
            touched = [
                r["_bucket"] for r in batch.select("_bucket").distinct().collect()
            ]
            # Partition-pruned read: only the touched bucket dirs.
            current = (
                self.spark.read.parquet(self.path)
                .filter(F.col("_bucket").isin(touched))
                .withColumn("_gen", F.lit(0))
            )
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
        # Staging holds only the touched buckets; the final write uses
        # dynamic partition overwrite so sibling buckets keep their
        # existing files byte-identical.
        tmp = self.path + ".staging"
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        (
            final.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(self.path)
        )

    def writer(self):
        """foreachBatch hook: `.writeStream.foreachBatch(table.writer())`."""

        def write(batch: DataFrame, _batch_id: int) -> None:
            self.upsert(batch)

        return write

    def get(self, key) -> Row | None:
        """Point lookup (reference GET /state/{key}): partition-pruned
        to the key's bucket directory — `.explain` shows
        PartitionFilters on `_bucket`, so only 1/buckets of the table
        is ever listed or read."""
        if not self._exists():
            return None
        rows = (
            self.spark.read.parquet(self.path)
            .filter(F.col("_bucket") == self.bucket_of(key))
            .filter(F.col(self.key) == key)
            .drop("_bucket")
            .collect()
        )
        return rows[0] if rows else None

    def snapshot(self) -> DataFrame:
        if not self._exists():
            raise FileNotFoundError(self.path)
        return self.spark.read.parquet(self.path).drop("_bucket")
