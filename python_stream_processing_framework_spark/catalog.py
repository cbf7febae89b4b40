"""Table catalog for the driver-generated parquet testdata.

Tables (TPC-H-ish star schema + an ``events`` stream table + LLM-
pipeline ``documents``/``embeddings``) live one-parquet-per-table in a
scale-factor directory. At 100 TB these would be partitioned/bucketed
parquet or Iceberg tables; the loader is the single place that would
change — every operator downstream consumes plain DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from python_stream_processing_framework_spark.session import ensure_utc

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: (region=5 rows, nation=25 rows always; TPC-H scales facts, not these).
BROADCAST_TABLES = frozenset({"region", "nation"})


#: Columns that have shipped as parquet TIMESTAMP(NANOS) in some
#: testdata generations, which Spark cannot read natively. When they
#: appear as int64 (`nanosAsLong`), truncate to microsecond timestamps —
#: the same ns->us truncation DuckDB applies when it reads TIMESTAMP_NS,
#: so both engines see identical values.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    # Generations that store TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # normally read as plain TIMESTAMP via the session conf
    # (parquet.inferTimestampNTZ.enabled=false, see session.ensure_utc);
    # cast defensively in case the caller's session read NTZ anyway.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every catalog table from ``sf_dir`` as a DataFrame."""
    ensure_utc(spark)
    return {t: _read(spark, sf_dir, t) for t in TABLES}


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load a subset of tables: ``li, orders = load(spark, d, 'lineitem', 'orders')``."""
    ensure_utc(spark)
    return [_read(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
