"""Event schemas: typed StructTypes with per-event-type dispatch.

Capability parity with the reference's schema layer (pspf/schema.py):
`BaseEvent` (event_id, event_type, timestamp, payload, partition,
offset — pspf/schema.py:8-26) becomes a StructType; the dynamic
`SchemaRegistry.register(event_type, model)` dispatch with BaseEvent
fallback (pspf/schema.py:28-57) becomes per-type `from_json` parsing.

Validation failures don't raise per message (the reference's
raise->retry->DLQ path); rows that fail to parse surface in a
`_corrupt` frame for DLQ routing — same observable outcome, but
batch-shaped and executed JVM-side by `from_json`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The reference's BaseEvent (pspf/schema.py:8-26) as a StructType.
BASE_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("payload", MapType(StringType(), StringType())),
        StructField("partition", IntegerType()),
        StructField("offset", StringType()),
    ]
)


class SchemaRegistry:
    """event_type -> StructType dispatch with a fallback schema."""

    def __init__(self, fallback: StructType = BASE_EVENT_SCHEMA):
        self.fallback = fallback
        self._schemas: dict[str, StructType] = {}

    def register(self, event_type: str, schema: StructType) -> None:
        self._schemas[event_type] = schema

    def schema_for(self, event_type: str) -> StructType:
        return self._schemas.get(event_type, self.fallback)

    def registered(self) -> list[str]:
        return sorted(self._schemas)

    def parse(
        self,
        df: DataFrame,
        json_col: str = "value",
        type_col: str = "event_type",
    ) -> tuple[dict[str, DataFrame], DataFrame]:
        """Parse a frame of raw JSON strings into typed frames per
        registered event_type (+ '_fallback' for unregistered types).

        Returns (frames, corrupt): `corrupt` holds rows whose JSON
        failed to parse under their dispatched schema — route it to a
        DLQ sink. Dispatch is a filter per type over one shared scan;
        all parsing is JVM-side `from_json`.
        """
        etype = F.get_json_object(F.col(json_col), f"$.{type_col}")
        # from_json yields a null-fielded struct (not NULL) for malformed
        # input in permissive mode; try_parse_json is the validity probe.
        valid = F.try_parse_json(F.col(json_col)).isNotNull()
        frames: dict[str, DataFrame] = {}
        for t, schema in sorted(self._schemas.items()):
            subset = df.filter(valid & (etype == t))
            frames[t] = subset.withColumn(
                "_event", F.from_json(F.col(json_col), schema)
            ).select("_event.*")
        others = df.filter(valid & (~etype.isin(list(self._schemas)) | etype.isNull()))
        frames["_fallback"] = others.withColumn(
            "_event", F.from_json(F.col(json_col), self.fallback)
        ).select("_event.*")
        corrupt = df.filter(~valid).select(
            F.coalesce(etype, F.lit("?")).alias("event_type"),
            F.col(json_col).alias("raw"),
        )
        return frames, corrupt


def evolve(df: DataFrame, target: StructType) -> DataFrame:
    """Schema evolution: project onto `target`, adding missing columns
    as typed nulls and dropping unknown ones (the reference's guidance
    is nullable-with-default Pydantic fields, docs/schema-evolution.md)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
