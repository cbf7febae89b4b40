"""Sources & sinks: broker connectors re-expressed as Spark readers/writers."""

from python_stream_processing_framework_spark.sources.registry import (
    SourceRegistry,
    registry,
)

__all__ = ["SourceRegistry", "registry"]
