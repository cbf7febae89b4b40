"""PySpark-native analytics & stream-processing engine.

A brand-new, Spark-first implementation of the query and
data-processing capabilities of the reference framework
(JosephMattHall/Python-Stream-Processing-Framework, "PSPF"): topics,
windowed keyed aggregation (tumbling/sliding/session) with watermarks
and late-data DLQ routing, predicate routing, windowed stream-stream
joins, retry/DLQ semantics, idempotent sinks — re-expressed on
Structured Streaming + the DataFrame/SQL/Catalyst stack — plus the
relational core (joins/aggs/window functions/set-ops) and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Everything here derives from the public Apache Spark API and the
publicly visible behavior of the reference repo; nothing is a code
port (the reference is a single-process asyncio engine, see
SURVEY.md).
"""

from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.catalog import (
    TABLES,
    load_tables,
    register_views,
)

__version__ = "0.1.0"

__all__ = ["get_spark", "TABLES", "load_tables", "register_views", "__version__"]
