"""Deterministic column helpers shared by operators and queries."""

from python_stream_processing_framework_spark.functions.exact import (
    cents,
    cents_sum,
    money,
)
from python_stream_processing_framework_spark.functions.hashing import (
    hash60,
    hash28_mod,
)
from python_stream_processing_framework_spark.functions.vectors import (
    as_double_array,
    dot,
    l2_norm,
    cosine,
)

__all__ = [
    "cents",
    "cents_sum",
    "money",
    "hash60",
    "hash28_mod",
    "as_double_array",
    "dot",
    "l2_norm",
    "cosine",
]
