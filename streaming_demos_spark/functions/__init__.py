"""Scalar-function catalog (SURVEY.md §2.8)."""

from streaming_demos_spark.functions.scalars import (
    bucket_time_of_day,
    null_safe,
    sigmoid,
    status_timestamps,
    title_case,
)

__all__ = [
    "bucket_time_of_day",
    "null_safe",
    "sigmoid",
    "status_timestamps",
    "title_case",
]
