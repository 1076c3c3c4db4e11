"""Scalar functions (SURVEY.md §2.8) and feature transforms (§2.10).

- scalars  — string/date/math/conditional column expressions
- features — one-hot, min-max scaling, membership flags
- tfidf    — TF-IDF + hashed vectors + truncated SVD embeddings
"""

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
