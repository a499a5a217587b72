"""Shared column-expression helpers (SURVEY.md §2.7 scalar surface)."""

from mapreduce_big_data_processing_spark.functions.columns import (
    canon_text,
    decode_sparse_vector,
    encode_sparse_vector,
    hash60,
    sparse_dot,
)

__all__ = [
    "canon_text",
    "decode_sparse_vector",
    "encode_sparse_vector",
    "hash60",
    "sparse_dot",
]
