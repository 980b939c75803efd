from alexandria_spark.functions.hashing import murmur2_64, hash64
from alexandria_spark.functions.tokenizer import (
    tokenize,
    tokenize_series,
    token_counts,
    query_terms,
)

__all__ = [
    "murmur2_64",
    "hash64",
    "tokenize",
    "tokenize_series",
    "token_counts",
    "query_terms",
]
