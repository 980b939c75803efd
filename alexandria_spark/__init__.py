"""alexandria_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of alexandria-org/alexandria
(reference surveyed in SURVEY.md) on idiomatic PySpark: DataFrame plans,
Catalyst optimization, Arrow-vectorized pandas UDFs for the hot paths
(tokenization, hashing, posting-block codec), and parquet/Iceberg-style
partitioned tables for the index itself.

Layout:
  functions/  — vectorized scalar functions (murmur2 hashing, tokenizer,
                text analysis, vector math)
  operators/  — reusable DataFrame operators (top-k, intersection/union,
                dedup family, similarity search, link-boosts, multimodal)
  sources/    — table loaders + deterministic synthetic corpus generator
  plans/      — end-to-end pipelines: index build (with checkpoint/resume)
                and the query engine
  streaming/  — incremental index maintenance via Structured Streaming
"""

from alexandria_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
