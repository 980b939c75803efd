"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns beside them. The Spark-side plumbing — schema, Arrow batch
shape, partitioning, UDF signatures — is real and tested; the actual media
decoding is STUBBED (no codec libraries in this container):

* ``decode_image`` raises NotImplementedError by design;
* ``fake_features`` is the deterministic stand-in used by tests/benchmarks —
  a seeded feature vector derived from the payload bytes, so pipelines
  downstream of "decode" (dedup by feature, ANN, quality filters) are fully
  exercisable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from alexandria_spark.sources.tables import documents

FEATURE_DIM = 16


def binarize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (utf-8 bytes of the text here;
    in production this is the raw image/audio blob from the lake)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def payload_meta(docs_bin: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, magic) — typed metadata extracted JVM-side."""
    return docs_bin.select(
        "doc_id",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("magic"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — requires an image codec, absent in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/ffmpeg); "
        "use fake_features for deterministic testing"
    )


def _fake_feature_vec(payload: bytes) -> np.ndarray:
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: 2 * FEATURE_DIM], dtype=np.uint16).astype(np.float32)
    return raw / np.float32(65535.0)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(docs_bin: DataFrame, batch_note: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow-batched shape is exactly what a real decoder would use — one
    numpy pass per batch, vector output column — only ``_fake_feature_vec``
    stands in for the codec.
    """

    def fn(batches):
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            feats = [_fake_feature_vec(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "features": feats,
                }
            )

    return docs_bin.select("doc_id", "payload").mapInPandas(fn, FEATURES_SCHEMA)


# ------------------------------------------------------------ suite entries

def q_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return payload_meta(binarize(documents(spark, sf_dir)))


SQL_PAYLOAD_META = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       lower(hex(encode(substr(text, 1, 4)))) AS magic
FROM documents
"""


def q_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction round-trip; oracle checks the plumbing-level
    invariants (byte counts) — the fake features themselves are asserted in
    pytest, not SQL-expressible."""
    f = extract_features(binarize(documents(spark, sf_dir)))
    return f.select(
        "doc_id", "n_bytes", F.size("features").cast("long").alias("feature_dim")
    )


SQL_PAYLOAD_FEATURES = f"""
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       {FEATURE_DIM}::BIGINT AS feature_dim
FROM documents
"""

ENTRIES = {
    "multimodal_meta": (q_payload_meta, SQL_PAYLOAD_META),
    "multimodal_features": (q_payload_features, SQL_PAYLOAD_FEATURES),
}
