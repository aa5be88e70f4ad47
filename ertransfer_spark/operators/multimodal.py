"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with typed metadata and processes them with Arrow-batched Python
(mapInPandas), never row-at-a-time. The reference has no binary payloads
(its closest analog is the bz2-pickled embedding blobs,
/root/reference/methods/ditto/transform.py:11-15), so this module defines
OUR contract:

- :func:`binary_meta` — real, tested: iterate Arrow batches, compute
  byte-level metadata (n_bytes, byte_sum, a cheap content tag). The
  partitioning/batching/schema shape is exactly what a decode stage needs.
- :func:`decode_image` — STUB: the decode libs (PIL/cv2/torchaudio) are
  not in this container; raises NotImplementedError at call time while
  keeping the full Spark-side plumbing (schema, mapInPandas signature)
  real so a lib drop-in is a one-function change.
- :func:`fake_decode` — deterministic stand-in used by tests: "decodes"
  a binary payload into a fixed-shape feature vector from byte
  statistics, exercising the identical batch path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BINARY_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("content_tag", StringType()),
    ]
)


def binary_meta(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_bytes, byte_sum, content_tag) via mapInPandas.

    The payload here is the utf-8 encoding of ``text_col`` (this corpus has
    no real blobs); with an actual binary column the `payload` line is the
    only change. byte_sum is the exact sum of byte values — cheap, exact,
    and oracle-checkable.
    """
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("payload_src"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload_src"].fillna("").map(lambda s: s.encode("utf-8"))
            n_bytes = payload.map(len)
            byte_sum = payload.map(lambda b: int(sum(b)))
            tag = n_bytes.map(lambda n: "empty" if n == 0 else ("small" if n < 256 else "large"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "content_tag": tag,
                }
            )

    return src.mapInPandas(compute, schema=BINARY_META_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_image(blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "payload") -> DataFrame:
    """Image decode + feature extraction over binary payloads.

    STUB: no image codec is available in this container. The Spark-side
    plumbing (column contract, Arrow batch iteration, output schema) is the
    real design; swap `_decode_batch` for a PIL/cv2 implementation to
    activate.
    """
    src = blobs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(blob_col).alias("payload"))

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not in this container); "
            "use fake_decode() for plumbing tests"
        )
        yield  # pragma: no cover

    return src.mapInPandas(_decode_batch, schema=DECODE_SCHEMA)


def fake_decode(blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "payload", dim: int = 8) -> DataFrame:
    """Deterministic decode stand-in: features[i] = (sum of bytes at
    positions ≡ i mod dim) / 255. Exercises the exact batch path of
    :func:`decode_image` with a checkable output."""
    src = blobs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(blob_col).alias("payload"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, widths, heights = [], [], []
            for blob in pdf["payload"]:
                b = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                acc = np.zeros(dim)
                if arr.size:
                    for i in range(dim):
                        acc[i] = float(arr[i::dim].sum()) / 255.0
                feats.append(acc.tolist())
                widths.append(int(arr.size))
                heights.append(1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "features": feats,
                }
            )

    return src.mapInPandas(compute, schema=DECODE_SCHEMA)
