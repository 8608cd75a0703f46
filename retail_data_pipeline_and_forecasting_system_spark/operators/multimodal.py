"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with struct
metadata. The *plumbing* — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested; the actual codec call is
stubbed (image/audio libraries are not in this container) behind
``FAKE_DECODE``: a deterministic function of the bytes, so tests and SQL
oracles can verify the pipeline end-to-end.

At scale: binary payloads dominate partition size, so the reader should cap
``spark.sql.files.maxPartitionBytes`` and the decode stage is a
``mapInPandas`` (streaming batches, no group materialization) — one pass,
no shuffle, CPU-bound; exactly the shape a real decoder (PIL/ffmpeg) slots
into by replacing ``_decode_batch``'s body.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _fake_dims(n_bytes: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Deterministic stand-in for decoded media dimensions."""
    width = 16 + (n_bytes % 617)
    height = 16 + ((n_bytes * 31) % 469)
    return width, height


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """The codec slot. Replace the body with a real decoder (e.g. PIL) —
    signature and output schema stay fixed."""
    import hashlib

    n_bytes = batch["payload"].map(len)
    width, height = _fake_dims(n_bytes)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "content_md5": batch["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            ),
            "width": width.astype("int32"),
            "height": height.astype("int32"),
        }
    )


def read_binary_files(spark, path_glob: str) -> DataFrame:
    """Real media ingestion path: Spark's ``binaryFile`` source — one row
    per file with (path, modificationTime, length, content binary). Feed
    the result to :func:`decode_media` after renaming ``content`` to
    ``payload`` and deriving an id. At scale, cap partition size via
    ``spark.sql.files.maxPartitionBytes`` so large payloads don't blow up
    task memory."""
    df = spark.read.format("binaryFile").load(path_glob)
    return df.select(
        F.abs(F.hash("path")).cast("long").alias("doc_id"),
        F.col("path"),
        F.col("length").cast("int").alias("n_bytes_meta"),
        F.col("content").alias("payload"),
    )


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Testdata shim: treat the utf-8 bytes of ``text_col`` as the opaque
    media payload (real pipelines read payloads from object storage or
    ``binaryFile`` sources)."""
    return df.select(
        id_col, F.encode(F.col(text_col), "utf-8").alias("payload")
    )


def decode_media(df: DataFrame) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas.

    ``mapInPandas`` (not applyInPandas): no grouping, no shuffle — batches
    stream through the decoder partition-local.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def decode_media_real(df: DataFrame) -> DataFrame:  # pragma: no cover
    """Real-codec path: raises until a decoder library is provided."""
    raise NotImplementedError(
        "No media codec available in this environment; use decode_media() "
        "(deterministic stub) or replace _decode_batch with a real decoder."
    )
