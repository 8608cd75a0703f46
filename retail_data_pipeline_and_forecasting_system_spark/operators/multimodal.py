"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with struct
metadata. The *plumbing* — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested, and IMAGE decode is real
too: a stdlib-only PNG/PPM/PGM codec (:mod:`operators.imagecodec` —
zlib + struct + scanline unfiltering; no PIL in this container) behind
format sniffing in ``_decode_batch`` and the full
:func:`decode_media_real` path. Payloads that aren't a supported image
(the synthetic text-bytes test rows; audio/video, whose codecs genuinely
aren't installable here) keep a deterministic stub: a pure function of
the bytes, so tests and SQL oracles verify the pipeline end-to-end.

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
    """The codec slot: REAL stdlib decode (PNG/PPM/PGM via
    operators.imagecodec — zlib + struct, all filter types, CRC-checked)
    behind format sniffing; payloads that aren't a supported image (the
    synthetic text-bytes rows) keep the deterministic stub dims so the
    SQL oracles stay exact."""
    import hashlib

    from . import imagecodec

    n_bytes = batch["payload"].map(len)
    width, height = _fake_dims(n_bytes)
    width, height = list(width), list(height)
    for i, payload in enumerate(batch["payload"]):
        if imagecodec.sniff_format(bytes(payload)) is not None:
            try:
                img = imagecodec.decode_image(bytes(payload))
            except ValueError:
                # Sniffed like an image but didn't decode (corrupt body,
                # unsupported variant): keep the stub dims — mirrors
                # decode_media_real's quarantine; never kill the job.
                continue
            width[i], height[i] = img.width, img.height
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "content_md5": batch["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            ),
            "width": pd.Series(width, index=batch.index).astype("int32"),
            "height": pd.Series(height, index=batch.index).astype("int32"),
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


REAL_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixel_md5", T.StringType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def decode_media_real(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL decode path — stdlib PNG/PPM/PGM codec
    (:mod:`operators.imagecodec`), no external library.

    Emits per-image typed metadata plus two pixel-derived columns that
    prove the decode actually ran: ``pixel_md5`` (md5 of the raw decoded
    pixel bytes — filter-independent, so the same image encoded with
    different PNG filters hashes identically) and ``mean_luma`` (mean of
    all samples, double). Non-image / unsupported payloads yield NULL
    metadata rows (``format`` NULL) unless ``strict=True``, which
    re-raises — a 100 TB corpus must quarantine bad payloads, not die.

    Same plumbing as :func:`decode_media`: partition-local Arrow-batched
    mapInPandas, no shuffle.
    """
    import hashlib

    from . import imagecodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in REAL_DECODED_SCHEMA}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                data = bytes(payload)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                try:
                    img = imagecodec.decode_image(data)
                except ValueError:
                    if strict:
                        raise
                    for k in (
                        "format", "width", "height", "channels",
                        "pixel_md5", "mean_luma",
                    ):
                        out[k].append(None)
                    continue
                out["format"].append(img.format)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["channels"].append(img.channels)
                out["pixel_md5"].append(hashlib.md5(img.pixels).hexdigest())
                out["mean_luma"].append(
                    sum(img.pixels) / len(img.pixels) if img.pixels else None
                )
            yield pd.DataFrame(out).astype(
                {
                    "n_bytes": "int32",
                    "width": "Int32",
                    "height": "Int32",
                    "channels": "Int32",
                    "mean_luma": "float64",
                }
            )

    return df.mapInPandas(run, schema=REAL_DECODED_SCHEMA)


PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synthesize_png_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-PNG payload synthesis (test corpus builder):
    each id becomes a genuine Paeth-filtered, zlib-compressed 8-bit
    grayscale PNG of ``(4 + id%13) x (3 + id%11)`` uniform pixels valued
    ``32 + id%95`` (printable-ASCII range so a SQL oracle can md5 the
    same pixel bytes via ``repeat(chr(v), n)``). Decoding these through
    :func:`decode_media_real` closes a real compress->decompress->
    unfilter loop on the executors — not a stub.

    Partition-local mapInPandas, no shuffle; mirrors the shape of a real
    payload fetch (id -> bytes).
    """
    from .imagecodec import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                w, h, v = int(4 + i % 13), int(3 + i % 11), int(32 + i % 95)
                payloads.append(
                    encode_png(w, h, 1, bytes([v]) * (w * h), filter_type=4)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("rs_width", T.IntegerType(), True),
        T.StructField("rs_height", T.IntegerType(), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dim_idx", T.IntegerType(), False),
        T.StructField("feat", T.IntegerType(), True),
    ]
)


def resize_media(df: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize to ``target`` on the long edge (stub codec).

    Same plumbing contract as :func:`decode_media`: partition-local
    mapInPandas, no shuffle; a real implementation replaces the dimension
    math with PIL's ``thumbnail``. Scale factor and floor are plain IEEE
    double ops so the SQL oracle reproduces them bit-for-bit.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            n_bytes = batch["payload"].map(len)
            width, height = _fake_dims(n_bytes)
            long_edge = np.maximum(width, height).astype("float64")
            scale = float(target) / long_edge
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "rs_width": np.floor(width * scale).astype("int32"),
                    "rs_height": np.floor(height * scale).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling from a (stub) video payload.

    One input row fans out to ``1 + n_bytes % max_frames`` frame rows —
    mapInPandas is a generator over batches, so the fan-out never
    materializes a whole group (unlike explode-after-collect designs).
    The stub treats 1 payload byte = 1 ms of video; a real sampler would
    call ffmpeg per batch with the same (doc_id, frame_idx, ts_ms) shape.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_bytes = len(payload)
                n_frames = 1 + (n_bytes % max_frames)
                step = n_bytes // n_frames
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * step)
                    out["frame_md5"].append(
                        hashlib.md5(bytes(payload) + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(df: DataFrame, dims: int = 8) -> DataFrame:
    """Per-payload feature vector (stub encoder), exploded to
    (doc_id, dim_idx, feat) rows.

    The stub derives dimension i from the i-th md5 nibble of the payload —
    deterministic and oracle-able. A real encoder (CLIP, wav2vec) replaces
    the nibble math and widens ``feat`` to float; the exploded long-format
    output is deliberate: it joins/aggregates without array-equality
    headaches and writes to columnar storage efficiently.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"doc_id": [], "dim_idx": [], "feat": []}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                hx = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(1, dims + 1):
                    out["doc_id"].append(doc_id)
                    out["dim_idx"].append(i)
                    out["feat"].append(int(hx[i - 1], 16))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)
