"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with struct
metadata. The *plumbing* — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested, and IMAGE decode is real
too: a stdlib-only PNG/PPM/PGM codec (:mod:`operators.imagecodec` —
zlib + struct + scanline unfiltering; no PIL in this container) behind
format sniffing in ``_decode_batch`` and the full
:func:`decode_media_real` path. AUDIO decode is real too
(:func:`decode_audio_real` over :mod:`operators.audiocodec` — RIFF
chunk walk, 8/16-bit PCM) and VIDEO via the stdlib Y4M codec
(:func:`sample_frames_real` over :mod:`operators.videocodec`). Payloads
in none of the supported formats (the synthetic text-bytes test rows;
compressed codecs that genuinely need ffmpeg) keep a deterministic
stub: a pure function of the bytes, so tests and SQL oracles verify
the pipeline end-to-end.

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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("pcm_md5", T.StringType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
    ]
)


def decode_audio_real(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL audio decode path — stdlib RIFF/WAVE PCM codec
    (:mod:`operators.audiocodec`), no external library; the audio twin of
    :func:`decode_media_real` with the identical sniff→decode→quarantine
    contract.

    Emits per-clip typed metadata plus two sample-derived columns that
    prove the decode actually ran: ``pcm_md5`` (md5 of the raw data-chunk
    PCM bytes, i.e. of the decoded payload after the chunk walk stripped
    headers/JUNK chunks) and ``mean_amp`` (mean of all decoded samples,
    centred — 8-bit WAV's unsigned+128-bias handled by
    :func:`audiocodec.samples_int`). Non-WAV / corrupt / unsupported
    payloads yield NULL metadata rows (``format`` NULL) unless
    ``strict=True`` — a 100 TB corpus quarantines bad payloads, never dies.

    Same plumbing as :func:`decode_media_real`: partition-local
    Arrow-batched mapInPandas, zero shuffle.
    """
    import hashlib

    from . import audiocodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_SCHEMA}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                data = bytes(payload)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                try:
                    audio = audiocodec.decode_audio(data)
                except ValueError:
                    if strict:
                        raise
                    for k in (
                        "format", "sample_rate", "channels", "bit_depth",
                        "n_samples", "duration_ms", "pcm_md5", "mean_amp",
                    ):
                        out[k].append(None)
                    continue
                samples = audiocodec.samples_int(audio)
                out["format"].append("wav")
                out["sample_rate"].append(audio.sample_rate)
                out["channels"].append(audio.channels)
                out["bit_depth"].append(audio.bit_depth)
                out["n_samples"].append(audio.n_samples)
                # raw IEEE division (no round): bit-identical in any
                # engine computing n*1000.0/rate as doubles — rule 2
                out["duration_ms"].append(
                    audio.n_samples * 1000.0 / audio.sample_rate
                )
                out["pcm_md5"].append(hashlib.md5(audio.pcm).hexdigest())
                out["mean_amp"].append(
                    sum(samples) / len(samples) if samples else None
                )
            yield pd.DataFrame(out).astype(
                {
                    "n_bytes": "int32",
                    "sample_rate": "Int32",
                    "channels": "Int32",
                    "bit_depth": "Int32",
                    "n_samples": "Int64",
                    "duration_ms": "float64",
                    "mean_amp": "float64",
                }
            )

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


def synthesize_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-WAV payload synthesis (test corpus builder):
    each id becomes a genuine RIFF/WAVE file — 8-bit mono PCM,
    ``16 + id%37`` samples of uniform unsigned value ``32 + id%95``
    (printable-ASCII range so a SQL oracle can md5 the identical PCM
    bytes via ``repeat(chr(v), n)`` — the m10 pixel_md5 play), sample
    rate ``8000 + 1000*(id%5)``. Every third clip carries an odd-length
    LIST junk chunk before ``data``, so decoding the corpus proves the
    chunk walk (incl. the pad byte) rather than a fixed 44-byte-header
    assumption — and the junk never changes the decoded output, which
    is what keeps the oracle closed-form.

    Partition-local mapInPandas, no shuffle; mirrors a real payload
    fetch (id -> bytes).
    """
    from .audiocodec import encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                n, v = int(16 + i % 37), int(32 + i % 95)
                payloads.append(
                    encode_wav(
                        bytes([v]) * n,
                        sample_rate=int(8000 + 1000 * (i % 5)),
                        bit_depth=8,
                        channels=1,
                        junk_chunk=(i % 3 == 0),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


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
    """Aspect-preserving resize to ``target`` on the long edge (stub codec
    — dimension math only, declared-dims in, no pixel access; the REAL
    pixel path is :func:`resize_media_real`).

    Same plumbing contract as :func:`decode_media`: partition-local
    mapInPandas, no shuffle. Scale factor and floor are plain IEEE
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


FRAMES_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("frame_md5", T.StringType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def sample_frames_real(
    df: DataFrame, max_frames: int = 8, strict: bool = False
) -> DataFrame:
    """REAL video frame sampling — stdlib Y4M codec
    (:mod:`operators.videocodec`), no ffmpeg; the video twin of
    :func:`decode_media_real` with the same sniff→decode→quarantine
    contract.

    Decodes the stream's true frame count, selects up to ``max_frames``
    evenly-spaced frames (``floor(j * n / max_frames)``), and emits per
    selected frame: its true index, the true frame timestamp from the
    stream's fps (``idx * 1000 * fps_den // fps_num`` ms, exact integer
    math), ``frame_md5`` (md5 of the decoded LUMA plane — proves the
    planar slicing ran) and ``mean_luma``. Non-Y4M / corrupt payloads
    yield ONE quarantine row (``frame_idx`` 0, ``n_frames`` NULL) unless
    ``strict=True`` — bad payloads must be visible, not job-fatal.

    Same plumbing as :func:`sample_frames`: the fan-out happens inside
    streaming Arrow batches — partition-local mapInPandas, no shuffle,
    no group materialization.
    """
    import hashlib

    from . import videocodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in FRAMES_REAL_SCHEMA}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    vid = videocodec.decode_y4m(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(0)
                    for k in (
                        "n_frames", "width", "height", "ts_ms",
                        "frame_md5", "mean_luma",
                    ):
                        out[k].append(None)
                    continue
                n = vid.n_frames
                if n <= max_frames:
                    picks = range(n)
                else:
                    picks = [j * n // max_frames for j in range(max_frames)]
                for idx in picks:
                    y = vid.y_plane(idx)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(n)
                    out["width"].append(vid.width)
                    out["height"].append(vid.height)
                    out["ts_ms"].append(
                        idx * 1000 * vid.fps_den // vid.fps_num
                    )
                    out["frame_md5"].append(hashlib.md5(y).hexdigest())
                    out["mean_luma"].append(sum(y) / len(y) if y else None)
            yield pd.DataFrame(out).astype(
                {
                    "frame_idx": "int32",
                    "n_frames": "Int32",
                    "width": "Int32",
                    "height": "Int32",
                    "ts_ms": "Int64",
                    "mean_luma": "float64",
                }
            )

    return df.mapInPandas(run, schema=FRAMES_REAL_SCHEMA)


def synthesize_y4m_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-Y4M payload synthesis (test corpus builder):
    each id becomes a genuine YUV4MPEG2 stream — C420, 25 fps,
    ``2*(2 + id%4) x 2*(1 + id%3)`` pixels, ``1 + id%6`` frames, frame k
    a uniform luma plane valued ``32 + (id + 7*k) % 95``
    (printable-ASCII range so a SQL oracle can md5 the identical luma
    bytes via ``repeat(chr(v), w*h)`` — the m10/m11 play; chroma planes
    are neutral 128 and deliberately excluded from the hash). Each FRAME
    line carries an ``Xsynth`` parameter so decoding the corpus proves
    per-frame-parameter tolerance, not a bare-marker assumption.

    Partition-local mapInPandas, no shuffle.
    """
    from .videocodec import encode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                w, h = int(2 * (2 + i % 4)), int(2 * (1 + i % 3))
                frames = [
                    bytes([int(32 + (i + 7 * k) % 95)]) * (w * h)
                    for k in range(int(1 + i % 6))
                ]
                payloads.append(
                    encode_y4m(
                        w, h, frames, fps=(25, 1), frame_param=b" Xsynth"
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_features(df: DataFrame, dims: int = 8) -> DataFrame:
    """Per-payload feature vector (stub encoder), exploded to
    (doc_id, dim_idx, feat) rows.

    The stub derives dimension i from the i-th md5 nibble of the payload —
    deterministic and oracle-able. A real encoder (CLIP, wav2vec) replaces
    the nibble math and widens ``feat`` to float; the exploded long-format
    output is deliberate: it joins/aggregates without array-equality
    headaches and writes to columnar storage efficiently. The REAL
    decoded-pixel statistics path is :func:`extract_features_real`.
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


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.IntegerType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
    ]
)


def audio_frame_features(
    df: DataFrame, frame: int = 16, hop: int = 16, strict: bool = False
) -> DataFrame:
    """Librosa-style frame-level audio features over REAL decoded PCM:
    decode the WAV payload (:mod:`operators.audiocodec`), split the
    centred sample stream into fixed ``frame``-sample windows at
    ``hop``-sample stride (trailing partial window dropped, the librosa
    ``center=False`` convention), and emit per frame: RMS energy
    (sqrt of mean squared sample), zero-crossing COUNT (sign products
    < 0 between consecutive samples — the VAD/speech-music primitive),
    and mean amplitude. Multi-channel clips are framed on the
    interleaved stream (callers wanting per-channel features split
    first). Non-WAV / corrupt payloads yield one quarantine row
    (``frame_idx`` 0, ``n_frames`` NULL) unless ``strict=True``.

    Same plumbing as every codec stage here: partition-local
    Arrow-batched mapInPandas, zero shuffle; a real mel/MFCC extractor
    replaces the numpy kernel inside the same batch iterator.
    """
    import numpy as np

    from . import audiocodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_FRAMES_SCHEMA}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    audio = audiocodec.decode_audio(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(0)
                    for k in ("n_frames", "rms", "zcr", "mean_amp"):
                        out[k].append(None)
                    continue
                x = np.asarray(audiocodec.samples_int(audio), dtype="float64")
                n_frames = max(0, (len(x) - frame) // hop + 1)
                if n_frames == 0:
                    # a VALID clip shorter than one window must stay
                    # visible (n_frames 0), not vanish — else short
                    # clips are indistinguishable from never-ingested
                    # docs downstream (round-7 review finding)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(0)
                    out["n_frames"].append(0)
                    for k in ("rms", "zcr", "mean_amp"):
                        out[k].append(None)
                    continue
                for k in range(n_frames):
                    w = x[k * hop : k * hop + frame]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["n_frames"].append(n_frames)
                    out["rms"].append(float(np.sqrt(np.mean(w * w))))
                    out["zcr"].append(int(np.sum(w[1:] * w[:-1] < 0)))
                    out["mean_amp"].append(float(np.mean(w)))
            yield pd.DataFrame(out).astype(
                {
                    "frame_idx": "int32",
                    "n_frames": "Int32",
                    "rms": "float64",
                    "zcr": "Int32",
                    "mean_amp": "float64",
                }
            )

    return df.mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)


def synthesize_square_wav_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic square-wave WAV synthesis (m13 corpus builder):
    each id becomes a genuine 8-bit mono RIFF file of ``16*(1 + id%4)``
    samples — a period-``2^(1 + id%3)`` square wave of amplitude
    ``1 + id%90`` around the 8-bit 128 bias. Periods divide the
    16-sample analysis window, so every frame's features are closed
    form: RMS = the amplitude exactly (sqrt of a perfect square),
    zero-crossing count = floor(15/(period/2)), mean = 0 — an oracle
    can state them without decoding anything, while the engine path
    genuinely decodes, centres, and frames real bytes.
    """
    from .audiocodec import encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                n = 16 * int(1 + i % 4)
                p = 2 ** int(1 + i % 3)
                v = int(1 + i % 90)
                pcm = bytes(
                    128 + v if (j % p) < p // 2 else 128 - v
                    for j in range(n)
                )
                payloads.append(
                    encode_wav(pcm, sample_rate=8000, bit_depth=8, channels=1)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def synthesize_gradient_png_payloads(
    df: DataFrame, id_col: str = "doc_id", per_id_phase: bool = False
) -> DataFrame:
    """Deterministic REAL-PNG gradient synthesis (m15/m16/m17 corpus
    builder): each id becomes a genuine Paeth-filtered zlib-compressed
    8-bit grayscale PNG of ``(4 + id%13) x (3 + id%11)`` pixels valued
    ``pixel(x, y) = 32 + (x + 3*y + phase) % 95`` — NON-uniform, so a
    resize or feature kernel that samples the wrong source pixel
    produces a different byte stream (the uniform m10 corpus cannot
    catch that), while every pixel stays closed-form/printable-ASCII so
    a SQL oracle reconstructs the exact grid with integer arithmetic.
    ``per_id_phase=False`` (m15/m16) uses phase 0 — same-dims images
    are identical; ``True`` (m17) uses ``phase = id`` so image CONTENT
    varies per id and content-grouping operators have real work. Paeth
    filtering over a gradient exercises the decoder's unfilter path on
    non-trivial predictors.

    Partition-local mapInPandas, no shuffle.
    """
    from .imagecodec import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                w, h = int(4 + i % 13), int(3 + i % 11)
                phase = int(i) if per_id_phase else 0
                px = bytes(
                    32 + (x + 3 * y + phase) % 95
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(encode_png(w, h, 1, px, filter_type=4))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def _quarantine(out: dict[str, list], fields: tuple[str, ...]) -> None:
    """Append one NULL quarantine row (all ``fields`` None) — the
    shared decode-failure path of the real-pixel operators; deriving
    the field list at the call site from the op's schema keeps the
    NULL row aligned with schema changes by construction."""
    for k in fields:
        out[k].append(None)


def _nn_indices(out_n: int, src_n: int):
    """All-integer nearest-neighbor source indices for ``out_n``
    samples over a ``src_n``-long axis: ``idx[k] = (k*src_n)//out_n``
    — the exactly-oracle-able gather shared by resize and dHash."""
    import numpy as np

    return (np.arange(out_n, dtype=np.int64) * src_n) // out_n


RESIZED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("rs_width", T.IntegerType(), True),
        T.StructField("rs_height", T.IntegerType(), True),
        T.StructField("resized_md5", T.StringType(), True),
        T.StructField("rs_mean_luma", T.DoubleType(), True),
    ]
)


def resize_media_real(
    df: DataFrame, target: int = 8, strict: bool = False
) -> DataFrame:
    """REAL aspect-preserving resize over DECODED pixels — the real
    twin of the :func:`resize_media` dimension-math stub (the play
    m13 ran for audio): decode the payload via the stdlib codec
    (:mod:`operators.imagecodec`), nearest-neighbor resample every
    channel plane in numpy to ``target`` on the long edge, and emit
    true output dims plus two pixel-derived proofs that the resample
    actually ran: ``resized_md5`` (md5 of the resized interleaved
    pixel bytes) and ``rs_mean_luma`` (mean of all resized samples).

    Resample semantics are ALL-INTEGER so a SQL oracle reproduces them
    exactly: output dims ``rs = max(1, (dim * target) // long_edge)``
    (long edge lands on ``target`` exactly when it divides), source
    index ``src[j] = (j * src_dim) // out_dim`` — the classic
    floor-NN mapping, upsample and downsample alike. Non-image /
    unsupported payloads yield one quarantine row (NULL metadata)
    unless ``strict=True``.

    Same plumbing as :func:`decode_media_real`: partition-local
    Arrow-batched mapInPandas, ZERO shuffle — resize is per-row CPU
    work; a real box/Lanczos kernel replaces the numpy gather inside
    the same batch iterator.
    """
    import hashlib

    import numpy as np

    from . import imagecodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in RESIZED_REAL_SCHEMA}
            nullable = tuple(
                f.name for f in RESIZED_REAL_SCHEMA if f.name != "doc_id"
            )
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = imagecodec.decode_image(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    _quarantine(out, nullable)
                    continue
                w, h, c = img.width, img.height, img.channels
                long_edge = max(w, h)
                rw = max(1, (w * target) // long_edge)
                rh = max(1, (h * target) // long_edge)
                arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
                    h, w, c
                )
                rs = arr[_nn_indices(rh, h)][:, _nn_indices(rw, w)]
                rs_bytes = rs.tobytes()
                out["width"].append(w)
                out["height"].append(h)
                out["rs_width"].append(rw)
                out["rs_height"].append(rh)
                out["resized_md5"].append(hashlib.md5(rs_bytes).hexdigest())
                out["rs_mean_luma"].append(
                    float(int(rs.sum(dtype=np.int64))) / len(rs_bytes)
                )
            yield pd.DataFrame(out).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "rs_width": "Int32",
                    "rs_height": "Int32",
                    "rs_mean_luma": "float64",
                }
            )

    return df.mapInPandas(run, schema=RESIZED_REAL_SCHEMA)


VISUAL_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("sum_px", T.LongType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("min_px", T.IntegerType(), True),
        T.StructField("max_px", T.IntegerType(), True),
        T.StructField("h_edges", T.IntegerType(), True),
        T.StructField("v_edges", T.IntegerType(), True),
    ]
)


def extract_features_real(
    df: DataFrame, edge_thresh: int = 8, strict: bool = False
) -> DataFrame:
    """REAL per-image visual features over DECODED pixels — the real
    twin of the :func:`extract_features` md5-nibble stub (the image
    counterpart of :func:`audio_frame_features`): decode via the
    stdlib codec and emit exactly-defined pixel statistics —
    ``n_pixels``/``sum_px``/``mean_px``/``min_px``/``max_px`` over ALL
    samples, plus ``h_edges``/``v_edges``: counts of adjacent
    channel-0 sample pairs (horizontal resp. vertical neighbors)
    whose absolute difference is ``>= edge_thresh`` — a gradient /
    edge-density primitive (the cheap proxy real curation pipelines
    threshold on before an expensive embed). Channel 0 (luma for
    grayscale, R for RGB) keeps the metric integer-exact; callers
    wanting true luma convert first. ``mean_px`` is one raw IEEE
    division of integer sum by integer count — bit-identical in any
    engine. Non-image payloads quarantine (NULL row) unless
    ``strict=True``.

    Partition-local Arrow-batched mapInPandas, ZERO shuffle; the numpy
    diff kernel is the slot a real feature extractor (CLIP embed)
    fills with the same batch shape.
    """
    import numpy as np

    from . import imagecodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                k.name: [] for k in VISUAL_FEATURES_SCHEMA
            }
            nullable = tuple(
                f.name for f in VISUAL_FEATURES_SCHEMA if f.name != "doc_id"
            )
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = imagecodec.decode_image(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    _quarantine(out, nullable)
                    continue
                arr = np.frombuffer(img.pixels, dtype=np.uint8)
                plane = arr.reshape(img.height, img.width, img.channels)[
                    :, :, 0
                ].astype(np.int64)
                hd = np.abs(np.diff(plane, axis=1))
                vd = np.abs(np.diff(plane, axis=0))
                total = int(arr.sum(dtype=np.int64))
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["channels"].append(img.channels)
                out["n_pixels"].append(arr.size)
                out["sum_px"].append(total)
                out["mean_px"].append(float(total) / arr.size)
                out["min_px"].append(int(arr.min()))
                out["max_px"].append(int(arr.max()))
                out["h_edges"].append(int((hd >= edge_thresh).sum()))
                out["v_edges"].append(int((vd >= edge_thresh).sum()))
            yield pd.DataFrame(out).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "channels": "Int32",
                    "n_pixels": "Int32",
                    "sum_px": "Int64",
                    "mean_px": "float64",
                    "min_px": "Int32",
                    "max_px": "Int32",
                    "h_edges": "Int32",
                    "v_edges": "Int32",
                }
            )

    return df.mapInPandas(run, schema=VISUAL_FEATURES_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("dhash_hi", T.LongType(), True),
        T.StructField("dhash_lo", T.LongType(), True),
    ]
)


def perceptual_hash(
    df: DataFrame, grid_w: int = 9, grid_h: int = 8, strict: bool = False
) -> DataFrame:
    """Difference hash (dHash) over REAL decoded pixels — the standard
    perceptual image fingerprint: NN-resample the channel-0 plane to a
    ``grid_w x grid_h`` grid (default 9x8, the canonical dHash shape)
    with the same all-integer mapping as :func:`resize_media_real`
    (``src = (j*src_dim) // out_dim``), then bit ``i*(grid_w-1)+j`` is
    set iff ``grid[i][j+1] > grid[i][j]`` — 64 bits capturing local
    gradient STRUCTURE, invariant to resolution and monotone brightness
    shifts (unlike m14's exact pixel md5, which only unifies encodings
    of bit-identical pixels). Emitted as two non-negative 32-bit halves
    (``dhash_hi`` = grid rows 0..3, ``dhash_lo`` = rows 4..7) so a SQL
    oracle sums powers of two without BIGINT sign overflow, and
    Hamming-band blocking (the d5 pigeonhole play) can reuse either
    half as a coarse bucket. Non-image payloads quarantine (NULL row)
    unless ``strict=True``.

    Partition-local Arrow-batched mapInPandas, ZERO shuffle; grouping /
    banding on the emitted 16 bytes is the caller's (m17's) one
    digest-sized exchange.
    """
    import numpy as np

    from . import imagecodec

    half = grid_h // 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in DHASH_SCHEMA}
            nullable = tuple(
                f.name for f in DHASH_SCHEMA if f.name != "doc_id"
            )
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = imagecodec.decode_image(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    _quarantine(out, nullable)
                    continue
                w, h = img.width, img.height
                plane = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
                    h, w, img.channels
                )[:, :, 0]
                g = plane[_nn_indices(grid_h, h)][
                    :, _nn_indices(grid_w, w)
                ].astype(np.int64)
                bits = g[:, 1:] > g[:, :-1]  # grid_h x (grid_w-1)
                shifts = np.arange(grid_w - 1, dtype=np.int64)
                row_vals = (bits.astype(np.int64) << shifts).sum(axis=1)
                row_shift = np.int64(grid_w - 1)
                hi = int(
                    (row_vals[:half]
                     << (np.arange(half, dtype=np.int64) * row_shift)).sum()
                )
                lo = int(
                    (row_vals[half:]
                     << (np.arange(grid_h - half, dtype=np.int64)
                         * row_shift)).sum()
                )
                out["width"].append(w)
                out["height"].append(h)
                out["dhash_hi"].append(hi)
                out["dhash_lo"].append(lo)
            yield pd.DataFrame(out).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "dhash_hi": "Int64",
                    "dhash_lo": "Int64",
                }
            )

    return df.mapInPandas(run, schema=DHASH_SCHEMA)


def dhash_neardup_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    grid_w: int = 9,
    grid_h: int = 8,
) -> DataFrame:
    """All image pairs within ``max_hamming`` bits on the dHash
    (columns ``doc_id``/``dhash_hi``/``dhash_lo`` from
    :func:`perceptual_hash`) — WITHOUT all-pairs: the 64-bit
    fingerprint splits into 4 16-bit bands, and a pair differing in
    <= 3 bits must agree exactly in at least one band (pigeonhole), so
    candidates come from 4 band-bucket equi-joins and a row-local XOR
    popcount verifies; ``distinct`` collapses multi-band hits.
    Recall-LOSSLESS for ``max_hamming <= 3`` (enforced — 4 bands
    cannot pigeonhole 4 scattered flips). Output: (doc_a, doc_b,
    hamming), doc_a < doc_b.

    ``grid_w``/``grid_h`` must match the :func:`perceptual_hash` call
    that produced ``hashed`` and are validated here: the band split is
    only correct when each hash half carries exactly 32 bits
    (``(grid_w-1) * (grid_h//2) == 32`` per half — the default 9x8, or
    e.g. 5x16); any other grid raises rather than silently losing
    recall on bits above the banded 32.

    ``max_bucket`` is the enforced hot-key cap (d3/d17 house rule):
    band buckets holding more than ``max_bucket`` rows are dropped
    WHOLE before the pair join, capping per-key fanout at
    ``max_bucket²`` — a degenerate band value (e.g. flat-color images
    hashing to a constant band) can no longer make one bucket
    quadratic. A pair is then emitted iff it agrees in at least one
    surviving band; callers' oracles must mirror the same rule.
    ``None`` disables the cap.

    Scale: one exchange per join side on the 16-bit bucket keys (the
    bucket-count filter shuffles on the SAME keys); pair volume is the
    sum of per-bucket products (never corpus²), bounded by
    ``max_bucket``.
    """
    if max_hamming > 3:
        raise ValueError(
            f"4 fixed bands pigeonhole at most 3 flips; got {max_hamming}"
        )
    half = grid_h // 2
    if (grid_w - 1) * half != 32 or (grid_w - 1) * (grid_h - half) != 32:
        raise ValueError(
            "dhash_neardup_pairs bands 32-bit halves into 4x16 bits; "
            f"grid {grid_w}x{grid_h} gives {(grid_w - 1) * half}/"
            f"{(grid_w - 1) * (grid_h - half)}-bit halves — incompatible"
        )
    bands = hashed.select(
        "doc_id", "dhash_hi", "dhash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("dhash_hi").bitwiseAND(F.lit(65535)).alias("bval"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftright("dhash_hi", 16).alias("bval"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    F.col("dhash_lo").bitwiseAND(F.lit(65535)).alias("bval"),
                ),
                F.struct(
                    F.lit(3).alias("band"),
                    F.shiftright("dhash_lo", 16).alias("bval"),
                ),
            )
        ).alias("bk"),
    ).select(
        "doc_id", "dhash_hi", "dhash_lo",
        F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"),
    )
    if max_bucket is not None:
        cool = (
            bands.groupBy("band", "bval")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket)
            .select("band", "bval")
        )
        bands = bands.join(cool, on=["band", "bval"])
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("dhash_hi").alias("a_hi"),
        F.col("dhash_lo").alias("a_lo"), "band", "bval",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("dhash_hi").alias("b_hi"),
        F.col("dhash_lo").alias("b_lo"), "band", "bval",
    )
    ham = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    )
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(ham <= max_hamming)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .distinct()
    )


SCENE_CUTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_cuts", T.IntegerType(), True),
        T.StructField("first_cut_idx", T.IntegerType(), True),
        T.StructField("mean_mad", T.DoubleType(), True),
    ]
)


def scene_cuts(
    df: DataFrame, thresh: float = 50.0, strict: bool = False
) -> DataFrame:
    """Scene-cut detection over REAL decoded video — the temporal
    feature of the codec family (decode: m12; spatial: m16; spectral:
    m13): decode the Y4M stream (:mod:`operators.videocodec`), compute
    the mean absolute LUMA difference (MAD) between every consecutive
    frame pair, and call a cut where ``MAD >= thresh`` — the classic
    shot-boundary primitive a video curation pipeline runs before
    per-scene frame sampling (one keyframe per scene beats every-N
    sampling for training-data diversity). Emits per clip: true frame
    count, cut count, first cut's frame index (NULL when no cut) and
    the mean MAD across pairs (NULL for single-frame clips — no pair
    exists, which must stay distinguishable from a quiet clip).
    Chroma is deliberately excluded (luma carries scene identity; the
    m12 convention). Non-Y4M / corrupt payloads yield one quarantine
    row unless ``strict=True``.

    Partition-local Arrow-batched mapInPandas, ZERO shuffle; frames
    never leave the task that decoded them — at 100 TB the operator
    scales by executors, and only clip-grain stats cross the wire.
    """
    import numpy as np

    from . import videocodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in SCENE_CUTS_SCHEMA}
            nullable = tuple(
                f.name for f in SCENE_CUTS_SCHEMA if f.name != "doc_id"
            )
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    vid = videocodec.decode_y4m(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    _quarantine(out, nullable)
                    continue
                n = vid.n_frames
                mads = []
                prev = None
                for idx in range(n):
                    y = np.frombuffer(
                        vid.y_plane(idx), dtype=np.uint8
                    ).astype(np.int64)
                    if prev is not None:
                        mads.append(float(np.abs(y - prev).mean()))
                    prev = y
                cuts = [k + 1 for k, m in enumerate(mads) if m >= thresh]
                out["n_frames"].append(n)
                out["n_cuts"].append(len(cuts))
                out["first_cut_idx"].append(cuts[0] if cuts else None)
                out["mean_mad"].append(
                    sum(mads) / len(mads) if mads else None
                )
            yield pd.DataFrame(out).astype(
                {
                    "n_frames": "Int32",
                    "n_cuts": "Int32",
                    "first_cut_idx": "Int32",
                    "mean_mad": "float64",
                }
            )

    return df.mapInPandas(run, schema=SCENE_CUTS_SCHEMA)


PNG_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("meta_key", T.StringType(), True),
        T.StructField("meta_value", T.StringType(), True),
    ]
)


def synthesize_png_with_text(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gradient PNGs carrying REAL ``tEXt`` metadata chunks (m20 corpus
    builder): every id gets ``source = cam-<id%7>``; ids divisible by 3
    also get ``author = u<id%11>`` — closed-form strings a SQL oracle
    regenerates exactly. Partition-local mapInPandas, no shuffle."""
    from .imagecodec import append_text_chunks, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].astype("int64")
            payloads = []
            for i in ids:
                w, h = int(4 + i % 13), int(3 + i % 11)
                px = bytes(
                    32 + (x + 3 * y) % 95
                    for y in range(h)
                    for x in range(w)
                )
                chunks = [("source", f"cam-{int(i) % 7}")]
                if i % 3 == 0:
                    chunks.append(("author", f"u{int(i) % 11}"))
                payloads.append(
                    append_text_chunks(
                        encode_png(w, h, 1, px, filter_type=4), chunks
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_png_metadata(df: DataFrame, strict: bool = False) -> DataFrame:
    """PNG ``tEXt`` metadata extraction (the EXIF-role sidecar read a
    multimodal catalog runs at ingest): one (doc_id, meta_key,
    meta_value) row per tEXt chunk, in stream order. A VALID PNG with
    no metadata emits no rows (absence is a legitimate answer —
    downstream joins are left joins); a NON-decodable or CRC-corrupt
    payload emits one quarantine row (NULL key/value) unless
    ``strict=True`` — corrupt and empty must stay distinguishable.

    Partition-local Arrow-batched mapInPandas, zero shuffle; the
    fan-out (chunks per image) streams inside batches like m4/m12.
    """
    from . import imagecodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k.name: [] for k in PNG_META_SCHEMA}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    chunks = imagecodec.read_text_chunks(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    out["doc_id"].append(doc_id)
                    out["meta_key"].append(None)
                    out["meta_value"].append(None)
                    continue
                for k, v in chunks:
                    out["doc_id"].append(doc_id)
                    out["meta_key"].append(k)
                    out["meta_value"].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=PNG_META_SCHEMA)
