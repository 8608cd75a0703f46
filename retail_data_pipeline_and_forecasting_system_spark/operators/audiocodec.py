"""Stdlib-only WAV (RIFF/PCM) decoding for the multimodal audio path.

No audio library ships in this environment (no soundfile/ffmpeg), but
canonical WAV is a RIFF chunk walk over raw PCM — fully decodable with
``struct`` alone. This module is the audio twin of
:mod:`operators.imagecodec`: the real body behind
:func:`operators.multimodal.decode_audio_real`, validated against
externally-produced files from the stdlib ``wave`` writer in
``tests/test_audiocodec.py``.

Supported: RIFF/WAVE with a PCM ``fmt `` chunk (format tag 1), 8- or
16-bit samples, 1–8 channels; unknown chunks (LIST/INFO/JUNK/fact/cue)
are skipped per spec including the odd-size pad byte. Unsupported
variants (float PCM, ADPCM, WAVE_FORMAT_EXTENSIBLE, 24/32-bit) raise
``ValueError`` with a precise reason — never a silent wrong decode.

Hostile-payload guards mirror the PNG decoder's (the round-5 ADVICE
pattern): declared sizes are bounded by the actual byte string and by
``MAX_DECODED_BYTES`` *before* any allocation, absurd fmt fields
(zero/huge rates, zero block align) are rejected, and ``struct.error``
is normalized to ``ValueError`` so one quarantine except-clause catches
every bad payload.

Scale note: decoding is per-row CPU with zero data dependencies — it
lives inside the multimodal ``mapInPandas`` stage, partition-local, no
shuffle; cap ``spark.sql.files.maxPartitionBytes`` when payloads
dominate rows (see operators/multimodal.py module docstring).
"""

from __future__ import annotations

import struct
import sys
from array import array
from dataclasses import dataclass

# Bound on the PCM payload we will materialize from a declared chunk
# size: a hostile header must raise, never OOM an executor.
MAX_DECODED_BYTES = 64 * 1024 * 1024

_MAX_SAMPLE_RATE = 384_000
_MAX_CHANNELS = 8


@dataclass(frozen=True)
class DecodedAudio:
    """Raw decoded audio: ``pcm`` is little-endian interleaved samples
    exactly as stored in the data chunk; ``n_samples`` counts frames
    (one frame = one sample per channel)."""

    sample_rate: int
    channels: int
    bit_depth: int
    n_samples: int
    pcm: bytes


def sniff_wav(data: bytes) -> bool:
    """True when ``data`` starts with a RIFF/WAVE container header."""
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> DecodedAudio:
    """Decode a RIFF/WAVE byte string with the stdlib only (struct).

    Walks the chunk list (skipping unknown chunks and their pad bytes),
    validates the PCM ``fmt `` chunk, and returns the raw data-chunk
    bytes plus typed header fields. Raises ``ValueError`` on any
    corrupt, truncated, unsupported, or hostile payload.
    """
    data = bytes(data)
    if not sniff_wav(data):
        raise ValueError("wav: bad RIFF/WAVE signature")
    try:
        (riff_size,) = struct.unpack("<I", data[4:8])
    except struct.error as ex:
        raise ValueError(f"wav: corrupt header ({ex})") from ex
    # The declared RIFF size bounds the walk; never trust it past the
    # actual byte string.
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt: tuple[int, int, int, int, int] | None = None
    pcm: bytes | None = None
    while pos + 8 <= end:
        ckid = data[pos : pos + 4]
        (cksize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if cksize > MAX_DECODED_BYTES:
            raise ValueError(
                f"wav: chunk {ckid!r} declares {cksize} bytes, "
                f"exceeds cap {MAX_DECODED_BYTES}"
            )
        if body_start + cksize > end:
            raise ValueError(f"wav: truncated {ckid!r} chunk")
        body = data[body_start : body_start + cksize]
        if ckid == b"fmt ":
            if cksize < 16:
                raise ValueError("wav: fmt chunk too short")
            try:
                tag, channels, rate, _brate, balign, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
            except struct.error as ex:
                raise ValueError(f"wav: corrupt fmt chunk ({ex})") from ex
            if tag != 1:
                raise ValueError(
                    f"wav: unsupported format tag {tag} (only PCM=1)"
                )
            if bits not in (8, 16):
                raise ValueError(f"wav: unsupported bit depth {bits}")
            if not 1 <= channels <= _MAX_CHANNELS:
                raise ValueError(f"wav: implausible channel count {channels}")
            if not 1 <= rate <= _MAX_SAMPLE_RATE:
                raise ValueError(f"wav: implausible sample rate {rate}")
            if balign != channels * bits // 8:
                raise ValueError(
                    f"wav: block align {balign} != channels*bits/8"
                )
            fmt = (tag, channels, rate, balign, bits)
        elif ckid == b"data":
            pcm = body
        # all other chunks (LIST, JUNK, fact, cue, ...) are skipped
        pos = body_start + cksize + (cksize & 1)  # odd sizes pad 1 byte
    if fmt is None:
        raise ValueError("wav: missing fmt chunk")
    if pcm is None:
        raise ValueError("wav: missing data chunk")
    _tag, channels, rate, balign, bits = fmt
    if len(pcm) % balign:
        raise ValueError("wav: data chunk not a whole number of frames")
    return DecodedAudio(rate, channels, bits, len(pcm) // balign, pcm)


def samples_int(audio: DecodedAudio) -> array:
    """Decode ``audio.pcm`` to a flat signed-int sample array
    (interleaved when multi-channel). 16-bit is signed little-endian;
    8-bit WAV is unsigned with a 128 bias per spec, centred here."""
    if audio.bit_depth == 16:
        arr = array("h")
        arr.frombytes(audio.pcm)
        if sys.byteorder == "big":
            arr.byteswap()
        return arr
    arr = array("b")
    arr.frombytes(bytes((b - 128) & 0xFF for b in audio.pcm))
    return arr


def decode_audio(data: bytes) -> DecodedAudio:
    """Sniff and decode; normalizes ``struct.error`` to ``ValueError``
    so a caller's quarantine path catches every bad payload with one
    except clause (the decode_image contract)."""
    try:
        return decode_wav(bytes(data))
    except struct.error as ex:
        raise ValueError(f"wav: corrupt payload ({ex})") from ex


# ------------------------------------------------------------ test helper


def encode_wav(
    pcm: bytes,
    sample_rate: int = 8000,
    bit_depth: int = 16,
    channels: int = 1,
    junk_chunk: bool = False,
) -> bytes:
    """Minimal RIFF/WAVE ENCODER (fixture builder, not a product path):
    writes a canonical header around raw little-endian PCM bytes.
    ``junk_chunk=True`` inserts a LIST chunk (with an odd-length body,
    so the pad byte is exercised) before ``data`` — decoding such files
    proves :func:`decode_wav` genuinely walks chunks rather than
    assuming the canonical 44-byte layout."""
    balign = channels * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,
        channels,
        sample_rate,
        sample_rate * balign,
        balign,
        bit_depth,
    )

    def chunk(ckid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    chunks = chunk(b"fmt ", fmt)
    if junk_chunk:
        chunks += chunk(b"LIST", b"INFOIART" + struct.pack("<I", 5) + b"spark")
    chunks += chunk(b"data", pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
