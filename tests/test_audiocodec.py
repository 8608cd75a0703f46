"""Stdlib WAV codec (operators/audiocodec.py) + the real audio decode path.

The primary fixtures are EXTERNALLY-produced files from the stdlib
``wave`` writer — bytes this repo's own ``encode_wav`` never touched —
so decoding them exercises the RIFF chunk walk, fmt validation, and PCM
extraction against a real-world encoder. Round-trip and property tests
then cover both bit depths, multichannel interleaving, junk chunks with
odd-size pad bytes, and the Spark-side :func:`decode_audio_real` path
end-to-end (including quarantine and strict mode).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from retail_data_pipeline_and_forecasting_system_spark.operators.audiocodec import (
    MAX_DECODED_BYTES,
    decode_audio,
    decode_wav,
    encode_wav,
    samples_int,
    sniff_wav,
)


def _stdlib_wav(pcm: bytes, rate: int, sampwidth: int, channels: int) -> bytes:
    """Externally-produced WAV: the stdlib ``wave`` writer, not encode_wav."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def test_stdlib_wave_writer_16bit_decodes_exactly():
    samples = [0, 1000, -1000, 32767, -32768, 42]
    pcm = struct.pack("<6h", *samples)
    audio = decode_wav(_stdlib_wav(pcm, 44100, 2, 1))
    assert (audio.sample_rate, audio.channels, audio.bit_depth) == (44100, 1, 16)
    assert audio.n_samples == 6
    assert audio.pcm == pcm
    assert list(samples_int(audio)) == samples


def test_stdlib_wave_writer_8bit_is_unsigned_with_bias():
    # 8-bit WAV stores unsigned bytes; samples_int centres them at 0
    pcm = bytes([0, 128, 255, 200])
    audio = decode_wav(_stdlib_wav(pcm, 8000, 1, 1))
    assert (audio.bit_depth, audio.n_samples) == (8, 4)
    assert list(samples_int(audio)) == [-128, 0, 127, 72]


def test_stdlib_wave_writer_stereo_frames():
    pcm = struct.pack("<8h", *range(8))  # 4 frames x 2 channels
    audio = decode_wav(_stdlib_wav(pcm, 16000, 2, 2))
    assert (audio.channels, audio.n_samples) == (2, 4)
    assert list(samples_int(audio)) == list(range(8))  # interleaved


def test_junk_chunk_and_odd_pad_byte_walked():
    """encode_wav(junk_chunk=True) inserts an odd-length LIST chunk before
    data — decoding proves a genuine chunk walk, and the decoded output
    is byte-identical to the junk-free file's."""
    pcm = struct.pack("<5h", 1, -2, 3, -4, 5)
    plain = decode_wav(encode_wav(pcm, 22050, 16, 1, junk_chunk=False))
    junked = decode_wav(encode_wav(pcm, 22050, 16, 1, junk_chunk=True))
    assert plain == junked
    assert junked.pcm == pcm


def test_roundtrip_matches_stdlib_writer_bytes():
    """encode_wav's canonical (junk-free) output decodes identically to
    the stdlib writer's file for the same parameters."""
    pcm = struct.pack("<6h", *[100 * i for i in range(6)])
    ours = decode_wav(encode_wav(pcm, 8000, 16, 2))
    theirs = decode_wav(_stdlib_wav(pcm, 8000, 2, 2))
    assert ours == theirs


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    sampwidth=st.sampled_from([1, 2]),
    channels=st.integers(1, 4),
    n_frames=st.integers(1, 40),
    data=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_decode_matches_stdlib_writer_property(
    rate, sampwidth, channels, n_frames, data
):
    n = n_frames * channels * sampwidth
    pcm = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    audio = decode_wav(_stdlib_wav(pcm, rate, sampwidth, channels))
    assert (audio.sample_rate, audio.channels) == (rate, channels)
    assert audio.bit_depth == sampwidth * 8
    assert audio.n_samples == n_frames
    assert audio.pcm == pcm


def test_hostile_payloads_raise_valueerror_precisely():
    good = encode_wav(struct.pack("<4h", 1, 2, 3, 4), 8000, 16, 1)

    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"RIFX....WAVE")
    # truncation at every prefix must raise ValueError, never struct.error
    for cut in range(0, len(good) - 1, 7):
        with pytest.raises(ValueError):
            decode_audio(good[:cut])
    # chunk declaring more bytes than the cap, before any allocation
    huge = bytearray(good)
    data_pos = good.find(b"data")
    huge[data_pos + 4 : data_pos + 8] = struct.pack("<I", MAX_DECODED_BYTES + 1)
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_wav(bytes(huge))

    def with_fmt(tag=1, channels=1, rate=8000, balign=2, bits=16):
        fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * balign, balign, bits)
        body = (
            b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    with pytest.raises(ValueError, match="format tag"):
        decode_wav(with_fmt(tag=3))  # float PCM
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(with_fmt(bits=24, balign=3))
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(with_fmt(rate=0))
    with pytest.raises(ValueError, match="channel count"):
        decode_wav(with_fmt(channels=0))
    with pytest.raises(ValueError, match="block align"):
        decode_wav(with_fmt(balign=7))
    # fmt present, data missing (and vice versa)
    nodata = with_fmt()[: -(8 + 4)]
    fixed = nodata[:4] + struct.pack("<I", len(nodata) - 8) + nodata[8:]
    with pytest.raises(ValueError, match="missing data"):
        decode_wav(fixed)
    # data not a whole number of frames
    ragged = with_fmt()
    ragged = ragged[:-4] + b"\x00" * 3
    ragged = (
        ragged[: ragged.find(b"data") + 4] + struct.pack("<I", 3) + b"\x00" * 3
    )
    ragged = ragged[:4] + struct.pack("<I", len(ragged) - 8) + ragged[8:]
    with pytest.raises(ValueError, match="whole number of frames"):
        decode_wav(ragged)


def test_sniff_wav():
    assert sniff_wav(encode_wav(b"\x00\x00", 8000, 16, 1))
    assert not sniff_wav(b"plain text payload")
    assert not sniff_wav(b"RIFF1234AVI ")  # RIFF but not WAVE
    with pytest.raises(ValueError, match="signature"):
        decode_audio(b"plain text payload")


def test_decode_audio_real_end_to_end(spark):
    """Spark path: mixed batch of real WAV (stdlib writer + junk-chunked)
    and garbage payloads through decode_audio_real — real decodes get
    true params + PCM stats, junk gets NULL metadata, strict raises."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        decode_audio_real,
    )

    pcm16 = struct.pack("<4h", 100, -100, 300, -300)
    rows = [
        (1, bytearray(_stdlib_wav(pcm16, 16000, 2, 1))),
        (2, bytearray(encode_wav(bytes([40] * 10), 8000, 8, 1, junk_chunk=True))),
        (3, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_audio_real(df).collect()}

    assert got[1]["format"] == "wav"
    assert (got[1]["sample_rate"], got[1]["bit_depth"]) == (16000, 16)
    assert got[1]["n_samples"] == 4
    assert got[1]["duration_ms"] == 4 * 1000.0 / 16000
    assert got[1]["pcm_md5"] == hashlib.md5(pcm16).hexdigest()
    assert got[1]["mean_amp"] == 0.0

    assert got[2]["n_samples"] == 10
    assert got[2]["pcm_md5"] == hashlib.md5(bytes([40] * 10)).hexdigest()
    assert got[2]["mean_amp"] == 40 - 128  # 8-bit centring

    assert got[3]["format"] is None and got[3]["n_samples"] is None
    assert got[3]["n_bytes"] == len(b"not audio at all")

    with pytest.raises(Exception):
        decode_audio_real(df, strict=True).collect()


def test_synthesize_wav_payloads_are_genuine_wavs(spark):
    """The m11 corpus builder emits real RIFF/WAVE files whose decoded
    fields match the closed-form oracle expressions exactly."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        decode_audio_real,
        synthesize_wav_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in decode_audio_real(synthesize_wav_payloads(ids)).collect()
    }
    for i in range(12):
        n, v = 16 + i % 37, 32 + i % 95
        r = got[i]
        assert r["format"] == "wav"
        assert r["sample_rate"] == 8000 + 1000 * (i % 5)
        assert (r["channels"], r["bit_depth"]) == (1, 8)
        assert r["n_samples"] == n
        assert r["pcm_md5"] == hashlib.md5(bytes([v]) * n).hexdigest()
        assert r["mean_amp"] == float(v - 128)


def test_audio_frame_features_hand_values(spark):
    """Frame features over an externally-produced (stdlib wave) 16-bit
    clip: 32 samples alternating +1000/-1000 -> two 16-sample frames,
    each RMS=1000, zcr=15, mean=0; a 40-sample clip drops the trailing
    partial window (librosa center=False); garbage quarantines."""
    import struct

    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        audio_frame_features,
    )

    alt = [1000 if i % 2 == 0 else -1000 for i in range(32)]
    pcm32 = struct.pack("<32h", *alt)
    ramp = list(range(40))  # 40 samples -> 2 full frames, 8 dropped
    pcm40 = struct.pack("<40h", *ramp)
    rows = [
        (1, bytearray(_stdlib_wav(pcm32, 8000, 2, 1))),
        (2, bytearray(_stdlib_wav(pcm40, 8000, 2, 1))),
        (3, bytearray(b"not audio")),
        # valid but shorter than one window: must stay visible (n_frames
        # 0 marker), not vanish
        (4, bytearray(_stdlib_wav(struct.pack("<5h", *range(5)), 8000, 2, 1))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = audio_frame_features(df, frame=16, hop=16).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)

    assert len(by_doc[1]) == 2
    for r in by_doc[1]:
        assert r["rms"] == 1000.0 and r["zcr"] == 15 and r["mean_amp"] == 0.0

    assert len(by_doc[2]) == 2  # partial third window dropped
    f0 = sorted(by_doc[2], key=lambda r: r["frame_idx"])[0]
    import numpy as np

    w = np.array(ramp[:16], dtype="float64")
    assert f0["rms"] == pytest.approx(float(np.sqrt(np.mean(w * w))))
    assert f0["zcr"] == 0 and f0["mean_amp"] == 7.5

    [q] = by_doc[3]
    assert q["n_frames"] is None and q["frame_idx"] == 0  # corrupt: NULL

    [s] = by_doc[4]
    assert s["n_frames"] == 0 and s["rms"] is None  # short: zero marker


@given(data=st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_decoder_total_on_arbitrary_bytes(data):
    """Totality: on ARBITRARY bytes decode_audio either succeeds or
    raises ValueError — never struct.error/IndexError/etc. This is the
    quarantine contract decode_audio_real relies on."""
    for payload in (data, b"RIFF" + data, b"RIFF\x00\x01\x00\x00WAVE" + data):
        try:
            decode_audio(payload)
        except ValueError:
            pass
