"""Stdlib Y4M codec (operators/videocodec.py) + the real frame-sample path.

The golden literal below is a hand-assembled YUV4MPEG2 stream written
from the published spec (mjpegtools Y4M documentation), NOT by this
repo's ``encode_y4m`` — decoding it exercises header parsing (including
the no-C-tag default colorspace and ignored I/A tags), the FRAME walk
with per-frame parameters, and planar slicing against independent bytes.
Round-trip tests then cover every supported colorspace, hostile-payload
guards, the evenly-spaced sampling law, and the Spark-side
:func:`sample_frames_real` path end-to-end.
"""

from __future__ import annotations

import hashlib

import pytest

from retail_data_pipeline_and_forecasting_system_spark.operators.videocodec import (
    MAX_DECODED_BYTES,
    decode_y4m,
    encode_y4m,
    sniff_y4m,
)

# 2x2 C420 (spec default — no C tag), 30000:1001 fps, interlace/aspect
# tags present, TWO frames, the second FRAME line carrying a parameter.
# Frame layout per spec: Y (4 bytes) + U (1) + V (1).
GOLDEN_2X2_TWO_FRAMES = (
    b"YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1\n"
    b"FRAME\n" + bytes([10, 20, 30, 40, 128, 128])
    + b"FRAME Xparam\n" + bytes([50, 60, 70, 80, 127, 129])
)


def test_golden_literal_decodes_exactly():
    vid = decode_y4m(GOLDEN_2X2_TWO_FRAMES)
    assert (vid.width, vid.height) == (2, 2)
    assert (vid.fps_num, vid.fps_den) == (30000, 1001)
    assert vid.colorspace == "C420"  # spec default, no C tag in header
    assert vid.n_frames == 2
    assert list(vid.y_plane(0)) == [10, 20, 30, 40]
    assert list(vid.y_plane(1)) == [50, 60, 70, 80]
    assert vid.frames[1] == bytes([50, 60, 70, 80, 127, 129])


@pytest.mark.parametrize(
    "cs,chroma_bytes",
    [("C420", 2), ("C420jpeg", 2), ("C422", 4), ("C444", 8), ("Cmono", 0)],
)
def test_roundtrip_every_colorspace(cs, chroma_bytes):
    w, h = 2, 2
    y_frames = [bytes([i * 16 + j for j in range(w * h)]) for i in range(3)]
    vid = decode_y4m(encode_y4m(w, h, y_frames, fps=(25, 1), colorspace=cs))
    assert vid.colorspace == cs
    assert vid.n_frames == 3
    for i in range(3):
        assert vid.y_plane(i) == y_frames[i]
        assert len(vid.frames[i]) == w * h + chroma_bytes


def test_frame_params_and_fps_kept():
    vid = decode_y4m(
        encode_y4m(4, 2, [bytes(8)], fps=(24000, 1001), frame_param=b" Xtag")
    )
    assert (vid.fps_num, vid.fps_den) == (24000, 1001)
    assert vid.n_frames == 1


def test_hostile_payloads_raise_valueerror_precisely():
    with pytest.raises(ValueError, match="signature"):
        decode_y4m(b"JPEG4MPEG2 W2 H2 F25:1\n")
    with pytest.raises(ValueError, match="header line"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1")  # no newline
    with pytest.raises(ValueError, match="implausible dimensions"):
        decode_y4m(b"YUV4MPEG2 W0 H2 F25:1\n")
    with pytest.raises(ValueError, match="implausible dimensions"):
        decode_y4m(b"YUV4MPEG2 W99999 H2 F25:1\n")
    with pytest.raises(ValueError, match="frame rate"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:0\n")
    with pytest.raises(ValueError, match="corrupt header token"):
        decode_y4m(b"YUV4MPEG2 W2x H2 F25:1\n")
    with pytest.raises(ValueError, match="unsupported colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C411\n")
    with pytest.raises(ValueError, match="4:2:0"):
        decode_y4m(b"YUV4MPEG2 W3 H2 F25:1 C420\n")
    with pytest.raises(ValueError, match="4:2:2"):
        decode_y4m(b"YUV4MPEG2 W3 H2 F25:1 C422\nFRAME\n" + bytes(9))
    # dims whose single-frame volume exceeds the cap must raise BEFORE
    # any frame allocation (8192x8192 C444 = 192 MiB/frame > 64 MiB cap)
    assert 8192 * 8192 * 3 > MAX_DECODED_BYTES
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_y4m(b"YUV4MPEG2 W8192 H8192 F25:1 C444\n")
    whole = encode_y4m(2, 2, [bytes(4), bytes(4)])
    with pytest.raises(ValueError, match="truncated final frame"):
        decode_y4m(whole[:-1])
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(whole[:-12] + b"XRAME\n" + bytes(6))
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1\n")


def test_sniff_y4m():
    assert sniff_y4m(GOLDEN_2X2_TWO_FRAMES)
    assert not sniff_y4m(b"plain text payload")


def test_sample_frames_real_evenly_spaced_selection(spark):
    """n_frames > max_frames: picks are floor(j*n/max) — true frame
    indices and fps-derived timestamps, not a resequenced 0..max range."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        sample_frames_real,
    )

    # 10 frames at 25 fps, distinct uniform luma per frame
    y_frames = [bytes([k * 7 + 1]) * 4 for k in range(10)]
    payload = encode_y4m(2, 2, y_frames, fps=(25, 1))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = sorted(
        sample_frames_real(df, max_frames=4).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 5, 7]
    assert all(r["n_frames"] == 10 for r in rows)
    assert [r["ts_ms"] for r in rows] == [0, 80, 200, 280]
    assert [r["mean_luma"] for r in rows] == [1.0, 15.0, 36.0, 50.0]
    assert rows[1]["frame_md5"] == hashlib.md5(bytes([15]) * 4).hexdigest()


def test_sample_frames_real_quarantine_and_strict(spark):
    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        sample_frames_real,
    )

    rows = [
        (1, bytearray(GOLDEN_2X2_TWO_FRAMES)),
        (2, bytearray(b"not video at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sample_frames_real(df).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2  # both golden frames sampled
    # timestamps from the golden stream's 30000:1001 fps (33 ms, floor)
    assert sorted(r["ts_ms"] for r in by_doc[1]) == [0, 33]
    assert len(by_doc[2]) == 1  # ONE visible quarantine row
    assert by_doc[2][0]["n_frames"] is None
    assert by_doc[2][0]["frame_idx"] == 0

    with pytest.raises(Exception):
        sample_frames_real(df, strict=True).collect()


def test_synthesize_y4m_payloads_are_genuine_streams(spark):
    """The m12 corpus builder emits real YUV4MPEG2 streams whose decoded
    fields match the closed-form oracle expressions exactly."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        sample_frames_real,
        synthesize_y4m_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(13)], "doc_id long")
    got = sample_frames_real(synthesize_y4m_payloads(ids), max_frames=8).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(13):
        w, h, n = 2 * (2 + i % 4), 2 * (1 + i % 3), 1 + i % 6
        rows = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(n))
        for k, r in enumerate(rows):
            v = 32 + (i + 7 * k) % 95
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
            assert r["ts_ms"] == k * 40
            assert r["mean_luma"] == float(v)
            assert r["frame_md5"] == hashlib.md5(bytes([v]) * (w * h)).hexdigest()


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    w2=st.integers(1, 6),
    h2=st.integers(1, 5),
    n_frames=st.integers(1, 6),
    cs=st.sampled_from(["C420", "C422", "C444", "Cmono"]),
    fps=st.sampled_from([(25, 1), (30000, 1001), (24, 1)]),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_y4m_roundtrip_property(w2, h2, n_frames, cs, fps, data):
    """decode(encode(frames)) == frames for arbitrary luma content across
    all colorspaces, sizes, frame counts and rates — the FRAME walk and
    planar slicing are true inverses, not tuned to the fixed fixtures."""
    w, h = 2 * w2, 2 * h2  # even dims valid under every subsampling
    n = w * h
    y_frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
        for _ in range(n_frames)
    ]
    vid = decode_y4m(encode_y4m(w, h, y_frames, fps=fps, colorspace=cs))
    assert (vid.width, vid.height) == (w, h)
    assert (vid.fps_num, vid.fps_den) == fps
    assert vid.n_frames == n_frames
    for i in range(n_frames):
        assert vid.y_plane(i) == y_frames[i]


@given(data=st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_decoder_total_on_arbitrary_bytes(data):
    """Totality: on ARBITRARY bytes decode_y4m either succeeds or raises
    ValueError — never IndexError/struct.error/etc. This is the whole
    quarantine contract: sample_frames_real catches exactly ValueError."""
    for payload in (data, b"YUV4MPEG2" + data, b"YUV4MPEG2 " + data):
        try:
            decode_y4m(payload)
        except ValueError:
            pass
