"""Stdlib-only Y4M (YUV4MPEG2) decoding for the multimodal video path.

No video library ships in this environment (no ffmpeg/PyAV), but Y4M is
an uncompressed container — an ASCII stream header plus raw planar YUV
frames each prefixed by an ASCII ``FRAME`` line — fully decodable with
byte slicing alone. This module is the video twin of
:mod:`operators.imagecodec` / :mod:`operators.audiocodec`: the real body
behind :func:`operators.multimodal.sample_frames_real`, validated
against hand-assembled and encoder-round-tripped streams in
``tests/test_videocodec.py``.

Supported: ``YUV4MPEG2`` streams with colorspace C420 (+ the
sampling-identical C420jpeg/C420mpeg2/C420paldv tags), C422, C444 and
Cmono; any frame rate ``F<num>:<den>``; per-frame parameters after
``FRAME`` are tolerated and ignored. Unsupported colorspaces raise
``ValueError`` with a precise reason — never a silent wrong decode.

Hostile-payload guards mirror the PNG decoder's: declared dimensions are
validated and the full ``frame_bytes x n_frames`` volume is bounded by
the actual byte string and by ``MAX_DECODED_BYTES`` *before* any frame
allocation; absurd header fields (zero/huge dims, zero fps denominator,
odd dims under chroma subsampling) are rejected; a truncated final frame
raises rather than yielding a short plane.

Scale note: decoding is per-row CPU with zero data dependencies — it
lives inside the multimodal ``mapInPandas`` stage, partition-local, no
shuffle; cap ``spark.sql.files.maxPartitionBytes`` when payloads
dominate rows (see operators/multimodal.py module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

# Bound on the total decoded frame volume a stream may declare: a
# hostile header must raise, never OOM an executor.
MAX_DECODED_BYTES = 64 * 1024 * 1024

_MAX_DIM = 8192
_MAX_FPS = 1000

_MAGIC = b"YUV4MPEG2"

#: chroma-plane size as a fraction of the luma plane, per colorspace
_CHROMA_FRACTION = {
    "C420": 1 / 4,
    "C420jpeg": 1 / 4,
    "C420mpeg2": 1 / 4,
    "C420paldv": 1 / 4,
    "C422": 1 / 2,
    "C444": 1,
    "Cmono": 0,
}


@dataclass(frozen=True)
class DecodedVideo:
    """Raw decoded video: ``frames`` holds one planar YUV byte string per
    frame (Y plane first — ``width*height`` bytes — then U then V per the
    colorspace's subsampling; Cmono has Y only)."""

    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    frames: list[bytes]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    def y_plane(self, i: int) -> bytes:
        """Luma plane of frame ``i`` (the first width*height bytes)."""
        return self.frames[i][: self.width * self.height]


def sniff_y4m(data: bytes) -> bool:
    """True when ``data`` starts with the YUV4MPEG2 stream magic."""
    return data[: len(_MAGIC)] == _MAGIC


def _parse_header(line: bytes) -> tuple[int, int, int, int, str]:
    width = height = 0
    fps_num, fps_den = 0, 0
    colorspace = "C420"  # Y4M spec default when no C tag is present
    for tok in line.split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == b"C":
                colorspace = tok.decode("ascii")
            # I (interlace), A (aspect), X (comment) are tolerated/ignored
        except (ValueError, UnicodeDecodeError) as ex:
            raise ValueError(f"y4m: corrupt header token {tok!r}") from ex
    if not 1 <= width <= _MAX_DIM or not 1 <= height <= _MAX_DIM:
        raise ValueError(f"y4m: implausible dimensions {width}x{height}")
    if fps_den <= 0 or fps_num <= 0 or fps_num > _MAX_FPS * fps_den:
        raise ValueError(f"y4m: implausible frame rate {fps_num}:{fps_den}")
    if colorspace not in _CHROMA_FRACTION:
        raise ValueError(f"y4m: unsupported colorspace {colorspace!r}")
    if colorspace.startswith("C420") and (width % 2 or height % 2):
        raise ValueError(
            f"y4m: odd dimensions {width}x{height} under 4:2:0 subsampling"
        )
    if colorspace == "C422" and width % 2:
        raise ValueError(f"y4m: odd width {width} under 4:2:2 subsampling")
    return width, height, fps_num, fps_den, colorspace


def decode_y4m(data: bytes) -> DecodedVideo:
    """Decode a YUV4MPEG2 byte string with the stdlib only.

    Parses the stream header, validates every field, bounds the total
    frame volume BEFORE slicing any frame, then walks ``FRAME`` markers
    collecting raw planar frames. Raises ``ValueError`` on any corrupt,
    truncated, unsupported, or hostile payload.
    """
    data = bytes(data)
    if not sniff_y4m(data):
        raise ValueError("y4m: bad YUV4MPEG2 signature")
    nl = data.find(b"\n", len(_MAGIC))
    if nl < 0 or nl > 512:
        raise ValueError("y4m: missing/oversized stream header line")
    width, height, fps_num, fps_den, cs = _parse_header(
        data[len(_MAGIC) : nl]
    )
    luma = width * height
    frame_bytes = luma + 2 * int(luma * _CHROMA_FRACTION[cs])
    if frame_bytes > MAX_DECODED_BYTES:
        raise ValueError(
            f"y4m: frame size {frame_bytes} exceeds cap {MAX_DECODED_BYTES}"
        )
    # the remaining payload bounds the frame count before any allocation
    if (len(data) - nl) // (frame_bytes + 6) * frame_bytes > MAX_DECODED_BYTES:
        raise ValueError("y4m: declared stream volume exceeds cap")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"y4m: expected FRAME marker at byte {pos}")
        fnl = data.find(b"\n", pos + 5)
        if fnl < 0 or fnl - pos > 256:
            raise ValueError("y4m: missing/oversized FRAME header line")
        body_start = fnl + 1
        if body_start + frame_bytes > len(data):
            raise ValueError("y4m: truncated final frame")
        frames.append(data[body_start : body_start + frame_bytes])
        pos = body_start + frame_bytes
    if not frames:
        raise ValueError("y4m: stream contains no frames")
    return DecodedVideo(width, height, fps_num, fps_den, cs, frames)


# ------------------------------------------------------------ test helper


def encode_y4m(
    width: int,
    height: int,
    y_frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C420",
    frame_param: bytes = b"",
) -> bytes:
    """Minimal YUV4MPEG2 ENCODER (fixture builder, not a product path):
    writes a canonical stream around per-frame luma planes, filling
    chroma planes with the neutral value 128. ``frame_param`` (e.g.
    ``b" Xtag"``) is appended to each FRAME line so tests prove the
    decoder tolerates per-frame parameters rather than assuming a bare
    ``FRAME\\n``."""
    luma = width * height
    chroma = int(luma * _CHROMA_FRACTION[colorspace])
    header = (
        _MAGIC
        + f" W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}".encode()
        + b"\n"
    )
    out = [header]
    for y in y_frames:
        if len(y) != luma:
            raise ValueError("encode_y4m: luma plane size mismatch")
        out.append(b"FRAME" + frame_param + b"\n")
        out.append(bytes(y) + b"\x80" * (2 * chroma))
    return b"".join(out)
