"""Round-8 operators: hand-built-corpus tests independent of the DuckDB
oracles (the done-bundle's second leg) for the REAL image resize and
REAL visual features paths (round-7 verdict Missing #1)."""

from __future__ import annotations

import hashlib

from retail_data_pipeline_and_forecasting_system_spark.operators.imagecodec import (
    encode_png,
)
from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
    extract_features_real,
    resize_media_real,
    synthesize_gradient_png_payloads,
)


def _png(w, h, c, px, filt=0):
    return bytearray(encode_png(w, h, c, bytes(px), filter_type=filt))


def test_resize_media_real_hand_values(spark):
    """NN resize checked against by-hand source-index math:
    4x2 gray [[10,20,30,40],[50,60,70,80]] to long-edge 2 ->
    rw=2, rh=max(1,(2*2)//4)=1; sy=[0], sx=[(0*4)//2,(1*4)//2]=[0,2]
    -> resized bytes [10,30]; garbage quarantines to a NULL row."""
    rows = [
        (1, _png(4, 2, 1, [10, 20, 30, 40, 50, 60, 70, 80], filt=1)),
        (2, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in resize_media_real(df, target=2).collect()}

    r = got[1]
    assert (r["width"], r["height"]) == (4, 2)
    assert (r["rs_width"], r["rs_height"]) == (2, 1)
    assert r["resized_md5"] == hashlib.md5(bytes([10, 30])).hexdigest()
    assert r["rs_mean_luma"] == 20.0

    bad = got[2]
    assert bad["rs_width"] is None and bad["resized_md5"] is None


def test_resize_media_real_upsample_and_rgb(spark):
    """Upsample (2x3 -> long-edge 6: rw=4, rh=6, sx=[0,0,1,1]) must
    REPLICATE source pixels, and RGB planes resize interleaved."""
    # 2x3 gray, column values [1, 2] on every row
    gray = _png(2, 3, 1, [1, 2] * 3, filt=2)
    # 2x1 RGB: pixel0=(9,8,7), pixel1=(3,2,1) -> target 4: rw=4, rh=2
    rgb = _png(2, 1, 3, [9, 8, 7, 3, 2, 1], filt=4)
    df = spark.createDataFrame(
        [(1, gray), (2, rgb)], "doc_id long, payload binary"
    )
    by_id = {
        r["doc_id"]: r
        for r in resize_media_real(df, target=6).collect()
        if r["doc_id"] == 1
    }
    r = by_id[1]
    assert (r["rs_width"], r["rs_height"]) == (4, 6)
    # every output row is [1,1,2,2]; 6 rows
    assert r["resized_md5"] == hashlib.md5(bytes([1, 1, 2, 2] * 6)).hexdigest()
    assert r["rs_mean_luma"] == 1.5

    r2 = {
        r["doc_id"]: r for r in resize_media_real(df, target=4).collect()
    }[2]
    # rw=4 (sx=[0,0,1,1]), rh=max(1,(1*4)//2)=2 (sy=[0,0])
    want = bytes([9, 8, 7, 9, 8, 7, 3, 2, 1, 3, 2, 1] * 2)
    assert (r2["rs_width"], r2["rs_height"]) == (4, 2)
    assert r2["resized_md5"] == hashlib.md5(want).hexdigest()


def test_extract_features_real_hand_values(spark):
    """Pixel stats + edge counts by hand: 3x2 gray
    [[0,5,20],[100,6,21]], thresh 8 -> h diffs |5|,|15|;|94|,|15| = 3
    edges; v diffs |100|,|1|,|1| = 1 edge; sum 152, min 0, max 100."""
    rows = [
        (1, _png(3, 2, 1, [0, 5, 20, 100, 6, 21], filt=3)),
        (2, bytearray(b"\x89PNG truncated garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_features_real(df, edge_thresh=8).collect()
    }
    r = got[1]
    assert (r["width"], r["height"], r["channels"]) == (3, 2, 1)
    assert (r["n_pixels"], r["sum_px"]) == (6, 152)
    assert r["mean_px"] == 152.0 / 6
    assert (r["min_px"], r["max_px"]) == (0, 100)
    assert (r["h_edges"], r["v_edges"]) == (3, 1)
    assert got[2]["n_pixels"] is None and got[2]["h_edges"] is None


def test_extract_features_real_rgb_channel0_edges(spark):
    """Multichannel: sum/min/max run over ALL samples, edge counts over
    channel 0 only — an image whose R plane is flat but G jumps must
    report zero edges."""
    # 2x1 RGB: (50, 0, 0) and (50, 255, 0)
    df = spark.createDataFrame(
        [(7, _png(2, 1, 3, [50, 0, 0, 50, 255, 0]))],
        "doc_id long, payload binary",
    )
    r = extract_features_real(df, edge_thresh=8).collect()[0]
    assert r["channels"] == 3
    assert (r["h_edges"], r["v_edges"]) == (0, 0)
    assert (r["sum_px"], r["min_px"], r["max_px"]) == (355, 0, 255)
    assert r["n_pixels"] == 6


def test_gradient_corpus_round_trips_for_both_ops(spark):
    """The registry corpus: gradient PNGs decode to the closed-form
    grid — spot-check doc 0 (4x3, pixel(x,y)=32+(x+3y)%95) through
    both real operators against pure-Python recomputation."""
    ids = spark.createDataFrame([(0,)], "doc_id long")
    payload_df = synthesize_gradient_png_payloads(ids)

    w, h = 4, 3
    grid = [[32 + (x + 3 * y) % 95 for x in range(w)] for y in range(h)]

    r = resize_media_real(payload_df, target=8).collect()[0]
    rw, rh = (w * 8) // 4, (h * 8) // 4  # long edge 4 -> 8x6
    sx = [(j * w) // rw for j in range(rw)]
    sy = [(i * h) // rh for i in range(rh)]
    want = bytes(grid[y][x] for y in sy for x in sx)
    assert (r["rs_width"], r["rs_height"]) == (rw, rh)
    assert r["resized_md5"] == hashlib.md5(want).hexdigest()
    assert r["rs_mean_luma"] == sum(want) / len(want)

    f = extract_features_real(payload_df, edge_thresh=8).collect()[0]
    flat = [v for row in grid for v in row]
    assert (f["n_pixels"], f["sum_px"]) == (12, sum(flat))
    h_edges = sum(
        1
        for y in range(h)
        for x in range(w - 1)
        if abs(grid[y][x + 1] - grid[y][x]) >= 8
    )
    v_edges = sum(
        1
        for y in range(h - 1)
        for x in range(w)
        if abs(grid[y + 1][x] - grid[y][x]) >= 8
    )
    assert (f["h_edges"], f["v_edges"]) == (h_edges, v_edges)
