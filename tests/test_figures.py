"""S19 figure sink: PNG encoding from the spec (no imaging libs in the
container) + the dashboard figure fan-out over the analytics artifact
frames.  Checks are structural (chunk layout, CRC, decoded pixels) and
behavioral (series colors present, heatmap ramp ordering, determinism)
— not golden files."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.sinks import figures as fig


def _decode_png(path: str) -> np.ndarray:
    """Independent minimal decoder for the subset write_png emits
    (8-bit RGB, filter 0) — verifies the file against the spec rather
    than trusting the encoder's own code paths."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF, "chunk CRC"
        if tag == b"IHDR":
            w, h, depth, ctype, *_ = struct.unpack(">IIBBBBB", payload)
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = [raw[i * stride : (i + 1) * stride] for i in range(len(raw) // stride)]
    assert all(r[0] == 0 for r in rows), "only filter 0 emitted"
    return np.frombuffer(b"".join(r[1:] for r in rows), np.uint8).reshape(-1, w, 3)


def test_write_png_round_trips_pixels(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(31, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    fig.write_png(p, img)
    assert np.array_equal(_decode_png(p), img)
    with pytest.raises(ValueError):
        fig.write_png(p, img.astype(np.int32))


def test_line_chart_draws_each_series_deterministically(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, t, float(t * (i + 1))) for i, s in enumerate("AB") for t in range(10)],
        "sym string, t int, v double",
    )
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    fig.line_chart(df, "t", "v", series="sym", path=p1)
    fig.line_chart(df, "t", "v", series="sym", path=p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()  # deterministic
    img = _decode_png(p1)
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    assert fig.PALETTE[0] in colors and fig.PALETTE[1] in colors
    with pytest.raises(ValueError, match="aggregate"):
        fig.line_chart(df, "t", "v", max_points=5)


def test_bar_chart_heights_follow_values(spark, tmp_path):
    df = spark.createDataFrame([(0, 1.0), (1, 4.0)], "k int, v double")
    p = str(tmp_path / "bar.png")
    fig.bar_chart(df, "k", "v", path=p)
    img = _decode_png(p)
    bar = np.all(img == np.array(fig.PALETTE[0]), axis=2)
    cols = np.where(bar.any(axis=0))[0]
    mid = (cols.min() + cols.max()) // 2
    h_left = bar[:, cols[cols <= mid]].sum(axis=0).max()
    h_right = bar[:, cols[cols > mid]].sum(axis=0).max()
    assert h_right == pytest.approx(4 * h_left, rel=0.05)  # 4.0 vs 1.0


def test_heatmap_diverging_ramp_orders_cells(spark, tmp_path):
    df = spark.createDataFrame(
        [("r", "c0", 0.0), ("r", "c1", 0.5), ("r", "c2", 1.0)],
        "r string, c string, v double",
    )
    p = str(tmp_path / "hm.png")
    fig.heatmap(df, "r", "c", "v", path=p)
    img = _decode_png(p)
    cell, m = 24, fig._MARGIN
    lowc = img[cell // 2, m + 1 + cell // 2]
    midc = img[cell // 2, m + 1 + cell + cell // 2]
    highc = img[cell // 2, m + 1 + 2 * cell + cell // 2]
    assert tuple(lowc) == (0, 0, 255)      # min → blue
    assert tuple(midc) == (255, 255, 255)  # middle → white
    assert tuple(highc) == (255, 0, 0)     # max → red


def test_hist_chart_bins_spark_side(spark, tmp_path):
    # 100 values at 0.0 and 300 at 1.0: the two occupied bins' bar
    # heights must be in 1:3 ratio, and binning happens in Spark (only
    # bucket counts are collected, so no max_points cap applies).
    df = spark.createDataFrame(
        [(0.0,)] * 100 + [(1.0,)] * 300 + [(None,)], "v double"
    )
    p = str(tmp_path / "h.png")
    fig.hist_chart(df, "v", bins=10, path=p)
    img = _decode_png(p)
    bar = np.all(img == np.array(fig.PALETTE[0]), axis=2)
    cols = np.where(bar.any(axis=0))[0]
    mid = (cols.min() + cols.max()) // 2
    h_low = bar[:, cols[cols <= mid]].sum(axis=0).max()
    h_high = bar[:, cols[cols > mid]].sum(axis=0).max()
    assert h_high == pytest.approx(3 * h_low, rel=0.05)


def test_scatter_chart_places_points_and_base_line(spark, tmp_path):
    pts = spark.createDataFrame([(0.0, 0.0), (10.0, 10.0)], "x double, y double")
    base = spark.createDataFrame(
        [(float(i), 5.0) for i in range(11)], "x double, y double"
    )
    p = str(tmp_path / "s.png")
    fig.scatter_chart(pts, "x", "y", base=base, path=p)
    img = _decode_png(p)
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    assert fig.PALETTE[0] in colors   # base polyline
    assert fig.PALETTE[3] in colors   # highlight dots
    # dots at opposite corners of the plot area: bottom-left, top-right
    dots = np.all(img == np.array(fig.PALETTE[3]), axis=2)
    ys, xs = np.where(dots)
    assert ys.max() - ys.min() > 100 and xs.max() - xs.min() > 100


def test_line_chart_dual_normalizes_each_series(spark, tmp_path):
    # y1 rises in [0, 1], y2 falls in [1000, 2000]: with per-series
    # normalization BOTH polylines span the full vertical range (and
    # cross, so neither fully overdraws the other).
    df = spark.createDataFrame(
        [(i, i / 9.0, 2000.0 - 1000.0 * i / 9.0) for i in range(10)],
        "t int, a double, b double",
    )
    p = str(tmp_path / "d.png")
    fig.line_chart_dual(df, "t", "a", "b", path=p)
    img = _decode_png(p)
    for color in (fig.PALETTE[0], fig.PALETTE[1]):
        mask = np.all(img == np.array(color), axis=2)
        ys = np.where(mask.any(axis=1))[0]
        assert ys.max() - ys.min() > (img.shape[0] - fig._MARGIN) * 0.9, color


def test_golden_pixels_fixed_size(spark):
    # Golden-pixel gate at fixed size: a fixed synthetic frame rendered
    # at 320x200 must decode to EXACTLY the committed golden's pixels.
    # Pixel-level (not byte-level) so a zlib version bump can't flake
    # it; any rasterizer change that moves one pixel fails here and the
    # golden must be consciously regenerated
    # (tools/regen_figure_golden.py).
    import os

    df = spark.createDataFrame(
        [(s, t, float((t * (i + 2) * 7919) % 101)) for i, s in enumerate("AB") for t in range(50)],
        "sym string, t int, v double",
    )
    got = fig.line_chart(df, "t", "v", series="sym", width=320, height=200)
    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "line_chart_320x200.png"
    )
    assert os.path.exists(golden_path), "golden missing — run tools/regen_figure_golden.py"
    assert np.array_equal(got, _decode_png(golden_path))


def test_write_figures_renders_dashboard_set(spark, tmp_path):
    # End-to-end S19: the same artifact dict the analytics CLI writes
    # as CSVs renders the reference dashboard's panels as valid PNGs —
    # and with the raw feature frame supplied, the full reference
    # figure set (binance_analysis.py:251-284,:701-721) renders 1:1.
    from kp_crypto_market_analytics_spark.analytics.pipeline import (
        add_features,
        analytics_fanout,
    )
    from kp_crypto_market_analytics_spark.session import load_tables
    from kp_crypto_market_analytics_spark.streaming.candles import candles_from_trades

    e = load_tables(spark, "/root/testdata/sf0.001", ["events"])["events"].selectExpr(
        "event_type AS symbol", "ts AS trade_time", "value AS price",
        "value AS qty", "event_id AS trade_id",
    )
    feats = add_features(candles_from_trades(e, watermark=None))
    arts = analytics_fanout(feats)
    try:
        written = fig.write_figures(arts, str(tmp_path / "figs"), features=feats)
    finally:
        feats.unpersist()
    names = sorted(p.rsplit("/", 1)[-1] for p in written)
    assert names == [
        "activity_heatmap.png", "anomalies_absret.png", "correlation.png",
        "daily_avg.png", "dow_profile.png", "monthly_volume.png",
        "price_and_vol.png", "returns_hist.png", "vol_vs_volume_scatter.png",
    ]
    for p in written:
        img = _decode_png(p)
        assert img.size > 0 and len({tuple(c) for c in img.reshape(-1, 3)}) > 1


def test_thin_evenly_caps_oversized_frames(spark, tmp_path):
    # The raw-frame dashboard panels must render at ANY input size:
    # write_figures thins the per-minute frame to the chart collect
    # caps, so >100k minutes per symbol can no longer crash the CLI
    # after the CSV artifacts were written (figures stay additive).
    small = spark.range(10).selectExpr("id AS t", "CAST(id AS DOUBLE) AS v")
    assert fig.thin_evenly(small, "t", cap=100).count() == 10  # no-op under cap

    big = spark.range(250_123).selectExpr(
        "id AS t",
        "CAST(id % 97 AS DOUBLE) AS a",
        "CAST(id % 31 AS DOUBLE) AS b",
    )
    th = fig.thin_evenly(big, "t", cap=1000)
    got = th.collect()
    assert len(got) <= 1000
    assert got[0]["t"] == 0  # first row always kept
    ts = [r["t"] for r in got]
    strides = {b - a for a, b in zip(ts, ts[1:])}
    assert len(strides) == 1  # even stride, deterministic order
    assert got == fig.thin_evenly(big, "t", cap=1000).collect()

    # An over-cap frame renders through the dual-axis panel instead of
    # raising once thinned.
    p = str(tmp_path / "big.png")
    fig.line_chart_dual(th, "t", "a", "b", path=p)
    assert _decode_png(p).size > 0
