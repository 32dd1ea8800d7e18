"""Regenerate the committed golden-pixel figure(s) for
tests/test_figures.py::test_golden_pixels_fixed_size.

Run ONLY after a conscious rasterizer change: the golden pins the exact
pixel output of the deterministic renderer at a fixed size, so any
accidental one-pixel drift in scaling/rasterization fails the test
instead of silently changing every figure artifact.

Usage: python tools/regen_figure_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main() -> None:
    from kp_crypto_market_analytics_spark.session import get_spark
    from kp_crypto_market_analytics_spark.sinks import figures as fig

    spark = get_spark("golden")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # MUST match the frame in test_golden_pixels_fixed_size exactly.
    df = spark.createDataFrame(
        [
            (s, t, float((t * (i + 2) * 7919) % 101))
            for i, s in enumerate("AB")
            for t in range(50)
        ],
        "sym string, t int, v double",
    )
    path = os.path.join(GOLDEN_DIR, "line_chart_320x200.png")
    fig.line_chart(df, "t", "v", series="sym", width=320, height=200, path=path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
