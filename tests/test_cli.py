"""CLI smoke tests — the reference's own test strategy (subprocess +
OFFLINE=1, tests/test_main.py:9-18) applied to the full E1→E2→E3
pipeline: collect → load → idempotent re-load → analytics."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_cli(args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, OFFLINE="1", SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )


def test_interactive_menu_price_ticks(tmp_path):
    # Reference parity (src/main.py:67-109,113-123): bare invocation
    # drops into the interactive menu; option 1 runs price-ticks with
    # prompted params, bad numeric input falls back to defaults.
    env = dict(os.environ, OFFLINE="1", SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark"],
        input="1\n2\n0\n",
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "interactive mode" in r.stdout
    # input() prompts share stdout with the JSON result line — parse
    # from the last opening brace.
    last = r.stdout.strip().splitlines()[-1]
    out = json.loads(last[last.index("{"):])
    assert out["count"] == 2 and out["values"] == [100.0, 100.0]


def test_interactive_menu_quit_and_unknown(tmp_path):
    env = dict(os.environ, OFFLINE="1", SPARK_GRAFT_CPUS="4")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for stdin, expect in [("q\n", "Bye."), ("z\n", "Unknown option")]:
        r = subprocess.run(
            [sys.executable, "-m", "kp_crypto_market_analytics_spark"],
            input=stdin, capture_output=True, text=True, env=env, cwd=cwd,
            timeout=120,
        )
        assert r.returncode == 0 and expect in r.stdout


def test_price_ticks_offline(tmp_path):
    # main.py parity: OFFLINE price-ticks returns constant 100.0 ticks.
    r = run_cli(["price-ticks", "--n", "2", "--delay", "0"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["count"] == 2 and out["values"] == [100.0, 100.0]


def test_collect_load_analytics_pipeline(tmp_path):
    data = str(tmp_path / "data")
    table = str(tmp_path / "warehouse" / "candles")
    arts = str(tmp_path / "artifacts")

    r = run_cli(["collect-klines", "--pairs", "BTCUSDT,ETHUSDT", "--tf", "1m",
                 "--days", "1", "--out", data], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert sorted(os.listdir(data)) == [
        "klines_BTCUSDT_1m.csv", "klines_ETHUSDT_1m.csv",
    ]

    r = run_cli(["load", "--data", data, "--table", table], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    n1 = json.loads(r.stdout.strip().splitlines()[-1])["rows"]
    assert n1 == 20  # offline generator: 10 candles per pair

    # E2 idempotence: re-loading the same CSVs must not duplicate.
    r = run_cli(["load", "--data", data, "--table", table], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == n1

    r = run_cli(["analytics", "--table", table, "--out", arts, "--figures"],
                str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    produced = set(os.listdir(arts))
    assert {"daily", "monthly", "hourly", "dow", "heatmap", "correlation",
            "top_anomalies"} <= produced
    # S19: the dashboard figure set renders beside the CSV artifacts.
    figs = set(os.listdir(os.path.join(arts, "figures")))
    assert {"daily_avg.png", "monthly_volume.png", "dow_profile.png",
            "activity_heatmap.png", "correlation.png",
            # raw-frame panels (reference figure-set parity, 1:1)
            "price_and_vol.png", "returns_hist.png",
            "anomalies_absret.png", "vol_vs_volume_scatter.png"} <= figs

    # `health`: the detector-health SLO table (gated honesty audits)
    # lands beside the analytics artifacts (VERDICT r8 ask #8).
    r = run_cli(["health", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", arts], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "health_detectors" in set(os.listdir(arts))

    # `report`: the static-HTML dashboard analog must list EVERY
    # artifact the reference dashboard reads — all CSV tables as
    # sections and all PNGs inlined base64 (self-contained page).
    r = run_cli(["report", "--arts", arts], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    page_path = os.path.join(arts, "report.html")
    assert os.path.exists(page_path)
    page = open(page_path).read()
    for section in ["daily", "monthly", "hourly", "dow", "heatmap",
                    "correlation", "top_anomalies"]:
        assert f'id="{section}"' in page, section
    for fig in figs:
        assert f"<figcaption>{fig}</figcaption>" in page, fig
    assert page.count("data:image/png;base64,") >= len(figs)
    # table rows rendered, capped like the dashboard's max_rows
    assert "<td>" in page and "<th>" in page
    # the detector-health table renders with its SLO columns, and every
    # gated accuracy SLO appears with its bound boolean (r10: recall
    # floors + estimator calibration caps + degenerate-guard audit)
    assert 'id="health_detectors"' in page
    assert "<th>meets_slo</th>" in page and "<th>metric</th>" in page
    assert "<th>value</th>" in page and "<th>slo</th>" in page
    for det in ("minhash_lsh_banding", "ann_ivf_trained", "ann_pq_rerank",
                "minhash_estimator", "econometrics_guards"):
        assert f"<td>{det}</td>" in page, det
    for metric in ("recall", "mae", "abs_bias", "degenerate_null_rate"):
        assert f"<td>{metric}</td>" in page, metric


def test_cli_build_index_pq(tmp_path):
    # The PQ index build writes codebooks + codes parquet a serving
    # query can join against.
    import subprocess
    import sys

    out = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark", "build-index",
         "--kind", "pq", "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    con = duckdb.connect()
    ncb = con.execute(f"SELECT count(*) FROM '{out}/pq_codebooks/*.parquet'").fetchone()[0]
    nc = con.execute(f"SELECT count(*) FROM '{out}/pq_codes/*.parquet'").fetchone()[0]
    assert 0 < ncb <= 8 * 16
    assert nc == 500 * 8


def test_interactive_menu_collect_klines(tmp_path):
    # Menu option 2 drives the collect-klines pipeline end-to-end with
    # prompted params; a non-numeric days answer falls back to 1
    # (src/main.py:93-101 tolerant-input parity).  Completes the menu
    # coverage: 1, 2, quit, unknown.
    env = dict(os.environ, OFFLINE="1", SPARK_GRAFT_CPUS="4")
    out = str(tmp_path / "data")
    r = subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark"],
        input=f"2\nBTCUSDT\n1m\nnot-a-number\n{out}\n",
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Bad days value" in r.stdout
    assert os.listdir(out) == ["klines_BTCUSDT_1m.csv"]


def test_manifest_backend_load_and_table_ops(tmp_path):
    # E2E over the manifest table format: versioned loads, history,
    # time travel, and data-skipping reads all through the CLI.
    data, table = str(tmp_path / "data"), str(tmp_path / "wh/candles")
    os.makedirs(data, exist_ok=True)
    r = run_cli(["collect-klines", "--pairs", "BTCUSDT", "--days", "1",
                 "--out", data], cwd=data)
    assert r.returncode == 0, r.stderr[-2000:]

    r1 = run_cli(["load", "--data", data, "--table", table,
                  "--backend", "manifest"], cwd=data)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["version"] == 1 and out1["rows"] > 0

    # Idempotent re-load: new version, same row count.
    r2 = run_cli(["load", "--data", data, "--table", table,
                  "--backend", "manifest"], cwd=data)
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["version"] == 2 and out2["rows"] == out1["rows"]

    rh = run_cli(["table", "history", "--root", table], cwd=data)
    hist = [json.loads(l) for l in rh.stdout.strip().splitlines() if l.startswith("{")]
    assert [h["version"] for h in hist] == [1, 2]

    rr = run_cli(["table", "read", "--root", table, "--version", "1"], cwd=data)
    assert json.loads(rr.stdout.strip().splitlines()[-1])["rows"] == out1["rows"]


def test_collect_klines_multipage(tmp_path):
    # The paged source through the CLI: >1000 candles collect + load
    # with no gap/dup across page seams (the reference's single-shot
    # fetch silently truncated this range to 1000).
    data = str(tmp_path / "data")
    table = str(tmp_path / "warehouse" / "candles")
    env = dict(os.environ, OFFLINE="1", SPARK_GRAFT_CPUS="4",
               OFFLINE_KLINES_TOTAL="1205")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark",
         "collect-klines", "--pairs", "BTCUSDT", "--tf", "1m",
         "--days", "2", "--out", data],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    path = os.path.join(data, "klines_BTCUSDT_1m.csv")
    with open(path) as f:
        assert sum(1 for _ in f) == 1206  # header + 1205 candles
    r = subprocess.run(
        [sys.executable, "-m", "kp_crypto_market_analytics_spark",
         "load", "--data", data, "--table", table],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == 1205
