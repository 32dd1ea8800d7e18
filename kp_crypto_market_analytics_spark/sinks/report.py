"""Static HTML report — the serving analog of the reference's
Streamlit dashboard (src/dashboard/app.py:109-230) without a server
process.

The reference dashboard is a read-only viewer over the analytics
artifacts: PNG figures, CSV tables, JSON summaries.  This module
renders the same read surface into ONE self-contained HTML file
(figures base64-inlined, tables row-capped like the dashboard's
``max_rows``), so the engine's write path has a symmetric read path:
`analytics` produces the artifact dir, `report` publishes it.

Pure Python by design — the report is a presentation edge over files
already on disk; it must not need a SparkSession (the dashboard
doesn't), and it must work on any artifact dir regardless of which
engine produced it.
"""

from __future__ import annotations

import base64
import csv
import glob
import html
import json
import os

MAX_ROWS = 30  # the reference dashboard's show_df_text max_rows


def _read_artifact_csv(path: str, max_rows: int = MAX_ROWS):
    """(header, rows) from a Spark CSV artifact dir (part files with a
    header each) or a plain .csv file; rows capped at ``max_rows``."""
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "part-*.csv")))
    else:
        parts = [path]
    header: list[str] | None = None
    rows: list[list[str]] = []
    for p in parts:
        with open(p, newline="") as f:
            r = csv.reader(f)
            try:
                h = next(r)
            except StopIteration:
                continue
            if header is None:
                header = h
            for row in r:
                rows.append(row)
                if len(rows) >= max_rows:
                    return header, rows
    return header or [], rows


def _table_html(title: str, header: list[str], rows: list[list[str]]) -> str:
    th = "".join(f"<th>{html.escape(c)}</th>" for c in header)
    trs = "".join(
        "<tr>" + "".join(f"<td>{html.escape(v)}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return (
        f'<section id="{html.escape(title)}"><h2>{html.escape(title)}</h2>'
        f"<table><thead><tr>{th}</tr></thead><tbody>{trs}</tbody></table>"
        f"</section>"
    )


def _figure_html(name: str, png_path: str) -> str:
    with open(png_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode("ascii")
    cap = html.escape(name)
    return (
        f'<figure><img alt="{cap}" src="data:image/png;base64,{b64}"/>'
        f"<figcaption>{cap}</figcaption></figure>"
    )


_STYLE = """
body { font-family: sans-serif; margin: 2rem; max-width: 72rem; }
h1 { border-bottom: 2px solid #444; padding-bottom: .3rem; }
table { border-collapse: collapse; margin: .5rem 0 1.5rem; }
th, td { border: 1px solid #bbb; padding: .25rem .6rem; font-size: .85rem; }
th { background: #eee; }
figure { display: inline-block; margin: .5rem; }
img { max-width: 34rem; border: 1px solid #ccc; }
figcaption { font-size: .8rem; color: #555; text-align: center; }
pre { background: #f6f6f6; padding: .6rem; overflow-x: auto; }
nav a { margin-right: 1rem; }
"""


def write_report(
    arts_dir: str,
    out_path: str | None = None,
    title: str = "KP Crypto Market Analytics — report",
) -> str:
    """Render ``arts_dir`` (the `analytics` verb's output) into one
    self-contained HTML page: every CSV artifact as a row-capped
    table, every figures/*.png inlined, every *.json summary pretty-
    printed — the full read surface of the reference dashboard.
    Returns the written path."""
    out_path = out_path or os.path.join(arts_dir, "report.html")
    sections: list[str] = []
    toc: list[str] = []

    # JSON summaries (dashboard: summary_*.json via st.json)
    for p in sorted(glob.glob(os.path.join(arts_dir, "*.json"))):
        name = os.path.basename(p)
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        body = html.escape(json.dumps(doc, indent=2, default=str))
        sections.append(
            f'<section id="{html.escape(name)}"><h2>{html.escape(name)}'
            f"</h2><pre>{body}</pre></section>"
        )
        toc.append(name)

    # CSV artifact tables (dashboard: show_df_text over every CSV)
    entries = sorted(os.listdir(arts_dir)) if os.path.isdir(arts_dir) else []
    for name in entries:
        p = os.path.join(arts_dir, name)
        is_csv_dir = os.path.isdir(p) and glob.glob(
            os.path.join(p, "part-*.csv")
        )
        if not (is_csv_dir or name.endswith(".csv")):
            continue
        header, rows = _read_artifact_csv(p)
        if header:
            sections.append(_table_html(name, header, rows))
            toc.append(name)

    # figures (dashboard: show_img over figs/*.png), base64-inlined so
    # the page is a single publishable file
    figs = sorted(glob.glob(os.path.join(arts_dir, "figures", "*.png")))
    if figs:
        imgs = "".join(
            _figure_html(os.path.basename(p), p) for p in figs
        )
        sections.append(f'<section id="figures"><h2>Figures</h2>{imgs}</section>')
        toc.append("figures")

    nav = "".join(
        f'<a href="#{html.escape(t)}">{html.escape(t)}</a>' for t in toc
    )
    page = (
        "<!doctype html><html><head><meta charset='utf-8'/>"
        f"<title>{html.escape(title)}</title><style>{_STYLE}</style></head>"
        f"<body><h1>{html.escape(title)}</h1><nav>{nav}</nav>"
        + "".join(sections)
        + "</body></html>"
    )
    with open(out_path, "w") as f:
        f.write(page)
    return out_path
