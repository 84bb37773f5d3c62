"""Plot sinks (SURVEY S9 / M17 rendering) — dependency-free SVG/HTML.

The reference renders matplotlib PNGs and plotly HTML on the driver:
word-frequency bars (``preprocessing.py:400-456``), per-topic keyword
panels and the docs-per-topic distribution (``LDA_Analysis.py:614-677``),
and the BERTopic barchart / similarity heatmap / topic-map HTML
(``BERTopic_Analysis.py:730-833``). This module keeps the same posture —
rendering is a DRIVER-SIDE sink over cluster-reduced aggregates (top-k
tables, K x K matrices, never corpus-sized data) — but the renderer is
stdlib-only: deterministic SVG, plus a standalone HTML wrapper, so the
sink works in a bare container and the artifacts are byte-stable under
test.

Every renderer accepts a small Spark DataFrame, enforces a driver-safe
row cap before ``toPandas()`` (the no-corpus-collect invariant), and
returns the SVG as a string (also writing ``path`` when given) so tests
parse the XML directly.

Visual system: single-hue marks (series blue) with direct labels — one
series per chart, so no legend; sequential magnitude uses the one-hue
blue ramp light->dark; text wears ink tokens, never the series color;
rounded data-ends on bars; recessive grid; every mark carries an SVG
``<title>`` tooltip.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

# validated light-mode palette (single source: the engine renders static
# light-surface artifacts, like the reference's white-facecolor PNGs)
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e7e6e1"
AXIS = "#d8d7d2"
SERIES = "#2a78d6"  # categorical slot 1 (blue)
# sequential blue ramp, light -> dark (steps 100..700)
SEQ_RAMP = (
    "#cde2fb", "#b7d3f6", "#9ec5f4", "#86b6ef", "#6da7ec", "#5598e7",
    "#3987e5", "#2a78d6", "#256abf", "#1c5cab", "#184f95", "#104281",
    "#0d366b",
)
FONT = "system-ui, -apple-system, 'Helvetica Neue', Arial, sans-serif"

# driver-side sinks render reduced aggregates only; anything larger is a
# pipeline bug, not a big chart
MAX_ROWS = 10_000


def _collect(df: DataFrame, limit: int = MAX_ROWS):
    rows = df.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"plot sink got > {limit} rows — plots render cluster-reduced "
            "aggregates (top-k tables, K x K matrices), not corpus data; "
            "aggregate before rendering"
        )
    return rows


def _fmt(v) -> str:
    if isinstance(v, float):
        if not math.isfinite(v):  # one bad cell must not kill the render
            return str(v)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.3f}".rstrip("0").rstrip(".")
    return str(v)


def _ticks(vmax: float, n: int = 4) -> list:
    """Round tick positions covering [0, vmax]."""
    if vmax <= 0:
        return [0.0]
    raw = vmax / n
    mag = 10 ** math.floor(math.log10(raw))
    for m in (1, 2, 2.5, 5, 10):
        if m * mag >= raw:
            step = m * mag
            break
    k = int(math.ceil(vmax / step))
    return [round(i * step, 10) for i in range(k + 1)]


def _vbar(x: float, y: float, w: float, h: float, fill: str, tip: str) -> str:
    """Vertical bar, 4px-rounded top data-end, square baseline."""
    r = min(4.0, w / 2, h)
    d = (
        f"M{x:.2f},{y + h:.2f} L{x:.2f},{y + r:.2f} "
        f"Q{x:.2f},{y:.2f} {x + r:.2f},{y:.2f} L{x + w - r:.2f},{y:.2f} "
        f"Q{x + w:.2f},{y:.2f} {x + w:.2f},{y + r:.2f} L{x + w:.2f},{y + h:.2f} Z"
    )
    return f'<path d="{d}" fill="{fill}"><title>{escape(tip)}</title></path>'


def _hbar(x: float, y: float, w: float, h: float, fill: str, tip: str) -> str:
    """Horizontal bar, 4px-rounded right data-end, square baseline."""
    r = min(4.0, h / 2, w)
    d = (
        f"M{x:.2f},{y:.2f} L{x + w - r:.2f},{y:.2f} "
        f"Q{x + w:.2f},{y:.2f} {x + w:.2f},{y + r:.2f} "
        f"L{x + w:.2f},{y + h - r:.2f} "
        f"Q{x + w:.2f},{y + h:.2f} {x + w - r:.2f},{y + h:.2f} "
        f"L{x:.2f},{y + h:.2f} Z"
    )
    return f'<path d="{d}" fill="{fill}"><title>{escape(tip)}</title></path>'


def _svg(width: float, height: float, title: str, body: list) -> str:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
        f'height="{height:.0f}" viewBox="0 0 {width:.0f} {height:.0f}" '
        f'font-family="{FONT}" role="img">'
        f"<title>{escape(title)}</title>"
        f'<rect width="{width:.0f}" height="{height:.0f}" fill="{SURFACE}"/>'
        f'<text x="16" y="26" font-size="15" font-weight="600" '
        f'fill="{INK}">{escape(title)}</text>'
    )
    return head + "".join(body) + "</svg>"


def _write(svg: str, path) -> str:
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg


def plot_word_frequency(
    df: DataFrame,
    path=None,
    word_col: str = "word",
    count_col: str = "n",
    top_n: int = 30,
    title: str = "Top word frequencies",
) -> str:
    """Vertical word-frequency bars (``preprocessing.py:400-456``): top-N
    words by count, value labels on the bars only while they stay
    readable (<= 12 bars — selective labeling, unlike the reference's
    label-every-bar), rotated word labels, horizontal gridlines."""
    rows = sorted(
        _collect(df), key=lambda r: (-r[count_col], r[word_col])
    )[:top_n]
    n = len(rows)
    bw, gap = (28.0, 8.0) if n <= 40 else (16.0, 4.0)
    ml, mt, mb, mr = 64.0, 48.0, 72.0, 16.0
    ph = 260.0
    width = ml + n * (bw + gap) + mr
    height = mt + ph + mb
    vmax = max((r[count_col] for r in rows), default=0)
    if not (vmax > 0):  # all-zero/negative/NaN data: keep the axis sane
        vmax = 1
    ticks = _ticks(vmax)
    scale = ph / ticks[-1]
    body = []
    for t in ticks:
        y = mt + ph - t * scale
        body.append(
            f'<line x1="{ml:.1f}" y1="{y:.1f}" x2="{width - mr:.1f}" '
            f'y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>'
            f'<text x="{ml - 8:.1f}" y="{y + 4:.1f}" font-size="11" '
            f'text-anchor="end" fill="{INK_2}">{_fmt(t)}</text>'
        )
    for i, r in enumerate(rows):
        x = ml + i * (bw + gap)
        h = r[count_col] * scale
        y = mt + ph - h
        body.append(
            _vbar(x, y, bw, h, SERIES, f"{r[word_col]} — {_fmt(r[count_col])}")
        )
        if n <= 12:
            body.append(
                f'<text x="{x + bw / 2:.1f}" y="{y - 6:.1f}" font-size="11" '
                f'text-anchor="middle" fill="{INK_2}">{_fmt(r[count_col])}</text>'
            )
        cx = x + bw / 2
        ly = mt + ph + 12
        body.append(
            f'<text x="{cx:.1f}" y="{ly:.1f}" font-size="11" fill="{INK}" '
            f'text-anchor="end" transform="rotate(-45 {cx:.1f} {ly:.1f})">'
            f"{escape(str(r[word_col]))}</text>"
        )
    body.append(
        f'<line x1="{ml:.1f}" y1="{mt + ph:.1f}" x2="{width - mr:.1f}" '
        f'y2="{mt + ph:.1f}" stroke="{AXIS}" stroke-width="1"/>'
    )
    return _write(_svg(width, height, title, body), path)


def plot_topic_keywords(
    df: DataFrame,
    path=None,
    topic_col: str = "label",
    word_col: str = "word",
    weight_col: str = "weight",
    cols: int = 3,
    title: str = "Topic keywords",
) -> str:
    """Small-multiples horizontal keyword bars per topic
    (``LDA_Analysis.py:620-638``; BERTopic's ``visualize_barchart``): one
    panel per topic, bars proportional to keyword weight, words as
    y-labels. Single hue — topic identity is the panel heading, not a
    color."""
    rows = _collect(df)
    topics: dict = {}
    for r in rows:
        topics.setdefault(r[topic_col], []).append(r)
    keys = sorted(topics)
    for k in keys:
        topics[k].sort(key=lambda r: (-r[weight_col], r[word_col]))
    bar_h, gap = 14.0, 4.0
    label_w, bar_w = 110.0, 150.0
    pw = label_w + bar_w + 24.0
    max_rows = max((len(v) for v in topics.values()), default=0)
    panel_h = 30.0 + max_rows * (bar_h + gap) + 10.0
    ncol = min(cols, max(1, len(keys)))
    nrow = math.ceil(len(keys) / ncol) if keys else 1
    ml, mt = 16.0, 44.0
    width = ml + ncol * pw + 16.0
    height = mt + nrow * panel_h + 16.0
    body = []
    for idx, k in enumerate(keys):
        px = ml + (idx % ncol) * pw
        py = mt + (idx // ncol) * panel_h
        body.append(
            f'<text x="{px:.1f}" y="{py + 14:.1f}" font-size="13" '
            f'font-weight="600" fill="{INK}">Topic {escape(str(k))}</text>'
        )
        wmax = max((r[weight_col] for r in topics[k]), default=0) or 1
        for j, r in enumerate(topics[k]):
            y = py + 24.0 + j * (bar_h + gap)
            w = max(1.0, r[weight_col] / wmax * bar_w)
            body.append(
                f'<text x="{px + label_w - 6:.1f}" y="{y + bar_h - 3:.1f}" '
                f'font-size="11" text-anchor="end" fill="{INK}">'
                f"{escape(str(r[word_col]))}</text>"
            )
            body.append(
                _hbar(
                    px + label_w, y, w, bar_h, SERIES,
                    f"{r[word_col]} — {_fmt(r[weight_col])}",
                )
            )
    return _write(_svg(width, height, title, body), path)


def plot_topic_distribution(
    df: DataFrame,
    path=None,
    topic_col: str = "topic",
    count_col: str = "n_docs",
    title: str = "Documents per topic",
) -> str:
    """Docs-per-dominant-topic bars (``LDA_Analysis.py:643-677``,
    BERTopic topic_info counts). K is small, so every bar carries its
    count — the reference's label-every-bar here coincides with the
    selective-label rule."""
    rows = sorted(_collect(df), key=lambda r: r[topic_col])
    n = len(rows)
    bw, gap = 44.0, 12.0
    ml, mt, mb, mr = 64.0, 48.0, 40.0, 16.0
    ph = 220.0
    width = ml + n * (bw + gap) + mr
    height = mt + ph + mb
    vmax = max((r[count_col] for r in rows), default=0)
    if not (vmax > 0):  # all-zero/negative/NaN data: keep the axis sane
        vmax = 1
    ticks = _ticks(vmax)
    scale = ph / ticks[-1]
    body = []
    for t in ticks:
        y = mt + ph - t * scale
        body.append(
            f'<line x1="{ml:.1f}" y1="{y:.1f}" x2="{width - mr:.1f}" '
            f'y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>'
            f'<text x="{ml - 8:.1f}" y="{y + 4:.1f}" font-size="11" '
            f'text-anchor="end" fill="{INK_2}">{_fmt(t)}</text>'
        )
    for i, r in enumerate(rows):
        x = ml + i * (bw + gap)
        h = r[count_col] * scale
        y = mt + ph - h
        body.append(
            _vbar(x, y, bw, h, SERIES, f"Topic {r[topic_col]} — {_fmt(r[count_col])}")
        )
        body.append(
            f'<text x="{x + bw / 2:.1f}" y="{y - 6:.1f}" font-size="11" '
            f'text-anchor="middle" fill="{INK_2}">{_fmt(r[count_col])}</text>'
        )
        body.append(
            f'<text x="{x + bw / 2:.1f}" y="{mt + ph + 16:.1f}" font-size="11" '
            f'text-anchor="middle" fill="{INK}">T{escape(str(r[topic_col]))}</text>'
        )
    body.append(
        f'<line x1="{ml:.1f}" y1="{mt + ph:.1f}" x2="{width - mr:.1f}" '
        f'y2="{mt + ph:.1f}" stroke="{AXIS}" stroke-width="1"/>'
    )
    return _write(_svg(width, height, title, body), path)


def plot_topic_heatmap(
    df: DataFrame,
    path=None,
    row_col: str = "label_a",
    col_col: str = "label_b",
    value_col: str = "cosine",
    title: str = "Topic similarity",
    vmin: float = 0.0,
    vmax: float = 1.0,
) -> str:
    """K x K similarity heatmap (BERTopic ``visualize_heatmap``,
    ``BERTopic_Analysis.py:808-815``) from the long-form matrix the
    engine's similarity queries emit. Magnitude maps onto the one-hue
    sequential ramp; cell values are printed while K stays small, with
    ink flipping to white on dark cells."""
    rows = _collect(df)
    ra = sorted({r[row_col] for r in rows})
    rb = sorted({r[col_col] for r in rows})
    cell = 44.0 if len(rb) <= 12 else 22.0
    ml, mt = 90.0, 64.0
    width = ml + len(rb) * cell + 24.0
    height = mt + len(ra) * cell + 24.0
    span = (vmax - vmin) or 1.0
    body = []
    for j, b in enumerate(rb):
        x = ml + j * cell + cell / 2
        body.append(
            f'<text x="{x:.1f}" y="{mt - 10:.1f}" font-size="11" '
            f'text-anchor="middle" fill="{INK_2}">{escape(str(b))}</text>'
        )
    for i, a in enumerate(ra):
        body.append(
            f'<text x="{ml - 8:.1f}" y="{mt + i * cell + cell / 2 + 4:.1f}" '
            f'font-size="11" text-anchor="end" fill="{INK_2}">'
            f"{escape(str(a))}</text>"
        )
    idx = {(r[row_col], r[col_col]): r[value_col] for r in rows}
    for i, a in enumerate(ra):
        for j, b in enumerate(rb):
            v = idx.get((a, b))
            if v is None:
                continue
            t = min(1.0, max(0.0, (v - vmin) / span))
            step = min(len(SEQ_RAMP) - 1, int(t * len(SEQ_RAMP)))
            x, y = ml + j * cell, mt + i * cell
            # 2px surface gap between adjacent fills
            body.append(
                f'<rect x="{x + 1:.1f}" y="{y + 1:.1f}" width="{cell - 2:.1f}" '
                f'height="{cell - 2:.1f}" rx="3" fill="{SEQ_RAMP[step]}">'
                f"<title>{escape(f'{a} x {b} — {_fmt(v)}')}</title></rect>"
            )
            if cell >= 40:
                ink = "#ffffff" if step >= 7 else INK
                body.append(
                    f'<text x="{x + cell / 2:.1f}" y="{y + cell / 2 + 4:.1f}" '
                    f'font-size="10" text-anchor="middle" fill="{ink}">'
                    f"{v:.2f}</text>"
                )
    return _write(_svg(width, height, title, body), path)


def plot_topic_map(
    df: DataFrame,
    path=None,
    topic_col: str = "label",
    x_col: str = "x",
    y_col: str = "y",
    size_col=None,
    title: str = "Topic map",
) -> str:
    """2-D topic scatter (BERTopic ``visualize_topics``,
    ``BERTopic_Analysis.py:784-792``): one marker per topic at its
    projected coordinates (caller supplies the 2-D reduction — e.g. the
    PCA twin's scores), radius optionally by topic size. Identity rides
    on the direct label next to each marker, not on color, so K is not
    capped by a categorical palette."""
    rows = _collect(df)
    ml, mt, size = 48.0, 48.0, 320.0
    width = ml + size + 72.0
    height = mt + size + 32.0
    xs = [r[x_col] for r in rows] or [0.0]
    ys = [r[y_col] for r in rows] or [0.0]
    xmin, xmax = min(xs), max(xs)
    ymin, ymax = min(ys), max(ys)
    xspan = (xmax - xmin) or 1.0
    yspan = (ymax - ymin) or 1.0
    if size_col:
        smax = max((r[size_col] for r in rows), default=1) or 1
    body = [
        f'<rect x="{ml:.1f}" y="{mt:.1f}" width="{size:.1f}" '
        f'height="{size:.1f}" fill="none" stroke="{AXIS}"/>'
    ]
    for r in rows:
        cx = ml + (r[x_col] - xmin) / xspan * (size - 24) + 12
        cy = mt + size - ((r[y_col] - ymin) / yspan * (size - 24) + 12)
        rad = 5.0 + (9.0 * math.sqrt(r[size_col] / smax) if size_col else 0.0)
        body.append(
            f'<circle cx="{cx:.1f}" cy="{cy:.1f}" r="{rad:.1f}" '
            f'fill="{SERIES}" stroke="{SURFACE}" stroke-width="2">'
            f"<title>{escape(f'Topic {r[topic_col]}')}</title></circle>"
        )
        body.append(
            f'<text x="{cx + rad + 4:.1f}" y="{cy + 4:.1f}" font-size="11" '
            f'fill="{INK}">T{escape(str(r[topic_col]))}</text>'
        )
    return _write(_svg(width, height, title, body), path)


def export_html_report(path, sections) -> str:
    """Bundle rendered SVGs into one standalone HTML file (the engine's
    substitute for the reference's per-figure HTML/PNG artifact
    directory, ``BERTopic_Analysis.py:730-833``). ``sections`` is an
    iterable of (heading, svg_string). Static artifact on a light
    surface, matching the reference's white-facecolor exports."""
    parts = [
        "<!DOCTYPE html><html lang='en'><head><meta charset='utf-8'>",
        "<title>Topic modeling report</title>",
        "<style>body{margin:2rem auto;max-width:1100px;color-scheme:light;",
        f"background:{SURFACE};color:{INK};font-family:{FONT};}}",
        f"h2{{font-size:1.1rem;color:{INK};}}figure{{margin:1.5rem 0;}}",
        "</style></head><body><h1>Topic modeling report</h1>",
    ]
    for heading, svg in sections:
        parts.append(f"<figure><h2>{escape(heading)}</h2>{svg}</figure>")
    parts.append("</body></html>")
    html = "".join(parts)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(html)
    return html


def plot_topic_hierarchy(
    steps_df: DataFrame,
    mapping_df: DataFrame = None,
    path=None,
    title: str = "Topic hierarchy",
) -> str:
    """Dendrogram of the topic-reduction merge log (BERTopic
    ``visualize_hierarchy``, ``BERTopic_Analysis.py:795-800``), fed by
    the ``topic_merge_steps`` query (step, into_root, from_root, cosine)
    — merge height is cosine distance (1 - cos). ``mapping_df``
    (``topic_reduction``'s label->merged_topic) supplies leaves that
    never merged so singleton topics still appear."""
    steps = sorted(_collect(steps_df), key=lambda r: r["step"])
    leaves = set()
    if mapping_df is not None:
        leaves |= {r["label"] for r in _collect(mapping_df)}
    for s in steps:
        leaves |= {s["into_root"], s["from_root"]}
    trees = {l: ("leaf", l, 0.0) for l in sorted(leaves)}
    for s in steps:
        a, b = s["into_root"], s["from_root"]
        h = 1.0 - s["cosine"]
        trees[a] = ("join", trees[a], trees[b], h)
        del trees[b]

    n = len(leaves)
    ml, mt, mb = 48.0, 48.0, 36.0
    lw = 44.0
    ph = 240.0
    width = ml + n * lw + 24.0
    height = mt + ph + mb
    hmax = max((1.0 - s["cosine"] for s in steps), default=0.0) or 1.0

    xpos: dict = {}
    cursor = [0]
    body: list = []

    def _y(h: float) -> float:
        return mt + ph - (h / hmax) * (ph - 20.0)

    def layout(node):
        """Returns (x, height) drawing the subtree; leaves get sequential
        x slots in traversal order."""
        if node[0] == "leaf":
            x = ml + (cursor[0] + 0.5) * lw
            cursor[0] += 1
            xpos[node[1]] = x
            body.append(
                f'<text x="{x:.1f}" y="{mt + ph + 18:.1f}" font-size="11" '
                f'text-anchor="middle" fill="{INK}">T{escape(str(node[1]))}</text>'
            )
            return x, 0.0
        _, left, right, h = node
        xl, hl = layout(left)
        xr, hr = layout(right)
        y = _y(h)
        for xc, hc in ((xl, hl), (xr, hr)):
            body.append(
                f'<line x1="{xc:.1f}" y1="{_y(hc):.1f}" x2="{xc:.1f}" '
                f'y2="{y:.1f}" stroke="{SERIES}" stroke-width="2"/>'
            )
        body.append(
            f'<line x1="{xl:.1f}" y1="{y:.1f}" x2="{xr:.1f}" y2="{y:.1f}" '
            f'stroke="{SERIES}" stroke-width="2">'
            f"<title>{escape(f'merge at cos {1.0 - h:.3f}')}</title></line>"
        )
        return (xl + xr) / 2.0, h

    for root in sorted(trees):
        layout(trees[root])
    body.append(
        f'<line x1="{ml:.1f}" y1="{mt + ph:.1f}" x2="{width - 24:.1f}" '
        f'y2="{mt + ph:.1f}" stroke="{AXIS}" stroke-width="1"/>'
    )
    return _write(_svg(width, height, title, body), path)
