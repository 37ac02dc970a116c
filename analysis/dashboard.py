"""Render a self-contained HTML training dashboard from metrics.csv.

Capability match for the reference's live visdom dashboards
(/root/reference/lib/core.py:730-780 ``display_stats``: one line chart per
stat group plus an info window with the pretty-printed config).  Here the
training loop appends to ``metrics.csv`` (training/stats.py::MetricsCSV)
and this script turns it into one static HTML file -- openable anywhere,
no server -- with a KPI row, per-metric line charts grouped like the
reference's visdom windows (loss / accuracy / misc), a config panel, and a
raw-data table.  Re-run it any time; it only reads the CSV.

Usage:
  python analysis/dashboard.py --run output/groomed_nms [--out dashboard.html]
"""

import argparse
import csv
import html
import json
import os
import sys


def read_metrics(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    if not rows:
        # run-startup race: the trainer created metrics.csv but has not
        # flushed the header yet
        return None, None
    header, data = rows[0], rows[1:]
    cols = {k: [] for k in header}
    for r in data:
        # the trainer appends while we read: skip short/garbled rows (a
        # partially-flushed last line).  Cells are tolerated PER CELL:
        # MetricsCSV writes an empty cell for a stat missing from a
        # logging window, which must not drop the whole row
        if len(r) != len(header):
            continue
        try:
            it = float(r[0])
        except ValueError:
            continue
        vals = [it]
        for v in r[1:]:
            try:
                vals.append(float(v))
            except ValueError:
                vals.append(None)
        for k, v in zip(header, vals):
            cols[k].append(v)
    return header, cols


def _last(vals):
    """Latest non-missing value of a column (None if all missing)."""
    for v in reversed(vals):
        if v is not None:
            return v
    return None


def group_of(key):
    if key.startswith("acc") or key.endswith("_acc"):
        return "accuracy"
    if key in ("fg_num", "bg_num", "lr") or key.endswith("_num") \
            or key in ("cen_dist", "rot_err", "iou_2d", "z_err"):
        return "misc"
    return "loss"


CSS = """
.viz-root { color-scheme: light;
  --surface-1:#fcfcfb; --surface-2:#f1f0ee; --line:#e4e2de;
  --text-primary:#0b0b0b; --text-secondary:#52514e; --series-1:#2a78d6; }
@media (prefers-color-scheme: dark) { .viz-root { color-scheme: dark;
  --surface-1:#1a1a19; --surface-2:#242423; --line:#31302e;
  --text-primary:#ffffff; --text-secondary:#c3c2b7; --series-1:#3987e5; } }
body { margin:0; background:var(--surface-1); color:var(--text-primary);
  font:14px/1.45 system-ui, sans-serif; }
.wrap { max-width:1180px; margin:0 auto; padding:20px; }
h1 { font-size:18px; font-weight:600; margin:0 0 4px; }
.sub { color:var(--text-secondary); margin-bottom:16px; }
.kpis { display:flex; gap:12px; flex-wrap:wrap; margin-bottom:20px; }
.tile { background:var(--surface-2); border-radius:8px; padding:12px 16px;
  min-width:140px; }
.tile .label { color:var(--text-secondary); font-size:12px; }
.tile .value { font-size:26px; font-weight:600; margin-top:2px; }
h2 { font-size:14px; font-weight:600; color:var(--text-secondary);
  text-transform:uppercase; letter-spacing:.04em; margin:22px 0 8px; }
.grid { display:grid; grid-template-columns:repeat(auto-fill,minmax(340px,1fr));
  gap:14px; }
.card { background:var(--surface-2); border-radius:8px; padding:10px 12px 6px; }
.card .name { font-size:13px; font-weight:600; margin-bottom:2px; }
.card .latest { color:var(--text-secondary); font-size:12px; }
svg text { fill:var(--text-secondary); font:11px system-ui, sans-serif; }
svg .grid-line { stroke:var(--line); stroke-width:1; }
svg .series { stroke:var(--series-1); stroke-width:2; fill:none;
  stroke-linejoin:round; stroke-linecap:round; }
svg .end-dot { fill:var(--series-1); stroke:var(--surface-2); stroke-width:2; }
svg .cross { stroke:var(--text-secondary); stroke-width:1; opacity:0; }
.tip { position:fixed; pointer-events:none; background:var(--surface-1);
  border:1px solid var(--line); border-radius:6px; padding:6px 9px;
  font-size:12px; opacity:0; z-index:9; }
.tip b { font-size:13px; }
details { margin-top:20px; }
summary { cursor:pointer; color:var(--text-secondary); }
pre { background:var(--surface-2); border-radius:8px; padding:12px;
  overflow:auto; font-size:12px; }
table { border-collapse:collapse; font-size:12px;
  font-variant-numeric:tabular-nums; }
td,th { padding:3px 10px; border-bottom:1px solid var(--line);
  text-align:right; }
"""

JS = """
const D = window.__DATA__;
const tip = document.getElementById('tip');
function fmt(v){
  if (!isFinite(v)) return String(v);
  const a = Math.abs(v);
  if (a >= 1000) return v.toLocaleString(undefined,{maximumFractionDigits:0});
  if (a >= 1) return v.toFixed(3);
  return v.toPrecision(3);
}
function ticks(lo, hi){
  if (hi === lo) { hi = lo + 1; }
  const span = hi - lo, step = Math.pow(10, Math.floor(Math.log10(span/3)));
  const s = [1,2,5,10].map(m=>m*step).find(m=>span/m <= 5) || step;
  const out = [];
  for (let v = Math.ceil(lo/s)*s; v <= hi + 1e-12; v += s) out.push(v);
  return out;
}
for (const chart of document.querySelectorAll('[data-key]')){
  const key = chart.dataset.key,
        xs = D.series[key].x, ys = D.series[key].y;
  if (!xs.length) continue;
  const W = 340, H = 130, L = 46, R = 12, T = 8, B = 20;
  const lo = Math.min(...ys), hi = Math.max(...ys);
  const x = v => L + (W-L-R) * (xs.length < 2 ? 0.5 :
      (v - xs[0]) / (xs[xs.length-1] - xs[0] || 1));
  const y = v => hi === lo ? (T+H-B)/2
      : T + (H-T-B) * (1 - (v - lo) / (hi - lo));
  const svg = document.createElementNS('http://www.w3.org/2000/svg','svg');
  svg.setAttribute('viewBox', `0 0 ${W} ${H}`);
  let g = '';
  for (const tv of ticks(lo, hi)){
    g += `<line class="grid-line" x1="${L}" x2="${W-R}" y1="${y(tv)}" `+
         `y2="${y(tv)}"></line>`+
         `<text x="${L-5}" y="${y(tv)+3}" text-anchor="end">${fmt(tv)}</text>`;
  }
  g += `<text x="${L}" y="${H-5}">${fmt(xs[0])}</text>`+
       `<text x="${W-R}" y="${H-5}" text-anchor="end">`+
       `${fmt(xs[xs.length-1])}</text>`;
  const pts = xs.map((v,i)=>`${x(v).toFixed(1)},${y(ys[i]).toFixed(1)}`);
  g += `<polyline class="series" points="${pts.join(' ')}"></polyline>`;
  const li = ys.length-1;
  g += `<circle class="end-dot" r="4" cx="${x(xs[li])}" `+
       `cy="${y(ys[li])}"></circle>`;
  g += `<line class="cross" y1="${T}" y2="${H-B}" x1="0" x2="0"></line>`;
  svg.innerHTML = g;
  chart.appendChild(svg);
  const cross = svg.querySelector('.cross');
  svg.addEventListener('pointermove', ev => {
    const r = svg.getBoundingClientRect();
    const px = (ev.clientX - r.left) * W / r.width;
    let best = 0, bd = 1e18;
    xs.forEach((v,i)=>{ const d = Math.abs(x(v)-px);
                        if (d < bd){ bd = d; best = i; } });
    cross.setAttribute('x1', x(xs[best])); cross.setAttribute('x2', x(xs[best]));
    cross.style.opacity = 1;
    tip.replaceChildren();
    const b = document.createElement('b');
    b.textContent = fmt(ys[best]);
    const s = document.createElement('div');
    s.textContent = `${key} @ iter ${xs[best]}`;
    tip.append(b, s);
    tip.style.left = (ev.clientX + 14) + 'px';
    tip.style.top = (ev.clientY - 10) + 'px';
    tip.style.opacity = 1;
  });
  svg.addEventListener('pointerleave', () => {
    cross.style.opacity = 0; tip.style.opacity = 0;
  });
}
"""


def render(header, cols, conf_text, run_name, refresh=None):
    it = cols[header[0]]
    keys = [k for k in header[1:]]
    groups = {}
    for k in keys:
        groups.setdefault(group_of(k), []).append(k)

    def tile(label, value):
        return (f'<div class="tile"><div class="label">{html.escape(label)}'
                f'</div><div class="value">{html.escape(value)}</div></div>')

    kpis = [tile("Iteration", f"{int(it[-1]):,}")]
    if _last(cols.get("total", [])) is not None:
        kpis.append(tile("Total loss", f"{_last(cols['total']):.4g}"))
    if _last(cols.get("lr", [])) is not None:
        kpis.append(tile("Learning rate", f"{_last(cols['lr']):.3g}"))
    if _last(cols.get("acc_fg", [])) is not None:
        kpis.append(tile("Foreground acc", f"{_last(cols['acc_fg']):.3f}"))

    sections = []
    for gname in ("loss", "accuracy", "misc"):
        if gname not in groups:
            continue
        cards = "".join(
            f'<div class="card" ><div class="name">{html.escape(k)}</div>'
            f'<div class="latest">latest {_last(cols[k]):.4g}</div>'
            f'<div data-key="{html.escape(k)}"></div></div>'
            for k in groups[gname] if _last(cols[k]) is not None)
        sections.append(f"<h2>{gname}</h2><div class='grid'>{cards}</div>")

    tail = min(len(it), 50)
    thead = "".join(f"<th>{html.escape(k)}</th>" for k in header)
    trows = "".join(
        "<tr>" + "".join(
            f"<td>{cols[k][i]:.5g}</td>" if cols[k][i] is not None
            else "<td></td>" for k in header) + "</tr>"
        for i in range(len(it) - tail, len(it)))
    table = (f"<details><summary>Data (last {tail} rows)</summary>"
             f"<table><tr>{thead}</tr>{trows}</table></details>")
    conf_panel = ""
    if conf_text:
        conf_panel = (f"<details><summary>Configuration</summary>"
                      f"<pre>{html.escape(conf_text)}</pre></details>")

    # per-series (x, y) with missing cells dropped -- series may have gaps
    # at different iterations, so each carries its own x axis
    series = {}
    for k in keys:
        pairs = [(it[i], v) for i, v in enumerate(cols[k]) if v is not None]
        series[k] = {"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]}
    data = json.dumps({"iter": it, "series": series})
    meta_refresh = (f'<meta http-equiv="refresh" content="{int(refresh)}">'
                    if refresh else "")
    return f"""<!doctype html><html><head><meta charset="utf-8">
{meta_refresh}
<title>{html.escape(run_name)} — training dashboard</title>
<style>{CSS}</style></head>
<body class="viz-root"><div class="wrap">
<h1>{html.escape(run_name)}</h1>
<div class="sub">training metrics — {len(it)} logged points</div>
<div class="kpis">{''.join(kpis)}</div>
{''.join(sections)}
{conf_panel}
{table}
</div><div class="tip" id="tip"></div>
<script>window.__DATA__ = {data};</script>
<script>{JS}</script></body></html>"""


def _render_run(run_dir, refresh=None):
    """Read metrics.csv + conf.json and render the page (or a waiting
    placeholder when the trainer hasn't logged its first window yet)."""
    name = os.path.basename(os.path.abspath(run_dir))
    metrics = os.path.join(run_dir, "metrics.csv")
    header = cols = None
    if os.path.exists(metrics):
        header, cols = read_metrics(metrics)
    if not header or not cols[header[0]]:
        body = (f"<h1>{html.escape(name)}</h1>"
                "<p>waiting for the first metrics window...</p>")
        meta = (f'<meta http-equiv="refresh" content="{int(refresh)}">'
                if refresh else "")
        return (f'<!doctype html><html><head><meta charset="utf-8">{meta}'
                f"<style>{CSS}</style></head><body class='viz-root'>"
                f"<div class='wrap'>{body}</div></body></html>")
    conf_path = os.path.join(run_dir, "conf.json")
    conf_text = None
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            conf_text = json.dumps(json.load(f), indent=2)
    return render(header, cols, conf_text, name, refresh=refresh)


def serve(run_dir, port, refresh=5, ready_cb=None):
    """Live dashboard: re-render from metrics.csv on every request, with a
    meta-refresh so the browser polls while training writes.  The live
    counterpart of the reference's visdom windows (lib/core.py:730-780) --
    stdlib http.server, no dependency, safe to leave running beside a run.

    ``ready_cb(port)`` is invoked once the socket is bound (tests use it to
    learn the ephemeral port).  Blocks until interrupted.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            page = _render_run(run_dir, refresh=refresh).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(page)))
            self.end_headers()
            self.wfile.write(page)

        def log_message(self, fmt, *a):  # quiet: one line per poll is noise
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    actual = httpd.server_address[1]
    print(f"dashboard live at http://127.0.0.1:{actual}/ "
          f"(refresh {refresh}s, ctrl-c to stop)", flush=True)
    if ready_cb:
        ready_cb(actual)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="experiment output dir (holds metrics.csv)")
    ap.add_argument("--out", default=None,
                    help="output html (default <run>/dashboard.html)")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="serve a live-updating dashboard on PORT instead "
                         "of writing a file (0 picks a free port)")
    ap.add_argument("--refresh", type=int, default=5,
                    help="browser poll interval in --serve mode (seconds)")
    args = ap.parse_args(argv)

    if args.serve is not None:
        return serve(args.run, args.serve, refresh=args.refresh)

    metrics = os.path.join(args.run, "metrics.csv")
    if not os.path.exists(metrics):
        sys.exit(f"no metrics.csv under {args.run}")
    header, cols = read_metrics(metrics)
    if not header or not cols[header[0]]:
        sys.exit("metrics.csv has no data rows yet")
    conf_path = os.path.join(args.run, "conf.json")
    conf_text = None
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            conf_text = json.dumps(json.load(f), indent=2)
    out = args.out or os.path.join(args.run, "dashboard.html")
    with open(out, "w") as f:
        f.write(render(header, cols, conf_text,
                       os.path.basename(os.path.abspath(args.run))))
    print(f"dashboard -> {out}")
    return out


if __name__ == "__main__":
    main()
