package graft

/** The candlestick UI face of the HTTP surface — an INDEPENDENT,
  * dependency-free re-expression of the reference frontend's chart
  * (`/root/reference/frontend/src/entry.jsx:126-225` renders with uPlot
  * + a candlestick plugin; this page draws straight onto a canvas with
  * ~150 lines of vanilla JS, because the build has zero npm deps and
  * the chart needs none). Served at `GET /chart/{table}` by
  * [[GraftServer]]; everything it shows comes from the two
  * golden-tested JSON endpoints:
  *
  *   - `GET /symbols/{table}/{col}` fills the symbol picker;
  *   - `GET /ohlcv/{table}/{from}/{to}?symbols=S` (uPlot-shaped
  *     `{results: {SYM: {t,o,h,l,c,v}}, min_date, max_date}`, ts in
  *     NANOS) feeds the candles + volume bars.
  *
  * Render rules match the reference's visual semantics (not its code):
  * green body when close >= open, red otherwise; high/low wick through
  * the body; volume bars on a lower band; crosshair legend with the
  * hovered bar's OHLCV. Server-side everything stays Spark — the page
  * is presentation only.
  */
object ChartPage {

  /** The page HTML for one table. `col`/`price`/`size`/`width` query
    * params forward to the /ohlcv fetch so encoded tables work too.
    *
    * Injection posture: everything interpolated into the page is either
    * identifier-validated (`symCol` — the only param that lands in a
    * URL path literal) or escaped for BOTH its JS-string and HTML
    * contexts (`table` — `<`/`>`/quotes/backslash to \\uXXXX, which
    * also kills `</script>` breakout; the title uses HTML entities).
    * The passthrough params are URL-encoded, so only [A-Za-z0-9*_.-%+]
    * reach the page. */
  def html(table: String, params: Map[String, String]): String = {
    val passthrough = Seq("col", "price", "size", "seq", "width")
      .flatMap(k => params.get(k).map(v =>
        s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"))
      .mkString("&")
    val symCol = params.getOrElse("col", "sym")
    require(symCol.matches("[A-Za-z0-9_]+"),
      s"invalid column name '$symCol'")
    // JS-string escape via unicode escapes: neutral in a quoted JS
    // literal AND inert to the HTML parser (no </script> breakout)
    def js(s: String): String = s.flatMap {
      case c if c.isLetterOrDigit || c == '_' || c == '-' || c == '.' => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
    def htmlEsc(s: String): String = s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }
    val tq = js(table)
    val titleTable = htmlEsc(table)
    s"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>graft &mdash; $titleTable</title>
<style>
  body { font: 13px sans-serif; margin: 12px; background: #fafafa; }
  #bar { margin-bottom: 8px; }
  #bar > * { margin-right: 6px; }
  #chart { background: #fff; border: 1px solid #ccc; cursor: crosshair; }
  #legend { font-family: monospace; height: 1.2em; margin-top: 4px; }
</style>
</head>
<body>
<div id="bar">
  <select id="sym"></select>
  <input id="from" size="24" placeholder="from (e.g. 2024-01-01)">
  <input id="to" size="24" placeholder="to">
  <button id="load">load</button>
  <span id="status"></span>
</div>
<canvas id="chart" width="960" height="480"></canvas>
<div id="legend"></div>
<script>
"use strict";
const TABLE = "$tq";
const EXTRA = "$passthrough";
const cv = document.getElementById("chart");
const ctx = cv.getContext("2d");
const legend = document.getElementById("legend");
let bars = null;      // {t,o,h,l,c,v} for the loaded symbol
let geom = null;      // layout of the last draw, for the crosshair

async function loadSymbols() {
  const r = await fetch("/symbols/" + encodeURIComponent(TABLE) + "/$symCol");
  const syms = await r.json();
  const sel = document.getElementById("sym");
  sel.innerHTML = "";
  for (const s of syms) {
    const o = document.createElement("option");
    o.value = o.textContent = s;
    sel.appendChild(o);
  }
}

function priceToY(p) {
  return geom.padTop + (geom.pMax - p) / (geom.pMax - geom.pMin) * geom.priceH;
}

function draw(hover) {
  const W = cv.width, H = cv.height;
  ctx.clearRect(0, 0, W, H);
  if (!bars || bars.t.length === 0) { geom = null; return; }
  const n = bars.t.length;
  const padL = 64, padR = 10, padTop = 10, padBot = 24, volH = H * 0.2;
  const priceH = H - padTop - padBot - volH - 8;
  let pMin = Math.min(...bars.l), pMax = Math.max(...bars.h);
  if (pMin === pMax) { pMin -= 1; pMax += 1; }
  const vMax = Math.max(1, ...bars.v);
  const slot = (W - padL - padR) / n;
  const bw = Math.max(1, Math.min(18, slot * 0.7));
  geom = { padL, padR, padTop, padBot, priceH, volH, pMin, pMax, slot, n };
  // price gridlines + labels
  ctx.strokeStyle = "#eee"; ctx.fillStyle = "#666";
  ctx.textAlign = "right"; ctx.textBaseline = "middle";
  for (let g = 0; g <= 4; g++) {
    const p = pMin + (pMax - pMin) * g / 4, y = priceToY(p);
    ctx.beginPath(); ctx.moveTo(padL, y); ctx.lineTo(W - padR, y); ctx.stroke();
    ctx.fillText(p.toFixed(2), padL - 6, y);
  }
  // time labels: first / middle / last bucket
  ctx.textAlign = "center"; ctx.textBaseline = "top";
  for (const i of [0, n >> 1, n - 1]) {
    const x = padL + slot * (i + 0.5);
    const d = new Date(bars.t[i] / 1e6);
    ctx.fillText(d.toISOString().slice(0, 16).replace("T", " "), x, H - padBot + 6);
  }
  const volY0 = H - padBot;
  for (let i = 0; i < n; i++) {
    const x = padL + slot * (i + 0.5);
    const up = bars.c[i] >= bars.o[i];
    const color = up ? "#1a7f37" : "#c0392b";
    // wick
    ctx.strokeStyle = "#333"; ctx.lineWidth = 1;
    ctx.beginPath();
    ctx.moveTo(x, priceToY(bars.h[i]));
    ctx.lineTo(x, priceToY(bars.l[i]));
    ctx.stroke();
    // body (>=1px so dojis stay visible)
    const yo = priceToY(bars.o[i]), yc = priceToY(bars.c[i]);
    const top = Math.min(yo, yc), hgt = Math.max(1, Math.abs(yo - yc));
    ctx.fillStyle = color;
    ctx.fillRect(x - bw / 2, top, bw, hgt);
    // volume band
    const vh = bars.v[i] / vMax * volH;
    ctx.globalAlpha = 0.45;
    ctx.fillRect(x - bw / 2, volY0 - vh, bw, vh);
    ctx.globalAlpha = 1;
    if (hover === i) {
      ctx.strokeStyle = "#888";
      ctx.beginPath();
      ctx.moveTo(x, padTop); ctx.lineTo(x, volY0); ctx.stroke();
    }
  }
}

cv.addEventListener("mousemove", e => {
  if (!bars || !geom) return;
  const i = Math.max(0, Math.min(geom.n - 1,
    Math.floor((e.offsetX - geom.padL) / geom.slot)));
  draw(i);
  const d = new Date(bars.t[i] / 1e6).toISOString();
  legend.textContent = d + "  O " + bars.o[i] + "  H " + bars.h[i] +
    "  L " + bars.l[i] + "  C " + bars.c[i] + "  V " + bars.v[i];
});
cv.addEventListener("mouseleave", () => { draw(); legend.textContent = ""; });

async function load() {
  const sym = document.getElementById("sym").value;
  const from = document.getElementById("from").value || "1970-01-01";
  const to = document.getElementById("to").value || "2100-01-01";
  const st = document.getElementById("status");
  st.textContent = "loading\\u2026";
  try {
    let url = "/ohlcv/" + encodeURIComponent(TABLE) + "/" +
      encodeURIComponent(from) + "/" + encodeURIComponent(to) +
      "?symbols=" + encodeURIComponent(sym);
    if (EXTRA) url += "&" + EXTRA;
    const r = await fetch(url);
    const j = await r.json();
    bars = j.results[sym] || { t: [], o: [], h: [], l: [], c: [], v: [] };
    st.textContent = bars.t.length + " bars";
    draw();
  } catch (err) {
    st.textContent = "error: " + err;
  }
}
document.getElementById("load").addEventListener("click", load);
loadSymbols().then(load).catch(e => {
  document.getElementById("status").textContent = "error: " + e;
});
</script>
</body>
</html>"""
  }
}
