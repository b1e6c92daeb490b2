"""Single-file admin dashboard served at /admin.

Reference: the reference server ships an admin SPA over its admin API
(crates/server/src/api/admin/mod.rs). This one is self-contained HTML
(zero egress: no CDN), polls /metrics (Prometheus text), /server_info
and /admin/traces, and renders stat tiles, a throughput line with
crosshair+tooltip, latency percentiles derived from the histogram
buckets, and a recent-spans table.
"""

ADMIN_HTML = r"""<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>vllm_rust_tpu admin</title>
<style>
  .viz-root {
    color-scheme: light;
    --surface-1: #fcfcfb;
    --surface-2: #f1f0ee;
    --text-primary: #0b0b0b;
    --text-secondary: #52514e;
    --series-1: #2a78d6;
    --status-good: #008300;
    --status-serious: #c4320a;
    --grid: #e3e2df;
  }
  @media (prefers-color-scheme: dark) {
    :root:where(:not([data-theme="light"])) .viz-root {
      color-scheme: dark;
      --surface-1: #1a1a19;
      --surface-2: #232322;
      --text-primary: #ffffff;
      --text-secondary: #c3c2b7;
      --series-1: #3987e5;
      --status-good: #3fb950;
      --status-serious: #ff7b72;
      --grid: #33332f;
    }
  }
  body { margin: 0; font: 14px/1.45 system-ui, sans-serif; }
  .viz-root { background: var(--surface-1); color: var(--text-primary);
              min-height: 100vh; padding: 20px 24px; }
  h1 { font-size: 18px; margin: 0 0 4px; }
  .sub { color: var(--text-secondary); margin-bottom: 18px; }
  .tiles { display: grid; grid-template-columns: repeat(auto-fit, minmax(150px, 1fr));
           gap: 12px; margin-bottom: 20px; }
  .tile { background: var(--surface-2); border-radius: 8px; padding: 12px 14px; }
  .tile .v { font-size: 24px; font-weight: 600; font-variant-numeric: tabular-nums; }
  .tile .l { color: var(--text-secondary); font-size: 12px; }
  .panel { background: var(--surface-2); border-radius: 8px; padding: 14px;
           margin-bottom: 16px; }
  .panel h2 { font-size: 13px; margin: 0 0 10px; color: var(--text-secondary);
              font-weight: 600; text-transform: uppercase; letter-spacing: .04em; }
  svg text { fill: var(--text-secondary); font-size: 11px; }
  table { border-collapse: collapse; width: 100%; font-variant-numeric: tabular-nums; }
  th { text-align: left; color: var(--text-secondary); font-weight: 600;
       font-size: 12px; padding: 4px 10px 4px 0; border-bottom: 1px solid var(--grid); }
  td { padding: 4px 10px 4px 0; border-bottom: 1px solid var(--grid); }
  .ok { color: var(--status-good); } .err { color: var(--status-serious); }
  .ok::before { content: "✓ "; } .err::before { content: "✕ "; }
  #tip { position: fixed; pointer-events: none; background: var(--surface-1);
         border: 1px solid var(--grid); border-radius: 6px; padding: 6px 8px;
         font-size: 12px; display: none; }
</style>
</head>
<body>
<div class="viz-root">
  <h1>vllm_rust_tpu</h1>
  <div class="sub" id="model">loading…</div>
  <div class="tiles" id="tiles"></div>
  <div class="panel">
    <h2>Decode throughput (tok/s)</h2>
    <svg id="tps" width="100%" height="120" viewBox="0 0 800 120"
         preserveAspectRatio="none"></svg>
  </div>
  <div class="panel">
    <h2>Latency percentiles (from histogram buckets)</h2>
    <table id="lat"><thead><tr><th>metric</th><th>p50</th><th>p90</th>
      <th>p99</th><th>count</th></tr></thead><tbody></tbody></table>
  </div>
  <div class="panel">
    <h2>Recent request spans</h2>
    <table id="spans"><thead><tr><th>span</th><th>status</th>
      <th>duration</th><th>request id</th></tr></thead><tbody></tbody></table>
  </div>
  <div id="tip"></div>
</div>
<script>
const hist = [];            // [t, generation_tokens_total]
const series = [];          // tok/s samples for the line

function parseProm(text) {
  const out = {};
  for (const line of text.split("\n")) {
    if (!line || line.startsWith("#")) continue;
    const sp = line.lastIndexOf(" ");
    out[line.slice(0, sp)] = parseFloat(line.slice(sp + 1));
  }
  return out;
}

function pct(m, name, q) {
  // percentile from cumulative buckets: first le with count >= q*total
  const total = m[name + "_count"];
  if (!total) return "–";
  const pairs = Object.keys(m)
    .filter(k => k.startsWith(name + '_bucket{le="') && !k.includes("+Inf"))
    .map(k => [parseFloat(k.match(/le="([^"]+)"/)[1]), m[k]])
    .sort((a, b) => a[0] - b[0]);
  for (const [le, c] of pairs) if (c >= q * total) return fmtS(le);
  return "> " + fmtS(pairs.length ? pairs[pairs.length - 1][0] : 0);
}
const fmtS = v => v >= 1 ? v.toFixed(1) + " s" : (v * 1000).toFixed(0) + " ms";
const fmt = v => v >= 1e6 ? (v / 1e6).toFixed(2) + "M"
  : v >= 1e4 ? (v / 1e3).toFixed(1) + "k" : (Math.round(v * 10) / 10).toString();

function tile(label, value, cls) {
  return `<div class="tile"><div class="v ${cls || ""}">${value}</div>` +
         `<div class="l">${label}</div></div>`;
}

function drawLine(svg, data) {
  if (data.length < 2) { svg.innerHTML = ""; return; }
  const W = 800, H = 120, P = 24;
  const max = Math.max(...data, 1);
  const x = i => P + (W - 2 * P) * i / (data.length - 1);
  const y = v => H - 14 - (H - 28) * v / max;
  let d = "M" + data.map((v, i) => `${x(i)},${y(v)}`).join(" L");
  svg.innerHTML =
    `<line x1="${P}" y1="${y(0)}" x2="${W - P}" y2="${y(0)}"
       stroke="var(--grid)" stroke-width="1"/>` +
    `<text x="${P}" y="12">${fmt(max)}</text>` +
    `<path d="${d}" fill="none" stroke="var(--series-1)" stroke-width="2"
       stroke-linejoin="round"/>` +
    `<circle id="cur" r="4" fill="var(--series-1)" stroke="var(--surface-2)"
       stroke-width="2" cx="${x(data.length - 1)}"
       cy="${y(data[data.length - 1])}"/>`;
  svg.onmousemove = e => {
    const r = svg.getBoundingClientRect();
    const i = Math.max(0, Math.min(data.length - 1,
      Math.round((e.clientX - r.left) / r.width * (data.length - 1))));
    const tip = document.getElementById("tip");
    tip.style.display = "block";
    tip.style.left = (e.clientX + 12) + "px";
    tip.style.top = (e.clientY - 10) + "px";
    tip.textContent = fmt(data[i]) + " tok/s";
    const c = document.getElementById("cur");
    if (c) { c.setAttribute("cx", 24 + (800 - 48) * i / (data.length - 1)); }
  };
  svg.onmouseleave = () =>
    document.getElementById("tip").style.display = "none";
}

async function refresh() {
  try {
    const [mt, info, tr] = await Promise.all([
      fetch("/metrics").then(r => r.text()),
      fetch("/server_info").then(r => r.json()),
      fetch("/admin/traces").then(r => r.json()),
    ]);
    const m = parseProm(mt);
    const now = Date.now() / 1000;
    const gen = m["vllm_generation_tokens_total"] || 0;
    hist.push([now, gen]);
    if (hist.length > 300) hist.shift();
    if (hist.length > 2) {
      const [t0, g0] = hist[Math.max(0, hist.length - 2)];
      series.push(Math.max(0, (gen - g0) / Math.max(now - t0, 1e-6)));
      if (series.length > 150) series.shift();
    }
    document.getElementById("model").textContent =
      `${info.model} — up ${fmt(info.uptime_s)}s`;
    const kvTotal = m["vllm_kv_cache_total_blocks"] || 0;
    const kvPct = kvTotal
      ? Math.round(100 * (m["vllm_kv_cache_usage_ratio"] || 0)) : 0;
    document.getElementById("tiles").innerHTML =
      tile("running", m["vllm_running_requests"] ?? 0) +
      tile("waiting", m["vllm_waiting_requests"] ?? 0) +
      tile("tok/s now", fmt(series[series.length - 1] || 0)) +
      tile("KV cache used", kvPct + "%") +
      tile("requests ok", fmt(m["vllm_requests_success_total"] || 0)) +
      tile("requests err", fmt(m["vllm_requests_error_total"] || 0),
           (m["vllm_requests_error_total"] || 0) > 0 ? "err" : "") +
      tile("preemptions", fmt(m["vllm_num_preemptions_total"] || 0)) +
      tile("accepting",
           (m["vllm_server_accepting_requests"] ?? 1) ? "yes" : "no",
           (m["vllm_server_accepting_requests"] ?? 1) ? "ok" : "err");
    drawLine(document.getElementById("tps"), series);
    const latBody = document.querySelector("#lat tbody");
    latBody.innerHTML = ["vllm_time_to_first_token_seconds",
      "vllm_time_per_output_token_seconds", "vllm_e2e_latency_seconds"]
      .map(n => `<tr><td>${n.replace("vllm_", "").replaceAll("_", " ")}</td>` +
        `<td>${pct(m, n, .5)}</td><td>${pct(m, n, .9)}</td>` +
        `<td>${pct(m, n, .99)}</td><td>${m[n + "_count"] || 0}</td></tr>`)
      .join("");
    const spanBody = document.querySelector("#spans tbody");
    spanBody.innerHTML = (tr.spans || []).slice(-15).reverse().map(s => {
      const ms = (parseInt(s.endTimeUnixNano) -
                  parseInt(s.startTimeUnixNano)) / 1e6;
      const rid = (s.attributes.find(a => a.key === "request.id") || {})
        .value?.stringValue || "";
      const ok = s.status.code !== 2;
      return `<tr><td>${s.name}</td>` +
        `<td class="${ok ? "ok" : "err"}">${ok ? "ok" : "error"}</td>` +
        `<td>${ms.toFixed(1)} ms</td><td>${rid}</td></tr>`;
    }).join("");
  } catch (e) { /* server restarting; retry next tick */ }
}
refresh();
setInterval(refresh, 2000);
</script>
</body>
</html>
"""


def add_spa_route(app) -> None:
    from aiohttp import web

    async def admin_page(request):
        return web.Response(text=ADMIN_HTML, content_type="text/html")

    app.add_routes([web.get("/admin", admin_page)])
