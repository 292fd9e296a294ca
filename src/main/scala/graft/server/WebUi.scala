package graft.server

/** Built-in query UI served at `/select/vmui` (the reference embeds its
  * vmui React bundle at the same path — app/vlselect/main.go:71-121).
  * This engine ships a single self-contained page instead of a static
  * asset bundle (zero-egress build: no npm), driving the same public
  * JSON endpoints a reference front uses: /select/logsql/query for rows,
  * /select/logsql/hits for the histogram, /select/logsql/field_names
  * for the sidebar.
  */
object WebUi {
  val html: String =
    """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft logs</title>
<style>
  :root { color-scheme: light dark; }
  body { font: 14px/1.45 system-ui, sans-serif; margin: 0; }
  header { display: flex; gap: 8px; padding: 10px 14px; align-items: center;
           border-bottom: 1px solid #8884; flex-wrap: wrap; }
  header input[type=text] { flex: 1 1 420px; font: 13px/1.3 ui-monospace, monospace;
           padding: 7px 9px; border: 1px solid #8886; border-radius: 6px; }
  header select, header input[type=number] { padding: 6px; border: 1px solid #8886;
           border-radius: 6px; background: inherit; color: inherit; }
  header button { padding: 7px 16px; border: 1px solid #8886; border-radius: 6px;
           cursor: pointer; background: #2563eb; color: #fff; font-weight: 600; }
  #bars { display: flex; align-items: flex-end; gap: 1px; height: 64px;
          padding: 8px 14px 0; }
  #bars div { flex: 1; background: #2563eb; min-height: 1px; }
  #bars div:hover { background: #60a5fa; }
  #meta { padding: 4px 14px; color: #888; }
  main { display: flex; }
  #fields { flex: 0 0 200px; padding: 8px 0 8px 14px; border-right: 1px solid #8884; }
  #fields div { cursor: pointer; padding: 1px 4px; overflow: hidden;
                text-overflow: ellipsis; white-space: nowrap; }
  #fields div:hover { background: #8882; }
  #fields .hits { color: #888; font-size: 11px; }
  #rows { flex: 1; padding: 8px 14px; overflow-x: auto; }
  .row { border-bottom: 1px solid #8883; padding: 5px 0; }
  .row .t { color: #888; font-size: 12px; }
  .row .m { font-family: ui-monospace, monospace; white-space: pre-wrap;
            word-break: break-word; }
  .row .f { font-size: 12px; color: #888; }
  .row .f b { color: inherit; font-weight: 600; }
  .err { color: #dc2626; padding: 10px 14px; font-family: ui-monospace, monospace;
         white-space: pre-wrap; }
</style>
</head>
<body>
<header>
  <input type="text" id="q" value="*" spellcheck="false"
         placeholder="LogsQL query, e.g. error _time:15m | stats by (app) count()">
  <select id="range">
    <option value="">any time</option>
    <option value="5m">last 5m</option>
    <option value="1h">last 1h</option>
    <option value="1d" selected>last 1d</option>
    <option value="7d">last 7d</option>
    <option value="30d">last 30d</option>
  </select>
  <input type="number" id="limit" value="100" min="1" max="10000" title="limit">
  <button id="run">Run</button>
</header>
<div id="bars" title="hits over time"></div>
<div id="meta"></div>
<main>
  <div id="fields"></div>
  <div id="rows"></div>
</main>
<script>
"use strict";
const $ = id => document.getElementById(id);
const esc = s => String(s).replace(/[&<>"]/g,
  c => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c]));
function args() {
  const a = new URLSearchParams();
  a.set("query", $("q").value);
  const r = $("range").value;
  if (r) {
    const unit = {m: 60, h: 3600, d: 86400}[r.slice(-1)];
    a.set("start", String(Math.floor(Date.now() / 1000) - parseInt(r) * unit));
  }
  return a;
}
async function run() {
  $("meta").textContent = "running…";
  $("rows").innerHTML = ""; $("fields").innerHTML = ""; $("bars").innerHTML = "";
  const a = args();
  a.set("limit", $("limit").value);
  const t0 = performance.now();
  try {
    const res = await fetch("/select/logsql/query?" + a, {method: "POST"});
    const text = await res.text();
    if (!res.ok) { $("rows").innerHTML = '<div class="err">' + esc(text) + "</div>";
                   $("meta").textContent = ""; return; }
    const rows = text.split("\n").filter(l => l.trim()).map(l => JSON.parse(l));
    $("meta").textContent = rows.length + " rows in " +
      ((performance.now() - t0) / 1000).toFixed(2) + "s";
    $("rows").innerHTML = rows.map(r => {
      const t = r._time || "", m = r._msg !== undefined ? r._msg : JSON.stringify(r);
      const rest = Object.entries(r).filter(([k]) => k !== "_time" && k !== "_msg")
        .map(([k, v]) => "<b>" + esc(k) + "</b>=" + esc(v)).join(" ");
      return '<div class="row"><span class="t">' + esc(t) + '</span>' +
        '<div class="m">' + esc(m) + '</div>' +
        (rest ? '<div class="f">' + rest + "</div>" : "") + "</div>";
    }).join("");
  } catch (e) { $("rows").innerHTML = '<div class="err">' + esc(e) + "</div>"; }
  // histogram + field sidebar are best-effort decorations
  try {
    const h = await (await fetch("/select/logsql/hits?" + args() + "&step=" +
      ({"5m":"10s","1h":"2m","1d":"30m","7d":"4h","30d":"1d"}[$("range").value] || "1d"),
      {method: "POST"})).json();
    const pts = (h.hits && h.hits[0] && h.hits[0].timestamps || [])
      .map((t, i) => [t, h.hits[0].values[i]]);
    const max = Math.max(1, ...pts.map(p => p[1]));
    $("bars").innerHTML = pts.map(p =>
      '<div style="height:' + Math.round(p[1] / max * 100) + '%" title="' +
      esc(p[0]) + ": " + p[1] + '"></div>').join("");
  } catch (e) {}
  try {
    const f = await (await fetch("/select/logsql/field_names?" + args(),
      {method: "POST"})).json();
    $("fields").innerHTML = (f.values || []).map(v =>
      '<div data-f="' + esc(v.value) + '">' + esc(v.value) +
      ' <span class="hits">' + v.hits + "</span></div>").join("");
    for (const el of $("fields").children)
      el.onclick = () => { $("q").value = $("q").value.trim() +
        " | field_values " + el.dataset.f; run(); };
  } catch (e) {}
}
$("run").onclick = run;
$("q").addEventListener("keydown", e => { if (e.key === "Enter") run(); });
run();
</script>
</body>
</html>
"""
}
