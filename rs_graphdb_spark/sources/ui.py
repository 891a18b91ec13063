"""Single-file web UI served at ``/ui`` — a dependency-free vanilla-JS
behavioral equivalent of the reference's Vue app
(`/root/reference/web-ui/src/`), built ONLY on the reference-parity data
routes (`/stats`, `/labels`, `/rel-types`, `/nodes`, `/rels`, `/sysinfo`,
`/queries`, `/dbs`, POST `/cypher`, POST `/search`) so the UI exercises
exactly the API surface the reference UI consumes.

Behavior parity with the Vue stores/components, re-expressed framework-free:

- **GraphView.vue / visualization store** → force-directed layout
  (spring-electrical iteration with a physics toggle), per-label node
  colors, edge arrowheads, click-select + details, double-click
  expand-neighbors, drag to pin.
- **queryHistory store** → localStorage ``graphdb_query_history`` (cap
  100, recent-20 view, per-entry id + result count + execution time +
  success flag; a consecutive duplicate EARLY-RETURNS so the original
  entry keeps its timestamp/stats, and ``removeHistory`` filters by the
  ``id`` field) — the same storage key and invariants as
  `stores/queryHistory.ts` ``addQuery``/``removeQuery``.
- **favorites store** → localStorage ``graphdb_favorites`` (star the
  current query, click to reload) — `stores/favorites.ts`.
- **commands store** → ``:help`` ``:sysinfo`` ``:queries`` ``:dbs``
  console commands over the same routes (`stores/commands.ts`).
- **ExportDialog.vue** → JSON + CSV export of the last result.

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
          --dim:#8a939c; --acc:#4ea1ff; --ok:#58c27a; --warn:#e3b341; }
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
  button.alt { background:#374151; color:var(--fg); }
  table { border-collapse:collapse; width:100%; font-size:13px; margin-top:8px; }
  th,td { border-bottom:1px solid var(--line); padding:4px 8px;
          text-align:left; max-width:260px; overflow:hidden;
          text-overflow:ellipsis; white-space:nowrap; }
  th { color:var(--dim); font-weight:600; }
  svg { width:100%; height:420px; background:var(--bg); border-radius:6px; }
  .edge { stroke:#3d4754; stroke-width:1.2; }
  .node { cursor:pointer; stroke:#06121f; stroke-width:1; }
  .node.sel { stroke:var(--ok); stroke-width:3; }
  .lbl { fill:var(--dim); font-size:9px; pointer-events:none; }
  #detail pre { background:var(--bg); border-radius:6px; padding:8px;
                font-size:12px; overflow:auto; max-height:220px; }
  #err { color:#ff7b72; font-size:13px; margin-top:6px; white-space:pre-wrap; }
  #meta { color:var(--dim); font-size:12px; margin-top:6px; }
  .hist { cursor:pointer; font:12px ui-monospace,monospace; padding:3px 6px;
          border-radius:4px; white-space:nowrap; overflow:hidden;
          text-overflow:ellipsis; }
  .hist:hover { background:var(--bg); }
  .hist .t { color:var(--dim); margin-left:6px; }
  .hist.fail { color:#ff7b72; }
  .fav { color:var(--warn); }
  .legend span { display:inline-block; margin-right:10px; font-size:12px;
                 color:var(--dim); }
  .legend i { display:inline-block; width:9px; height:9px;
              border-radius:50%; margin-right:4px; }
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
      <h2>Cypher console
        <span style="text-transform:none;color:var(--dim)">
          — :help :sysinfo :queries :dbs</span></h2>
      <textarea id="q">MATCH (n) RETURN n LIMIT 10</textarea><br>
      <button onclick="runCypher()">Run</button>
      <button class="alt" onclick="addFavorite()">&#9733; Favorite</button>
      <button class="alt" onclick="exportRows('json')">Export JSON</button>
      <button class="alt" onclick="exportRows('csv')">Export CSV</button>
      <div id="err"></div>
      <div id="meta"></div>
      <div id="rows"></div>
    </div>
    <div class="panel" style="margin-top:12px">
      <h2>Graph view <span id="gmeta" style="text-transform:none"></span>
        <label style="float:right;text-transform:none;color:var(--dim)">
          <input type="checkbox" id="phys" checked onchange="tickLoop()">
          physics</label></h2>
      <div class="legend" id="legend"></div>
      <svg id="g" viewBox="0 0 800 420"></svg>
      <div style="color:var(--dim);font-size:12px">
        click = select · double-click = expand neighbors · drag = pin</div>
    </div>
  </div>
  <div>
    <div class="panel">
      <h2>Catalog</h2>
      <div id="catalog">…</div>
    </div>
    <div class="panel" style="margin-top:12px">
      <h2>Query history <span id="hmeta" style="text-transform:none"></span></h2>
      <div id="history" style="max-height:170px;overflow:auto"></div>
    </div>
    <div class="panel" style="margin-top:12px">
      <h2>Favorites</h2>
      <div id="favs" style="max-height:120px;overflow:auto"></div>
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
const PALETTE = ['#4ea1ff','#58c27a','#e3b341','#ff7b72','#bc8cff',
                 '#39c5cf','#f778ba','#9ece6a'];
const HKEY = 'graphdb_query_history', FKEY = 'graphdb_favorites';
const MAX_HISTORY = 100;

/* ---- stats / catalog (HeaderStats.vue) ---- */
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

/* ---- result table (TableView.vue) ---- */
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

/* ---- query history store (stores/queryHistory.ts: same storage key,
       cap 100, consecutive-duplicate suppression, recent-20 view) ---- */
function loadHistory() {
  try { return JSON.parse(localStorage.getItem(HKEY) || '[]'); }
  catch (e) { return []; }
}
function addHistory(query, success, resultCount, executionTime, errorMessage) {
  const h = loadHistory();
  // reference semantics (addQuery): a CONSECUTIVE duplicate is ignored
  // entirely — the original entry keeps its timestamp/stats
  if (h.length && h[0].query === query.trim()) { renderHistory(); return; }
  h.unshift({id: 'qh_' + Date.now() + '_' +
                 Math.random().toString(36).substr(2, 9),
             query: query.trim(), timestamp: new Date().toISOString(),
             success, resultCount, executionTime, errorMessage});
  localStorage.setItem(HKEY, JSON.stringify(h.slice(0, MAX_HISTORY)));
  renderHistory();
}
function removeHistory(id) {  // removeQuery: filter by the id field
  localStorage.setItem(HKEY,
    JSON.stringify(loadHistory().filter(e => e.id !== id)));
  renderHistory();
}
function renderHistory() {
  const h = loadHistory();
  document.getElementById('hmeta').textContent = '· ' + h.length;
  document.getElementById('history').innerHTML = h.slice(0, 20).map((e,i) =>
    '<div class="hist' + (e.success ? '' : ' fail') + '" data-i="'+i+'">' +
    e.query.replace(/</g,'&lt;') +
    '<span class="t">' + (e.resultCount ?? '') +
    (e.executionTime != null ? ' · ' + e.executionTime + 'ms' : '') +
    '</span></div>').join('') || '<p style="color:var(--dim)">none yet</p>';
  document.querySelectorAll('#history .hist').forEach(d => d.onclick = () => {
    document.getElementById('q').value = loadHistory()[+d.dataset.i].query;
  });
}

/* ---- favorites store (stores/favorites.ts) ---- */
function loadFavs() {
  try { return JSON.parse(localStorage.getItem(FKEY) || '[]'); }
  catch (e) { return []; }
}
function addFavorite() {
  const q = document.getElementById('q').value.trim();
  if (!q) return;
  const f = loadFavs();
  if (!f.some(x => x.query === q))
    f.unshift({query: q, createdAt: new Date().toISOString()});
  localStorage.setItem(FKEY, JSON.stringify(f));
  renderFavs();
}
function renderFavs() {
  const f = loadFavs();
  document.getElementById('favs').innerHTML = f.map((e,i) =>
    '<div class="hist" data-i="'+i+'"><span class="fav">&#9733;</span> ' +
    e.query.replace(/</g,'&lt;') + '</div>').join('')
    || '<p style="color:var(--dim)">none yet</p>';
  document.querySelectorAll('#favs .hist').forEach(d => d.onclick = () => {
    document.getElementById('q').value = loadFavs()[+d.dataset.i].query;
  });
}

/* ---- console commands (stores/commands.ts) ---- */
const COMMANDS = {
  ':help': async () => [{command: ':help', description: 'this list'},
    {command: ':sysinfo', description: 'system information (/sysinfo)'},
    {command: ':queries', description: 'running queries (/queries)'},
    {command: ':dbs', description: 'databases (/dbs)'}],
  ':sysinfo': async () => [await fetch('/sysinfo').then(J)],
  ':queries': async () => (await fetch('/queries').then(J)).queries || [],
  ':dbs': async () => (await fetch('/dbs').then(J)).databases || [],
};

/* ---- run (QueryEditor.vue) ---- */
async function runCypher() {
  const q = document.getElementById('q').value.trim();
  document.getElementById('err').textContent = '';
  const t0 = performance.now();
  try {
    if (COMMANDS[q]) { renderRows(await COMMANDS[q]()); return; }
    const res = await fetch('/cypher', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify({query: q})});
    const body = await res.json();
    const ms = Math.round(performance.now() - t0);
    if (!res.ok) throw new Error(body.error || res.statusText);
    const rows = body.rows || (body.ok ? [{ok: true}] : []);
    renderRows(rows);
    document.getElementById('meta').textContent =
      rows.length + ' rows · ' + ms + ' ms';
    addHistory(q, true, rows.length, ms);
  } catch (e) {
    document.getElementById('err').textContent = String(e);
    addHistory(q, false, 0, Math.round(performance.now() - t0), String(e));
  }
}

/* ---- export (ExportDialog.vue): JSON + CSV ---- */
function exportRows(fmt) {
  let blob;
  if (fmt === 'csv') {
    const cols = lastRows.length ? Object.keys(lastRows[0]) : [];
    const esc = v => { const s = typeof v === 'object'
        ? JSON.stringify(v) : String(v ?? '');
      return /[",\\n]/.test(s) ? '"' + s.replace(/"/g,'""') + '"' : s; };
    blob = new Blob([[cols.join(',')].concat(
      lastRows.map(r => cols.map(c => esc(r[c])).join(','))).join('\\n')],
      {type: 'text/csv'});
  } else {
    blob = new Blob([JSON.stringify(lastRows, null, 2)],
                    {type: 'application/json'});
  }
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob);
  a.download = 'result.' + fmt; a.click();
}

/* ---- force-directed graph view (GraphView.vue / visualization store):
       spring-electrical iteration, physics toggle, drag-to-pin,
       per-label colors, arrowheads, dblclick expand-neighbors ---- */
const sim = {nodes: [], edges: [], byId: new Map(), colors: new Map(),
             running: false, shown: 0};
function labelColor(lbl) {
  if (!sim.colors.has(lbl)) sim.colors.set(lbl, PALETTE[sim.colors.size % PALETTE.length]);
  return sim.colors.get(lbl);
}
async function loadGraph() {
  const [nodes, rels] = await Promise.all(
    [fetch('/nodes').then(J), fetch('/rels').then(J)]);
  sim.all = {nodes: nodes.rows, rels: rels.rows};
  const ns = nodes.rows.slice(0, 120);
  setGraph(ns, rels.rows);
}
function setGraph(ns, es) {
  sim.byId = new Map();
  // deterministic circle start (the server-side layout module's shape),
  // then the force iteration relaxes it
  ns.forEach((nd, i) => {
    const a = 2 * Math.PI * i / ns.length;
    sim.byId.set(nd.id, {x: 400 + 180 * Math.cos(a), y: 210 + 180 * Math.sin(a),
                         vx: 0, vy: 0, pin: false, nd});
  });
  sim.nodes = [...sim.byId.values()];
  sim.edges = es.filter(e => sim.byId.has(e.src) && sim.byId.has(e.dst))
               .slice(0, 600);
  document.getElementById('legend').innerHTML =
    [...new Set(sim.nodes.map(p => p.nd.label))].map(l =>
      '<span><i style="background:' + labelColor(l) + '"></i>' + l + '</span>'
    ).join('');
  renderGraph();
  tickLoop();
}
function forceTick() {
  const N = sim.nodes, K = 55, REP = 1800, DT = 0.04;
  for (let i = 0; i < N.length; i++) {
    const a = N[i]; let fx = 0, fy = 0;
    for (let j = 0; j < N.length; j++) {
      if (i === j) continue;
      const b = N[j], dx = a.x - b.x, dy = a.y - b.y;
      const d2 = dx*dx + dy*dy + 0.01;
      fx += REP * dx / d2; fy += REP * dy / d2;   // repulsion
    }
    fx += (400 - a.x) * 0.02; fy += (210 - a.y) * 0.02;  // gravity
    a.fx = fx; a.fy = fy;
  }
  sim.edges.forEach(e => {                         // springs
    const s = sim.byId.get(e.src), d = sim.byId.get(e.dst);
    const dx = d.x - s.x, dy = d.y - s.y;
    const dist = Math.sqrt(dx*dx + dy*dy) + 0.01, f = (dist - K) * 0.05;
    s.fx += f * dx / dist; s.fy += f * dy / dist;
    d.fx -= f * dx / dist; d.fy -= f * dy / dist;
  });
  N.forEach(p => {
    if (p.pin) return;
    p.vx = (p.vx + p.fx * DT) * 0.85; p.vy = (p.vy + p.fy * DT) * 0.85;
    p.x = Math.max(10, Math.min(790, p.x + p.vx));
    p.y = Math.max(10, Math.min(410, p.y + p.vy));
  });
}
function renderGraph() {
  const svg = document.getElementById('g');
  svg.innerHTML =
    '<defs><marker id="arr" viewBox="0 0 10 10" refX="14" refY="5" ' +
    'markerWidth="6" markerHeight="6" orient="auto-start-reverse">' +
    '<path d="M 0 0 L 10 5 L 0 10 z" fill="#3d4754"/></marker></defs>' +
    sim.edges.map(e => { const s = sim.byId.get(e.src), d = sim.byId.get(e.dst);
      return '<line class="edge" marker-end="url(#arr)" x1="'+s.x+'" y1="'+s.y+
             '" x2="'+d.x+'" y2="'+d.y+'"/>'; }).join('') +
    sim.nodes.map(p =>
      '<circle class="node' + (p.sel ? ' sel' : '') + '" r="6" cx="'+p.x+
      '" cy="'+p.y+'" fill="' + labelColor(p.nd.label) +
      '" data-id="'+p.nd.id+'"/>').join('');
  document.getElementById('gmeta').textContent =
    '· ' + sim.nodes.length + ' nodes, ' + sim.edges.length + ' edges shown';
  svg.querySelectorAll('.node').forEach(c => {
    const p = sim.byId.get(Number(c.dataset.id));
    c.onclick = () => {                                  // select + details
      sim.nodes.forEach(x => x.sel = false); p.sel = true;
      document.getElementById('dprops').textContent =
        JSON.stringify(p.nd, null, 2);
      renderGraph();
    };
    c.ondblclick = () => expandNeighbors(p.nd.id);       // GraphView dblclick
    c.onmousedown = ev => {                              // drag-to-pin
      ev.preventDefault(); p.pin = true;
      const svgR = svg.getBoundingClientRect();
      const move = m => { p.x = (m.clientX - svgR.left) * 800 / svgR.width;
                          p.y = (m.clientY - svgR.top) * 420 / svgR.height;
                          renderGraph(); };
      const up = () => { window.removeEventListener('mousemove', move);
                         window.removeEventListener('mouseup', up); };
      window.addEventListener('mousemove', move);
      window.addEventListener('mouseup', up);
    };
  });
}
function expandNeighbors(id) {
  // bring every node adjacent to `id` into the view (expandNeighbors emit)
  const adj = new Set([id]);
  sim.all.rels.forEach(e => { if (e.src === id) adj.add(e.dst);
                              if (e.dst === id) adj.add(e.src); });
  const have = new Set(sim.nodes.map(p => p.nd.id));
  const extra = sim.all.nodes.filter(n => adj.has(n.id) && !have.has(n.id));
  if (extra.length)
    setGraph(sim.nodes.map(p => p.nd).concat(extra), sim.all.rels);
}
function tickLoop() {
  if (sim.running) return;
  const step = () => {
    if (!document.getElementById('phys').checked) { sim.running = false; return; }
    sim.running = true;
    forceTick(); renderGraph();
    if (sim.ticks++ < 120) requestAnimationFrame(step);
    else sim.running = false;
  };
  sim.ticks = 0; requestAnimationFrame(step);
}
loadStats(); loadGraph(); renderHistory(); renderFavs();
</script>
</body>
</html>
"""
