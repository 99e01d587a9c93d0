"""Explorer — the human query console (reference: ``explorer/``, a
SvelteKit app speaking DRISL over socket.io).

This engine's explorer is deliberately dependency-free: ONE static HTML
page (no build step, no npm) served by ``LeafHttpServer`` at
``GET /explorer``, talking JSON to the ``POST /api/<endpoint>`` bridge
(http.py) which adapts to the same ``LeafServer.dispatch`` the DRISL
transports use. Feature parity with the reference console's tabs
(explorer/src/routes/[[tab]]/+page.svelte):

- **Create Stream**: module SQL editors (authorizer / init / materializer
  / state init / state materializer / named queries), upload + create.
- **Query**: run a named query with start/limit/params against a stream.
- **Events**: send regular or state event batches (JSON payloads).
- **Log**: live event feed via subscribe + long-poll.

Auth is a Bearer token field (opaque token or ATProto JWT — whatever the
server accepts); anonymous connections can query but not write, exactly
like every other transport.
"""

EXPLORER_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>leaf_spark explorer</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
:root { --bg:#14161a; --panel:#1d2026; --line:#2c313a; --fg:#d7dce2;
        --dim:#8a93a0; --acc:#6aa1ff; --err:#ff7a7a; --ok:#7adf9a; }
* { box-sizing:border-box; }
body { margin:0; background:var(--bg); color:var(--fg);
       font:14px/1.45 ui-monospace, SFMono-Regular, Menlo, monospace; }
header { display:flex; gap:1rem; align-items:center; padding:.6rem 1rem;
         border-bottom:1px solid var(--line); background:var(--panel); }
header h1 { font-size:1rem; margin:0; color:var(--acc); }
nav button { background:none; border:none; color:var(--dim); font:inherit;
             padding:.3rem .6rem; cursor:pointer; }
nav button.on { color:var(--fg); border-bottom:2px solid var(--acc); }
main { padding:1rem; max-width:72rem; margin:0 auto; }
section { display:none; } section.on { display:block; }
label { display:block; margin:.6rem 0 .15rem; color:var(--dim); }
input, textarea { width:100%; background:var(--panel); color:var(--fg);
  border:1px solid var(--line); border-radius:4px; padding:.4rem .5rem;
  font:inherit; }
textarea { min-height:4.5rem; resize:vertical; }
button.act { background:var(--acc); color:#0b0d10; border:none;
  border-radius:4px; padding:.45rem .9rem; margin-top:.7rem;
  font:inherit; font-weight:600; cursor:pointer; }
table { border-collapse:collapse; margin-top:.8rem; width:100%; }
th, td { border:1px solid var(--line); padding:.3rem .55rem;
         text-align:left; }
th { color:var(--dim); font-weight:600; }
#out { white-space:pre-wrap; margin-top:.8rem; }
.err { color:var(--err); } .ok { color:var(--ok); }
.row { display:flex; gap:.8rem; } .row > div { flex:1; }
#log { margin-top:.8rem; max-height:22rem; overflow:auto;
       border:1px solid var(--line); border-radius:4px; padding:.5rem; }
#log div { border-bottom:1px dashed var(--line); padding:.25rem 0; }
</style>
</head>
<body>
<header>
  <h1>leaf_spark explorer</h1>
  <nav id="tabs"></nav>
  <span style="flex:1"></span>
  <input id="token" placeholder="bearer token (optional)"
         style="width:16rem" title="opaque token or ATProto JWT">
</header>
<main>
  <div class="row">
    <div><label>stream DID</label>
      <input id="streamDid" placeholder="did:plc:example"></div>
    <div><label>module CID (after upload)</label>
      <input id="moduleCid" readonly></div>
  </div>

  <section data-tab="Query">
    <div class="row">
      <div><label>query name</label><input id="qName" value="messages"></div>
      <div><label>start</label><input id="qStart" placeholder="1"></div>
      <div><label>limit</label><input id="qLimit" placeholder="50"></div>
    </div>
    <label>extra params (JSON object)</label>
    <textarea id="qParams">{}</textarea>
    <button class="act" onclick="runQuery()">Run query</button>
    <div id="qResult"></div>
  </section>

  <section data-tab="Create Stream">
    <label>authorizer SQL</label><textarea id="mAuth"></textarea>
    <label>init SQL</label><textarea id="mInit"></textarea>
    <label>materializer SQL</label><textarea id="mMat"></textarea>
    <label>state init SQL</label><textarea id="mSInit"></textarea>
    <label>state materializer SQL</label><textarea id="mSMat"></textarea>
    <label>named queries (JSON: [{"name","sql","params":[...]}])</label>
    <textarea id="mQueries">[]</textarea>
    <button class="act" onclick="uploadModule()">Upload module</button>
    <button class="act" onclick="createStream()">Create stream</button>
  </section>

  <section data-tab="Events">
    <label>payloads — one JSON value per line</label>
    <textarea id="evPayloads">{"content": "hello", "sentAt": 1}</textarea>
    <button class="act" onclick="sendEvents('stream/event_batch')">
      Send events</button>
    <button class="act" onclick="sendEvents('stream/state_event_batch')">
      Send state events</button>
  </section>

  <section data-tab="Log">
    <div class="row">
      <div><label>query name to follow</label>
        <input id="logName" value="messages"></div>
      <div><label>limit / poll</label><input id="logLimit" value="50"></div>
    </div>
    <button class="act" onclick="startLog()">Subscribe</button>
    <button class="act" onclick="stopLog()">Stop</button>
    <div id="log"></div>
  </section>

  <div id="out"></div>
</main>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
const TABS = ["Query", "Create Stream", "Events", "Log"];
for (const t of TABS) {
  const b = document.createElement("button");
  b.textContent = t;
  b.onclick = () => show(t);
  $("tabs").appendChild(b);
}
function show(t) {
  document.querySelectorAll("nav button").forEach(
    (b) => b.classList.toggle("on", b.textContent === t));
  document.querySelectorAll("section").forEach(
    (s) => s.classList.toggle("on", s.dataset.tab === t));
  localStorage.setItem("tab", t);
}
show(localStorage.getItem("tab") || "Query");
for (const id of ["streamDid", "token"]) {
  $(id).value = localStorage.getItem(id) || "";
  $(id).addEventListener("input", () => localStorage.setItem(id, $(id).value));
}
function note(msg, cls) {
  $("out").textContent = msg;
  $("out").className = cls || "";
}
async function api(endpoint, args) {
  const headers = { "Content-Type": "application/json" };
  const tok = $("token").value.trim();
  if (tok) headers["Authorization"] = "Bearer " + tok;
  const r = await fetch("/api/" + endpoint, {
    method: "POST", headers, body: JSON.stringify(args || {}) });
  const body = await r.json();
  if (body.Err !== undefined) throw new Error(body.Err);
  return body.Ok;
}
async function uploadModule() {
  try {
    const mod = {
      "$type": "space.roomy.module.defs#basicModule",
      authorizer: $("mAuth").value, initSql: $("mInit").value,
      materializer: $("mMat").value, stateInitSql: $("mSInit").value,
      stateMaterializer: $("mSMat").value,
      queries: JSON.parse($("mQueries").value || "[]"),
    };
    const out = await api("module/upload", { module: mod });
    $("moduleCid").value = out.cid;
    note("module uploaded: " + out.cid, "ok");
  } catch (e) { note(String(e), "err"); }
}
async function createStream() {
  try {
    const out = await api("stream/create", {
      streamDid: $("streamDid").value, moduleCid: $("moduleCid").value });
    note("stream created: " + out.streamDid, "ok");
  } catch (e) { note(String(e), "err"); }
}
async function sendEvents(endpoint) {
  try {
    const payloads = $("evPayloads").value.split("\\n")
      .map((l) => l.trim()).filter(Boolean).map((l) => JSON.parse(l));
    const out = await api(endpoint, {
      streamDid: $("streamDid").value, payloads });
    note("sent " + payloads.length + " event(s)" +
      (out.latestEvent !== undefined ? ", head=" + out.latestEvent : ""),
      "ok");
  } catch (e) { note(String(e), "err"); }
}
function renderRows(el, rows) {
  // build with createElement/textContent ONLY: row values and column
  // names are writer-controlled, and innerHTML here would be stored XSS
  // running in the server's origin (with the bearer token one
  // localStorage read away)
  el.textContent = "";
  if (!rows.length) {
    const p = document.createElement("p");
    p.textContent = "(no rows)";
    el.appendChild(p);
    return;
  }
  const cols = Object.keys(rows[0]);
  const table = document.createElement("table");
  const head = document.createElement("tr");
  for (const c of cols) {
    const th = document.createElement("th");
    th.textContent = c;
    head.appendChild(th);
  }
  table.appendChild(head);
  for (const r of rows) {
    const tr = document.createElement("tr");
    for (const c of cols) {
      const td = document.createElement("td");
      td.textContent = r[c] === null ? "∅" : String(r[c]);
      tr.appendChild(td);
    }
    table.appendChild(tr);
  }
  el.appendChild(table);
}
function plainRows(wire) {
  // wire rows: [{col: {"$type": "...", value: v} | v}]
  return wire.map((row) => {
    const o = {};
    for (const [k, v] of Object.entries(row)) {
      o[k] = v && typeof v === "object" && "$type" in v ? v.value : v;
    }
    return o;
  });
}
async function runQuery() {
  try {
    const q = { name: $("qName").value,
                params: JSON.parse($("qParams").value || "{}") };
    if ($("qStart").value) q.start = Number($("qStart").value);
    if ($("qLimit").value) q.limit = Number($("qLimit").value);
    const out = await api("stream/query", {
      streamDid: $("streamDid").value, query: q });
    renderRows($("qResult"), plainRows(out.rows));
    note(out.rows.length + " row(s)", "ok");
  } catch (e) { note(String(e), "err"); }
}
let logSub = null, logOn = false;
async function startLog() {
  try {
    const out = await api("stream/subscribe_events", {
      streamDid: $("streamDid").value,
      query: { name: $("logName").value, start: 1,
               limit: Number($("logLimit").value) || 50 } });
    logSub = out.subscriptionId; logOn = true;
    note("subscribed: " + logSub, "ok");
    poll();
  } catch (e) { note(String(e), "err"); }
}
async function poll() {
  while (logOn && logSub) {
    try {
      const out = await api("stream/poll_subscription", {
        streamDid: $("streamDid").value, subscriptionId: logSub,
        timeoutSec: 10 });
      for (const resp of out.responses) {
        if (resp.error) { note(resp.error, "err"); continue; }
        for (const row of plainRows(resp.rows)) {
          const d = document.createElement("div");
          d.textContent = JSON.stringify(row);
          $("log").prepend(d);
        }
      }
    } catch (e) { note(String(e), "err"); logOn = false; }
  }
}
async function stopLog() {
  logOn = false;
  if (logSub) {
    try {
      await api("stream/unsubscribe", {
        streamDid: $("streamDid").value, subscriptionId: logSub });
    } catch (e) { /* already gone */ }
    logSub = null;
  }
  note("unsubscribed", "ok");
}
</script>
</body>
</html>
"""
