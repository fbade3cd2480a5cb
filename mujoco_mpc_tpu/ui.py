"""Live browser control panel: the interactive-GUI surface of the app.

TPU-native re-design of the reference's interactive Simulate GUI
(/root/reference/mjpc/simulate.cc + agent GUI sections, agent.cc:529-693):
weight/parameter sliders mutating the live task, mode and planner controls,
pause/resume of the plan loop, real-time speed control, and live plots of
cost terms / actions / plan latency (reference AgentPlots, agent.h:38-43,
PlotShow agent.cc:1104-1116). The reference renders through GLFW inside the
simulate window; a TPU serving host is headless, so the panel is a
zero-dependency HTTP server (stdlib) + a single self-contained HTML page
polling small JSON endpoints — usable over an SSH tunnel to a pod host.

Also the live observability surface (SURVEY.md §5.5): per-phase timers,
plan/physics rates and cost traces are all exported as JSON at /api/state.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _clean(x):
  """JSON-safe scalar."""
  f = float(x)
  if not np.isfinite(f):
    return None
  return f


class ControlPanel:
  """HTTP panel around a running App (mujoco_mpc_tpu.app.App)."""

  def __init__(self, app, port: int = 0, host: str = '127.0.0.1'):
    self.app = app
    panel = self

    class Handler(BaseHTTPRequestHandler):
      def log_message(self, *a):  # quiet
        pass

      def _send(self, body: bytes, ctype: str = 'application/json',
                code: int = 200):
        self.send_response(code)
        self.send_header('Content-Type', ctype)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

      def do_GET(self):
        if self.path == '/' or self.path.startswith('/index'):
          self._send(PAGE.encode(), 'text/html; charset=utf-8')
        elif self.path == '/api/state':
          self._send(json.dumps(panel.state()).encode())
        elif self.path == '/api/plots':
          self._send(json.dumps(panel.plots()).encode())
        elif self.path == '/api/scene':
          self._send(json.dumps(panel.scene()).encode())
        elif self.path == '/api/frame':
          self._send(json.dumps(panel.frame()).encode())
        else:
          self._send(b'{"error": "not found"}', code=404)

      def do_POST(self):
        n = int(self.headers.get('Content-Length', 0))
        try:
          req = json.loads(self.rfile.read(n) or b'{}')
          if self.path == '/api/set':
            panel.apply(req)
          elif self.path == '/api/perturb':
            panel.perturb(req)
          else:
            self._send(b'{"error": "not found"}', code=404)
            return
          self._send(b'{"ok": true}')
        except Exception as e:  # surface the error to the page
          self._send(json.dumps({'error': str(e)}).encode(), code=400)

    self._server = ThreadingHTTPServer((host, port), Handler)
    self.port = self._server.server_address[1]
    self._thread = threading.Thread(target=self._server.serve_forever,
                                    daemon=True)

  def start(self):
    self._thread.start()
    return self

  def stop(self):
    self._server.shutdown()

  # -- JSON surface --------------------------------------------------------
  def state(self):
    app, agent, spec = self.app, self.app.agent, self.app.spec
    params = agent.params
    timers = app.timers.snapshot()
    plan = timers.get('plan_iteration', {})
    phys = timers.get('physics_step', {})
    return {
        'task': spec.name,
        'planner': int(agent.planner_id),
        'planner_names': list(_planner_names()),
        'mode': agent.mode(),
        'steps': app._steps,
        'plan_iterations': app._plan_iterations,
        'plan_enabled': app._plan_enabled.is_set(),
        'percent_realtime': app.percent_realtime,
        'sim_time': _clean(agent._host_time),
        'plan_p50_ms': _clean(1e3 * plan.get('p50_s', 0.0)),
        'plan_mean_ms': _clean(1e3 * plan.get('mean_s', 0.0)),
        'physics_mean_ms': _clean(1e3 * phys.get('mean_s', 0.0)),
        'timers': {k: {kk: _clean(vv) for kk, vv in v.items()}
                   for k, v in timers.items()},
        'weights': [
            {'name': n, 'value': _clean(params.weights[i]),
             'lo': spec.weight_ranges[i][0] if i < len(spec.weight_ranges)
                   else 0.0,
             'hi': spec.weight_ranges[i][1] if i < len(spec.weight_ranges)
                   else 10.0}
            for i, n in enumerate(spec.term_names)],
        'parameters': [
            {'name': n, 'value': _clean(params.residual_params[i]),
             'lo': spec.residual_param_ranges[i][0],
             'hi': spec.residual_param_ranges[i][1]}
            for i, n in enumerate(spec.residual_param_names)
            if not n.startswith('_')],
    }

  def plots(self):
    p = self.app.agent.plots()
    p['term_names'] = list(self.app.spec.term_names)
    return p

  def scene(self):
    """Static scene description for the in-browser 3D view.

    The reference renders the scene with GLFW/OpenGL inside Simulate
    (simulate.cc); a TPU serving host is headless, so geometry ships
    once as JSON and the page draws it with a painter's-algorithm SVG
    projection (mesh geoms as their collision convex hulls from
    physics/model.py — the same hulls the narrowphase uses)."""
    mjm = self.app.spec.mj_model
    model = self.app.spec.model
    geoms = []
    for g in range(mjm.ngeom):
      rgba = [round(float(x), 3) for x in mjm.geom_rgba[g]]
      entry = {
          'type': int(mjm.geom_type[g]),
          'size': [round(float(x), 5) for x in mjm.geom_size[g]],
          'rgba': rgba,
          'body': int(mjm.geom_bodyid[g]),
      }
      hull = (model.geom_mesh or {}).get(g)
      if hull is not None and int(mjm.geom_type[g]) == 7:  # mjGEOM_MESH
        entry['hull'] = np.round(np.asarray(hull[0], dtype=np.float64),
                                 5).tolist()
      geoms.append(entry)
    return {'geoms': geoms,
            'body_names': [mjm.body(i).name for i in range(mjm.nbody)]}

  def frame(self):
    """Per-tick geom world poses from the live sim Data (the kinematics
    the physics step already computed — one small device readback)."""
    app = self.app
    with app._state_lock:
      d = app.agent.sim_data
      pos = np.asarray(d.geom_xpos, dtype=np.float64)
      mat = np.asarray(d.geom_xmat, dtype=np.float64)
      t = float(app.agent._host_time)
    return {'t': None if not np.isfinite(t) else t,
            'pos': np.round(pos, 5).tolist(),
            'mat': np.round(mat.reshape(len(pos), 9), 5).tolist()}

  def perturb(self, req: dict):
    """Drag-perturbation: apply a world-frame force to one body until
    cleared (reference: simulate.cc perturbation UI ->
    mjv_applyPerturbForce; here the wrench lands in xfrc_applied, which
    rollouts and the sim step both consume)."""
    app = self.app
    body = int(req.get('body', -1))
    d = app.agent.sim_data
    xfrc = np.zeros((len(np.asarray(d.xfrc_applied)), 6))
    if body >= 0:
      f = [float(x) for x in req.get('force', [0.0, 0.0, 0.0])]
      xfrc[body, :3] = f
    with app._state_lock:
      app.agent.set_state(xfrc_applied=xfrc)

  def apply(self, req: dict):
    app, agent = self.app, self.app.agent
    with app._state_lock:
      if 'weights' in req:
        agent.set_cost_weights({str(k): float(v)
                                for k, v in req['weights'].items()})
      if 'parameters' in req:
        for k, v in req['parameters'].items():
          agent.set_task_parameter(str(k), float(v))
      if 'mode' in req:
        agent.set_mode(int(req['mode']))
      if 'plan_enabled' in req:
        if req['plan_enabled']:
          app._plan_enabled.set()
        else:
          app._plan_enabled.clear()
      if 'percent_realtime' in req:
        app.percent_realtime = float(req['percent_realtime'])


def _planner_names():
  from mujoco_mpc_tpu.planners import registry as preg
  return preg.PLANNER_NAMES


# ---------------------------------------------------------------------------
# The page: vanilla HTML/JS, palette + specs per the dataviz method
# (validated default palette; line charts with crosshair tooltips, fixed-
# order categorical series, legend + table view, light/dark).
# ---------------------------------------------------------------------------

PAGE = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>MJPC TPU control panel</title>
<style>
.viz-root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f0efec;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #7a7974;
  --grid: #e4e3df; --accent: #2a78d6;
  --s1: #2a78d6; --s2: #eb6834; --s3: #1baf7a; --s4: #eda100;
  --s5: #e87ba4; --s6: #008300; --s7: #4a3aa7; --s8: #e34948;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #262624;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8f8e86;
    --grid: #383835; --accent: #3987e5;
    --s1: #3987e5; --s2: #d95926; --s3: #199e70; --s4: #c98500;
    --s5: #d55181; --s6: #008300; --s7: #9085e9; --s8: #e66767;
  }
}
* { box-sizing: border-box; margin: 0; }
body.viz-root {
  background: var(--surface-1); color: var(--text-primary);
  font: 14px/1.45 system-ui, -apple-system, "Segoe UI", sans-serif;
  padding: 20px; max-width: 1180px; margin: 0 auto;
}
h1 { font-size: 18px; font-weight: 600; margin-bottom: 2px; }
.sub { color: var(--text-secondary); margin-bottom: 16px; }
.row { display: flex; gap: 12px; flex-wrap: wrap; margin-bottom: 12px; }
.card {
  background: var(--surface-1); border: 1px solid var(--grid);
  border-radius: 8px; padding: 12px 14px; flex: 1 1 240px; min-width: 0;
}
.tile .label { color: var(--text-secondary); font-size: 12px; }
.tile .value { font-size: 28px; font-weight: 600; }
.tile .unit { font-size: 13px; color: var(--text-muted); font-weight: 400; }
.controls { display: flex; gap: 10px; flex-wrap: wrap; align-items: center;
  margin-bottom: 14px; }
.controls label { color: var(--text-secondary); font-size: 13px; }
select, button, input[type=number] {
  background: var(--surface-1); color: var(--text-primary);
  border: 1px solid var(--grid); border-radius: 6px; padding: 4px 8px;
  font: inherit;
}
button { cursor: pointer; }
button.primary { border-color: var(--accent); color: var(--accent); }
.slider-row { display: grid; grid-template-columns: 130px 1fr 52px;
  gap: 8px; align-items: center; padding: 3px 0; }
.slider-row .name { color: var(--text-secondary); font-size: 12px;
  overflow: hidden; text-overflow: ellipsis; white-space: nowrap; }
.slider-row output { font-size: 12px; text-align: right;
  font-variant-numeric: tabular-nums; }
input[type=range] { width: 100%; accent-color: var(--accent); height: 18px; }
figure { margin: 0; }
figcaption { font-size: 13px; font-weight: 600; margin-bottom: 6px; }
.chart-wrap { position: relative; }
svg text { fill: var(--text-muted); font-size: 11px;
  font-variant-numeric: tabular-nums; }
.legend { display: flex; gap: 12px; flex-wrap: wrap; margin-top: 6px; }
.legend span { display: inline-flex; align-items: center; gap: 5px;
  color: var(--text-secondary); font-size: 12px; }
.legend i { width: 14px; height: 2px; display: inline-block; }
.tooltip { position: absolute; pointer-events: none; background:
  var(--surface-1); border: 1px solid var(--grid); border-radius: 6px;
  padding: 6px 9px; font-size: 12px; display: none; z-index: 5;
  box-shadow: 0 2px 8px rgba(0,0,0,.12); }
.tooltip b { font-variant-numeric: tabular-nums; }
.tooltip i { width: 10px; height: 2px; display: inline-block;
  margin-right: 5px; vertical-align: middle; }
.tbl-toggle { float: right; font-size: 12px; background: none; border: none;
  color: var(--accent); cursor: pointer; }
table.data { width: 100%; border-collapse: collapse; font-size: 12px;
  margin-top: 6px; }
table.data th, table.data td { text-align: right; padding: 2px 6px;
  border-bottom: 1px solid var(--grid);
  font-variant-numeric: tabular-nums; }
table.data th:first-child, table.data td:first-child { text-align: left; }
.err { color: #d03b3b; font-size: 12px; min-height: 16px; }
</style>
</head>
<body class="viz-root">
<h1>MJPC TPU control panel</h1>
<div class="sub" id="sub">connecting…</div>

<div class="row" id="tiles"></div>

<div class="controls card" style="flex-basis:100%">
  <label>Planner <select id="planner" disabled title="planner switching requires restart"></select></label>
  <label>Mode <input type="number" id="mode" min="0" max="10" step="1"
    style="width:58px"></label>
  <label>Speed %
    <input type="number" id="rt" min="1" max="800" step="5"
      style="width:64px"></label>
  <button class="primary" id="planBtn">Pause planning</button>
  <span class="err" id="err"></span>
</div>

<div class="row">
  <div class="card" style="flex:1 1 100%">
    <figcaption>Scene
      <span style="font-weight:400;color:var(--text-muted);font-size:12px">
        drag orbit · wheel zoom · shift-drag a body to perturb</span>
    </figcaption>
    <div class="chart-wrap">
      <svg id="scene" viewBox="0 0 760 420" style="width:100%;
        background:var(--surface-2);border-radius:6px;cursor:grab"></svg>
      <div id="sceneSel" style="position:absolute;left:8px;top:6px;
        font-size:12px;color:var(--text-secondary)"></div>
    </div>
  </div>
</div>

<div class="row">
  <div class="card" style="flex:1 1 340px">
    <figcaption>Cost weights</figcaption>
    <div id="weights"></div>
  </div>
  <div class="card" style="flex:1 1 340px">
    <figcaption>Task parameters</figcaption>
    <div id="params"></div>
  </div>
</div>

<div class="row">
  <div class="card" style="flex:1 1 100%" id="costCard"></div>
</div>
<div class="row">
  <div class="card" style="flex:1 1 48%" id="actionCard"></div>
  <div class="card" style="flex:1 1 48%" id="latCard"></div>
</div>

<script>
"use strict";
const SERIES = ['--s1','--s2','--s3','--s4','--s5','--s6','--s7','--s8'];
const css = n => getComputedStyle(document.body).getPropertyValue(n).trim();
const fmt = v => v == null ? '–' : (Math.abs(v) >= 100 ? v.toFixed(0)
  : Math.abs(v) >= 1 ? v.toFixed(2) : v.toFixed(4));

// ---- line chart component: crosshair + single tooltip, legend, table view
function lineChart(card, title) {
  card.innerHTML = '';
  const cap = document.createElement('figcaption');
  cap.textContent = title;
  const tbtn = document.createElement('button');
  tbtn.className = 'tbl-toggle'; tbtn.textContent = 'table';
  cap.appendChild(tbtn);
  const wrap = document.createElement('div'); wrap.className = 'chart-wrap';
  const W = 760, H = 190, L = 46, R = 10, T = 8, B = 22;
  const svg = document.createElementNS('http://www.w3.org/2000/svg', 'svg');
  svg.setAttribute('viewBox', `0 0 ${W} ${H}`);
  svg.style.width = '100%';
  const tip = document.createElement('div'); tip.className = 'tooltip';
  const legend = document.createElement('div'); legend.className = 'legend';
  const tblWrap = document.createElement('div');
  tblWrap.style.display = 'none';
  wrap.appendChild(svg); wrap.appendChild(tip);
  card.appendChild(cap); card.appendChild(wrap);
  card.appendChild(legend); card.appendChild(tblWrap);
  let data = {x: [], series: []};   // series: [{name, ys}]
  tbtn.onclick = () => {
    const show = tblWrap.style.display === 'none';
    tblWrap.style.display = show ? '' : 'none';
    wrap.style.display = show ? 'none' : '';
    legend.style.display = show ? 'none' : '';
    tbtn.textContent = show ? 'chart' : 'table';
    if (show) renderTable();
  };
  function renderTable() {
    const t = document.createElement('table'); t.className = 'data';
    const hr = t.insertRow();
    hr.appendChild(document.createElement('th')).textContent = 't (s)';
    for (const s of data.series)
      hr.appendChild(document.createElement('th')).textContent = s.name;
    const n = data.x.length, step = Math.max(1, Math.floor(n / 24));
    for (let i = 0; i < n; i += step) {
      const r = t.insertRow();
      r.insertCell().textContent = fmt(data.x[i]);
      for (const s of data.series) r.insertCell().textContent = fmt(s.ys[i]);
    }
    tblWrap.innerHTML = ''; tblWrap.appendChild(t);
  }
  function update(x, series) {
    data = {x, series};
    if (tblWrap.style.display !== 'none') { renderTable(); return; }
    svg.innerHTML = '';
    legend.innerHTML = '';
    if (!x.length || !series.length) return;
    let lo = Infinity, hi = -Infinity;
    for (const s of series) for (const v of s.ys) {
      if (v == null) continue;
      if (v < lo) lo = v; if (v > hi) hi = v;
    }
    if (!(isFinite(lo) && isFinite(hi))) return;
    if (hi - lo < 1e-9) { hi += 1; lo -= 1; }
    const x0 = x[0], x1 = x[x.length - 1] || 1;
    const sx = v => L + (v - x0) / (x1 - x0 || 1) * (W - L - R);
    const sy = v => T + (hi - v) / (hi - lo) * (H - T - B);
    const ns = 'http://www.w3.org/2000/svg';
    // hairline grid: 4 clean y ticks
    for (let i = 0; i <= 3; i++) {
      const v = lo + (hi - lo) * i / 3;
      const g = document.createElementNS(ns, 'line');
      g.setAttribute('x1', L); g.setAttribute('x2', W - R);
      g.setAttribute('y1', sy(v)); g.setAttribute('y2', sy(v));
      g.setAttribute('stroke', css('--grid'));
      g.setAttribute('stroke-width', '1');
      svg.appendChild(g);
      const tx = document.createElementNS(ns, 'text');
      tx.setAttribute('x', L - 6); tx.setAttribute('y', sy(v) + 3.5);
      tx.setAttribute('text-anchor', 'end');
      tx.textContent = fmt(v);
      svg.appendChild(tx);
    }
    // x labels: first/last time
    for (const [v, anchor] of [[x0, 'start'], [x1, 'end']]) {
      const tx = document.createElementNS(ns, 'text');
      tx.setAttribute('x', sx(v)); tx.setAttribute('y', H - 6);
      tx.setAttribute('text-anchor', anchor);
      tx.textContent = fmt(v) + ' s';
      svg.appendChild(tx);
    }
    series.forEach((s, si) => {
      const color = css(SERIES[si % 8]);
      let dstr = '';
      for (let i = 0; i < x.length; i++) {
        if (s.ys[i] == null) continue;
        dstr += (dstr ? 'L' : 'M') + sx(x[i]).toFixed(1) + ' '
              + sy(s.ys[i]).toFixed(1);
      }
      const p = document.createElementNS(ns, 'path');
      p.setAttribute('d', dstr); p.setAttribute('fill', 'none');
      p.setAttribute('stroke', color); p.setAttribute('stroke-width', '2');
      p.setAttribute('stroke-linejoin', 'round');
      p.setAttribute('stroke-linecap', 'round');
      svg.appendChild(p);
      if (series.length >= 2) {
        const k = document.createElement('span');
        const sw = document.createElement('i');
        sw.style.background = color;
        k.appendChild(sw);
        k.appendChild(document.createTextNode(s.name));
        legend.appendChild(k);
      }
    });
    // crosshair + tooltip (one readout, every series)
    const hair = document.createElementNS(ns, 'line');
    hair.setAttribute('y1', T); hair.setAttribute('y2', H - B);
    hair.setAttribute('stroke', css('--text-muted'));
    hair.setAttribute('stroke-width', '1');
    hair.style.display = 'none';
    svg.appendChild(hair);
    svg.onpointermove = ev => {
      const r = svg.getBoundingClientRect();
      const px = (ev.clientX - r.left) / r.width * W;
      let best = 0, bd = Infinity;
      for (let i = 0; i < x.length; i++) {
        const dd = Math.abs(sx(x[i]) - px);
        if (dd < bd) { bd = dd; best = i; }
      }
      hair.style.display = '';
      hair.setAttribute('x1', sx(x[best]));
      hair.setAttribute('x2', sx(x[best]));
      tip.style.display = 'block';
      tip.innerHTML = '';
      const hd = document.createElement('div');
      hd.textContent = 't = ' + fmt(x[best]) + ' s';
      hd.style.color = css('--text-muted');
      tip.appendChild(hd);
      series.forEach((s, si) => {
        const rrow = document.createElement('div');
        const sw = document.createElement('i');
        sw.style.background = css(SERIES[si % 8]);
        rrow.appendChild(sw);
        const b = document.createElement('b');
        b.textContent = fmt(s.ys[best]);
        rrow.appendChild(b);
        rrow.appendChild(document.createTextNode(' ' + s.name));
        tip.appendChild(rrow);
      });
      const wr = wrap.getBoundingClientRect();
      tip.style.left = Math.min(ev.clientX - wr.left + 14,
                                wr.width - 150) + 'px';
      tip.style.top = '8px';
    };
    svg.onpointerleave = () => {
      tip.style.display = 'none'; hair.style.display = 'none';
    };
  }
  return {update};
}

// ---- 3D scene: painter's-algorithm SVG projection with orbit camera ------
// Redesign of the reference Simulate scene render (simulate.cc GLFW/OpenGL)
// for a headless serving host: geometry arrives once via /api/scene, poses
// stream via /api/frame, shift-drag posts a perturb wrench (/api/perturb)
// exactly like the reference's mjv_applyPerturbForce drag.
const scene3d = (() => {
  const svg = document.getElementById('scene');
  const selLabel = document.getElementById('sceneSel');
  const NS = 'http://www.w3.org/2000/svg';
  const W = 760, H = 420;
  let cam = {az: 2.2, el: 0.55, dist: 2.2, cx: 0, cy: 0, cz: 0.15};
  let geoms = null, bodyNames = [];
  let lastFrame = null;
  let selBody = -1, perturbing = false, dragStart = null;

  // unit sphere ring + box topology, built once
  const BOXF = [[0,1,3,2],[4,6,7,5],[0,4,5,1],[2,3,7,6],[0,2,6,4],[1,5,7,3]];
  const BOXN = [[0,0,-1],[0,0,1],[0,-1,0],[0,1,0],[-1,0,0],[1,0,0]];

  function basis() {
    const ca = Math.cos(cam.az), sa = Math.sin(cam.az);
    const ce = Math.cos(cam.el), se = Math.sin(cam.el);
    const fwd = [-ce * ca, -ce * sa, -se];           // camera -> target
    const right = [-sa, ca, 0];
    const up = [se * ca, se * sa, -ce].map(v => -v);
    const eye = [cam.cx - fwd[0] * cam.dist, cam.cy - fwd[1] * cam.dist,
                 cam.cz - fwd[2] * cam.dist];
    return {fwd, right, up, eye};
  }
  function project(p, B) {
    const d = [p[0] - B.eye[0], p[1] - B.eye[1], p[2] - B.eye[2]];
    const z = d[0] * B.fwd[0] + d[1] * B.fwd[1] + d[2] * B.fwd[2];
    const x = d[0] * B.right[0] + d[1] * B.right[1] + d[2] * B.right[2];
    const y = d[0] * B.up[0] + d[1] * B.up[1] + d[2] * B.up[2];
    const f = 650 / Math.max(z, 0.05);
    return [W / 2 + x * f, H / 2 - y * f, z, f];
  }
  const rot = (mat, v) => [
    mat[0] * v[0] + mat[1] * v[1] + mat[2] * v[2],
    mat[3] * v[0] + mat[4] * v[1] + mat[5] * v[2],
    mat[6] * v[0] + mat[7] * v[1] + mat[8] * v[2]];
  const add = (a, b) => [a[0] + b[0], a[1] + b[1], a[2] + b[2]];

  function shade(rgba, lambert, extra) {
    const l = 0.45 + 0.55 * Math.max(lambert, 0);
    const s = extra || 1;
    return `rgba(${Math.round(rgba[0]*255*l*s)},${Math.round(rgba[1]*255*l*s)},`
         + `${Math.round(rgba[2]*255*l*s)},${Math.min(rgba[3], 0.95)})`;
  }
  const LIGHT = [0.35, 0.25, 0.9];

  function draw() {
    if (!geoms || !lastFrame) return;
    const B = basis();
    const items = [];   // {z, el}
    const mk = (tag, attrs) => {
      const e = document.createElementNS(NS, tag);
      for (const k in attrs) e.setAttribute(k, attrs[k]);
      return e;
    };
    geoms.forEach((g, gi) => {
      const pos = lastFrame.pos[gi], mat = lastFrame.mat[gi];
      if (!pos) return;
      const rgba = g.rgba.slice();
      if (rgba[3] < 0.05) return;                    // invisible helper geoms
      const hot = g.body === selBody;
      if (hot) { rgba[0] = Math.min(1, rgba[0] + .3); rgba[3] = 1; }
      if (g.type === 0) {                            // plane: ground grid
        const ext = 1.2;
        for (let i = -4; i <= 4; i++) {
          for (const seg of [[[i*ext/4,-ext],[i*ext/4,ext]],
                             [[-ext,i*ext/4],[ext,i*ext/4]]]) {
            const a = project(add(pos, rot(mat, [seg[0][0],seg[0][1],0])), B);
            const b = project(add(pos, rot(mat, [seg[1][0],seg[1][1],0])), B);
            if (a[2] < .06 || b[2] < .06) continue;
            items.push({z: 1e6 - i, el: mk('line', {x1: a[0], y1: a[1],
              x2: b[0], y2: b[1], stroke: css('--grid'),
              'stroke-width': 1})});
          }
        }
        return;
      }
      if (g.type === 2 || g.type === 4) {            // sphere / ellipsoid
        const r = g.type === 2 ? g.size[0]
                : (g.size[0] + g.size[1] + g.size[2]) / 3;
        const p = project(pos, B);
        if (p[2] < .06) return;
        items.push({z: p[2], el: mk('circle', {cx: p[0], cy: p[1],
          r: Math.max(r * p[3], 1.2),
          fill: shade(rgba, 0.8), 'data-body': g.body})});
        return;
      }
      if (g.type === 3 || g.type === 5) {            // capsule / cylinder
        const h = g.size[1];
        const a3 = add(pos, rot(mat, [0, 0, -h]));
        const b3 = add(pos, rot(mat, [0, 0, h]));
        const a = project(a3, B), b = project(b3, B);
        if (a[2] < .06 || b[2] < .06) return;
        const zc = (a[2] + b[2]) / 2;
        items.push({z: zc, el: mk('line', {x1: a[0], y1: a[1], x2: b[0],
          y2: b[1], stroke: shade(rgba, 0.75),
          'stroke-width': Math.max(2 * g.size[0] * (a[3] + b[3]) / 2, 1.5),
          'stroke-linecap': g.type === 3 ? 'round' : 'butt',
          'data-body': g.body})});
        return;
      }
      if (g.type === 6) {                            // box: 6 shaded faces
        const s = g.size;
        const v = [];
        for (let i = 0; i < 8; i++)
          v.push(project(add(pos, rot(mat,
            [(i & 1 ? s[0] : -s[0]), (i & 2 ? s[1] : -s[1]),
             (i & 4 ? s[2] : -s[2])])), B));
        if (v.some(p => p[2] < .06)) return;
        BOXF.forEach((f, fi) => {
          const n = rot(mat, BOXN[fi]);
          // backface cull: face normal vs view direction
          const c3 = add(pos, rot(mat, [BOXN[fi][0]*s[0], BOXN[fi][1]*s[1],
                                        BOXN[fi][2]*s[2]]));
          const vd = [c3[0]-B.eye[0], c3[1]-B.eye[1], c3[2]-B.eye[2]];
          if (n[0]*vd[0] + n[1]*vd[1] + n[2]*vd[2] > 0) return;
          const lam = n[0]*LIGHT[0] + n[1]*LIGHT[1] + n[2]*LIGHT[2];
          const zc = f.reduce((acc, i) => acc + v[i][2], 0) / 4;
          items.push({z: zc, el: mk('polygon', {points:
            f.map(i => v[i][0].toFixed(1) + ',' + v[i][1].toFixed(1))
             .join(' '),
            fill: shade(rgba, lam), 'data-body': g.body})});
        });
        return;
      }
      if (g.hull) {                                  // mesh: hull silhouette
        const pts = g.hull.map(p3 => project(add(pos, rot(mat, p3)), B));
        if (pts.some(p => p[2] < .06)) return;
        // 2D convex hull (gift wrap on few points)
        const hull2 = convexHull2(pts);
        const zc = pts.reduce((a, p) => a + p[2], 0) / pts.length;
        items.push({z: zc, el: mk('polygon', {points:
          hull2.map(p => p[0].toFixed(1) + ',' + p[1].toFixed(1)).join(' '),
          fill: shade(rgba, 0.65), stroke: shade(rgba, 0.3),
          'data-body': g.body})});
        return;
      }
      const p = project(pos, B);                     // fallback: dot
      if (p[2] < .06) return;
      items.push({z: p[2], el: mk('circle', {cx: p[0], cy: p[1], r: 2.5,
        fill: shade(rgba, 0.8), 'data-body': g.body})});
    });
    items.sort((a, b) => b.z - a.z);                 // far -> near
    svg.innerHTML = '';
    for (const it of items) svg.appendChild(it.el);
  }

  function convexHull2(pts) {
    const p = pts.map(q => [q[0], q[1]]).sort((a, b) =>
      a[0] - b[0] || a[1] - b[1]);
    if (p.length < 3) return p;
    const cross = (o, a, b) =>
      (a[0]-o[0])*(b[1]-o[1]) - (a[1]-o[1])*(b[0]-o[0]);
    const lo = [], hi = [];
    for (const q of p) {
      while (lo.length >= 2 && cross(lo[lo.length-2], lo[lo.length-1], q)
             <= 0) lo.pop();
      lo.push(q);
    }
    for (const q of p.slice().reverse()) {
      while (hi.length >= 2 && cross(hi[hi.length-2], hi[hi.length-1], q)
             <= 0) hi.pop();
      hi.push(q);
    }
    return lo.slice(0, -1).concat(hi.slice(0, -1));
  }

  // ---- interaction: orbit / zoom / shift-drag perturb
  svg.addEventListener('pointerdown', ev => {
    svg.setPointerCapture(ev.pointerId);
    const r = svg.getBoundingClientRect();
    const px = (ev.clientX - r.left) / r.width * W;
    const py = (ev.clientY - r.top) / r.height * H;
    if (ev.shiftKey && geoms && lastFrame) {
      // pick nearest projected geom center
      const B = basis();
      let best = -1, bd = 28;
      geoms.forEach((g, gi) => {
        if (g.type === 0 || g.rgba[3] < 0.05) return;
        const p = project(lastFrame.pos[gi], B);
        const dd = Math.hypot(p[0] - px, p[1] - py);
        if (dd < bd) { bd = dd; best = g.body; }
      });
      selBody = best;
      selLabel.textContent = best >= 0
        ? 'perturbing: ' + (bodyNames[best] || ('body ' + best)) : '';
      perturbing = best >= 0;
    }
    dragStart = {px, py, az: cam.az, el: cam.el};
  });
  svg.addEventListener('pointermove', ev => {
    if (!dragStart) return;
    const r = svg.getBoundingClientRect();
    const px = (ev.clientX - r.left) / r.width * W;
    const py = (ev.clientY - r.top) / r.height * H;
    if (perturbing && selBody >= 0) {
      // drag in the camera plane -> world-frame force
      const B = basis();
      const k = 6.0 * cam.dist / 650;
      const fx = (px - dragStart.px) * k, fy = -(py - dragStart.py) * k;
      const f = [B.right[0] * fx + B.up[0] * fy,
                 B.right[1] * fx + B.up[1] * fy,
                 B.right[2] * fx + B.up[2] * fy];
      fetch('/api/perturb', {method: 'POST',
        headers: {'Content-Type': 'application/json'},
        body: JSON.stringify({body: selBody, force: f})}).catch(() => {});
    } else {
      cam.az = dragStart.az - (px - dragStart.px) * 0.008;
      cam.el = Math.max(-1.4, Math.min(1.4,
        dragStart.el + (py - dragStart.py) * 0.008));
      draw();
    }
  });
  svg.addEventListener('pointerup', () => {
    if (perturbing) {
      fetch('/api/perturb', {method: 'POST',
        headers: {'Content-Type': 'application/json'},
        body: JSON.stringify({body: -1})}).catch(() => {});
      perturbing = false; selBody = -1; selLabel.textContent = '';
      draw();
    }
    dragStart = null;
  });
  svg.addEventListener('wheel', ev => {
    ev.preventDefault();
    cam.dist = Math.max(0.15, Math.min(20,
      cam.dist * (ev.deltaY > 0 ? 1.1 : 0.9)));
    draw();
  }, {passive: false});

  async function init() {
    try {
      const s = await (await fetch('/api/scene')).json();
      geoms = s.geoms; bodyNames = s.body_names || [];
    } catch (e) { /* scene optional */ }
  }
  async function tickFrame() {
    if (!geoms) return;
    try {
      lastFrame = await (await fetch('/api/frame')).json();
      draw();
    } catch (e) { /* transient */ }
  }
  init();
  setInterval(tickFrame, 120);
  return {draw};
})();

const costChart = lineChart(document.getElementById('costCard'),
                            'Cost terms (weighted)');
const actChart = lineChart(document.getElementById('actionCard'),
                           'Actions');
const latChart = lineChart(document.getElementById('latCard'),
                           'Total cost');

// ---- tiles
function setTiles(s) {
  const t = document.getElementById('tiles');
  const items = [
    ['Plan latency p50', s.plan_p50_ms, 'ms'],
    ['Plan iterations', s.plan_iterations, ''],
    ['Physics steps', s.steps, ''],
    ['Sim time', s.sim_time, 's'],
  ];
  t.innerHTML = '';
  for (const [label, v, unit] of items) {
    const c = document.createElement('div'); c.className = 'card tile';
    const l = document.createElement('div'); l.className = 'label';
    l.textContent = label;
    const val = document.createElement('div'); val.className = 'value';
    val.textContent = v == null ? '–'
      : (typeof v === 'number' && !Number.isInteger(v) ? fmt(v) : v);
    if (unit) {
      const u = document.createElement('span'); u.className = 'unit';
      u.textContent = ' ' + unit;
      val.appendChild(u);
    }
    c.appendChild(l); c.appendChild(val);
    t.appendChild(c);
  }
}

// ---- sliders
const dirty = new Set();
function sliders(containerId, list, kind) {
  const c = document.getElementById(containerId);
  for (const item of list) {
    const id = kind + '::' + item.name;
    let row = document.getElementById(id);
    if (!row) {
      row = document.createElement('div');
      row.className = 'slider-row'; row.id = id;
      const nm = document.createElement('div'); nm.className = 'name';
      nm.textContent = item.name; nm.title = item.name;
      const inp = document.createElement('input');
      inp.type = 'range';
      inp.min = item.lo; inp.max = Math.max(item.hi, item.lo + 1e-6);
      inp.step = (item.hi - item.lo) / 200 || 0.01;
      const out = document.createElement('output');
      inp.oninput = () => { out.value = fmt(+inp.value); dirty.add(id); };
      inp.onchange = async () => {
        await post({[kind]: {[item.name]: +inp.value}});
        dirty.delete(id);
      };
      row.appendChild(nm); row.appendChild(inp); row.appendChild(out);
      c.appendChild(row);
    }
    if (!dirty.has(id)) {
      const inp = row.querySelector('input');
      const out = row.querySelector('output');
      inp.value = item.value; out.value = fmt(item.value);
    }
  }
}

async function post(body) {
  try {
    const r = await fetch('/api/set', {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body)});
    const j = await r.json();
    document.getElementById('err').textContent = j.error || '';
  } catch (e) {
    document.getElementById('err').textContent = String(e);
  }
}

let planEnabled = true;
document.getElementById('planBtn').onclick = () => {
  planEnabled = !planEnabled;
  post({plan_enabled: planEnabled});
};
document.getElementById('mode').onchange = ev =>
  post({mode: +ev.target.value});
document.getElementById('rt').onchange = ev =>
  post({percent_realtime: +ev.target.value});

async function tick() {
  try {
    const s = await (await fetch('/api/state')).json();
    document.getElementById('sub').textContent =
      s.task + ' · ' + (s.planner_names[s.planner] || s.planner)
      + ' · ' + (s.plan_enabled ? 'planning' : 'plan paused');
    setTiles(s);
    sliders('weights', s.weights, 'weights');
    sliders('params', s.parameters, 'parameters');
    const pb = document.getElementById('planBtn');
    planEnabled = s.plan_enabled;
    pb.textContent = planEnabled ? 'Pause planning' : 'Resume planning';
    const ps = document.getElementById('planner');
    if (!ps.options.length)
      s.planner_names.forEach((n, i) => {
        const o = document.createElement('option');
        o.value = i; o.textContent = n; ps.appendChild(o);
      });
    ps.value = s.planner;
    if (document.activeElement !== document.getElementById('mode'))
      document.getElementById('mode').value = s.mode;
    if (document.activeElement !== document.getElementById('rt'))
      document.getElementById('rt').value = s.percent_realtime;
  } catch (e) {
    document.getElementById('sub').textContent = 'disconnected: ' + e;
  }
  try {
    const p = await (await fetch('/api/plots')).json();
    const x = p.time || [];
    if (x.length > 1) {
      const nterm = (p.cost_terms[0] || []).length;
      let names = p.term_names.slice(0, nterm);
      let series = names.map((n, i) => (
        {name: n, ys: p.cost_terms.map(r => r[i])}));
      if (series.length > 8) {   // fold extras into "Other", keep 7 + Other
        const head = series.slice(0, 7);
        const rest = series.slice(7);
        head.push({name: 'Other', ys: x.map((_, j) =>
          rest.reduce((a, s) => a + (s.ys[j] || 0), 0))});
        series = head;
      }
      costChart.update(x, series);
      const nu = (p.action[0] || []).length;
      let act = [];
      for (let i = 0; i < Math.min(nu, 8); i++)
        act.push({name: 'u' + i, ys: p.action.map(r => r[i])});
      actChart.update(x, act);
      latChart.update(x, [{name: 'total cost', ys: p.total_cost}]);
    }
  } catch (e) { /* plots optional */ }
  setTimeout(tick, 700);
}
tick();
</script>
</body>
</html>
"""
