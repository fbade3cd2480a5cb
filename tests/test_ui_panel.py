"""Browser control panel (mujoco_mpc_tpu/ui.py).

Reference parity: the interactive GUI surface — live sliders mutating
weights/params, mode switching, plan pause, plots (mjpc/simulate.cc +
agent GUI, agent.cc:529-693) — served as HTTP/JSON over the running App.
"""

import json
import urllib.error
import urllib.request

import numpy as np

from mujoco_mpc_tpu import app as app_mod
from mujoco_mpc_tpu import ui


def _get(port, path):
  with urllib.request.urlopen(f'http://127.0.0.1:{port}{path}',
                              timeout=30) as r:
    return json.loads(r.read())


def _post(port, path, body):
  req = urllib.request.Request(
      f'http://127.0.0.1:{port}{path}',
      data=json.dumps(body).encode(),
      headers={'Content-Type': 'application/json'}, method='POST')
  with urllib.request.urlopen(req, timeout=30) as r:
    return json.loads(r.read())


def test_panel_state_set_and_plots():
  app = app_mod.App('ParticleFixed', num_samples=4)
  panel = ui.ControlPanel(app, port=0).start()
  try:
    # page serves
    with urllib.request.urlopen(
        f'http://127.0.0.1:{panel.port}/', timeout=30) as r:
      page = r.read().decode()
    assert 'control panel' in page

    s = _get(panel.port, '/api/state')
    assert s['task'] == 'ParticleFixed'
    assert s['planner_names'][0] == 'Sampling'
    names = [w['name'] for w in s['weights']]
    assert names, s

    # mutate a weight through the panel; the agent sees it
    target = names[0]
    _post(panel.port, '/api/set', {'weights': {target: 3.25}})
    w = np.asarray(app.agent.params.weights)
    idx = app.spec.term_names.index(target)
    assert abs(float(w[idx]) - 3.25) < 1e-6

    # pause / resume planning
    _post(panel.port, '/api/set', {'plan_enabled': False})
    assert not app._plan_enabled.is_set()
    _post(panel.port, '/api/set', {'plan_enabled': True})
    assert app._plan_enabled.is_set()

    # speed control
    _post(panel.port, '/api/set', {'percent_realtime': 250.0})
    assert app.percent_realtime == 250.0

    # plots surface (after recording a trace)
    app.agent.record_plots()
    p = _get(panel.port, '/api/plots')
    assert p['term_names'] and len(p['total_cost']) == 1

    # bad input surfaces an error, not a crash
    try:
      _post(panel.port, '/api/set', {'weights': {'nope': 1.0}})
      raised = False
    except urllib.error.HTTPError as e:
      raised = e.code == 400
    assert raised

    # 3D scene surface: static geometry + streamed poses + drag perturb
    # (the reference renders these in Simulate's GLFW window;
    # simulate.cc perturbation UI -> mjv_applyPerturbForce)
    sc = _get(panel.port, '/api/scene')
    assert len(sc['geoms']) == app.spec.mj_model.ngeom
    assert all(len(g['rgba']) == 4 for g in sc['geoms'])
    app.agent.step()          # fills geom_xpos via the forward pass
    fr = _get(panel.port, '/api/frame')
    assert len(fr['pos']) == app.spec.mj_model.ngeom
    assert len(fr['mat'][0]) == 9
    body = int(app.spec.mj_model.geom_bodyid[-1])
    _post(panel.port, '/api/perturb',
          {'body': body, 'force': [1.0, 0.0, 0.0]})
    xf = np.asarray(app.agent.sim_data.xfrc_applied)
    assert abs(float(xf[body, 0]) - 1.0) < 1e-6
    _post(panel.port, '/api/perturb', {'body': -1})
    assert float(np.abs(np.asarray(
        app.agent.sim_data.xfrc_applied)).max()) == 0.0
  finally:
    panel.stop()
