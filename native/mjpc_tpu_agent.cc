// Embeddable C control surface for the TPU agent.
//
// Reference parity: mjpc/interface.h:29-49 runs a whole MJPC agent from C —
// an AgentRunner owning the Agent plus a background plan thread, behind
// extern-C `create_policy / step_policy / set_weights / destroy_policy`
// (mjpc/interface.cc:27-62, 80+). Here the compute path is JAX/XLA on TPU,
// so the runner embeds CPython and drives `mujoco_mpc_tpu.agent.Agent`:
// planning runs on the device (background thread, mirroring the reference's
// agent_plan_pool_), while `mtpu_agent_action` serves the act path. When the
// library is loaded from inside an existing Python process (e.g. via
// ctypes), it attaches to that interpreter instead of starting one.
//
// Thread model: every entry point acquires the GIL (PyGILState_Ensure);
// JAX device execution releases it, so the background plan loop and the
// caller's act path overlap the same way the reference's plan thread and
// physics thread do (app.cc:483-496).

#include <Python.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>

namespace {

std::mutex g_mutex;               // guards runner lifecycle, not calls
std::string g_error;              // last error message (mtpu_last_error)
PyObject* g_agent = nullptr;      // mujoco_mpc_tpu.agent.Agent instance
PyThreadState* g_main_tstate = nullptr;  // set iff we initialized Python
std::thread g_plan_thread;
std::atomic_bool g_plan_exit{false};
std::atomic_long g_plan_count{0};
int g_nu = 0, g_nq = 0, g_nv = 0, g_nweights = 0;

void set_error_from_python() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  g_error = "python error";
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c != nullptr) g_error = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

// Start (or attach to) the interpreter. Returns false on failure.
bool ensure_python() {
  if (Py_IsInitialized()) return true;
  Py_InitializeEx(0);
  if (!Py_IsInitialized()) {
    g_error = "Py_InitializeEx failed";
    return false;
  }
#ifdef MTPU_REPO_ROOT
  // Baked fallback so standalone embedders work without PYTHONPATH (the
  // env var, when set, is already honored by Py_InitializeEx).
  PyRun_SimpleString(
      "import sys\n"
      "for _p in ('" MTPU_REPO_ROOT "',):\n"
      "  sys.path.insert(0, _p) if _p not in sys.path else None\n");
#endif
  // Release the GIL so worker threads can take it via PyGILState_Ensure.
  g_main_tstate = PyEval_SaveThread();
  return true;
}

// RAII GIL hold for every entry point.
struct Gil {
  PyGILState_STATE state;
  Gil() : state(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state); }
};

// Entry-point guard: PyGILState_Ensure on an uninitialized interpreter is
// undefined behavior, so check before taking the GIL.
#define MTPU_REQUIRE_AGENT()                         \
  do {                                               \
    if (!Py_IsInitialized() || g_agent == nullptr) { \
      g_error = "no agent: call mtpu_agent_create";  \
      return -1;                                     \
    }                                                \
  } while (0)

PyObject* call_method(const char* name, PyObject* args, PyObject* kwargs) {
  if (g_agent == nullptr) {
    g_error = "no agent: call mtpu_agent_create first";
    return nullptr;
  }
  PyObject* fn = PyObject_GetAttrString(g_agent, name);
  if (fn == nullptr) {
    set_error_from_python();
    return nullptr;
  }
  PyObject* out = PyObject_Call(fn, args, kwargs);
  Py_DECREF(fn);
  if (out == nullptr) set_error_from_python();
  return out;
}

int int_attr(PyObject* obj, const char* dotted) {
  PyObject* cur = obj;
  Py_INCREF(cur);
  const char* p = dotted;
  while (cur != nullptr && *p != '\0') {
    char name[64];
    size_t n = strcspn(p, ".");
    snprintf(name, sizeof name, "%.*s", static_cast<int>(n), p);
    PyObject* next = PyObject_GetAttrString(cur, name);
    Py_DECREF(cur);
    cur = next;
    p += n + (p[n] == '.' ? 1 : 0);
  }
  if (cur == nullptr) {
    PyErr_Clear();
    return -1;
  }
  long v = PyLong_AsLong(cur);
  Py_DECREF(cur);
  if (PyErr_Occurred()) {
    PyErr_Clear();
    return -1;
  }
  return static_cast<int>(v);
}

// Copy a Python sequence of floats into out[0..n). Returns count or -1.
int to_doubles(PyObject* seq, double* out, int n) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence");
  if (fast == nullptr) {
    set_error_from_python();
    return -1;
  }
  Py_ssize_t len = PySequence_Fast_GET_SIZE(fast);
  int count = static_cast<int>(len < n ? len : n);
  for (int i = 0; i < count; ++i) {
    out[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
  }
  Py_DECREF(fast);
  if (PyErr_Occurred()) {
    set_error_from_python();
    return -1;
  }
  return count;
}

void plan_loop() {
  while (!g_plan_exit.load()) {
    Gil gil;
    if (g_agent == nullptr) break;
    PyObject* args = PyTuple_New(0);
    PyObject* out = call_method("plan_iteration", args, nullptr);
    Py_DECREF(args);
    if (out == nullptr) break;  // error recorded; stop looping
    Py_DECREF(out);
    g_plan_count.fetch_add(1);
  }
}

}  // namespace

extern "C" {

const char* mtpu_last_error() { return g_error.c_str(); }

// Create the global runner for `task_name` (registry name). num_samples<=0
// and planner_id<0 keep the task defaults. Mirrors
// create_policy_from_task_id (interface.cc:97+).
int mtpu_agent_create(const char* task_name, int num_samples,
                      int planner_id) {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (!ensure_python()) return -1;
  Gil gil;
  if (g_agent != nullptr) {
    g_error = "agent already created; call mtpu_agent_destroy first";
    return -1;
  }
  // The task name crosses as a globals entry (no string escaping); the
  // numeric options are formatted into the source.
  std::string src =
      // MTPU_PLATFORM forces the JAX backend from inside the interpreter
      // (jax.config before first backend use) — the JAX_PLATFORMS env var
      // is not reliably honored, and a dead TPU tunnel hangs backend init
      "import os as _os\n"
      "_plat = _os.environ.get('MTPU_PLATFORM')\n"
      "if _plat:\n"
      "  import jax as _jax\n"
      "  _jax.config.update('jax_platforms', _plat)\n"
      "from mujoco_mpc_tpu.tasks import registry as _r\n"
      "from mujoco_mpc_tpu import agent as _a\n"
      "_spec = _r.get_task(_task_name)\n"
      "_agent = _a.Agent(_spec";
  if (num_samples > 0) src += ", num_samples=" + std::to_string(num_samples);
  if (planner_id >= 0) src += ", planner_id=" + std::to_string(planner_id);
  src += ")\n";
  PyObject* globals = PyDict_New();
  PyDict_SetItemString(globals, "__builtins__", PyEval_GetBuiltins());
  PyObject* tn = PyUnicode_FromString(task_name);
  PyDict_SetItemString(globals, "_task_name", tn);
  Py_DECREF(tn);
  PyObject* res = PyRun_String(src.c_str(), Py_file_input, globals, globals);
  if (res == nullptr) {
    set_error_from_python();
    Py_DECREF(globals);
    return -1;
  }
  Py_DECREF(res);
  g_agent = PyDict_GetItemString(globals, "_agent");  // borrowed
  Py_XINCREF(g_agent);
  Py_DECREF(globals);
  if (g_agent == nullptr) {
    g_error = "agent construction produced no object";
    return -1;
  }
  g_nu = int_attr(g_agent, "spec.model.nu");
  g_nq = int_attr(g_agent, "spec.model.nq");
  g_nv = int_attr(g_agent, "spec.model.nv");
  PyObject* names = nullptr;
  PyObject* spec = PyObject_GetAttrString(g_agent, "spec");
  if (spec != nullptr) {
    names = PyObject_GetAttrString(spec, "term_names");
    Py_DECREF(spec);
  }
  g_nweights = names != nullptr
      ? static_cast<int>(PySequence_Size(names)) : 0;
  Py_XDECREF(names);
  PyErr_Clear();
  g_plan_exit.store(false);
  g_plan_count.store(0);
  return 0;
}

int mtpu_agent_nu() { return g_nu; }
int mtpu_agent_nq() { return g_nq; }
int mtpu_agent_nv() { return g_nv; }
int mtpu_agent_num_weights() { return g_nweights; }

int mtpu_agent_set_state(const double* qpos, int nq, const double* qvel,
                         int nv, double time) {
  MTPU_REQUIRE_AGENT();
  Gil gil;
  PyObject* kwargs = PyDict_New();
  if (qpos != nullptr && nq > 0) {
    PyObject* l = PyList_New(nq);
    for (int i = 0; i < nq; ++i)
      PyList_SET_ITEM(l, i, PyFloat_FromDouble(qpos[i]));
    PyDict_SetItemString(kwargs, "qpos", l);
    Py_DECREF(l);
  }
  if (qvel != nullptr && nv > 0) {
    PyObject* l = PyList_New(nv);
    for (int i = 0; i < nv; ++i)
      PyList_SET_ITEM(l, i, PyFloat_FromDouble(qvel[i]));
    PyDict_SetItemString(kwargs, "qvel", l);
    Py_DECREF(l);
  }
  if (time >= 0.0) {
    PyObject* t = PyFloat_FromDouble(time);
    PyDict_SetItemString(kwargs, "time", t);
    Py_DECREF(t);
  }
  PyObject* args = PyTuple_New(0);
  PyObject* out = call_method("set_state", args, kwargs);
  Py_DECREF(args);
  Py_DECREF(kwargs);
  if (out == nullptr) return -1;
  Py_DECREF(out);
  return 0;
}

// One synchronous plan iteration (device compute; blocks).
int mtpu_agent_plan() {
  MTPU_REQUIRE_AGENT();
  Gil gil;
  PyObject* args = PyTuple_New(0);
  PyObject* out = call_method("plan_iteration", args, nullptr);
  Py_DECREF(args);
  if (out == nullptr) return -1;
  Py_DECREF(out);
  return 0;
}

// Background plan loop — the reference's agent_plan_pool_.Schedule(Plan)
// (interface.cc:39-41).
int mtpu_agent_start_plan_loop() {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (g_plan_thread.joinable()) {
    g_error = "plan loop already running";
    return -1;
  }
  g_plan_exit.store(false);
  g_plan_thread = std::thread(plan_loop);
  return 0;
}

int mtpu_agent_stop_plan_loop() {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (!g_plan_thread.joinable()) return 0;
  g_plan_exit.store(true);
  g_plan_thread.join();
  return 0;
}

long mtpu_agent_plan_count() { return g_plan_count.load(); }

// Query the policy action at `time` (pass time<0 for current sim time).
// Mirrors step_policy's ActionFromPolicy (interface.cc:48-52).
int mtpu_agent_action(double time, double* out, int out_len) {
  MTPU_REQUIRE_AGENT();
  Gil gil;
  PyObject* args;
  if (time >= 0.0) {
    args = PyTuple_New(1);
    PyTuple_SET_ITEM(args, 0, PyFloat_FromDouble(time));
  } else {
    args = PyTuple_New(0);
  }
  PyObject* u = call_method("action", args, nullptr);
  Py_DECREF(args);
  if (u == nullptr) return -1;
  PyObject* lst = PyObject_CallMethod(u, "tolist", nullptr);
  Py_DECREF(u);
  if (lst == nullptr) {
    set_error_from_python();
    return -1;
  }
  int n = to_doubles(lst, out, out_len);
  Py_DECREF(lst);
  return n;
}

// Step the simulation under the policy action (Agent embedding also owns
// the sim in our design; reference embedders call mj_step themselves).
int mtpu_agent_step() {
  MTPU_REQUIRE_AGENT();
  Gil gil;
  PyObject* args = PyTuple_New(0);
  PyObject* out = call_method("step", args, nullptr);
  Py_DECREF(args);
  if (out == nullptr) return -1;
  Py_DECREF(out);
  return 0;
}

// Set all cost weights by term order — reference set_weights
// (interface.cc:120+ applies a dense weight vector).
int mtpu_agent_set_weights(const double* w, int n) {
  MTPU_REQUIRE_AGENT();
  Gil gil;
  if (g_agent == nullptr) {
    g_error = "no agent";
    return -1;
  }
  PyObject* spec = PyObject_GetAttrString(g_agent, "spec");
  PyObject* names =
      spec != nullptr ? PyObject_GetAttrString(spec, "term_names") : nullptr;
  Py_XDECREF(spec);
  if (names == nullptr) {
    set_error_from_python();
    return -1;
  }
  Py_ssize_t count = PySequence_Size(names);
  if (count > n) count = n;
  PyObject* d = PyDict_New();
  for (Py_ssize_t i = 0; i < count; ++i) {
    PyObject* key = PySequence_GetItem(names, i);
    PyObject* val = PyFloat_FromDouble(w[i]);
    PyDict_SetItem(d, key, val);
    Py_DECREF(key);
    Py_DECREF(val);
  }
  Py_DECREF(names);
  PyObject* args = PyTuple_New(1);
  PyTuple_SET_ITEM(args, 0, d);
  PyObject* out = call_method("set_cost_weights", args, nullptr);
  Py_DECREF(args);
  if (out == nullptr) return -1;
  Py_DECREF(out);
  return 0;
}

// Tear down the runner (stops the plan loop). Python stays initialized —
// re-create is cheap and CPython finalize/re-init is not reliable with
// JAX loaded. Mirrors destroy_policy (interface.cc:80-88).
int mtpu_agent_destroy() {
  mtpu_agent_stop_plan_loop();
  std::lock_guard<std::mutex> lock(g_mutex);
  if (g_agent != nullptr) {
    Gil gil;
    Py_DECREF(g_agent);
    g_agent = nullptr;
  }
  g_nu = g_nq = g_nv = g_nweights = 0;
  return 0;
}

}  // extern "C"
