/* Standalone C embedder for the TPU agent — the analog of embedding the
 * reference as a controller library via mjpc/interface.h (e.g. from a
 * simulator or Unity plugin).
 *
 * Build (from the repo root):
 *   gcc examples/embed_agent.c $(python3-config --includes) \
 *       -ldl -Wl,--no-as-needed $(python3-config --embed --ldflags) \
 *       -o embed_agent
 * (--no-as-needed keeps the libpython DT_NEEDED entry even though only
 * the dlopen'd agent library references Py* symbols.)
 *
 * Run with PYTHONPATH pointing at the repo (and platform plugin site dir
 * if any); pass the task name as argv[1].
 */

#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>

#include "../native/mjpc_tpu_agent.h"

typedef int (*fn_create)(const char*, int, int);
typedef int (*fn_int)(void);
typedef int (*fn_set_state)(const double*, int, const double*, int, double);
typedef int (*fn_action)(double, double*, int);
typedef const char* (*fn_err)(void);

int main(int argc, char** argv) {
  const char* lib_path = getenv("MTPU_AGENT_LIB");
  const char* task = argc > 1 ? argv[1] : "ParticleFixed";
  if (lib_path == NULL) {
    fprintf(stderr, "set MTPU_AGENT_LIB to the built libmjpc_tpu_agent\n");
    return 2;
  }
  void* lib = dlopen(lib_path, RTLD_NOW | RTLD_GLOBAL);
  if (lib == NULL) {
    fprintf(stderr, "dlopen: %s\n", dlerror());
    return 2;
  }
  fn_create create = (fn_create)dlsym(lib, "mtpu_agent_create");
  fn_int nu_fn = (fn_int)dlsym(lib, "mtpu_agent_nu");
  fn_int plan = (fn_int)dlsym(lib, "mtpu_agent_plan");
  fn_int step = (fn_int)dlsym(lib, "mtpu_agent_step");
  fn_int destroy = (fn_int)dlsym(lib, "mtpu_agent_destroy");
  fn_action action = (fn_action)dlsym(lib, "mtpu_agent_action");
  fn_err err = (fn_err)dlsym(lib, "mtpu_last_error");

  if (create(task, 4, -1) != 0) {
    fprintf(stderr, "create failed: %s\n", err());
    return 1;
  }
  int nu = nu_fn();
  printf("created agent for %s, nu=%d\n", task, nu);

  double u[64];
  for (int i = 0; i < 3; ++i) {
    if (plan() != 0) {
      fprintf(stderr, "plan failed: %s\n", err());
      return 1;
    }
    if (action(-1.0, u, 64) < 0) {
      fprintf(stderr, "action failed: %s\n", err());
      return 1;
    }
    if (step() != 0) {
      fprintf(stderr, "step failed: %s\n", err());
      return 1;
    }
    printf("plan %d: u[0]=%g\n", i, u[0]);
  }
  destroy();
  printf("ok\n");
  return 0;
}
