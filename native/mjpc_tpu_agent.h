/* Embeddable C control surface for the mujoco_mpc_tpu agent.
 *
 * Reference parity: mjpc/interface.h:44-49 (extern-C create_policy /
 * step_policy / set_weights / destroy_policy around an AgentRunner that
 * owns the agent and a background plan thread).
 *
 * Usage (standalone embedder):
 *   - compile your program against this header and link
 *     libmjpc_tpu_agent.so plus libpython (`python3-config --embed
 *     --includes --ldflags`);
 *   - set PYTHONPATH so `mujoco_mpc_tpu` (and any platform plugin site
 *     dir) import, or rely on the repo root baked at build time;
 *   - mtpu_agent_create starts the interpreter on first use. When the
 *     library is loaded into an existing Python process it attaches to
 *     that interpreter instead.
 *
 * All functions return 0 (or a non-negative count) on success and -1 on
 * error; mtpu_last_error() describes the most recent failure. There is
 * one global runner, like the reference's interface.cc:66.
 */

#ifndef MJPC_TPU_AGENT_H_
#define MJPC_TPU_AGENT_H_

#ifdef __cplusplus
extern "C" {
#endif

/* Create the global runner for a registry task name (e.g. "Cartpole").
 * num_samples <= 0 and planner_id < 0 keep the task defaults. */
int mtpu_agent_create(const char* task_name, int num_samples,
                      int planner_id);
int mtpu_agent_destroy(void);

int mtpu_agent_nu(void);
int mtpu_agent_nq(void);
int mtpu_agent_nv(void);
int mtpu_agent_num_weights(void);

/* NULL qpos/qvel (or 0 lengths) leave that field unchanged; time < 0
 * leaves time unchanged. */
int mtpu_agent_set_state(const double* qpos, int nq, const double* qvel,
                         int nv, double time);

/* One synchronous plan iteration (blocks on device compute). */
int mtpu_agent_plan(void);

/* Background plan loop on a worker thread (reference interface.cc:39-41);
 * plan_count reports completed iterations. */
int mtpu_agent_start_plan_loop(void);
int mtpu_agent_stop_plan_loop(void);
long mtpu_agent_plan_count(void);

/* Policy action at `time` (time < 0: current sim time) into out[0..n).
 * Returns the number of values written (= nu). */
int mtpu_agent_action(double time, double* out, int out_len);

/* Step the runner's own simulation under the policy action. */
int mtpu_agent_step(void);

/* Dense cost weights in task term order (mtpu_agent_num_weights of
 * them) — reference set_weights. */
int mtpu_agent_set_weights(const double* w, int n);

const char* mtpu_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* MJPC_TPU_AGENT_H_ */
