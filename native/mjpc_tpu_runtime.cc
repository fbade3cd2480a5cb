// Native runtime for the TPU-native MPC framework.
//
// The JAX/XLA side owns all planning compute; this library owns the
// latency-critical host runtime around it, the analog of the reference's
// C++ runtime pieces:
//   * spline policy container with lock-protected plan swap and
//     zero/linear/cubic sampling  (reference: mjpc/spline/spline.cc:103-260,
//     policy swap under shared_mutex, mjpc/planners/sampling/planner.cc:525)
//   * extern-C embedding API        (reference: mjpc/interface.h:29-49)
//   * worker thread pool with counter barrier
//     (reference: mjpc/threadpool.{h,cc})
//
// Built as a shared library, loaded from Python via ctypes
// (mujoco_mpc_tpu/native.py). No Python.h dependency.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <shared_mutex>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Spline policy
// ---------------------------------------------------------------------

enum Interp : int { kZero = 0, kLinear = 1, kCubic = 2 };

struct Policy {
  int nu = 0;
  int num_points = 0;
  int interp = kZero;
  std::vector<double> times;    // (P,)
  std::vector<double> values;   // (P, nu)
  std::vector<double> slopes;   // (P, nu) cubic FD slopes, derived
  std::vector<double> lo, hi;   // ctrl clamp
  mutable std::shared_mutex mtx;

  void RecomputeSlopes() {
    // averaged one-sided finite differences (matches ops/spline.py _slopes)
    const int P = num_points;
    slopes.assign(static_cast<size_t>(P) * nu, 0.0);
    if (P < 2) return;
    std::vector<double> fd(static_cast<size_t>(P - 1) * nu);
    for (int i = 0; i < P - 1; ++i) {
      double dt = std::max(times[i + 1] - times[i], 1e-10);
      for (int j = 0; j < nu; ++j) {
        fd[i * nu + j] = (values[(i + 1) * nu + j] - values[i * nu + j]) / dt;
      }
    }
    for (int j = 0; j < nu; ++j) {
      slopes[j] = fd[j];
      slopes[(P - 1) * nu + j] = fd[(P - 2) * nu + j];
    }
    for (int i = 1; i < P - 1; ++i) {
      for (int j = 0; j < nu; ++j) {
        slopes[i * nu + j] = 0.5 * (fd[(i - 1) * nu + j] + fd[i * nu + j]);
      }
    }
  }

  void Sample(double t, double* out) const {
    std::shared_lock<std::shared_mutex> lock(mtx);
    const int P = num_points;
    if (P == 1 || t <= times[0]) {
      std::memcpy(out, values.data() + (t <= times[0] ? 0
                  : (P - 1) * nu), sizeof(double) * nu);
      Clamp(out);
      return;
    }
    if (t >= times[P - 1]) {
      std::memcpy(out, values.data() + (P - 1) * nu, sizeof(double) * nu);
      Clamp(out);
      return;
    }
    // binary search: first index with times[i] > t
    int upper = static_cast<int>(
        std::upper_bound(times.begin(), times.end(), t) - times.begin());
    int lo_i = std::max(upper - 1, 0);
    int hi_i = std::min(upper, P - 1);
    const double* v0 = values.data() + lo_i * nu;
    const double* v1 = values.data() + hi_i * nu;
    if (interp == kZero) {
      std::memcpy(out, v0, sizeof(double) * nu);
    } else {
      double t0 = times[lo_i], t1 = times[hi_i];
      double dt = std::max(t1 - t0, 1e-10);
      double s = (t - t0) / dt;
      if (interp == kLinear) {
        for (int j = 0; j < nu; ++j) out[j] = v0[j] * (1 - s) + v1[j] * s;
      } else {
        const double* m0 = slopes.data() + lo_i * nu;
        const double* m1 = slopes.data() + hi_i * nu;
        double s2 = s * s, s3 = s2 * s;
        double c0 = 2 * s3 - 3 * s2 + 1;
        double c1 = (s3 - 2 * s2 + s) * dt;
        double c2 = -2 * s3 + 3 * s2;
        double c3 = (s3 - s2) * dt;
        for (int j = 0; j < nu; ++j) {
          out[j] = c0 * v0[j] + c1 * m0[j] + c2 * v1[j] + c3 * m1[j];
        }
      }
    }
    Clamp(out);
  }

  void Clamp(double* out) const {
    if (lo.empty()) return;
    for (int j = 0; j < nu; ++j) {
      out[j] = std::min(std::max(out[j], lo[j]), hi[j]);
    }
  }
};

// ---------------------------------------------------------------------
// ThreadPool with counter barrier (reference threadpool.h:32-77)
// ---------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : count_(0), stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this, i] { Worker(i); });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Schedule(std::function<void()> task) {
    {
      std::unique_lock<std::mutex> lock(m_);
      queue_.push(std::move(task));
    }
    cv_.notify_one();
  }

  int GetCount() const { return count_.load(); }
  void ResetCount() { count_.store(0); }

  void WaitCount(int n) {
    std::unique_lock<std::mutex> lock(wait_m_);
    wait_cv_.wait(lock, [this, n] { return count_.load() >= n; });
  }

  int NumThreads() const { return static_cast<int>(workers_.size()); }

  static thread_local int worker_id_;

 private:
  void Worker(int id) {
    worker_id_ = id;
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lock(m_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = std::move(queue_.front());
        queue_.pop();
      }
      task();
      {
        // Increment under wait_m_ so the increment cannot land between a
        // waiter's predicate check and its block (missed-wakeup race).
        std::lock_guard<std::mutex> lk(wait_m_);
        count_.fetch_add(1);
      }
      wait_cv_.notify_all();
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex m_;
  std::condition_variable cv_;
  std::atomic<int> count_;
  std::mutex wait_m_;
  std::condition_variable wait_cv_;
  bool stop_;
};

thread_local int ThreadPool::worker_id_ = -1;

}  // namespace

// ---------------------------------------------------------------------
// extern "C" API (reference: mjpc/interface.h extern-C surface)
// ---------------------------------------------------------------------

extern "C" {

void* mtpu_create_policy(int nu, int num_points, int interp) {
  auto* p = new Policy();
  p->nu = nu;
  p->num_points = num_points;
  p->interp = interp;
  p->times.assign(num_points, 0.0);
  p->values.assign(static_cast<size_t>(num_points) * nu, 0.0);
  p->RecomputeSlopes();
  return p;
}

void mtpu_destroy_policy(void* h) { delete static_cast<Policy*>(h); }

// Atomically install a new plan (the planner thread's policy swap).
void mtpu_set_plan(void* h, const double* times, const double* values) {
  auto* p = static_cast<Policy*>(h);
  std::unique_lock<std::shared_mutex> lock(p->mtx);
  std::memcpy(p->times.data(), times, sizeof(double) * p->num_points);
  std::memcpy(p->values.data(), values,
              sizeof(double) * p->num_points * p->nu);
  if (p->interp == kCubic) p->RecomputeSlopes();
}

void mtpu_set_interp(void* h, int interp) {
  auto* p = static_cast<Policy*>(h);
  std::unique_lock<std::shared_mutex> lock(p->mtx);
  p->interp = interp;
  if (interp == kCubic) p->RecomputeSlopes();
}

void mtpu_set_clamp(void* h, const double* lo, const double* hi) {
  auto* p = static_cast<Policy*>(h);
  std::unique_lock<std::shared_mutex> lock(p->mtx);
  p->lo.assign(lo, lo + p->nu);
  p->hi.assign(hi, hi + p->nu);
}

// Low-latency action query (the physics thread's ActionFromPolicy).
void mtpu_action(void* h, double t, double* out) {
  static_cast<Policy*>(h)->Sample(t, out);
}

// Batched action query: sample T times at once.
void mtpu_actions(void* h, const double* ts, int n, double* out) {
  auto* p = static_cast<Policy*>(h);
  for (int i = 0; i < n; ++i) p->Sample(ts[i], out + i * p->nu);
}

// ---- thread pool ----

void* mtpu_threadpool_create(int n) { return new ThreadPool(n); }
void mtpu_threadpool_destroy(void* h) { delete static_cast<ThreadPool*>(h); }
int mtpu_threadpool_size(void* h) {
  return static_cast<ThreadPool*>(h)->NumThreads();
}

typedef void (*mtpu_task_fn)(void* arg);

void mtpu_schedule(void* h, mtpu_task_fn fn, void* arg) {
  static_cast<ThreadPool*>(h)->Schedule([fn, arg] { fn(arg); });
}

void mtpu_wait_count(void* h, int n) {
  static_cast<ThreadPool*>(h)->WaitCount(n);
}

void mtpu_reset_count(void* h) {
  static_cast<ThreadPool*>(h)->ResetCount();
}

int mtpu_get_count(void* h) {
  return static_cast<ThreadPool*>(h)->GetCount();
}

int mtpu_worker_id() { return ThreadPool::worker_id_; }

}  // extern "C"
