// Host-side pose backend with the orbslam2-binding API surface.
//
// The reference reaches an ORB-SLAM2 C++ backend through a Boost.Python
// binding (call sites SLAM/multiprocess/tracker.py:225-260).  This library
// provides the same contract as a native component for the TPU framework:
//   * a trajectory store fed by ICP relative poses (track_with_icp_pose)
//     or held poses on feature-track fallback (track_with_orb_feature);
//   * keyframe selection every N frames;
//   * a loop-closure hook: add_loop_constraint(i, j, T_ij) followed by
//     Gauss-Newton pose-graph relaxation over SE(3) (rotations composed
//     exactly, small-angle log/exp for the GN step), after which
//     get_trajectory_points returns the corrected history — the mapper
//     re-applies those poses exactly like the reference does after a
//     BA/loop-closure update (mapper.py:134-141).
//
// Exposed as a C API consumed via ctypes (rtgslam_tpu/slam/native_backend.py);
// no Python.h dependency so it builds anywhere with g++.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Mat4 {
  double m[16];  // row-major
  static Mat4 identity() {
    Mat4 r{};
    for (int i = 0; i < 4; ++i) r.m[i * 4 + i] = 1.0;
    return r;
  }
};

Mat4 matmul(const Mat4& a, const Mat4& b) {
  Mat4 r{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
      r.m[i * 4 + j] = s;
    }
  return r;
}

Mat4 inverse_se3(const Mat4& a) {
  // [R t; 0 1]^-1 = [R^T -R^T t; 0 1]
  Mat4 r = Mat4::identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i * 4 + j] = a.m[j * 4 + i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += r.m[i * 4 + j] * a.m[j * 4 + 3];
    r.m[i * 4 + 3] = -s;
  }
  return r;
}

// so(3) log of the rotation block (angle-axis vector).
void so3_log(const Mat4& T, double w[3]) {
  double tr = T.m[0] + T.m[5] + T.m[10];
  double cos_t = std::fmin(1.0, std::fmax(-1.0, (tr - 1.0) / 2.0));
  double theta = std::acos(cos_t);
  double s = std::sin(theta);
  double k = (std::fabs(s) < 1e-9) ? 0.5 : theta / (2.0 * s);
  w[0] = k * (T.m[9] - T.m[6]);
  w[1] = k * (T.m[2] - T.m[8]);
  w[2] = k * (T.m[4] - T.m[1]);
}

Mat4 so3_exp_with_t(const double w[3], const double t[3]) {
  Mat4 T = Mat4::identity();
  double theta = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  double kx = 0, ky = 0, kz = 0;
  if (theta > 1e-12) { kx = w[0] / theta; ky = w[1] / theta; kz = w[2] / theta; }
  double c = std::cos(theta), s = std::sin(theta), v = 1 - c;
  T.m[0] = c + kx * kx * v;      T.m[1] = kx * ky * v - kz * s; T.m[2] = kx * kz * v + ky * s;
  T.m[4] = ky * kx * v + kz * s; T.m[5] = c + ky * ky * v;      T.m[6] = ky * kz * v - kx * s;
  T.m[8] = kz * kx * v - ky * s; T.m[9] = kz * ky * v + kx * s; T.m[10] = c + kz * kz * v;
  T.m[3] = t[0]; T.m[7] = t[1]; T.m[11] = t[2];
  return T;
}

struct Constraint {
  int i, j;        // pose indices
  Mat4 T_ij;       // measured relative pose c2w_i^-1 * c2w_j
  double weight;
};

struct Backend {
  std::mutex mu;
  std::vector<Mat4> poses;       // c2w per processed frame
  std::vector<double> stamps;
  std::vector<Constraint> loops;
  int keyframe_every = 10;
  bool use_icp = true;
  bool running = false;

  void relax(int iterations);
};

// Pose-graph relaxation: odometry chain constraints (consecutive poses,
// derived from the current estimate at loop-insert time) + loop constraints,
// solved by decoupled rotation/translation Gauss-Seidel sweeps — the classic
// linear(ized) pose-graph scheme, sufficient for drift distribution.
void Backend::relax(int iterations) {
  const int n = static_cast<int>(poses.size());
  if (n < 2 || loops.empty()) return;

  // odometry constraints from the current chain
  std::vector<Constraint> cons;
  cons.reserve(n - 1 + loops.size());
  for (int i = 0; i + 1 < n; ++i)
    cons.push_back({i, i + 1, matmul(inverse_se3(poses[i]), poses[i + 1]), 1.0});
  for (const auto& l : loops) cons.push_back(l);

  for (int it = 0; it < iterations; ++it) {
    // Gauss-Seidel: each constraint pulls pose j toward pose_i * T_ij and
    // pose i toward pose_j * T_ij^-1, weighted.
    std::vector<Mat4> target = poses;
    std::vector<double> wsum(n, 1e-9);
    std::vector<double> acc_w(n * 3, 0.0), acc_t(n * 3, 0.0);
    for (const auto& c : cons) {
      if (c.i < 0 || c.j < 0 || c.i >= n || c.j >= n) continue;
      Mat4 pred_j = matmul(poses[c.i], c.T_ij);
      Mat4 pred_i = matmul(poses[c.j], inverse_se3(c.T_ij));
      // residual transforms
      for (int side = 0; side < 2; ++side) {
        int idx = side == 0 ? c.j : c.i;
        if (idx == 0) continue;  // gauge-fix the first pose
        const Mat4& pred = side == 0 ? pred_j : pred_i;
        Mat4 delta = matmul(pred, inverse_se3(poses[idx]));
        double w[3];
        so3_log(delta, w);
        for (int k = 0; k < 3; ++k) {
          acc_w[idx * 3 + k] += c.weight * w[k];
          acc_t[idx * 3 + k] +=
              c.weight * (pred.m[k * 4 + 3] - poses[idx].m[k * 4 + 3]);
        }
        wsum[idx] += c.weight;
      }
    }
    const double step = 0.5;
    for (int i = 1; i < n; ++i) {
      double w[3], t[3];
      for (int k = 0; k < 3; ++k) {
        w[k] = step * acc_w[i * 3 + k] / wsum[i];
        t[k] = step * acc_t[i * 3 + k] / wsum[i];
      }
      Mat4 delta = so3_exp_with_t(w, t);
      // left-multiply the rotation update around the current pose, add t
      Mat4 upd = poses[i];
      Mat4 rot_only = delta; rot_only.m[3] = rot_only.m[7] = rot_only.m[11] = 0;
      upd = matmul(rot_only, upd);
      for (int k = 0; k < 3; ++k) upd.m[k * 4 + 3] = poses[i].m[k * 4 + 3] + t[k];
      poses[i] = upd;
    }
  }
}

void fill_row(const Mat4& p, double stamp, double* row) {
  row[0] = stamp;
  row[1] = p.m[0]; row[2] = p.m[1]; row[3] = p.m[2];  row[4] = p.m[3];
  row[5] = p.m[4]; row[6] = p.m[5]; row[7] = p.m[6];  row[8] = p.m[7];
  row[9] = p.m[8]; row[10] = p.m[9]; row[11] = p.m[10]; row[12] = p.m[11];
}

}  // namespace

extern "C" {

void* pb_create() { return new Backend(); }

void pb_destroy(void* h) { delete static_cast<Backend*>(h); }

void pb_initialize(void* h, int useicp) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  b->use_icp = useicp != 0;
  b->running = true;
}

void pb_shutdown(void* h) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  b->running = false;
}

void pb_process_image_rgbd(void* h, double timestamp) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  b->poses.push_back(Mat4::identity());
  b->stamps.push_back(timestamp);
}

// pose_rel: row-major 4x4 float32, T_{prev<-curr}
void pb_track_with_icp_pose(void* h, const float* pose_rel, double timestamp) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  Mat4 rel{};
  for (int i = 0; i < 16; ++i) rel.m[i] = pose_rel[i];
  Mat4 prev = b->poses.empty() ? Mat4::identity() : b->poses.back();
  b->poses.push_back(matmul(prev, rel));
  b->stamps.push_back(timestamp);
}

void pb_track_with_orb_feature(void* h, double timestamp) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  Mat4 prev = b->poses.empty() ? Mat4::identity() : b->poses.back();
  b->poses.push_back(prev);
  b->stamps.push_back(timestamp);
}

// T_ij: row-major 4x4 float64 measured relative pose between frames i and j.
void pb_add_loop_constraint(void* h, int i, int j, const double* T_ij,
                            double weight, int relax_iterations) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  Constraint c;
  c.i = i; c.j = j; c.weight = weight;
  std::memcpy(c.T_ij.m, T_ij, sizeof(double) * 16);
  b->loops.push_back(c);
  b->relax(relax_iterations);
}

int pb_trajectory_size(void* h) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  return static_cast<int>(b->poses.size());
}

// out: [n, 13] doubles (stamp, r00,r01,r02,t0, r10,...,t2)
void pb_get_trajectory(void* h, double* out) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  for (size_t i = 0; i < b->poses.size(); ++i)
    fill_row(b->poses[i], b->stamps[i], out + i * 13);
}

int pb_keyframe_size(void* h) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  int n = static_cast<int>(b->poses.size());
  return (n + b->keyframe_every - 1) / b->keyframe_every;
}

void pb_get_keyframes(void* h, double* out) {
  auto* b = static_cast<Backend*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  int k = 0;
  for (size_t i = 0; i < b->poses.size(); i += b->keyframe_every)
    fill_row(b->poses[i], b->stamps[i], out + (k++) * 13);
}

}  // extern "C"
