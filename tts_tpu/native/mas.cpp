// Monotonic Alignment Search — native host kernel (C++/OpenMP).
//
// TPU-native framework's host-side fallback for the DP the reference ships
// as Cython (/root/reference/TTS/tts/layers/glow_tts/monotonic_align/core.pyx:9-45):
// per-batch-item Viterbi forward over the (t_x, t_y) log-likelihood matrix
// followed by a backtrack writing a 0/1 path. Batch items run in parallel.
// The on-device paths (Pallas kernel / lax.scan) are preferred; this exists
// for CPU data-preprocessing pipelines and as a correctness oracle.

#include <algorithm>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {
constexpr float kNegInf = -1e9f;

void maximum_path_single(int32_t* path, float* value, int t_x, int t_y,
                         int T_y_stride, int T_x /*rows allocated*/) {
  // forward pass, in place on the value matrix (row-major [x][y])
  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_stay = (x == y) ? kNegInf : value[x * T_y_stride + (y - 1)];
      float v_diag;
      if (x == 0) {
        v_diag = (y == 0) ? 0.f : kNegInf;
      } else {
        v_diag = value[(x - 1) * T_y_stride + (y - 1)];
      }
      value[x * T_y_stride + y] += std::max(v_stay, v_diag);
    }
  }
  // backtrack
  int x = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[x * T_y_stride + y] = 1;
    if (x != 0 &&
        (x == y || value[(x - 1) * T_y_stride + (y - 1)] >=
                       value[x * T_y_stride + (y - 1)])) {
      --x;
    }
  }
}
}  // namespace

extern "C" {

void maximum_path(int32_t* paths, float* values, const int32_t* t_xs,
                  const int32_t* t_ys, int B, int T_x, int T_y) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    maximum_path_single(paths + (int64_t)b * T_x * T_y,
                        values + (int64_t)b * T_x * T_y, t_xs[b], t_ys[b],
                        T_y, T_x);
  }
}

}  // extern "C"
