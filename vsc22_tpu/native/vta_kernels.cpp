// Sequential alignment kernels (the numba @njit replacement).
//
// Role parity (reference, for cross-checking — original implementation):
//   D1/infer/vcsl/vta.py:174-207 (`njit_dp_matrix`) — the mPDP dynamic
//   program fill, inherently sequential in both axes (left + top
//   dependencies with a conditional freeze), so it belongs on the host in
//   native code rather than on the TPU.

#include <cstdint>
#include <cstring>

extern "C" {

// mPDP fill. sim: [m, n] row-major (already shifted non-negative by caller).
// Outputs: dp [m, n] f64, accu [m, n] i32, back [m, n] i8 (init by callee).
void vta_dp_fill(const double* sim, int64_t m, int64_t n, int64_t discontinue,
                 double min_sim, double* dp, int32_t* accu, int8_t* back) {
  for (int64_t idx = 0; idx < m * n; ++idx) {
    dp[idx] = sim[idx];
    accu[idx] = 0;
    back[idx] = -1;
  }
  for (int64_t i = 1; i < m; ++i) {
    const double* sim_i = sim + i * n;
    double* dp_i = dp + i * n;
    const double* dp_im1 = dp + (i - 1) * n;
    int32_t* accu_i = accu + i * n;
    const int32_t* accu_im1 = accu + (i - 1) * n;
    int8_t* back_i = back + i * n;
    for (int64_t j = 1; j < n; ++j) {
      double s = sim_i[j];
      double top_left = dp_im1[j - 1] + s;
      double top = dp_im1[j] + 0.5 * s;
      double left = dp_i[j - 1] + 0.5 * s;
      int8_t max_ind;
      double max_value;
      int32_t prev_accu;
      if (top_left >= top && top_left >= left) {
        max_ind = 0;
        max_value = top_left;
        prev_accu = accu_im1[j - 1];
      } else if (top >= left) {
        max_ind = 1;
        max_value = top;
        prev_accu = accu_im1[j];
      } else {
        max_ind = 2;
        max_value = left;
        prev_accu = accu_i[j - 1];
      }
      if (s < min_sim) {
        accu_i[j] = prev_accu + 1;
      }
      if (accu_i[j] <= discontinue) {
        back_i[j] = max_ind;
        dp_i[j] = max_value;
      }
    }
  }
}

}  // extern "C"
