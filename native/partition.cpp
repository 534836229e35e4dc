// Native block-partition scheduler for kfac_pytorch_tpu.
//
// Optimal contiguous assignment of N weighted tasks to P workers minimizing
// the bottleneck (max per-worker load). This is the production counterpart
// of the reference's offline Python prototype
// (/root/reference/scripts/dp_block_partition.py:11-76); implemented here
// via parametric binary search over the bottleneck with a greedy feasibility
// check (O(N log(sum/eps))), exposed through a C ABI for ctypes.
//
// Build: make -C native   (produces libkfac_partition.so)

#include <cstdint>
#include <vector>

extern "C" {

// Returns 1 if `weights[0..n)` can be split into <= p contiguous blocks each
// of sum <= cap.
static int feasible(const double* w, int64_t n, double cap, int64_t p) {
  int64_t blocks = 1;
  double load = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    if (w[i] > cap) return 0;
    if (load + w[i] > cap) {
      ++blocks;
      load = w[i];
      if (blocks > p) return 0;
    } else {
      load += w[i];
    }
  }
  return 1;
}

// placement[i] <- worker id for task i. Returns the achieved bottleneck.
double kfac_block_partition(const double* weights, int64_t n, int64_t p,
                            int64_t* placement) {
  if (n == 0) return 0.0;
  if (n <= p) {
    for (int64_t i = 0; i < n; ++i) placement[i] = i;
    double mx = 0.0;
    for (int64_t i = 0; i < n; ++i) mx = weights[i] > mx ? weights[i] : mx;
    return mx;
  }
  double lo = 0.0, hi = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    hi += weights[i];
    if (weights[i] > lo) lo = weights[i];
  }
  for (int iter = 0; iter < 64; ++iter) {
    double mid = 0.5 * (lo + hi);
    if (feasible(weights, n, mid, p)) {
      hi = mid;
    } else {
      lo = mid;
    }
  }
  const double cap = hi * (1.0 + 1e-12);

  int64_t worker = 0;
  double load = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    if (load + weights[i] > cap && load > 0.0) {
      ++worker;
      load = 0.0;
    }
    placement[i] = worker < p - 1 ? worker : p - 1;
    load += weights[i];
  }
  // spread trailing tasks onto idle workers (keeps parity with the
  // reference's fill-in pass, dp_block_partition.py:68-74)
  int64_t used = placement[n - 1] + 1;
  if (used < p) {
    for (int64_t i = n - 1; i > 0 && used < p; --i) {
      if (placement[i] == placement[i - 1]) {
        for (int64_t j = i; j < n; ++j) ++placement[j];
        ++used;
      }
    }
  }
  double best = 0.0, cur = 0.0;
  int64_t prev = placement[0];
  for (int64_t i = 0; i < n; ++i) {
    if (placement[i] != prev) {
      if (cur > best) best = cur;
      cur = 0.0;
      prev = placement[i];
    }
    cur += weights[i];
  }
  if (cur > best) best = cur;
  return best;
}

}  // extern "C"
