// Native 0/1 knapsack solver for keyshot selection.
//
// Host-side replacement for the reference's pure-Python DP
// (reference utils.py:466-510 — the O(n_clips × capacity) doubly nested loop
// flagged as a hot host loop in SURVEY.md §3.1).  Same recurrence, same
// greedy-from-the-end traceback semantics, ~3 orders of magnitude faster on
// long timelines (90-min match → capacity ≈ 0.15·135000·5 ≈ 100k columns).
//
// Exposed via a C ABI and loaded with ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// values: n importance sums; weights: n integer (pre-scaled) lengths;
// capacity: integer (pre-scaled) budget; selected_out: caller buffer of n ints.
// Returns the number of selected indices (written in ascending order).
int goalnet_knapsack(const double* values, const int64_t* weights, int32_t n,
                     int64_t capacity, int32_t* selected_out) {
  if (n <= 0 || capacity <= 0) return 0;
  const size_t w1 = static_cast<size_t>(capacity) + 1;

  // Full table for exact reference traceback; row-major (n+1, capacity+1).
  std::vector<double> table(static_cast<size_t>(n + 1) * w1, 0.0);
  for (int32_t i = 0; i < n; ++i) {
    const double* prev = &table[static_cast<size_t>(i) * w1];
    double* cur = &table[static_cast<size_t>(i + 1) * w1];
    const int64_t wi = weights[i];
    const double vi = values[i];
    if (wi > capacity) {
      std::memcpy(cur, prev, w1 * sizeof(double));
      continue;
    }
    std::memcpy(cur, prev, static_cast<size_t>(wi) * sizeof(double));
    for (size_t w = static_cast<size_t>(wi); w < w1; ++w) {
      const double take = prev[w - wi] + vi;
      cur[w] = take > prev[w] ? take : prev[w];
    }
  }

  // Reference traceback (utils.py:494-510): walk items from the end, skip when
  // the cell value is inherited from the row above, else take the item.
  double res = table[static_cast<size_t>(n) * w1 + capacity];
  int64_t w = capacity;
  int32_t count = 0;
  for (int32_t i = n; i > 0; --i) {
    if (res <= 0.0) break;
    // w < 0 can only happen when float-valued inputs break the exact
    // equality below (fp subtraction need not reproduce the table cell);
    // bail out rather than index out of bounds — the Python layer routes
    // non-integral values to the f64 host engine, this is defense in depth
    if (w < 0) break;
    if (res == table[static_cast<size_t>(i - 1) * w1 + w]) continue;
    selected_out[count++] = i - 1;
    res -= values[i - 1];
    w -= weights[i - 1];
  }
  // Emitted from the end — reverse to ascending order (reference reverses too).
  for (int32_t a = 0, b = count - 1; a < b; ++a, --b) {
    int32_t t = selected_out[a];
    selected_out[a] = selected_out[b];
    selected_out[b] = t;
  }
  return count;
}

}  // extern "C"
