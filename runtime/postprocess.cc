// Native end-to-end summarize postprocess:
//   round → expand to raw rate → per-clip stats → 0/1 knapsack → frame mask
//
// One C call replacing the whole host side of pipeline.summarize (reference
// ``postprocess``, utils.py:606-643): the Python path crosses numpy/XLA
// boundaries per stage; here the entire chain runs in a single pass over the
// timeline plus the DP.  Semantics are kept exactly:
//   * round-half-even then int8 cast (np.round().astype(np.int8));
//   * expansion is the clamped gather expanded[j] = r[min(j/skip, n-1)]
//     (reference expand_array, utils.py:396-410);
//   * clip stats use exclusive ends with Python-slice clamping
//     (utils.py:445-464);
//   * capacity = (int64)(ratio * full_n) — same IEEE double truncation as
//     Python's int();
//   * knapsack DP + greedy-from-the-end traceback (utils.py:466-510),
//     integer weights so the ×scale_factor is provably skippable;
//   * mask ends inclusive (reference utils.py:639-641) or exclusive.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

int goalnet_knapsack(const double* values, const int64_t* weights, int32_t n,
                     int64_t capacity, int32_t* selected_out);

// importances: (n_cond,) float scores; intervals: (n_clips, 2) int64 row-major.
// mask_out: caller buffer (full_n,); selected_out: caller buffer (n_clips,).
// Returns the number of selected clips (ascending order), or -1 on bad args.
int32_t goalnet_summarize(const float* importances, int32_t n_cond,
                          const int64_t* intervals, int32_t n_clips,
                          int32_t skip_frames, int64_t full_n,
                          double summary_ratio, int32_t inclusive_mask,
                          uint8_t* mask_out, int32_t* selected_out) {
  if (n_cond <= 0 || n_clips < 0 || skip_frames <= 0 || full_n <= 0) return -1;
  std::memset(mask_out, 0, static_cast<size_t>(full_n));
  if (n_clips == 0) return 0;

  // 1. round-half-even → int8 (np.round().astype(np.int8) semantics on the
  //    model's [1, 5] score range), PRE-ROUNDED once per condensed score —
  //    re-rounding per raw frame did skip_frames× the work in the one pass
  //    this file exists to make fast.  Hand-rolled half-even so the result
  //    is immune to fesetround() changes, with an int8 clamp (a bare
  //    static_cast from an out-of-range double is UB the optimizer may
  //    exploit; the staged Python path's float→int8 astype is itself
  //    platform-defined out of range, so clamping is the sane shared
  //    semantics for inputs beyond the model's range).
  std::vector<int8_t> rounded(static_cast<size_t>(n_cond));
  for (int32_t i = 0; i < n_cond; ++i) {
    const double x = static_cast<double>(importances[i]);
    const double f = std::floor(x);
    const double d = x - f;
    double r;
    if (d > 0.5) r = f + 1.0;
    else if (d < 0.5) r = f;
    else r = (std::fmod(f, 2.0) == 0.0) ? f : f + 1.0;  // ties to even
    if (r > 127.0) r = 127.0;
    if (r < -128.0) r = -128.0;
    rounded[static_cast<size_t>(i)] = static_cast<int8_t>(r);
  }
  //    prefix-sum the EXPANDED scores in one pass (expansion is a clamped
  //    gather, so each condensed score covers a contiguous raw range).
  std::vector<int64_t> prefix(static_cast<size_t>(full_n) + 1, 0);
  for (int64_t j = 0; j < full_n; ++j) {
    int64_t idx = j / skip_frames;
    if (idx >= n_cond) idx = n_cond - 1;
    prefix[j + 1] = prefix[j] + rounded[static_cast<size_t>(idx)];
  }

  // 2. per-clip stats with Python-slice clamping.
  std::vector<double> clip_imps(n_clips);
  std::vector<int64_t> clip_lens(n_clips);
  for (int32_t c = 0; c < n_clips; ++c) {
    int64_t a = intervals[2 * c], b = intervals[2 * c + 1];
    if (a < 0) a = 0;
    if (a > full_n) a = full_n;
    if (b < 0) b = 0;
    if (b > full_n) b = full_n;
    if (b < a) b = a;
    clip_imps[c] = static_cast<double>(prefix[b] - prefix[a]);
    clip_lens[c] = b - a;
  }

  // 3. knapsack at capacity = int(ratio * full_n); integer weights make the
  //    reference's ×scale_factor a no-op (docs/BENCHMARKS.md).
  const auto capacity =
      static_cast<int64_t>(summary_ratio * static_cast<double>(full_n));
  int32_t count = 0;
  if (capacity > 0) {
    count = goalnet_knapsack(clip_imps.data(), clip_lens.data(), n_clips,
                             capacity, selected_out);
  }

  // 4. frame mask over the selected intervals.
  for (int32_t s = 0; s < count; ++s) {
    const int32_t c = selected_out[s];
    int64_t a = intervals[2 * c], b = intervals[2 * c + 1];
    if (inclusive_mask) b += 1;
    if (a < 0) a = 0;
    if (b > full_n) b = full_n;
    for (int64_t j = a; j < b; ++j) mask_out[j] = 1;
  }
  return count;
}

}  // extern "C"
