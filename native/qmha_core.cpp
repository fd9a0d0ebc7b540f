// Implementation of the native host core (see qmha_core.h).
//
// This is host-side C++ (threads + scalar/auto-vectorized loops): the TPU
// compute path lives in Pallas kernels; this library is the framework's
// native golden-reference, verifier, and quantizer — the role the
// reference's utils/verify.cu + tests/generate_golden.cpp + the in-kernel
// fp32_to_int8sram quantizer (fa_tc_int8_a.cu:38-147) played, built fresh.

#include "qmha_core.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

namespace {

int resolve_threads(int32_t n_threads) {
  if (n_threads > 0) return n_threads;
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? static_cast<int>(hc) : 4;
}

// Run fn(worker_id, begin, end) over [0, total) split across threads.
void parallel_for(int64_t total, int n_threads,
                  const std::function<void(int, int64_t, int64_t)>& fn) {
  n_threads = static_cast<int>(
      std::max<int64_t>(1, std::min<int64_t>(n_threads, total ? total : 1)));
  if (n_threads == 1) {
    fn(0, 0, total);
    return;
  }
  std::vector<std::thread> workers;
  int64_t chunk = (total + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min<int64_t>(begin + chunk, total);
    if (begin >= end) break;
    workers.emplace_back(fn, t, begin, end);
  }
  for (auto& w : workers) w.join();
}

// One attention row: out[d] = sum_j softmax(scale * q . k_j)_j * v_j.
// q: [d]; k, v: [n_kv, d] with row stride `stride`. Optionally records the
// scaled scores and normalized probs for row `i` into s_row/p_row ([n_kv]).
// window > 0 restricts causal visibility to (i - j) < window, except the
// first `sinks` positions which stay visible (StreamingLLM sinks) — the
// same semantics as reference/mha.py mha_masked_reference.
void attention_row(const float* q, const float* k, const float* v, float* out,
                   float* s_row, float* p_row, int64_t i, int64_t n_kv,
                   int32_t d, int64_t stride, int32_t causal, int32_t window,
                   int32_t sinks, float scale, std::vector<float>& scores) {
  const float NEG = -std::numeric_limits<float>::max();
  float m = NEG;
  for (int64_t j = 0; j < n_kv; ++j) {
    bool vis = !causal || j <= i;
    if (vis && causal && window > 0)
      vis = (i - j) < window || j < sinks;
    float s;
    if (vis) {
      float acc = 0.f;
      const float* kj = k + j * stride;
      for (int32_t c = 0; c < d; ++c) acc += q[c] * kj[c];
      s = acc * scale;
      m = std::max(m, s);
    } else {
      s = NEG;
    }
    scores[j] = s;
    if (s_row) s_row[j] = s;
  }
  float l = 0.f;
  for (int64_t j = 0; j < n_kv; ++j) {
    float e = scores[j] == NEG ? 0.f : std::exp(scores[j] - m);
    scores[j] = e;
    l += e;
  }
  float inv_l = 1.0f / l;
  if (p_row) {
    for (int64_t j = 0; j < n_kv; ++j) p_row[j] = scores[j] * inv_l;
  }
  for (int32_t c = 0; c < d; ++c) out[c] = 0.f;
  for (int64_t j = 0; j < n_kv; ++j) {
    if (scores[j] == 0.f) continue;
    float w = scores[j] * inv_l;
    const float* vj = v + j * stride;
    for (int32_t c = 0; c < d; ++c) out[c] += w * vj[c];
  }
}

}  // namespace

extern "C" {

int qmha_version() { return 2; }

void qmha_rope(float* x, int64_t seq, int32_t d, float theta) {
  // Pairing (2i, 2i+1), angle pos * theta^(-2i/d) — matches
  // quantizedmha_tpu/reference/mha.py apply_rope and the reference golden
  // (utils/verify.cu:56-69).
  int32_t half = d / 2;
  std::vector<float> freqs(half);
  for (int32_t i = 0; i < half; ++i)
    freqs[i] = std::pow(theta, -2.0f * static_cast<float>(i) / d);
  for (int64_t pos = 0; pos < seq; ++pos) {
    float* row = x + pos * d;
    for (int32_t i = 0; i < half; ++i) {
      float ang = static_cast<float>(pos) * freqs[i];
      float c = std::cos(ang), s = std::sin(ang);
      float e = row[2 * i], o = row[2 * i + 1];
      row[2 * i] = e * c - o * s;
      row[2 * i + 1] = e * s + o * c;
    }
  }
}

int qmha_cpu_mha_head(const float* q, const float* k, const float* v,
                      float* o, float* s, float* p, int64_t n, int32_t d,
                      int32_t causal, int32_t window, int32_t sinks,
                      float sm_scale) {
  if (!q || !k || !v || !o || n <= 0 || d <= 0) return 1;
  float scale = sm_scale > 0.f ? sm_scale : 1.0f / std::sqrt((float)d);
  std::vector<float> scores(n);
  for (int64_t i = 0; i < n; ++i) {
    attention_row(q + i * d, k, v, o + i * d, s ? s + i * n : nullptr,
                  p ? p + i * n : nullptr, i, n, d, d, causal, window, sinks,
                  scale, scores);
  }
  return 0;
}

int qmha_cpu_mha(const float* q, const float* k, const float* v, float* o,
                 int64_t n, int32_t d_model, int32_t h, int32_t use_rope,
                 float rope_theta, int32_t causal, int32_t window,
                 int32_t sinks, float sm_scale, int32_t n_threads) {
  if (!q || !k || !v || !o || n <= 0 || h <= 0 || d_model % h != 0) return 1;
  int32_t d = d_model / h;
  if (use_rope && d % 2 != 0) return 2;
  float scale = sm_scale > 0.f ? sm_scale : 1.0f / std::sqrt((float)d);
  int threads = resolve_threads(n_threads);

  // Extract per-head contiguous [n, d] slices (launch_extract_mat's role,
  // reference utils/utils.cu:24-33) and apply RoPE once per head.
  std::vector<float> qh(h * n * d), kh(h * n * d), vh(h * n * d);
  parallel_for(h, threads, [&](int, int64_t hb, int64_t he) {
    for (int64_t hh = hb; hh < he; ++hh) {
      float* qd = qh.data() + hh * n * d;
      float* kd = kh.data() + hh * n * d;
      float* vd = vh.data() + hh * n * d;
      for (int64_t i = 0; i < n; ++i) {
        std::memcpy(qd + i * d, q + i * d_model + hh * d, d * sizeof(float));
        std::memcpy(kd + i * d, k + i * d_model + hh * d, d * sizeof(float));
        std::memcpy(vd + i * d, v + i * d_model + hh * d, d * sizeof(float));
      }
      if (use_rope) {
        qmha_rope(qd, n, d, rope_theta);
        qmha_rope(kd, n, d, rope_theta);
      }
    }
  });

  // Parallelize over all (head, query-row) pairs.
  parallel_for(static_cast<int64_t>(h) * n, threads,
               [&](int, int64_t begin, int64_t end) {
    std::vector<float> scores(n);
    std::vector<float> out_row(d);
    for (int64_t idx = begin; idx < end; ++idx) {
      int64_t hh = idx / n, i = idx % n;
      const float* qd = qh.data() + hh * n * d;
      const float* kd = kh.data() + hh * n * d;
      const float* vd = vh.data() + hh * n * d;
      attention_row(qd + i * d, kd, vd, out_row.data(), nullptr, nullptr, i,
                    n, d, d, causal, window, sinks, scale, scores);
      // Concat back into [n, d_model] (launch_concat_mat's role).
      std::memcpy(o + i * d_model + hh * d, out_row.data(), d * sizeof(float));
    }
  });
  return 0;
}

int qmha_verify(const float* got, const float* ref, int64_t count,
                double abs_tol, double rel_tol, double* stats_out) {
  if (!got || !ref || count < 0 || !stats_out) return -1;
  double max_abs = 0.0, sum_abs = 0.0, ref_absmax = 0.0;
  int64_t n_mismatch = 0, n_nonfinite = 0, first_bad = -1;
  for (int64_t i = 0; i < count; ++i) {
    double g = got[i], r = ref[i];
    // Non-finite on EITHER side fails the gate (a NaN reference would
    // otherwise slip through: NaN comparisons are all false, and
    // std::max drops NaN from the stats).
    if (!std::isfinite(g) || !std::isfinite(r)) {
      ++n_nonfinite;
      if (first_bad < 0) first_bad = i;
      continue;
    }
    double diff = std::fabs(g - r);
    max_abs = std::max(max_abs, diff);
    sum_abs += diff;
    ref_absmax = std::max(ref_absmax, std::fabs(r));
    if (diff > std::max(abs_tol, rel_tol * std::fabs(r))) {
      ++n_mismatch;
      if (first_bad < 0) first_bad = i;
    }
  }
  stats_out[0] = max_abs;
  stats_out[1] = count ? sum_abs / count : 0.0;
  stats_out[2] = ref_absmax > 0 ? max_abs / ref_absmax : max_abs;
  stats_out[3] = static_cast<double>(n_mismatch);
  stats_out[4] = static_cast<double>(n_nonfinite);
  stats_out[5] = static_cast<double>(first_bad);
  return (n_mismatch == 0 && n_nonfinite == 0) ? 0 : 1;
}

int qmha_quantize_int8(const float* x, int64_t rows, int64_t cols,
                       int64_t tile_rows, float scale_clamp, int8_t* out,
                       float* scales) {
  if (!x || !out || !scales || rows <= 0 || cols <= 0 || tile_rows <= 0)
    return 1;
  int64_t n_tiles = (rows + tile_rows - 1) / tile_rows;
  for (int64_t t = 0; t < n_tiles; ++t) {
    int64_t r0 = t * tile_rows, r1 = std::min(rows, r0 + tile_rows);
    float amax = 0.f;
    for (int64_t i = r0 * cols; i < r1 * cols; ++i)
      amax = std::max(amax, std::fabs(x[i]));
    // Clamp amax BEFORE dividing — the Python quantizers' semantics
    // (ops/quantize.py: scale = max(amax, clamp) / 127), so near-zero
    // tiles quantize identically across the native and jnp paths.
    float scale = std::max(amax, scale_clamp) / 127.0f;
    scales[t] = scale;
    float inv = 1.0f / scale;
    for (int64_t i = r0 * cols; i < r1 * cols; ++i) {
      float q = std::nearbyint(x[i] * inv);  // round-half-to-even, like jnp
      out[i] = static_cast<int8_t>(std::max(-127.f, std::min(127.f, q)));
    }
  }
  return 0;
}

int qmha_dequantize_int8(const int8_t* x, const float* scales, int64_t rows,
                         int64_t cols, int64_t tile_rows, float* out) {
  if (!x || !scales || !out || rows <= 0 || cols <= 0 || tile_rows <= 0)
    return 1;
  for (int64_t i = 0; i < rows; ++i) {
    float scale = scales[i / tile_rows];
    for (int64_t c = 0; c < cols; ++c)
      out[i * cols + c] = static_cast<float>(x[i * cols + c]) * scale;
  }
  return 0;
}

}  // extern "C"
