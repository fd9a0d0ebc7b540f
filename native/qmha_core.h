// Native host-side core of quantizedmha_tpu.
//
// TPU-native rebuild of the reference's C++/CUDA host layer: the CPU golden
// MHA with RoPE (reference utils/verify.cu:9-104), the elementwise verifier
// (verify.cu:153-173), and the symmetric per-tile INT8 quantizer the kernels
// use on-device (fa_tc_int8_a.cu:38-147's math, minus the CUDA). Exposed as
// a plain C ABI consumed from Python via ctypes (no pybind11 in this image).
//
// Semantics match quantizedmha_tpu/reference/mha.py exactly (RoPE pairing
// (2i, 2i+1), freqs theta^(-2i/d), stable softmax, scale 1/sqrt(d)).
#pragma once

#include <cstdint>

extern "C" {

// Library/ABI version; bump on any signature change (2: +window/+sinks).
int qmha_version();

// In-place RoPE over one [seq, d] matrix (d even), positions 0..seq-1.
void qmha_rope(float* x, int64_t seq, int32_t d, float theta);

// CPU golden MHA over flat [n, d_model] Q/K/V -> O (reference ABI).
//   use_rope: apply RoPE to Q and K per head before attention.
//   causal:   lower-triangular mask.
//   window:   causal sliding window, (i - j) < window; 0 = off.
//   sinks:    StreamingLLM attention sinks (first `sinks` positions stay
//             visible beyond the window); only meaningful with window > 0.
//   sm_scale: softmax scale; pass <= 0 for the default 1/sqrt(d).
//   n_threads: worker threads; pass 0 for hardware concurrency.
// Returns 0 on success, nonzero on invalid arguments.
int qmha_cpu_mha(const float* q, const float* k, const float* v, float* o,
                 int64_t n, int32_t d_model, int32_t h, int32_t use_rope,
                 float rope_theta, int32_t causal, int32_t window,
                 int32_t sinks, float sm_scale, int32_t n_threads);

// Like qmha_cpu_mha but over ONE head [n, d] and also writing the
// intermediates S (scaled scores, [n, n]) and P (normalized probs, [n, n]);
// pass nullptr to skip either. Used by the golden-case generator
// (reference tests/generate_golden.cpp:53-92 kept S and P too).
int qmha_cpu_mha_head(const float* q, const float* k, const float* v,
                      float* o, float* s, float* p, int64_t n, int32_t d,
                      int32_t causal, int32_t window, int32_t sinks,
                      float sm_scale);

// Elementwise verification gate: |got-ref| <= max(abs_tol, rel_tol*|ref|)
// (reference utils/verify.cu:153-173), plus summary statistics.
// stats_out[6] = { max_abs, mean_abs, max_rel, n_mismatch, n_nonfinite,
//                  first_bad_index (-1 if none) }.
// Returns 0 if all elements pass and are finite.
int qmha_verify(const float* got, const float* ref, int64_t count,
                double abs_tol, double rel_tol, double* stats_out);

// Symmetric per-tile INT8 quantization: for each [tile_rows, cols] tile,
// scale = max|x| / 127 clamped at scale_clamp; out = round(x / scale).
// x: [rows, cols]; rows must be a multiple of tile_rows (or the last tile
// is short). scales: [ceil(rows/tile_rows)].
int qmha_quantize_int8(const float* x, int64_t rows, int64_t cols,
                       int64_t tile_rows, float scale_clamp, int8_t* out,
                       float* scales);

// Dequantize: inverse of qmha_quantize_int8.
int qmha_dequantize_int8(const int8_t* x, const float* scales, int64_t rows,
                         int64_t cols, int64_t tile_rows, float* out);

}  // extern "C"
