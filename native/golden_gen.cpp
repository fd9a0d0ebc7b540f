// Golden-case generator binary.
//
// Native parity with the reference's tests/generate_golden.cpp:103-192:
// writes deterministic MHA test cases — {Q,K,V,O}.f32.bin (+ per-head S and
// P score/prob intermediates when small enough) plus meta.json — for a
// ladder of sizes including an unaligned case and an INT8 quantization case.
// Two deliberate upgrades over the reference: the meta.json schema is the
// one quantizedmha_tpu.harness.data.load_case reads (so the Python test
// suite actually CONSUMES these cases — the reference generated golden files
// nothing ever read, SURVEY.md §4.3), and the quant case stores real
// per-tile max-abs scales next to the reference-style fixed scale.
//
// Usage: golden_gen <out_dir> [case ...]   (default: all cases)

#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "qmha_core.h"

namespace {

struct Case {
  const char* name;
  int64_t n;
  int32_t d_model;
  int32_t h;
  bool causal;
  bool quant;  // additionally emit INT8 Q/K/V + scales
  int32_t window = 0;  // causal sliding window (0 = off)
  int32_t sinks = 0;   // StreamingLLM attention sinks
};

// Size ladder mirroring generate_golden.cpp:105-114 (small → unaligned →
// medium → large → huge) with h > 1 so head slicing is exercised.
const Case kCases[] = {
    {"small", 8, 8, 1, false, false},
    {"unaligned", 24, 12, 3, false, false},
    {"medium", 128, 64, 2, false, false},
    {"large", 512, 128, 4, false, false},
    {"causal_medium", 128, 64, 2, true, false},
    {"windowed_medium", 256, 64, 2, true, false, 64, 8},
    {"huge_1024", 1024, 256, 4, false, false},
    {"huge_2048", 2048, 512, 8, false, false},
    {"quant_small", 64, 32, 2, false, true},
};

// Keep S/P on disk only when the [h, n, n] tensors stay modest.
constexpr int64_t kMaxSPBytes = 64ll << 20;

void write_bin(const std::string& path, const void* data, size_t bytes) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  std::fwrite(data, 1, bytes, f);
  std::fclose(f);
}

std::string tensor_meta(const char* name, const char* file,
                        std::initializer_list<int64_t> shape,
                        const char* dtype) {
  std::string s = "    \"";
  s += name;
  s += "\": {\"file\": \"";
  s += file;
  s += "\", \"shape\": [";
  bool first = true;
  for (int64_t d : shape) {
    if (!first) s += ", ";
    first = false;
    s += std::to_string(d);
  }
  s += "], \"dtype\": \"";
  s += dtype;
  s += "\"}";
  return s;
}

void generate(const Case& c, const std::string& out_root) {
  std::string dir = out_root + "/" + c.name;
  std::string mk = "mkdir -p " + dir;
  if (std::system(mk.c_str()) != 0) std::exit(1);

  int64_t n = c.n;
  int32_t dm = c.d_model, h = c.h, d = dm / h;
  int64_t elems = n * dm;

  // normal(0, 0.5) inputs, fixed seed per case name — the reference used
  // normal(0, 0.5) too (generate_golden.cpp:121-129).
  std::mt19937 rng(static_cast<uint32_t>(std::hash<std::string>{}(c.name)));
  std::normal_distribution<float> dist(0.0f, 0.5f);
  std::vector<float> q(elems), k(elems), v(elems), o(elems);
  for (auto* vec : {&q, &k, &v})
    for (auto& x : *vec) x = dist(rng);

  // O via the multithreaded golden (RoPE on, like verify.cu:56-69).
  if (qmha_cpu_mha(q.data(), k.data(), v.data(), o.data(), n, dm, h,
                   /*use_rope=*/1, 10000.0f, c.causal ? 1 : 0, c.window,
                   c.sinks, -1.0f, 0)) {
    std::fprintf(stderr, "%s: cpu_mha failed\n", c.name);
    std::exit(1);
  }

  // Per-head S/P when small enough: recompute per head on RoPE'd slices.
  bool keep_sp = static_cast<int64_t>(h) * n * n * 4 <= kMaxSPBytes;
  std::vector<float> s_all, p_all;
  if (keep_sp) {
    s_all.resize(static_cast<size_t>(h) * n * n);
    p_all.resize(static_cast<size_t>(h) * n * n);
    std::vector<float> qh(n * d), kh(n * d), vh(n * d), oh(n * d);
    for (int32_t hh = 0; hh < h; ++hh) {
      for (int64_t i = 0; i < n; ++i) {
        std::memcpy(&qh[i * d], &q[i * dm + hh * d], d * sizeof(float));
        std::memcpy(&kh[i * d], &k[i * dm + hh * d], d * sizeof(float));
        std::memcpy(&vh[i * d], &v[i * dm + hh * d], d * sizeof(float));
      }
      qmha_rope(qh.data(), n, d, 10000.0f);
      qmha_rope(kh.data(), n, d, 10000.0f);
      qmha_cpu_mha_head(qh.data(), kh.data(), vh.data(), oh.data(),
                        &s_all[static_cast<size_t>(hh) * n * n],
                        &p_all[static_cast<size_t>(hh) * n * n], n, d,
                        c.causal ? 1 : 0, c.window, c.sinks, -1.0f);
    }
  }

  write_bin(dir + "/Q.f32.bin", q.data(), elems * 4);
  write_bin(dir + "/K.f32.bin", k.data(), elems * 4);
  write_bin(dir + "/V.f32.bin", v.data(), elems * 4);
  write_bin(dir + "/O.f32.bin", o.data(), elems * 4);
  if (keep_sp) {
    write_bin(dir + "/S.f32.bin", s_all.data(), s_all.size() * 4);
    write_bin(dir + "/P.f32.bin", p_all.data(), p_all.size() * 4);
  }

  std::vector<std::string> tensors = {
      tensor_meta("Q", "Q.f32.bin", {n, dm}, "f32"),
      tensor_meta("K", "K.f32.bin", {n, dm}, "f32"),
      tensor_meta("V", "V.f32.bin", {n, dm}, "f32"),
      tensor_meta("O", "O.f32.bin", {n, dm}, "f32"),
  };
  if (keep_sp) {
    tensors.push_back(tensor_meta("S", "S.f32.bin", {h, n, n}, "f32"));
    tensors.push_back(tensor_meta("P", "P.f32.bin", {h, n, n}, "f32"));
  }

  std::string quant_extra;
  if (c.quant) {
    // Reference-style fixed scale 0.05 (generate_golden.cpp:163-187) AND
    // per-row-tile max-abs scales (tile_rows = 32, the kernels' granularity).
    const float fixed_scale = 0.05f;
    const int64_t tile_rows = 32;
    int64_t n_tiles = (n + tile_rows - 1) / tile_rows;
    std::vector<int8_t> qi(elems), ki(elems), vi(elems);
    std::vector<float> qsc(n_tiles), ksc(n_tiles), vsc(n_tiles);
    const char* names[3] = {"Q", "K", "V"};
    const std::vector<float>* srcs[3] = {&q, &k, &v};
    std::vector<int8_t>* dsts[3] = {&qi, &ki, &vi};
    std::vector<float>* scs[3] = {&qsc, &ksc, &vsc};
    for (int t = 0; t < 3; ++t) {
      qmha_quantize_int8(srcs[t]->data(), n, dm, tile_rows, 1e-8f,
                         dsts[t]->data(), scs[t]->data());
      std::string base = std::string(names[t]) + "_int8";
      write_bin(dir + "/" + base + ".i8.bin", dsts[t]->data(), elems);
      write_bin(dir + "/" + base + "_scales.f32.bin", scs[t]->data(),
                n_tiles * 4);
      tensors.push_back(tensor_meta((base).c_str(), (base + ".i8.bin").c_str(),
                                    {n, dm}, "i8"));
      tensors.push_back(tensor_meta((base + "_scales").c_str(),
                                    (base + "_scales.f32.bin").c_str(),
                                    {n_tiles}, "f32"));
    }
    // Fixed-scale variants for exact reference parity.
    std::vector<int8_t> qf(elems);
    for (int64_t i = 0; i < elems; ++i) {
      float x = std::nearbyint(q[i] / fixed_scale);
      qf[i] = static_cast<int8_t>(std::max(-127.f, std::min(127.f, x)));
    }
    write_bin(dir + "/Q_int8_fixed.i8.bin", qf.data(), elems);
    tensors.push_back(
        tensor_meta("Q_int8_fixed", "Q_int8_fixed.i8.bin", {n, dm}, "i8"));
    quant_extra = ",\n  \"quant\": {\"fixed_scale\": 0.05, \"tile_rows\": 32, "
                  "\"scale_clamp\": 1e-08}";
  }

  std::string meta = "{\n  \"format_version\": 1,\n  \"case\": \"";
  meta += c.name;
  meta += "\",\n  \"n\": " + std::to_string(n);
  meta += ",\n  \"d_model\": " + std::to_string(dm);
  meta += ",\n  \"h\": " + std::to_string(h);
  meta += ",\n  \"rope\": true,\n  \"causal\": ";
  meta += c.causal ? "true" : "false";
  meta += ",\n  \"window\": " + std::to_string(c.window);
  meta += ",\n  \"sinks\": " + std::to_string(c.sinks);
  meta += ",\n  \"sp_saved\": ";
  meta += keep_sp ? "true" : "false";
  meta += quant_extra;
  meta += ",\n  \"tensors\": {\n";
  for (size_t i = 0; i < tensors.size(); ++i) {
    meta += tensors[i];
    meta += (i + 1 < tensors.size()) ? ",\n" : "\n";
  }
  meta += "  }\n}\n";
  write_bin(dir + "/meta.json", meta.data(), meta.size());
  std::printf("wrote %s (N=%" PRId64 " d_model=%d h=%d%s%s)\n", dir.c_str(),
              n, dm, h, c.causal ? " causal" : "", c.quant ? " +int8" : "");
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <out_dir> [case ...]\n", argv[0]);
    return 2;
  }
  std::string out_root = argv[1];
  std::string mk = "mkdir -p " + out_root;
  if (std::system(mk.c_str()) != 0) return 1;
  for (const Case& c : kCases) {
    if (argc > 2) {
      bool wanted = false;
      for (int i = 2; i < argc; ++i)
        if (c.name == std::string(argv[i])) wanted = true;
      if (!wanted) continue;
    }
    generate(c, out_root);
  }
  return 0;
}
