// CPU dense-CRF mean-field engine (exact dense kernels, OpenMP).
//
// Host-side counterpart of dsrg_tpu.ops.crf.exact: identical math
// (symmetric-normalized Gaussian kernels, Potts compatibilities, the
// reference CRF() parameterization), written from the mean-field equations
// rather than ported from the reference's permutohedral lattice.  Serves as
// the CPU inference/validation path of the framework — the role the vendored
// krahenbuhl2013 C++ engine plays in the reference (CRF/src/densecrf.cpp).
//
// Build: see native/Makefile (cc -O3 -fopenmp -shared).

#include <cmath>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// K[i,j] = exp(-0.5 * ||f_i - f_j||^2), including the diagonal.
void build_kernel(const float* feats, int n, int d, std::vector<float>& k) {
  k.resize((size_t)n * n);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const float* fi = feats + (size_t)i * d;
    float* row = k.data() + (size_t)i * n;
    for (int j = 0; j < n; ++j) {
      const float* fj = feats + (size_t)j * d;
      float acc = 0.f;
      for (int t = 0; t < d; ++t) {
        float diff = fi[t] - fj[t];
        acc += diff * diff;
      }
      row[j] = std::exp(-0.5f * acc);
    }
  }
}

// norm = 1/sqrt(K @ 1 + 1e-20)  (NORMALIZE_SYMMETRIC)
void sym_norm(const std::vector<float>& k, int n, std::vector<float>& norm) {
  norm.resize(n);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    double s = 0.0;
    const float* row = k.data() + (size_t)i * n;
    for (int j = 0; j < n; ++j) s += row[j];
    norm[i] = 1.0f / std::sqrt((float)s + 1e-20f);
  }
}

// out += w * norm .* (K @ (norm .* q));  q, out are (N, M) row-major.
void filter_acc(const std::vector<float>& k, const std::vector<float>& norm,
                const float* q, float w, int n, int m, float* out) {
  std::vector<float> nq((size_t)n * m);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i)
    for (int c = 0; c < m; ++c) nq[(size_t)i * m + c] = norm[i] * q[(size_t)i * m + c];

#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const float* row = k.data() + (size_t)i * n;
    float* oi = out + (size_t)i * m;
    std::vector<double> acc(m, 0.0);
    for (int j = 0; j < n; ++j) {
      const float kij = row[j];
      if (kij < 1e-12f) continue;
      const float* qj = nq.data() + (size_t)j * m;
      for (int c = 0; c < m; ++c) acc[c] += (double)kij * qj[c];
    }
    const float wn = w * norm[i];
    for (int c = 0; c < m; ++c) oi[c] += wn * (float)acc[c];
  }
}

void softmax_rows(float* x, int n, int m) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    float* xi = x + (size_t)i * m;
    float mx = xi[0];
    for (int c = 1; c < m; ++c) mx = std::max(mx, xi[c]);
    double s = 0.0;
    for (int c = 0; c < m; ++c) {
      xi[c] = std::exp(xi[c] - mx);
      s += xi[c];
    }
    for (int c = 0; c < m; ++c) xi[c] = (float)(xi[c] / s);
  }
}

}  // namespace

extern "C" {

// unary: (N, M) scores (negated costs); feats_b: (N, 5); feats_s: (N, 2);
// out: (N, M) marginals.  Weights per the reference CRF(): wb=10, ws=3.
void dsrg_crf_mean_field(const float* unary, const float* feats_b,
                         const float* feats_s, float wb, float ws, int n,
                         int m, int iters, float* out) {
  std::vector<float> kb, ks, nb, ns;
  build_kernel(feats_b, n, 5, kb);
  build_kernel(feats_s, n, 2, ks);
  sym_norm(kb, n, nb);
  sym_norm(ks, n, ns);

  std::vector<float> q((size_t)n * m);
  std::memcpy(q.data(), unary, sizeof(float) * (size_t)n * m);
  softmax_rows(q.data(), n, m);

  std::vector<float> tmp((size_t)n * m);
  for (int it = 0; it < iters; ++it) {
    std::memcpy(tmp.data(), unary, sizeof(float) * (size_t)n * m);
    filter_acc(kb, nb, q.data(), wb, n, m, tmp.data());
    filter_acc(ks, ns, q.data(), ws, n, m, tmp.data());
    softmax_rows(tmp.data(), n, m);
    q.swap(tmp);
  }
  std::memcpy(out, q.data(), sizeof(float) * (size_t)n * m);
}

// Convenience wrapper with the reference CRF() parameterization:
// image (H*W*3 in [0,255], row-major HWC), unary (H*W*M scores).
void dsrg_crf_reference(const float* image, const float* unary, int h, int w,
                        int m, int iters, float scale_factor,
                        float color_factor, float* out) {
  const int n = h * w;
  std::vector<float> fb((size_t)n * 5), fs((size_t)n * 2);
  const float sa = 80.f / scale_factor;
  const float sg = 3.f / scale_factor;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      fb[(size_t)i * 5 + 0] = x / sa;
      fb[(size_t)i * 5 + 1] = y / sa;
      for (int c = 0; c < 3; ++c)
        fb[(size_t)i * 5 + 2 + c] =
            std::round(image[(size_t)i * 3 + c]) / color_factor;
      fs[(size_t)i * 2 + 0] = x / sg;
      fs[(size_t)i * 2 + 1] = y / sg;
    }
  dsrg_crf_mean_field(unary, fb.data(), fs.data(), 10.f, 3.f, n, m, iters, out);
}
}
