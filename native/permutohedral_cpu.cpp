// Permutohedral-lattice Gaussian filter + dense-CRF mean field (CPU).
//
// Own implementation of the published algorithm (Adams, Baek, Davis,
// "Fast High-Dimensional Filtering Using the Permutohedral Lattice",
// Eurographics 2010): embed features on the hyperplane sum=0, splat each
// point onto the d+1 vertices of its enclosing simplex with barycentric
// weights, blur along each of the d+1 lattice directions with a [1/2,1,1/2]
// kernel, slice back.  O(N*(d+1)) per filter pass — the same cost class as
// the reference's host engine (CRF/src/permutohedral.cpp), which this file
// exists to stand in for as bench.py's HONEST reference baseline (the round-1
// baseline used an O(N^2) proxy; see VERDICT.md).  Written from the paper's
// algorithm, not translated from the reference source.
//
// The mean-field driver mirrors krahenbuhl2013's CRF() parameterization:
// bilateral (x/sa, y/sa, r/cf, g/cf, b/cf) with Potts 10 + spatial
// (x/sg, y/sg) with Potts 3, symmetric normalization, softmax updates.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Open-addressing hash map from short int16 keys (d entries) to dense slot
// ids.  Capacity fixed at construction (max possible vertices = N*(d+1)),
// power-of-two sized for mask probing.
class KeyTable {
 public:
  KeyTable(int key_dim, size_t max_entries) : kd_(key_dim) {
    size_t want = max_entries * 2;
    cap_ = 1;
    while (cap_ < want) cap_ <<= 1;
    slot_of_.assign(cap_, -1);
    keys_.reserve(max_entries * kd_);
  }

  int size() const { return (int)(keys_.size() / kd_); }
  const int16_t* key(int slot) const { return keys_.data() + (size_t)slot * kd_; }

  // Find the slot for `k`, inserting it if absent.
  int lookup_insert(const int16_t* k) {
    size_t h = hash(k) & (cap_ - 1);
    for (;;) {
      int s = slot_of_[h];
      if (s < 0) {
        int ns = size();
        keys_.insert(keys_.end(), k, k + kd_);
        slot_of_[h] = ns;
        return ns;
      }
      if (!std::memcmp(key(s), k, kd_ * sizeof(int16_t))) return s;
      h = (h + 1) & (cap_ - 1);
    }
  }

  // Find only (-1 if absent).
  int find(const int16_t* k) const {
    size_t h = hash(k) & (cap_ - 1);
    for (;;) {
      int s = slot_of_[h];
      if (s < 0) return -1;
      if (!std::memcmp(key(s), k, kd_ * sizeof(int16_t))) return s;
      h = (h + 1) & (cap_ - 1);
    }
  }

 private:
  size_t hash(const int16_t* k) const {
    uint64_t h = 1469598103934665603ull;  // FNV-1a over the key bytes
    for (int i = 0; i < kd_; ++i) {
      h ^= (uint16_t)k[i];
      h *= 1099511628211ull;
    }
    return (size_t)h;
  }

  int kd_;
  size_t cap_;
  std::vector<int> slot_of_;
  std::vector<int16_t> keys_;
};

// Sparse permutohedral lattice over N points with d-dim features.
class Lattice {
 public:
  Lattice(const float* feats, int n, int d) : n_(n), d_(d), table_(d, (size_t)n * (d + 1)) {
    offsets_.resize((size_t)n * (d + 1));
    weights_.resize((size_t)n * (d + 1));

    const int dp1 = d + 1;
    // Per-axis embedding scales: compensate the variance of the [1/2,1,1/2]
    // blur so the composite filter is a unit Gaussian (paper, section 4.1).
    std::vector<float> scale(d);
    const float inv_std = (float)(dp1 * std::sqrt(2.0 / 3.0));
    for (int i = 0; i < d; ++i)
      scale[i] = inv_std / std::sqrt((float)(i + 1) * (i + 2));

    std::vector<float> elevated(dp1), rem0(dp1), bary(d + 2);
    std::vector<int> rank(dp1);
    std::vector<int16_t> key(d);

    // canonical simplex: vertex r has coordinates r on the first d+1-r axes
    // (by rank order) and r-(d+1) on the rest.
    std::vector<int16_t> canonical((size_t)dp1 * dp1);
    for (int r = 0; r < dp1; ++r)
      for (int i = 0; i < dp1; ++i)
        canonical[(size_t)r * dp1 + i] = (int16_t)(i < dp1 - r ? r : r - dp1);

    for (int p = 0; p < n; ++p) {
      const float* f = feats + (size_t)p * d;
      // Elevate onto the hyperplane sum=0 (E * f via the recurrence).
      float sm = 0.f;
      for (int i = d; i > 0; --i) {
        float cf = f[i - 1] * scale[i - 1];
        elevated[i] = sm - (float)i * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // Nearest remainder-0 lattice point.
      int sum = 0;
      for (int i = 0; i <= d; ++i) {
        float v = elevated[i] / dp1;
        float up = std::ceil(v) * dp1, dn = std::floor(v) * dp1;
        rem0[i] = (up - elevated[i] < elevated[i] - dn) ? up : dn;
        sum += (int)std::lround(rem0[i] / dp1);
      }

      // Rank coordinates by their differential to rem0.
      std::fill(rank.begin(), rank.end(), 0);
      for (int i = 0; i < d; ++i) {
        float di = elevated[i] - rem0[i];
        for (int j = i + 1; j <= d; ++j) {
          if (di < elevated[j] - rem0[j])
            ++rank[i];
          else
            ++rank[j];
        }
      }

      // Fix rounding so the point sums to zero.
      for (int i = 0; i <= d; ++i) {
        rank[i] += sum;
        if (rank[i] < 0) {
          rank[i] += dp1;
          rem0[i] += dp1;
        } else if (rank[i] > d) {
          rank[i] -= dp1;
          rem0[i] -= dp1;
        }
      }

      // Barycentric coordinates of the enclosing simplex.
      std::fill(bary.begin(), bary.end(), 0.f);
      for (int i = 0; i <= d; ++i) {
        float delta = (elevated[i] - rem0[i]) / dp1;
        bary[d - rank[i]] += delta;
        bary[dp1 - rank[i]] -= delta;
      }
      bary[0] += 1.f + bary[dp1];

      // Register the d+1 simplex vertices (store first d coords; the last is
      // implied by the zero-sum constraint).
      for (int r = 0; r <= d; ++r) {
        for (int i = 0; i < d; ++i)
          key[i] = (int16_t)((int)rem0[i] + canonical[(size_t)r * dp1 + rank[i]]);
        offsets_[(size_t)p * dp1 + r] = table_.lookup_insert(key.data());
        weights_[(size_t)p * dp1 + r] = bary[r];
      }
    }

    // Precompute blur neighbors: along axis a, n+ = key+1 except key[a]-d,
    // n- = key-1 except key[a]+d.
    nv_ = table_.size();
    blur_n1_.resize((size_t)dp1 * nv_);
    blur_n2_.resize((size_t)dp1 * nv_);
    std::vector<int16_t> nk(d);
    for (int a = 0; a <= d; ++a) {
      for (int s = 0; s < nv_; ++s) {
        const int16_t* k = table_.key(s);
        for (int i = 0; i < d; ++i) nk[i] = (int16_t)(k[i] + 1);
        if (a < d) nk[a] = (int16_t)(k[a] - d);
        blur_n1_[(size_t)a * nv_ + s] = table_.find(nk.data());
        for (int i = 0; i < d; ++i) nk[i] = (int16_t)(k[i] - 1);
        if (a < d) nk[a] = (int16_t)(k[a] + d);
        blur_n2_[(size_t)a * nv_ + s] = table_.find(nk.data());
      }
    }
  }

  int n_vertices() const { return nv_; }

  // out = K @ values for (N, c) row-major values (splat/blur/slice).
  void filter(const float* values, int c, float* out) const {
    const int dp1 = d_ + 1;
    std::vector<float> tbl((size_t)nv_ * c, 0.f);
    // splat
    for (int p = 0; p < n_; ++p) {
      const float* v = values + (size_t)p * c;
      for (int r = 0; r < dp1; ++r) {
        float wgt = weights_[(size_t)p * dp1 + r];
        float* t = tbl.data() + (size_t)offsets_[(size_t)p * dp1 + r] * c;
        for (int k = 0; k < c; ++k) t[k] += wgt * v[k];
      }
    }
    // blur: one pass per lattice direction, kernel (0.5, 1, 0.5)
    std::vector<float> nxt((size_t)nv_ * c);
    for (int a = 0; a <= d_; ++a) {
      const int* n1 = blur_n1_.data() + (size_t)a * nv_;
      const int* n2 = blur_n2_.data() + (size_t)a * nv_;
      for (int s = 0; s < nv_; ++s) {
        const float* self = tbl.data() + (size_t)s * c;
        const float* l = n1[s] >= 0 ? tbl.data() + (size_t)n1[s] * c : nullptr;
        const float* r = n2[s] >= 0 ? tbl.data() + (size_t)n2[s] * c : nullptr;
        float* o = nxt.data() + (size_t)s * c;
        for (int k = 0; k < c; ++k)
          o[k] = self[k] + 0.5f * ((l ? l[k] : 0.f) + (r ? r[k] : 0.f));
      }
      tbl.swap(nxt);
    }
    // slice (alpha corrects the blur's mass gain: 1 / (1 + 2^-d))
    const float alpha = 1.f / (1.f + std::pow(2.f, -(float)d_));
    for (int p = 0; p < n_; ++p) {
      float* o = out + (size_t)p * c;
      for (int k = 0; k < c; ++k) o[k] = 0.f;
      for (int r = 0; r < dp1; ++r) {
        float wgt = weights_[(size_t)p * dp1 + r] * alpha;
        const float* t = tbl.data() + (size_t)offsets_[(size_t)p * dp1 + r] * c;
        for (int k = 0; k < c; ++k) o[k] += wgt * t[k];
      }
    }
  }

 private:
  int n_, d_, nv_ = 0;
  KeyTable table_;
  std::vector<int> offsets_;
  std::vector<float> weights_;
  std::vector<int> blur_n1_, blur_n2_;
};

void softmax_rows_p(float* x, int n, int m) {
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

// w * norm .* filter(norm .* q) accumulated into out.
void filtered_message(const Lattice& lat, const std::vector<float>& norm,
                      const float* q, float w, int n, int m, float* out) {
  std::vector<float> nq((size_t)n * m), fq((size_t)n * m);
  for (int i = 0; i < n; ++i)
    for (int c = 0; c < m; ++c) nq[(size_t)i * m + c] = norm[i] * q[(size_t)i * m + c];
  lat.filter(nq.data(), m, fq.data());
  for (int i = 0; i < n; ++i) {
    const float wn = w * norm[i];
    for (int c = 0; c < m; ++c) out[(size_t)i * m + c] += wn * fq[(size_t)i * m + c];
  }
}

std::vector<float> symmetric_norm(const Lattice& lat, int n) {
  std::vector<float> ones(n, 1.f), f(n);
  lat.filter(ones.data(), 1, f.data());
  std::vector<float> norm(n);
  for (int i = 0; i < n; ++i) norm[i] = 1.f / std::sqrt(std::max(f[i], 0.f) + 1e-20f);
  return norm;
}

}  // namespace

extern "C" {

// Raw lattice filter for unit tests: feats (N, d), values (N, c) -> out (N, c).
void dsrg_permutohedral_filter(const float* feats, const float* values, int n,
                               int d, int c, float* out) {
  Lattice lat(feats, n, d);
  lat.filter(values, c, out);
}

// Dense-CRF mean field with the reference CRF() parameterization, running on
// the permutohedral lattice — the faithful reference-host-cost baseline.
// image: (H*W*3) in [0, 255]; unary: (H*W*M) scores; out: (H*W*M) marginals.
void dsrg_crf_permutohedral(const float* image, const float* unary, int h,
                            int w, int m, int iters, float scale_factor,
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
        fb[(size_t)i * 5 + 2 + c] = std::round(image[(size_t)i * 3 + c]) / color_factor;
      fs[(size_t)i * 2 + 0] = x / sg;
      fs[(size_t)i * 2 + 1] = y / sg;
    }

  Lattice lat_b(fb.data(), n, 5), lat_s(fs.data(), n, 2);
  std::vector<float> nb = symmetric_norm(lat_b, n), ns = symmetric_norm(lat_s, n);

  std::vector<float> q((size_t)n * m), tmp((size_t)n * m);
  std::memcpy(q.data(), unary, sizeof(float) * (size_t)n * m);
  softmax_rows_p(q.data(), n, m);
  for (int it = 0; it < iters; ++it) {
    std::memcpy(tmp.data(), unary, sizeof(float) * (size_t)n * m);
    filtered_message(lat_b, nb, q.data(), 10.f, n, m, tmp.data());
    filtered_message(lat_s, ns, q.data(), 3.f, n, m, tmp.data());
    softmax_rows_p(tmp.data(), n, m);
    q.swap(tmp);
  }
  std::memcpy(out, q.data(), sizeof(float) * (size_t)n * m);
}
}
