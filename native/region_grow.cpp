// CPU seeded-region-growing engine (BFS flood fill, exact DSRG semantics).
//
// Host-side counterpart of dsrg_tpu.ops.grow: replaces the reference's
// pure-Python two-pass union-find (pylayers/CC_labeling_8.py) +
// per-class component expansion (pylayers.py:237-275) with a BFS from seed
// pixels through the candidate mask — the same fixed point, O(H*W) per
// class.  Semantics reproduced exactly: highest-cue-class label map with
// threshold overwrites, ascending sequential class processing mutating the
// seed tensor, and barrier pixels (exclusively seeded by another class) that
// conduct connectivity but are never converted.

#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// labels: (M,) multi-hot; cues: (M, H, W) {0,1} seeds (modified in place is
// avoided: out receives the grown seeds); probs: (M, H, W) refined marginals.
void dsrg_region_grow(const float* labels, const float* cues,
                      const float* probs, int m, int h, int w, float th1,
                      float th2, float* out) {
  const int n = h * w;
  std::memcpy(out, cues, sizeof(float) * (size_t)m * n);

  // label_map: cue classes (highest class wins), then threshold overwrites
  std::vector<int> label_map(n, 0);
  for (int c = 0; c < m; ++c)
    for (int i = 0; i < n; ++i)
      if (cues[(size_t)c * n + i] > 0.5f) label_map[i] = c + 1;

  for (int i = 0; i < n; ++i) {
    int best = -1;
    float best_p = -1.f;
    for (int c = 0; c < m; ++c) {
      if (labels[c] != 1.f) continue;
      const float p = probs[(size_t)c * n + i];
      if (p > best_p) {  // strict >: first max in ascending order wins
        best_p = p;
        best = c;
      }
    }
    if (best < 0) continue;
    if (best_p > th2) {
      if (best != 0)
        label_map[i] = best + 1;
      else if (best_p > th1)
        label_map[i] = 1;
    }
  }

  std::vector<unsigned char> mask(n), visited(n);
  std::vector<int> queue(n);
  for (int c = 0; c < m; ++c) {
    if (labels[c] != 1.f) continue;
    const size_t off = (size_t)c * n;
    int qn = 0;
    for (int i = 0; i < n; ++i) {
      mask[i] = label_map[i] == c + 1;
      visited[i] = 0;
      if (mask[i] && out[off + i] == 1.f) {
        visited[i] = 1;
        queue[qn++] = i;
      }
    }
    // BFS through the mask (barriers conduct; they are filtered at write)
    for (int head = 0; head < qn; ++head) {
      const int i = queue[head];
      const int y = i / w, x = i % w;
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          if (!dy && !dx) continue;
          const int ny = y + dy, nx = x + dx;
          if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
          const int j = ny * w + nx;
          if (mask[j] && !visited[j]) {
            visited[j] = 1;
            queue[qn++] = j;
          }
        }
    }
    for (int i = 0; i < n; ++i) {
      if (!visited[i] || out[off + i] == 1.f) continue;
      // barrier: candidate seeded by exactly one *other* class
      float total = 0.f;
      for (int c2 = 0; c2 < m; ++c2) total += out[(size_t)c2 * n + i];
      if (total == 1.f) continue;
      out[off + i] = 1.f;
    }
  }
}
}
