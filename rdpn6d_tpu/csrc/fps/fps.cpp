// Farthest point sampling — native host kernel.
//
// TPU-native rebuild of the capability provided by the reference's
// core/csrc/fps extension (farthest_point_sampling.cpp:76-204), written
// fresh: flat arrays instead of Vec3 vectors, a deterministic seeded
// variant instead of srand(time(0)), and an -O3/-ffast-math friendly
// inner loop. Used by the offline FPS-keypoint tools for large meshes;
// the on-device path uses the JAX implementation in ops/fps.py.
//
// Build: make -C rdpn6d_tpu/csrc/fps   (produces libfps.so)

#include <cfloat>
#include <cstdint>
#include <vector>

namespace {

inline float sq_dist(const float* a, const float* b) {
  const float dx = a[0] - b[0];
  const float dy = a[1] - b[1];
  const float dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

// One FPS round-trip: relax min_dist against point `cur`, then return the
// index with the largest min-distance.
inline int relax_and_argmax(const float* pts, int pn, int cur,
                            std::vector<float>& min_dist) {
  const float* p = pts + 3 * cur;
  int best = 0;
  float best_d = -FLT_MAX;
  for (int i = 0; i < pn; ++i) {
    const float d = sq_dist(pts + 3 * i, p);
    if (d < min_dist[i]) min_dist[i] = d;
    if (min_dist[i] > best_d) {
      best_d = min_dist[i];
      best = i;
    }
  }
  return best;
}

void run_fps(const float* pts, int* idxs, int pn, int sn, int first,
             std::vector<float>& min_dist) {
  if (pn <= 0 || sn <= 0) return;
  int cur = first;
  const int n_unique = sn < pn ? sn : pn;
  for (int s = 0; s < n_unique; ++s) {
    idxs[s] = cur;
    min_dist[cur] = -FLT_MAX;  // never reselect
    cur = relax_and_argmax(pts, pn, cur, min_dist);
  }
  // degenerate request (more samples than points): cycle the picks
  // instead of silently emitting index 0
  for (int s = n_unique; s < sn; ++s) idxs[s] = idxs[s % n_unique];
}

}  // namespace

extern "C" {

// Deterministic variant: seed the running distance from the bbox center so
// the first sample is the vertex farthest from the center.
void farthest_point_sampling_init_center(const float* pts, int* idxs, int pn,
                                         int sn) {
  float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int i = 0; i < pn; ++i) {
    for (int c = 0; c < 3; ++c) {
      const float v = pts[3 * i + c];
      if (v < lo[c]) lo[c] = v;
      if (v > hi[c]) hi[c] = v;
    }
  }
  const float center[3] = {(lo[0] + hi[0]) * 0.5f, (lo[1] + hi[1]) * 0.5f,
                           (lo[2] + hi[2]) * 0.5f};
  std::vector<float> min_dist(pn);
  int first = 0;
  float best = -FLT_MAX;
  for (int i = 0; i < pn; ++i) {
    min_dist[i] = sq_dist(pts + 3 * i, center);
    if (min_dist[i] > best) {
      best = min_dist[i];
      first = i;
    }
  }
  run_fps(pts, idxs, pn, sn, first, min_dist);
}

// Reproducible replacement for the reference's srand(time(0)) variant.
void farthest_point_sampling_seeded(const float* pts, int* idxs, int pn,
                                    int sn, int seed) {
  if (pn <= 0) return;  // modulo-by-zero below is UB
  // splitmix64 step for a well-mixed start index
  uint64_t z = static_cast<uint64_t>(seed) + 0x9e3779b97f4a7c15ull;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  z ^= z >> 31;
  const int first = static_cast<int>(z % static_cast<uint64_t>(pn));
  std::vector<float> min_dist(pn, FLT_MAX);
  run_fps(pts, idxs, pn, sn, first, min_dist);
}

}  // extern "C"
