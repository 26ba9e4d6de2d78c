// Concave hull (k-nearest-neighbours, Moreira & Santos 2007) — native C++
// replacement for the cubao `concave_hull` pybind11 package the reference
// depends on (call site: gflow/utils/concave_hull.py:3,82; used to turn the
// moving-point uv cloud into a segmentation polygon each frame).
//
// Exposed via a plain C ABI for ctypes:
//   int concave_hull(const float* pts, int n, int k0,
//                    int* out_idx, int max_out)
// returns the number of hull vertices written to out_idx (indices into pts),
// ordered along the boundary, or -1 on failure (caller falls back to convex
// hull).
//
// Build: g++ -O3 -shared -fPIC -o libgflow_native.so concave_hull.cpp

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct P {
  float x, y;
};

inline float sqdist(const P& a, const P& b) {
  float dx = a.x - b.x, dy = a.y - b.y;
  return dx * dx + dy * dy;
}

// > 0 if c is to the left of a->b
inline float cross(const P& a, const P& b, const P& c) {
  return (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x);
}

bool segments_intersect(const P& p1, const P& p2, const P& p3, const P& p4) {
  auto d1 = cross(p3, p4, p1);
  auto d2 = cross(p3, p4, p2);
  auto d3 = cross(p1, p2, p3);
  auto d4 = cross(p1, p2, p4);
  if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)))
    return true;
  return false;
}

bool point_in_polygon(const P& pt, const std::vector<int>& hull,
                      const std::vector<P>& pts) {
  bool inside = false;
  size_t n = hull.size();
  for (size_t i = 0, j = n - 1; i < n; j = i++) {
    const P& a = pts[hull[i]];
    const P& b = pts[hull[j]];
    if (((a.y > pt.y) != (b.y > pt.y)) &&
        (pt.x < (b.x - a.x) * (pt.y - a.y) / (b.y - a.y) + a.x))
      inside = !inside;
  }
  return inside;
}

int concave_hull_impl(const std::vector<P>& pts, int k,
                      std::vector<int>& hull) {
  const int n = static_cast<int>(pts.size());
  if (n < 3) return -1;
  k = std::max(3, std::min(k, n - 1));

  // start at the lowest point (min y, then min x)
  int first = 0;
  for (int i = 1; i < n; ++i)
    if (pts[i].y < pts[first].y ||
        (pts[i].y == pts[first].y && pts[i].x < pts[first].x))
      first = i;

  hull.clear();
  hull.push_back(first);
  std::vector<char> used(n, 0);
  used[first] = 1;

  int current = first;
  float prev_angle = 0.0f;  // previous edge direction
  int steps = 0;

  std::vector<std::pair<float, int>> knn;
  knn.reserve(n);

  while (steps < 4 * n) {
    ++steps;
    // allow closing the loop after a few steps
    if (steps > 3) used[first] = 0;

    // gather k nearest unused neighbours
    knn.clear();
    for (int i = 0; i < n; ++i)
      if (!used[i] && i != current)
        knn.emplace_back(sqdist(pts[current], pts[i]), i);
    if (knn.empty()) return -1;
    int kk = std::min<int>(k, static_cast<int>(knn.size()));
    std::partial_sort(knn.begin(), knn.begin() + kk, knn.end());

    // sort candidates by largest right-hand turn from the previous direction
    std::vector<std::pair<float, int>> cands;
    cands.reserve(kk);
    for (int j = 0; j < kk; ++j) {
      int i = knn[j].second;
      float ang = std::atan2(pts[i].y - pts[current].y,
                             pts[i].x - pts[current].x);
      float turn = prev_angle - ang;
      while (turn < 0) turn += 2.0f * static_cast<float>(M_PI);
      while (turn >= 2.0f * static_cast<float>(M_PI))
        turn -= 2.0f * static_cast<float>(M_PI);
      cands.emplace_back(turn, i);
    }
    std::sort(cands.rbegin(), cands.rend());

    int chosen = -1;
    for (auto& c : cands) {
      int i = c.second;
      // reject edges intersecting the existing boundary
      bool ok = true;
      const P& a = pts[current];
      const P& b = pts[i];
      for (size_t e = 0; e + 1 < hull.size(); ++e) {
        // skip the edge adjacent to `current`
        if (hull[e + 1] == current || hull[e] == current) continue;
        if (segments_intersect(a, b, pts[hull[e]], pts[hull[e + 1]])) {
          ok = false;
          break;
        }
      }
      if (ok) {
        chosen = i;
        break;
      }
    }
    if (chosen < 0) return -1;  // caller retries with larger k

    if (chosen == first) {
      // closed — verify all points inside
      for (int i = 0; i < n; ++i)
        if (!used[i] && i != first && !point_in_polygon(pts[i], hull, pts))
          return -2;  // not all contained: retry with larger k
      return static_cast<int>(hull.size());
    }

    hull.push_back(chosen);
    used[chosen] = 1;
    prev_angle = std::atan2(pts[current].y - pts[chosen].y,
                            pts[current].x - pts[chosen].x);
    current = chosen;
  }
  return -1;
}

}  // namespace

extern "C" {

int concave_hull(const float* pts_xy, int n, int k0, int* out_idx,
                 int max_out) {
  std::vector<P> pts(n);
  for (int i = 0; i < n; ++i) pts[i] = {pts_xy[2 * i], pts_xy[2 * i + 1]};
  std::vector<int> hull;
  for (int k = std::max(3, k0); k < n; k = k + std::max(1, k / 2)) {
    int r = concave_hull_impl(pts, k, hull);
    if (r > 0) {
      int m = std::min(r, max_out);
      std::memcpy(out_idx, hull.data(), m * sizeof(int));
      return m;
    }
  }
  return -1;
}

// Scanline polygon rasterization (even-odd rule) — replaces
// PIL-draw-based polygon_to_mask (gflow/utils/concave_hull.py:10-16) for the
// hot path; writes 0/1 into `mask` (H*W row-major).
void rasterize_polygon(const float* poly_xy, int n, int width, int height,
                       unsigned char* mask) {
  std::memset(mask, 0, static_cast<size_t>(width) * height);
  if (n < 3) return;
  std::vector<float> xs;
  xs.reserve(n);
  for (int y = 0; y < height; ++y) {
    float fy = static_cast<float>(y);
    xs.clear();
    for (int i = 0, j = n - 1; i < n; j = i++) {
      float y1 = poly_xy[2 * j + 1], y2 = poly_xy[2 * i + 1];
      float x1 = poly_xy[2 * j], x2 = poly_xy[2 * i];
      if ((y1 > fy) != (y2 > fy)) {
        float t = (fy - y1) / (y2 - y1);
        xs.push_back(x1 + t * (x2 - x1));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t s = 0; s + 1 < xs.size(); s += 2) {
      int x0 = std::max(0, static_cast<int>(std::ceil(xs[s])));
      int x1 = std::min(width - 1, static_cast<int>(std::floor(xs[s + 1])));
      for (int x = x0; x <= x1; ++x) mask[y * width + x] = 1;
    }
  }
}

}  // extern "C"
