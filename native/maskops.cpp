// maskops — native mask analysis kernels for the host-side tooling path.
//
// The reference leans on OpenCV's C++ connectedComponentsWithStats for all
// mask post-processing decisions (/root/reference/src/predict.py:215,
// model_selector.py:178). The device path reimplements CC as XLA label
// propagation (ops/components.py); this library is the native HOST path:
// a two-pass union-find labeler with cv2-identical stats used by dataset
// tooling and as a golden cross-check, plus fused area-filter and
// largest-component kernels so the tooling never round-trips label maps
// through Python loops.
//
// Build: make -C native   (produces libmaskops.so, loaded via ctypes from
// unet_watermark_tpu/utils/native.py)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a;  // smaller root wins → stable ordering
    else parent[a] = b;
  }
};

}  // namespace

extern "C" {

// Two-pass union-find connected components.
//   mask:   h*w uint8, nonzero = foreground
//   labels: h*w int32 out, 0 = background, components numbered 1..n-1 in
//           raster order of their first pixel (cv2 ordering)
//   stats:  max_labels*5 int32 out rows [left, top, width, height, area]
//           (cv2 CC_STAT_* layout), row 0 = background
// Returns the number of labels including background (cv2 contract), or
// -1 if more than max_labels components exist.
int32_t maskops_label(const uint8_t* mask, int32_t h, int32_t w,
                      int32_t connectivity, int32_t* labels,
                      int32_t* stats, int32_t max_labels) {
  const int64_t n = static_cast<int64_t>(h) * w;
  // provisional labels: one per run-start; first pass assigns + unions
  UnionFind uf(static_cast<size_t>(n) / 2 + 2);
  std::vector<int32_t> prov(n, -1);
  int32_t next = 0;

  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = static_cast<int64_t>(y) * w + x;
      if (!mask[i]) continue;
      int32_t up = (y > 0 && mask[i - w]) ? prov[i - w] : -1;
      int32_t left = (x > 0 && mask[i - 1]) ? prov[i - 1] : -1;
      int32_t ul = -1, ur = -1;
      if (connectivity == 8 && y > 0) {
        if (x > 0 && mask[i - w - 1]) ul = prov[i - w - 1];
        if (x + 1 < w && mask[i - w + 1]) ur = prov[i - w + 1];
      }
      int32_t lbl = -1;
      for (int32_t cand : {up, left, ul, ur}) {
        if (cand >= 0) lbl = (lbl < 0) ? cand : std::min(lbl, cand);
      }
      if (lbl < 0) {
        lbl = next++;
        if (static_cast<size_t>(lbl) >= uf.parent.size())
          uf.parent.push_back(lbl);
      } else {
        for (int32_t cand : {up, left, ul, ur})
          if (cand >= 0) uf.unite(lbl, cand);
      }
      prov[i] = lbl;
    }
  }

  // compact roots → final labels in raster order of first appearance
  std::vector<int32_t> remap(static_cast<size_t>(next), 0);
  int32_t count = 1;  // 0 is background
  for (int64_t i = 0; i < n; ++i) {
    if (prov[i] < 0) {
      labels[i] = 0;
      continue;
    }
    int32_t root = uf.find(prov[i]);
    if (remap[root] == 0) {
      if (count >= max_labels) return -1;
      remap[root] = count++;
    }
    labels[i] = remap[root];
  }

  // stats
  std::memset(stats, 0, sizeof(int32_t) * 5 * count);
  std::vector<int32_t> minx(count, w), miny(count, h), maxx(count, -1),
      maxy(count, -1), area(count, 0);
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t l = labels[static_cast<int64_t>(y) * w + x];
      area[l] += 1;
      minx[l] = std::min(minx[l], x);
      miny[l] = std::min(miny[l], y);
      maxx[l] = std::max(maxx[l], x);
      maxy[l] = std::max(maxy[l], y);
    }
  }
  for (int32_t l = 0; l < count; ++l) {
    int32_t* row = stats + static_cast<int64_t>(l) * 5;
    if (area[l] > 0) {
      row[0] = minx[l];
      row[1] = miny[l];
      row[2] = maxx[l] - minx[l] + 1;
      row[3] = maxy[l] - miny[l] + 1;
      row[4] = area[l];
    }
  }
  return count;
}

// Zero every component with area <= min_area (in place on mask).
// Returns number of surviving components.
int32_t maskops_filter_area(uint8_t* mask, int32_t h, int32_t w,
                            int32_t connectivity, int32_t min_area) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> labels(n);
  const int32_t max_labels = static_cast<int32_t>(n / 2 + 2);
  std::vector<int32_t> stats(static_cast<size_t>(max_labels) * 5);
  int32_t count = maskops_label(mask, h, w, connectivity, labels.data(),
                                stats.data(), max_labels);
  if (count < 0) return -1;
  std::vector<uint8_t> keep(count, 0);
  int32_t survivors = 0;
  for (int32_t l = 1; l < count; ++l) {
    keep[l] = stats[static_cast<int64_t>(l) * 5 + 4] > min_area;
    survivors += keep[l];
  }
  for (int64_t i = 0; i < n; ++i) mask[i] = keep[labels[i]] ? 255 : 0;
  return survivors;
}

// The reference's largest-component rule (predict.py:251-266): keep the
// largest component; if its area < min_keep_area, instead keep all
// components with area > fallback_min_area. In place on mask.
int32_t maskops_keep_largest(uint8_t* mask, int32_t h, int32_t w,
                             int32_t connectivity, int32_t min_keep_area,
                             int32_t fallback_min_area) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> labels(n);
  const int32_t max_labels = static_cast<int32_t>(n / 2 + 2);
  std::vector<int32_t> stats(static_cast<size_t>(max_labels) * 5);
  int32_t count = maskops_label(mask, h, w, connectivity, labels.data(),
                                stats.data(), max_labels);
  if (count <= 1) return count < 0 ? -1 : 0;
  int32_t largest = 1;
  for (int32_t l = 2; l < count; ++l) {
    if (stats[static_cast<int64_t>(l) * 5 + 4] >
        stats[static_cast<int64_t>(largest) * 5 + 4])
      largest = l;
  }
  const int32_t max_area = stats[static_cast<int64_t>(largest) * 5 + 4];
  std::vector<uint8_t> keep(count, 0);
  if (max_area >= min_keep_area) {
    keep[largest] = 1;
  } else {
    for (int32_t l = 1; l < count; ++l)
      keep[l] = stats[static_cast<int64_t>(l) * 5 + 4] > fallback_min_area;
  }
  int32_t survivors = 0;
  for (int32_t l = 1; l < count; ++l) survivors += keep[l];
  for (int64_t i = 0; i < n; ++i) mask[i] = keep[labels[i]] ? 255 : 0;
  return survivors;
}

}  // extern "C"
