// pvsg_native: TPU-host native runtime kernels for the OpenPVSG-TPU framework.
//
// Provides the host-side native components that the reference stack pulled in
// via pip dependencies (see SURVEY.md §2.9):
//   * COCO-compatible RLE mask codec (reference: pycocotools.mask, used by
//     models/unitrack/utils/mask.py and utils/relation_matching.py:78-79).
//     The `counts` strings produced here are bit-identical to pycocotools'
//     rleToString so that masks.txt files interoperate.
//   * LAPJV (Jonker-Volgenant) linear assignment with cost limit (reference:
//     lap.lapjv in models/unitrack/core/association/matching.py:29-40).
//   * Hungarian-style rectangular assignment used for training-time target
//     matching (reference: scipy.optimize.linear_sum_assignment inside
//     mmdet's MaskHungarianAssigner).
//
// Exposed as a plain C ABI consumed from Python via ctypes (no pybind11).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 pvsg_native.cpp -o libpvsg_native.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// RLE codec
// ---------------------------------------------------------------------------

// Encode a binary mask (uint8, column-major a.k.a. Fortran order, h*w items)
// into raw run counts (alternating runs of 0s/1s, starting with 0s).
// Returns the number of runs written; `counts` must have capacity h*w+1.
int64_t rle_encode_counts(const uint8_t* mask, int64_t h, int64_t w,
                          uint32_t* counts) {
  int64_t n = h * w;
  int64_t m = 0;
  uint8_t prev = 0;  // runs start with zeros by convention
  uint32_t run = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t v = mask[i] ? 1 : 0;
    if (v != prev) {
      counts[m++] = run;
      run = 0;
      prev = v;
    }
    ++run;
  }
  counts[m++] = run;
  return m;
}

// Decode raw run counts into a binary mask (uint8, column-major, h*w items).
void rle_decode_counts(const uint32_t* counts, int64_t m, uint8_t* mask,
                       int64_t n) {
  uint8_t v = 0;
  int64_t p = 0;
  for (int64_t i = 0; i < m && p < n; ++i) {
    uint32_t run = counts[i];
    for (uint32_t j = 0; j < run && p < n; ++j) mask[p++] = v;
    v = 1 - v;
  }
}

// Compress run counts to the COCO ascii string format (LEB128-style, 5 bits
// per char, chars offset by 48, deltas vs counts[i-2] for i>2). The output is
// NUL-terminated; `out` must have capacity >= 8*m+1. Returns string length.
int64_t rle_counts_to_string(const uint32_t* counts, int64_t m, char* out) {
  int64_t p = 0;
  for (int64_t i = 0; i < m; ++i) {
    int64_t x = (int64_t)counts[i];
    if (i > 2) x -= (int64_t)counts[i - 2];
    bool more = true;
    while (more) {
      char c = (char)(x & 0x1f);
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      c += 48;
      out[p++] = c;
    }
  }
  out[p] = '\0';
  return p;
}

// Decompress a COCO ascii `counts` string into raw run counts.
// `counts` must have capacity >= strlen(s). Returns the number of runs.
int64_t rle_string_to_counts(const char* s, uint32_t* counts) {
  int64_t m = 0, p = 0;
  while (s[p]) {
    int64_t x = 0;
    int64_t k = 0;
    bool more = true;
    while (more) {
      char c = s[p] - 48;
      x |= ((int64_t)(c & 0x1f)) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= ~((int64_t)0) << (5 * k);
    }
    if (m > 2) x += (int64_t)counts[m - 2];
    counts[m++] = (uint32_t)x;
  }
  return m;
}

// One-shot: binary mask -> COCO counts string. Returns string length.
int64_t rle_encode_to_string(const uint8_t* mask, int64_t h, int64_t w,
                             char* out) {
  std::vector<uint32_t> counts(h * w + 1);
  int64_t m = rle_encode_counts(mask, h, w, counts.data());
  return rle_counts_to_string(counts.data(), m, out);
}

// One-shot: COCO counts string -> binary mask (column-major h*w).
void rle_decode_from_string(const char* s, int64_t h, int64_t w,
                            uint8_t* mask) {
  int64_t n = h * w;
  std::vector<uint32_t> counts(strlen(s) + 1);
  int64_t m = rle_string_to_counts(s, counts.data());
  memset(mask, 0, n);
  rle_decode_counts(counts.data(), m, mask, n);
}

// Area (number of foreground pixels) directly from a counts string.
int64_t rle_area_from_string(const char* s) {
  std::vector<uint32_t> counts(strlen(s) + 1);
  int64_t m = rle_string_to_counts(s, counts.data());
  int64_t area = 0;
  for (int64_t i = 1; i < m; i += 2) area += counts[i];
  return area;
}

// IoU of two RLE counts strings without densifying (run-merge intersection).
double rle_iou_from_strings(const char* sa, const char* sb) {
  std::vector<uint32_t> ca(strlen(sa) + 1), cb(strlen(sb) + 1);
  int64_t ma = rle_string_to_counts(sa, ca.data());
  int64_t mb = rle_string_to_counts(sb, cb.data());
  int64_t ia = 0, ib = 0;
  int64_t ra = ma ? (int64_t)ca[0] : 0, rb = mb ? (int64_t)cb[0] : 0;
  uint8_t va = 0, vb = 0;
  int64_t inter = 0, uni = 0;
  while (ia < ma && ib < mb) {
    int64_t step = std::min(ra, rb);
    if (va && vb) inter += step;
    if (va || vb) uni += step;
    ra -= step;
    rb -= step;
    if (ra == 0 && ++ia < ma) { va ^= 1; ra = ca[ia]; }
    if (rb == 0 && ++ib < mb) { vb ^= 1; rb = cb[ib]; }
  }
  return uni > 0 ? (double)inter / (double)uni : 0.0;
}

// ---------------------------------------------------------------------------
// Linear assignment — classical O(n^3) Hungarian with potentials (Kuhn /
// Jonker-Volgenant family). Solves a dense square n x n min-cost matching.
// Fills x (row->col) and y (col->row); returns total cost.
// ---------------------------------------------------------------------------

static double lapjv_internal(int n, const double* cost, int* x, int* y) {
  const double INF = std::numeric_limits<double>::infinity();
  // 1-indexed potentials; p[j] = row matched to column j (0 = none).
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(size_t)(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else minv[j] -= delta;
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  double total = 0.0;
  for (int j = 1; j <= n; ++j) {
    x[p[j] - 1] = j - 1;
    y[j - 1] = p[j] - 1;
    total += cost[(size_t)(p[j] - 1) * n + (j - 1)];
  }
  return total;
}

// lap.lapjv-compatible entry with extend_cost + cost_limit semantics:
// rectangular (nr x nc) costs are embedded in a (nr+nc) square matrix whose
// padding entries cost cost_limit/2 (so any real match above cost_limit is
// rejected in favor of "unassigned"). x[i] = matched col or -1; y[j] likewise.
double lapjv(int nr, int nc, const double* cost, double cost_limit,
             int* x, int* y) {
  int n = nr + nc;
  double pad = cost_limit < std::numeric_limits<double>::infinity()
                   ? cost_limit / 2.0
                   : 0.0;
  if (!(cost_limit < std::numeric_limits<double>::infinity())) {
    double mx = 0.0;
    for (int i = 0; i < nr * nc; ++i) mx = std::max(mx, cost[i]);
    pad = mx + 1.0;
  }
  std::vector<double> big((size_t)n * n, pad);
  for (int i = 0; i < nr; ++i)
    for (int j = 0; j < nc; ++j) big[(size_t)i * n + j] = cost[i * nc + j];
  // bottom-right block: zeros so dummy rows/cols pair up freely
  for (int i = nr; i < n; ++i)
    for (int j = nc; j < n; ++j) big[(size_t)i * n + j] = 0.0;
  std::vector<int> bx(n), by(n);
  double total = lapjv_internal(n, big.data(), bx.data(), by.data());
  for (int i = 0; i < nr; ++i) x[i] = bx[i] < nc ? bx[i] : -1;
  for (int j = 0; j < nc; ++j) y[j] = by[j] < nr ? by[j] : -1;
  // total includes padding costs; recompute over real matches only
  double real = 0.0;
  for (int i = 0; i < nr; ++i)
    if (x[i] >= 0) real += cost[i * nc + x[i]];
  (void)total;
  return real;
}

// scipy.optimize.linear_sum_assignment-compatible rectangular assignment
// (minimize). Fills row_ind/col_ind with min(nr,nc) matched pairs in row
// order. Returns the number of pairs.
int hungarian(int nr, int nc, const double* cost, int* row_ind, int* col_ind) {
  int n = std::max(nr, nc);
  const double INF = std::numeric_limits<double>::infinity();
  double mx = 0.0;
  for (int i = 0; i < nr * nc; ++i)
    if (cost[i] < INF) mx = std::max(mx, std::abs(cost[i]));
  double pad = mx + 1.0;
  std::vector<double> big((size_t)n * n, pad);
  for (int i = 0; i < nr; ++i)
    for (int j = 0; j < nc; ++j) big[(size_t)i * n + j] = cost[i * nc + j];
  std::vector<int> x(n), y(n);
  lapjv_internal(n, big.data(), x.data(), y.data());
  int k = 0;
  for (int i = 0; i < nr; ++i)
    if (x[i] < nc) { row_ind[k] = i; col_ind[k] = x[i]; ++k; }
  return k;
}

// ---------------------------------------------------------------------------
// Batched frame-IoU between two stacks of label maps (for tube matching).
// For each (gt_id, pred_id) pair computes IoU of (gt==gt_id) vs (pred==pred_id)
// in one pass over the pixels. gt/pred: int32 h*w. ids are dense 0..K-1 after
// host-side relabeling; -1 = ignore.
// ---------------------------------------------------------------------------
void pairwise_mask_iou(const int32_t* gt, const int32_t* pred, int64_t n,
                       int32_t n_gt, int32_t n_pred, double* iou) {
  std::vector<int64_t> inter((size_t)n_gt * n_pred, 0);
  std::vector<int64_t> ga(n_gt, 0), pa(n_pred, 0);
  for (int64_t i = 0; i < n; ++i) {
    int32_t g = gt[i], p = pred[i];
    if (g >= 0 && g < n_gt) ++ga[g];
    if (p >= 0 && p < n_pred) ++pa[p];
    if (g >= 0 && g < n_gt && p >= 0 && p < n_pred)
      ++inter[(size_t)g * n_pred + p];
  }
  for (int32_t g = 0; g < n_gt; ++g)
    for (int32_t p = 0; p < n_pred; ++p) {
      int64_t in = inter[(size_t)g * n_pred + p];
      int64_t un = ga[g] + pa[p] - in;
      iou[(size_t)g * n_pred + p] = un > 0 ? (double)in / (double)un : 0.0;
    }
}

}  // extern "C"
