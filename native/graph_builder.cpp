// Native heuristic graph builder — the data-pipeline hot loop.
//
// C++ implementation of the textline relation heuristics in
// grl_tpu/data/graph_builder.py (left-right with occlusion filtering +
// nearest-column cleaning, nearest-above top-bottom + nearest-row
// cleaning), which re-implements the reference semantics
// (reference: gnn/data_generator/data_process/utils/graph_utils.py:425-683).
//
// Scope: textline nodes (the only node kind the reference's pipeline ever
// produces in practice — cell/table parenting never matches, see
// graph_builder.py). The Python wrapper falls back to the pure-Python
// builder when cells/rows/cols are present.
//
// Exposed C ABI (ctypes):
//   int grl_build_edges(const double* boxes /* n*4: x,y,w,h */,
//                       const unsigned char* has_text /* n */,
//                       int n,
//                       int* out_edges /* cap*3: src,label,dst */,
//                       int cap);
// Returns the number of edges written, or -1 if cap is too small.
// Edge labels: 0=lr, 1=rl, 2=tb, 3=bt (child/parent never occur for
// textline-only graphs).

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

constexpr int kLR = 0;
constexpr int kRL = 1;
constexpr int kTB = 2;
constexpr int kBT = 3;

struct Builder {
  int n;
  const double* bx;  // strided boxes: x,y,w,h per node
  std::vector<std::vector<double>> y_ov;  // y-interval overlap lengths
  std::vector<std::vector<double>> x_ov;  // x-interval overlap lengths
  std::vector<std::vector<int>> lefts, rights, tops, bottoms;

  double x(int i) const { return bx[4 * i + 0]; }
  double y(int i) const { return bx[4 * i + 1]; }
  double w(int i) const { return bx[4 * i + 2]; }
  double h(int i) const { return bx[4 * i + 3]; }

  explicit Builder(const double* boxes, int n_) : n(n_), bx(boxes) {
    y_ov.assign(n, std::vector<double>(n));
    x_ov.assign(n, std::vector<double>(n));
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < n; ++j) {
        double lo = std::max(y(i), y(j));
        double hi = std::min(y(i) + h(i), y(j) + h(j));
        y_ov[i][j] = std::max(0.0, hi - lo);
        double lo2 = std::max(x(i), x(j));
        double hi2 = std::min(x(i) + w(i), x(j) + w(j));
        x_ov[i][j] = std::max(0.0, hi2 - lo2);
      }
    }
    lefts.assign(n, {});
    rights.assign(n, {});
    tops.assign(n, {});
    bottoms.assign(n, {});
  }

  bool contains(const std::vector<int>& v, int value) const {
    return std::find(v.begin(), v.end(), value) != v.end();
  }

  // graph_builder.py::_is_left_of
  bool is_left_of(int i, int j, const std::vector<int>& refs) const {
    if (contains(rights[i], j)) return true;
    if (x(j) < x(i) || y_ov[i][j] <= 0.0) return false;
    if (y_ov[i][j] > 0.9 * std::min(h(i), h(j)) &&
        x(j) - x(i) < 0.1 * std::min(w(i), w(j)))
      return true;
    if (refs.empty()) return true;
    for (int c : refs) {
      if (y_ov[i][c] > 0.0 && x(c) + w(c) < x(j) + w(j) * 0.1 &&
          x(c) >= x(i) + w(i) * 0.8 &&
          y_ov[i][c] > std::min(h(i), h(c)) / 5.0 &&
          (y_ov[c][j] > h(j) / 2.0 ||
           y_ov[i][c] > 0.8 * std::min(h(c), h(i))))
        return false;  // an occluder sits between i and j
    }
    return true;
  }

  void build_left_right(std::vector<int>& edges) {
    std::vector<int> by_y(n);
    for (int i = 0; i < n; ++i) by_y[i] = i;
    std::stable_sort(by_y.begin(), by_y.end(),
                     [&](int a, int b) { return y(a) < y(b); });
    for (int i : by_y) {
      std::vector<int> collide;
      for (int j : by_y) {
        if (j != i && x(j) >= x(i) &&
            y_ov[i][j] > 0.4 * std::min(h(i), h(j)))
          collide.push_back(j);
      }
      for (int j : collide) {
        if (is_left_of(i, j, collide) && !contains(rights[i], j)) {
          edges.push_back(i); edges.push_back(kLR); edges.push_back(j);
          edges.push_back(j); edges.push_back(kRL); edges.push_back(i);
          rights[i].push_back(j);
          lefts[j].push_back(i);
        }
      }
    }
  }

  void clean_left_right(std::vector<int>& edges) {
    for (int i = 0; i < n; ++i) {
      if (lefts[i].size() <= 1) continue;
      std::vector<int> sorted = lefts[i];
      std::stable_sort(sorted.begin(), sorted.end(),
                       [&](int a, int b) { return x(a) < x(b); });
      std::vector<int> overlapping, candidates;
      for (int c : sorted) {
        if (x(c) + w(c) > x(i) && x(c) > x(i) - 0.5 * h(i))
          overlapping.push_back(c);
        else
          candidates.push_back(c);
      }
      // cluster candidates into columns by x-projection overlap.
      std::vector<std::vector<int>> columns;
      std::vector<int> current;
      for (int c : candidates) {
        bool chained = !current.empty() &&
                       x_ov[current.back()][c] >
                           0.5 * std::min(w(current.back()), w(c));
        if (chained) {
          current.push_back(c);
        } else {
          if (!current.empty()) columns.push_back(current);
          current = {c};
        }
      }
      if (!current.empty()) columns.push_back(current);
      std::vector<int> keep =
          columns.empty() ? std::vector<int>{} : columns.back();

      std::vector<int> removals = overlapping;
      for (int c : candidates)
        if (!contains(keep, c)) removals.push_back(c);
      for (int c : removals) {
        rights[c].erase(std::find(rights[c].begin(), rights[c].end(), i));
        erase_edge(edges, c, kLR, i);
        erase_edge(edges, i, kRL, c);
      }
      lefts[i] = keep;
    }
  }

  void erase_edge(std::vector<int>& edges, int s, int l, int d) const {
    for (size_t e = 0; e < edges.size(); e += 3) {
      if (edges[e] == s && edges[e + 1] == l && edges[e + 2] == d) {
        edges.erase(edges.begin() + e, edges.begin() + e + 3);
        return;
      }
    }
  }

  void build_top_bottom(std::vector<int>& edges, const unsigned char* has_text) {
    std::vector<int> by_x(n);
    for (int i = 0; i < n; ++i) by_x[i] = i;
    std::stable_sort(by_x.begin(), by_x.end(),
                     [&](int a, int b) { return x(a) < x(b); });
    for (int i : by_x) {
      int best = -1;
      double best_dist = 50000.0;
      for (int j : by_x) {
        if (!has_text[j]) continue;
        if (x_ov[i][j] <= 0.0) continue;  // unreachable otherwise
        if (y(j) < y(i)) {
          double dist = y(i) - y(j) - h(j);
          if (dist < best_dist) {
            best = j;
            best_dist = dist;
          }
        }
      }
      if (best >= 0) {
        edges.push_back(best); edges.push_back(kTB); edges.push_back(i);
        edges.push_back(i); edges.push_back(kBT); edges.push_back(best);
        tops[i].push_back(best);
        bottoms[best].push_back(i);
      }
    }
  }

  void clean_top_bottom(std::vector<int>& edges) {
    for (int i = 0; i < n; ++i) {
      if (tops[i].size() <= 1) continue;
      std::vector<int> sorted = tops[i];
      std::stable_sort(sorted.begin(), sorted.end(),
                       [&](int a, int b) { return y(a) < y(b); });
      // cluster into rows by y-projection overlap vs min widths.
      std::vector<std::vector<int>> rows;
      std::vector<int> current;
      for (int c : sorted) {
        bool chained = !current.empty() &&
                       y_ov[current.back()][c] >
                           0.5 * std::min(w(current.back()), w(c));
        if (chained) {
          current.push_back(c);
        } else {
          if (!current.empty()) rows.push_back(current);
          current = {c};
        }
      }
      if (!current.empty()) rows.push_back(current);
      std::vector<int> keep = rows.back();
      for (int c : sorted) {
        if (!contains(keep, c)) {
          bottoms[c].erase(std::find(bottoms[c].begin(), bottoms[c].end(), i));
          erase_edge(edges, c, kTB, i);
          erase_edge(edges, i, kBT, c);
        }
      }
      tops[i] = keep;
    }
  }
};

}  // namespace

extern "C" int grl_build_edges(const double* boxes, const unsigned char* has_text,
                               int n, int* out_edges, int cap) {
  Builder builder(boxes, n);
  std::vector<int> edges;
  edges.reserve(static_cast<size_t>(n) * 12);
  builder.build_left_right(edges);
  builder.build_top_bottom(edges, has_text);
  builder.clean_left_right(edges);
  builder.clean_top_bottom(edges);
  int count = static_cast<int>(edges.size() / 3);
  if (count > cap) return -1;
  std::memcpy(out_edges, edges.data(), edges.size() * sizeof(int));
  return count;
}
