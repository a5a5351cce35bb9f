// Bipartite edge coloring by recursive Euler splitting — the offline
// routing step of the TPU expansion network (see nifty_tpu/ops/route.py
// for the algorithm description; this is a line-for-line-equivalent
// native implementation of route.euler_color's inner loop, ~50x faster
// than the Python traversal at millions of edges).
//
// Exposed C ABI:
//   router_euler_color(E, src, dst, n, n_colors, colors_out) -> int
// src/dst are node ids in [0, n); every node must have degree <= n_colors
// (checked; returns nonzero on violation).  n_colors must be a power of
// two.  The output is a proper coloring: no color repeats at any left or
// right node.

#include <cstdint>
#include <vector>

namespace {

using std::int64_t;
using std::vector;

// Split the edges (with even degree everywhere — guaranteed by stub
// padding to full degree, a power of two) into two halves balanced at
// every node, by walking alternating Euler trails.
// ids: edge indices of this subproblem; src/dst: global endpoint arrays.
void euler_split(const vector<int64_t>& ids, const int64_t* src,
                 const int64_t* dst, int64_t n, vector<char>& half) {
  const int64_t m = (int64_t)ids.size();
  // local CSR adjacency: for each left/right node, the list of local
  // edge positions incident to it
  vector<int64_t> lcnt(n + 1, 0), rcnt(n + 1, 0);
  for (int64_t i = 0; i < m; ++i) {
    ++lcnt[src[ids[i]] + 1];
    ++rcnt[dst[ids[i]] + 1];
  }
  for (int64_t v = 0; v < n; ++v) {
    lcnt[v + 1] += lcnt[v];
    rcnt[v + 1] += rcnt[v];
  }
  vector<int64_t> ladj(m), radj(m);
  {
    vector<int64_t> lp(lcnt.begin(), lcnt.end() - 1),
        rp(rcnt.begin(), rcnt.end() - 1);
    for (int64_t i = 0; i < m; ++i) {
      ladj[lp[src[ids[i]]]++] = i;
      radj[rp[dst[ids[i]]]++] = i;
    }
  }
  vector<int64_t> lptr(lcnt.begin(), lcnt.end() - 1),
      rptr(rcnt.begin(), rcnt.end() - 1);
  vector<char> used(m, 0);
  for (int64_t i0 = 0; i0 < m; ++i0) {
    if (used[i0]) continue;
    int64_t i = i0;
    bool take = true;
    while (i >= 0 && !used[i]) {
      used[i] = 1;
      half[ids[i]] = take ? 1 : 0;
      const int64_t e = ids[i];
      int64_t next = -1;
      if (take) {
        const int64_t v = dst[e];
        int64_t p = rptr[v];
        while (p < rcnt[v + 1] && used[radj[p]]) ++p;
        rptr[v] = p;
        if (p < rcnt[v + 1]) next = radj[p];
      } else {
        const int64_t v = src[e];
        int64_t p = lptr[v];
        while (p < lcnt[v + 1] && used[ladj[p]]) ++p;
        lptr[v] = p;
        if (p < lcnt[v + 1]) next = ladj[p];
      }
      i = next;
      take = !take;
    }
  }
}

void color_rec(vector<int64_t>&& ids, const int64_t* src, const int64_t* dst,
               int64_t n, int64_t k, int64_t base, int64_t* colors,
               vector<char>& half) {
  if (k == 1) {
    for (int64_t i : ids) colors[i] = base;
    return;
  }
  euler_split(ids, src, dst, n, half);
  vector<int64_t> a, b;
  a.reserve(ids.size() / 2 + 1);
  b.reserve(ids.size() / 2 + 1);
  for (int64_t i : ids) (half[i] ? a : b).push_back(i);
  ids.clear();
  ids.shrink_to_fit();
  color_rec(std::move(a), src, dst, n, k / 2, base, colors, half);
  color_rec(std::move(b), src, dst, n, k / 2, base + k / 2, colors, half);
}

}  // namespace

extern "C" int router_euler_color(int64_t E, const int64_t* src,
                                  const int64_t* dst, int64_t n,
                                  int64_t n_colors, int64_t* colors_out) {
  if (n_colors <= 0 || (n_colors & (n_colors - 1)) != 0) return 2;
  // degrees + stub padding to full degree n_colors at every node
  vector<int64_t> ldeg(n, 0), rdeg(n, 0);
  for (int64_t e = 0; e < E; ++e) {
    if (src[e] < 0 || src[e] >= n || dst[e] < 0 || dst[e] >= n) return 3;
    ++ldeg[src[e]];
    ++rdeg[dst[e]];
  }
  int64_t lpad = 0, rpad = 0;
  for (int64_t v = 0; v < n; ++v) {
    if (ldeg[v] > n_colors || rdeg[v] > n_colors) return 1;
    lpad += n_colors - ldeg[v];
    rpad += n_colors - rdeg[v];
  }
  if (lpad != rpad) return 4;  // cannot happen when n_left == n_right
  const int64_t Ep = E + lpad;
  vector<int64_t> src_p(Ep), dst_p(Ep);
  for (int64_t e = 0; e < E; ++e) {
    src_p[e] = src[e];
    dst_p[e] = dst[e];
  }
  {
    int64_t w = E;
    for (int64_t v = 0; v < n; ++v)
      for (int64_t c = ldeg[v]; c < n_colors; ++c) src_p[w++] = v;
    w = E;
    for (int64_t v = 0; v < n; ++v)
      for (int64_t c = rdeg[v]; c < n_colors; ++c) dst_p[w++] = v;
  }
  vector<int64_t> colors(Ep, 0);
  vector<int64_t> ids(Ep);
  for (int64_t i = 0; i < Ep; ++i) ids[i] = i;
  vector<char> half(Ep, 0);
  color_rec(std::move(ids), src_p.data(), dst_p.data(), n, n_colors, 0,
            colors.data(), half);
  for (int64_t e = 0; e < E; ++e) colors_out[e] = colors[e];
  return 0;
}
