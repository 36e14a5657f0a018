// NeutronStarLite-TPU native host runtime.
//
// The reference implements its graph substrate and sampler in C++/OpenMP
// (core/graph.hpp load/partition/CSC-CSR build; core/ntsSampler.hpp
// reservoir sampling; core/coocsc.hpp relabeling). This library provides the
// TPU build's equivalents for the host-side hot paths — everything the
// device (XLA) cannot do: edge sorting/CSC construction, minibatch neighbor
// sampling, and the Fennel partitioner. Exposed as a C ABI consumed via ctypes
// (neutronstarlite_tpu/native.py), with pure-numpy fallbacks when the .so is
// absent.
//
// Build: `make` in this directory (g++ -O3 -fopenmp -march=native -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Degree count: deg[i] = #occurrences of i in ids[0..e)
// ---------------------------------------------------------------------------
void nsl_degree(const int32_t* ids, int64_t e, int32_t v, int32_t* deg) {
  std::memset(deg, 0, sizeof(int32_t) * v);
#ifdef _OPENMP
#pragma omp parallel
  {
    std::vector<int32_t> local(v, 0);
#pragma omp for nowait
    for (int64_t i = 0; i < e; i++) local[ids[i]]++;
#pragma omp critical
    for (int32_t j = 0; j < v; j++) deg[j] += local[j];
  }
#else
  for (int64_t i = 0; i < e; i++) deg[ids[i]]++;
#endif
}

// ---------------------------------------------------------------------------
// Stable counting sort of edges by key (dst for CSC, src for CSR).
// Outputs: offsets[v+1], perm[e] (input edge order within each bucket
// preserved — same per-segment edge order as the reference's CSC build).
// ---------------------------------------------------------------------------
void nsl_sort_edges(const int32_t* key, int64_t e, int32_t v,
                    int64_t* offsets, int64_t* perm) {
  std::vector<int32_t> deg(v, 0);
  for (int64_t i = 0; i < e; i++) deg[key[i]]++;
  offsets[0] = 0;
  for (int32_t j = 0; j < v; j++) offsets[j + 1] = offsets[j] + deg[j];
  std::vector<int64_t> cursor(offsets, offsets + v);
  for (int64_t i = 0; i < e; i++) perm[cursor[key[i]]++] = i;
}

// ---------------------------------------------------------------------------
// Minibatch neighbor sampling: one hop for a batch of seeds.
// For each seed (>=0), uniformly sample up to `fanout` in-neighbors without
// replacement from csc (offsets, nbr) — the reference's reservoir sampler
// (ntsSampler.hpp:113-172) produces the same distribution.
// out_nbr: [cap, fanout] global ids (-1 pad). Parallel over rows; each row
// uses a counter-based RNG stream (seed, row) for reproducibility.
// ---------------------------------------------------------------------------
void nsl_sample_hop(const int64_t* offsets, const int32_t* nbr,
                    const int32_t* seeds, int32_t cap, int32_t fanout,
                    uint64_t seed, int64_t* out_nbr_i64_unused,
                    int32_t* out_nbr) {
  (void)out_nbr_i64_unused;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 16)
#endif
  for (int32_t r = 0; r < cap; r++) {
    int32_t* row = out_nbr + (int64_t)r * fanout;
    for (int32_t j = 0; j < fanout; j++) row[j] = -1;
    int32_t vtx = seeds[r];
    if (vtx < 0) continue;
    int64_t lo = offsets[vtx], hi = offsets[vtx + 1];
    int64_t deg = hi - lo;
    if (deg <= 0) continue;
    if (deg <= fanout) {
      for (int64_t j = 0; j < deg; j++) row[j] = nbr[lo + j];
    } else {
      // reservoir sampling (matches reference semantics)
      std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)r);
      std::vector<int64_t> res(fanout);
      for (int32_t j = 0; j < fanout; j++) res[j] = lo + j;
      for (int64_t i = fanout; i < deg; i++) {
        uint64_t j = rng() % (uint64_t)(i + 1);
        if (j < (uint64_t)fanout) res[j] = lo + i;
      }
      for (int32_t j = 0; j < fanout; j++) row[j] = nbr[res[j]];
    }
  }
}

// ---------------------------------------------------------------------------
// Dedup + relabel: given flat global ids (with -1 padding), produce the
// sorted unique table and rewrite ids as local indices (pad stays 0 with
// valid=0). Serial (called per batch; batches are small).
// Returns table size.
// ---------------------------------------------------------------------------
int64_t nsl_dedup_relabel(const int32_t* flat, int64_t n, int32_t v,
                          int32_t* table, int32_t* local, int32_t* scratch) {
  // scratch: [v] int32 workspace (caller-allocated, reused across calls)
  // pass 1: mark
  for (int64_t i = 0; i < n; i++)
    if (flat[i] >= 0) scratch[flat[i]] = 1;
  // pass 2: assign ranks over marked ids (sorted order)
  int64_t cnt = 0;
  for (int32_t j = 0; j < v; j++) {
    if (scratch[j]) {
      table[cnt] = j;
      scratch[j] = (int32_t)(cnt + 1);  // rank+1 (0 = absent)
      cnt++;
    }
  }
  // pass 3: rewrite
  for (int64_t i = 0; i < n; i++)
    local[i] = flat[i] >= 0 ? scratch[flat[i]] - 1 : 0;
  // pass 4: clear marks
  for (int64_t i = 0; i < cnt; i++) scratch[table[i]] = 0;
  return cnt;
}

// ---------------------------------------------------------------------------
// Single-pass ELL slab packer (the hot loop of the dual-ELL build — the
// reference's per-chunk CSC/CSR materialization phase it parallelizes
// across threads, core/graph.hpp:1329-1826). Packs an UNSORTED edge list
// into base + row-split tail slabs in one sweep with per-row cursors:
// within a row, slots follow original edge order (== the numpy fallback's
// stable argsort + rank). Outputs are caller-allocated; idx/wgt and
// tail_idx/tail_w must be pre-zeroed, tail_rows pre-filled with num_rows
// (the padding sentinel); pos[j] = flat slab position of input edge j
// (base slab first, then tail). Called per (device, direction) from a
// Python thread pool — ctypes releases the GIL, so 2P packs run on all
// cores.
// ---------------------------------------------------------------------------
void nsl_pack_slab(const int32_t* key, const int32_t* other, const float* w,
                   int64_t e, int32_t num_rows, int32_t k, int64_t v_pad,
                   int32_t* idx, float* wgt, int32_t* tail_idx,
                   float* tail_w, int32_t* tail_rows, int64_t* pos) {
  std::vector<int64_t> deg(num_rows, 0);
  for (int64_t j = 0; j < e; j++) deg[key[j]]++;
  // vstart[r] = exclusive cumsum of per-row tail slices ceil(max(deg-k,0)/k)
  std::vector<int64_t> vstart(num_rows + 1, 0);
  for (int32_t r = 0; r < num_rows; r++) {
    const int64_t over = deg[r] > k ? deg[r] - k : 0;
    vstart[r + 1] = vstart[r] + (over + k - 1) / k;
  }
  for (int32_t r = 0; r < num_rows; r++)
    for (int64_t t = vstart[r]; t < vstart[r + 1]; t++) tail_rows[t] = r;
  const int64_t base_size = v_pad * (int64_t)k;
  std::vector<int64_t> cursor(num_rows, 0);
  for (int64_t j = 0; j < e; j++) {
    const int32_t r = key[j];
    const int64_t rank = cursor[r]++;
    int64_t p;
    if (rank < k) {
      p = (int64_t)r * k + rank;
      idx[p] = other[j];
      wgt[p] = w[j];
    } else {
      const int64_t tr = rank - k;
      const int64_t tp = (vstart[r] + tr / k) * k + tr % k;
      tail_idx[tp] = other[j];
      tail_w[tp] = w[j];
      p = base_size + tp;
    }
    pos[j] = p;
  }
}

// ---------------------------------------------------------------------------
// Fennel streaming vertex partitioner (beyond-reference: the reference only
// has the contiguous locality-aware range partition, core/graph.hpp:1185-
// 1213). One pass over vertices in the given order; each vertex joins the
// partition maximizing
//     |assigned neighbors in i|  -  alpha * gamma * load_i^(gamma-1)
// (Tsourakakis et al., Fennel, WSDM'14), with a hard per-partition cap
// slack*ceil(v/p). Neighborhood = in-edges (CSC) + out-edges (CSR) — mirror
// counts depend on both directions. Ties break toward the lighter load.
// ---------------------------------------------------------------------------
void nsl_fennel(const int64_t* in_off, const int32_t* in_nbr,
                const int64_t* out_off, const int32_t* out_nbr,
                int32_t v, int64_t e, int32_t p, double gamma,
                double slack, int32_t passes, const int32_t* order,
                int32_t* owner) {
  const double alpha =
      std::pow((double)p, gamma - 1.0) * (double)e / std::pow((double)v, gamma);
  const int64_t cap = (int64_t)(slack * ((v + p - 1) / p)) + 1;
  std::vector<int64_t> load(p, 0);
  std::vector<int64_t> cnt(p);
  for (int32_t i = 0; i < v; i++) owner[i] = -1;
  for (int32_t pass = 0; pass < passes; pass++) {
    for (int32_t s = 0; s < v; s++) {
      const int32_t u = order ? order[s] : s;
      if (owner[u] >= 0) {
        load[owner[u]]--;  // re-evaluate on later passes
        owner[u] = -1;     // self-loops must not count the stale assignment
      }
      std::fill(cnt.begin(), cnt.end(), 0);
      for (int64_t k = in_off[u]; k < in_off[u + 1]; k++) {
        const int32_t o = owner[in_nbr[k]];
        if (o >= 0) cnt[o]++;
      }
      for (int64_t k = out_off[u]; k < out_off[u + 1]; k++) {
        const int32_t o = owner[out_nbr[k]];
        if (o >= 0) cnt[o]++;
      }
      int32_t best = -1;
      double best_s = 0.0;
      for (int32_t i = 0; i < p; i++) {
        if (load[i] >= cap) continue;
        const double sc =
            (double)cnt[i] -
            alpha * gamma * std::pow((double)load[i], gamma - 1.0);
        if (best < 0 || sc > best_s ||
            (sc == best_s && load[i] < load[best])) {
          best = i;
          best_s = sc;
        }
      }
      if (best < 0) {  // every partition at cap (slack<1): least-loaded
        best = 0;
        for (int32_t i = 1; i < p; i++)
          if (load[i] < load[best]) best = i;
      }
      owner[u] = best;
      load[best]++;
    }
  }
}

}  // extern "C"
