// Native triangle->tile band binning for sdfgenfast_tpu.
//
// The TPU pipeline's host-side preprocessing bins every triangle into each
// grid tile overlapped by its band-expanded bbox (the static-shape
// replacement for the reference's per-triangle cell scatter,
// cpu_lib/makelevelset3.cpp:203-220, and the CUDA backend's atomics,
// gpu_lib/makelevelset3_gpu.cu:374-432). The vectorized NumPy version costs
// ~0.3-1.3 s at the 256-class 82k-triangle workload; this native two-pass
// counting-sort version runs in tens of milliseconds and produces
// BIT-IDENTICAL output: per-tile candidate lists in ascending triangle
// order (NumPy's stable sort by tile preserves triangle order), active
// tiles in ascending linear id.
//
// Band-membership math mirrors the reference exactly: double-precision grid
// coordinates (makelevelset3.cpp:206-208), C truncation toward zero,
// clamped per-axis index windows (:210-212).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

namespace {

void set_err(char* err, int errlen, const char* msg) {
  if (err && errlen > 0) {
    std::strncpy(err, msg, errlen - 1);
    err[errlen - 1] = '\0';
  }
}

// Exact-overlap prune: a pair (triangle, tile) is kept only when a LOWER
// BOUND on the distance (in cell units) from the tile's cell box to the
// triangle is <= band + eps. Two bounds, both separating-axis style:
//   1. Euclidean bbox gap: sqrt(gx^2+gy^2+gz^2) between the triangle bbox
//      and the tile cell box (the legacy criterion was the L-inf version —
//      per-axis dilation — which keeps diagonal-corner tiles the L2 test
//      drops).
//   2. Plane separation: |n.c - d| - sum(|n_ax| * h_ax), the distance from
//      the tile box to the triangle's PLANE (skipped for degenerate
//      normals).
// Freeze-exactness only needs triangles within `band` cells of some tile
// cell kept, and dist(cell, tri) >= both bounds, so pruning is safe.
// eps guards f64 rounding at the decision margin (decisions must also
// match the NumPy fallback bit-for-bit; see -ffp-contract=off).
struct TriGeom {
  double fmin[3], fmax[3];  // grid-coordinate bbox
  double n[3], d, nlen;     // plane n.x = d, |n| (0 for degenerate)
  double f[3][3];           // grid-coordinate vertices
};

inline void tri_geom(const float* verts, const uint32_t* tri,
                     const double* origin, double dx, TriGeom* g) {
  for (int ax = 0; ax < 3; ++ax) {
    g->fmin[ax] = 1e300;
    g->fmax[ax] = -1e300;
  }
  for (int v = 0; v < 3; ++v) {
    const uint32_t vi = tri[v];
    for (int ax = 0; ax < 3; ++ax) {
      const double f =
          (static_cast<double>(verts[vi * 3 + ax]) - origin[ax]) / dx;
      g->f[v][ax] = f;
      if (f < g->fmin[ax]) g->fmin[ax] = f;
      if (f > g->fmax[ax]) g->fmax[ax] = f;
    }
  }
  double e1[3], e2[3];
  for (int ax = 0; ax < 3; ++ax) {
    e1[ax] = g->f[1][ax] - g->f[0][ax];
    e2[ax] = g->f[2][ax] - g->f[0][ax];
  }
  g->n[0] = e1[1] * e2[2] - e1[2] * e2[1];
  g->n[1] = e1[2] * e2[0] - e1[0] * e2[2];
  g->n[2] = e1[0] * e2[1] - e1[1] * e2[0];
  const double n2 =
      g->n[0] * g->n[0] + g->n[1] * g->n[1] + g->n[2] * g->n[2];
  g->nlen = std::sqrt(n2);
  g->d = g->n[0] * g->f[0][0] + g->n[1] * g->f[0][1] + g->n[2] * g->f[0][2];
}

inline bool keep_tile(const TriGeom& g, const int64_t* tile,
                      const int64_t* dims, int64_t a, int64_t b, int64_t c,
                      double band) {
  const double eps = 1e-6;
  const int64_t tix[3] = {a, b, c};
  double lo[3], hi[3], gap2 = 0.0;
  for (int ax = 0; ax < 3; ++ax) {
    lo[ax] = static_cast<double>(tix[ax] * tile[ax]);
    double h = static_cast<double>((tix[ax] + 1) * tile[ax] - 1);
    const double dmax = static_cast<double>(dims[ax] - 1);
    if (h > dmax) h = dmax;
    hi[ax] = h;
    double gap = 0.0;
    if (lo[ax] > g.fmax[ax]) gap = lo[ax] - g.fmax[ax];
    else if (g.fmin[ax] > hi[ax]) gap = g.fmin[ax] - hi[ax];
    gap2 += gap * gap;
  }
  const double limit = band + eps;
  if (gap2 > limit * limit) return false;
  if (g.nlen > 1e-30) {
    double center_dot = 0.0, radius = 0.0;
    for (int ax = 0; ax < 3; ++ax) {
      center_dot += g.n[ax] * (0.5 * (lo[ax] + hi[ax]));
      radius += std::fabs(g.n[ax]) * (0.5 * (hi[ax] - lo[ax]));
    }
    const double plane_gap =
        (std::fabs(center_dot - g.d) - radius) / g.nlen;
    if (plane_gap > limit) return false;
  }
  return true;
}

struct BinDims {
  int64_t dims[3], tile[3], nti, ntj, ntk, T;
};

inline void tri_window(const TriGeom& g, int32_t band, const BinDims& bd,
                       int64_t* tlo, int64_t* thi) {
  // reference window: clamp(int(min)-band, 0, n-1) ..
  // clamp(int(max)+band+1, 0, n-1), int() = C truncation
  for (int ax = 0; ax < 3; ++ax) {
    int64_t lo = static_cast<int64_t>(std::trunc(g.fmin[ax])) - band;
    int64_t hi = static_cast<int64_t>(std::trunc(g.fmax[ax])) + band + 1;
    if (lo < 0) lo = 0;
    if (lo > bd.dims[ax] - 1) lo = bd.dims[ax] - 1;
    if (hi < 0) hi = 0;
    if (hi > bd.dims[ax] - 1) hi = bd.dims[ax] - 1;
    tlo[ax] = lo / bd.tile[ax];
    thi[ax] = hi / bd.tile[ax];
  }
}

// Count pairs per tile for triangles [t0, t1) into `cnt` (int32: a single
// chunk can't overflow — nt < 2^31 triangles reach any one tile).
void count_chunk(const float* verts, const uint32_t* tris,
                 const double* origin, double dx, int32_t band, int32_t prune,
                 const BinDims& bd, int64_t t0, int64_t t1, int32_t* cnt) {
  for (int64_t t = t0; t < t1; ++t) {
    TriGeom g;
    tri_geom(verts, tris + t * 3, origin, dx, &g);
    int64_t tlo[3], thi[3];
    tri_window(g, band, bd, tlo, thi);
    for (int64_t a = tlo[0]; a <= thi[0]; ++a)
      for (int64_t b = tlo[1]; b <= thi[1]; ++b)
        for (int64_t c2 = tlo[2]; c2 <= thi[2]; ++c2)
          if (!prune || keep_tile(g, bd.tile, bd.dims, a, b, c2, band))
            cnt[(a * bd.ntj + b) * bd.ntk + c2] += 1;
  }
}

// Deterministic parallelism: triangles split into NTH contiguous chunks;
// per-chunk per-tile counts give every chunk a fixed write offset per tile,
// so the filled candidate lists keep ascending-triangle order regardless of
// thread scheduling — BIT-IDENTICAL to the serial fill (argmin tie-breaks
// downstream depend on this order). Memory: NTH * T * 4 bytes of scratch.
inline int pick_threads(int64_t nt) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw < 1) hw = 1;
  if (hw > 8) hw = 8;
  return nt >= 8192 ? hw : 1;
}

}  // namespace

extern "C" {

// Pass 1: count pairs per tile and report A (active tiles) and K (max
// candidates per tile, rounded up to pad_k). `counts` must hold
// nti*ntj*ntk int64 zeros on entry; it is filled with per-tile counts.
int sdfbin_count(
    const float* verts, int64_t nv,
    const uint32_t* tris, int64_t nt,
    const double* origin, double dx,
    int32_t ni, int32_t nj, int32_t nk,
    int32_t band, int32_t ti, int32_t tj, int32_t tk,
    int32_t prune,    // 0: legacy L-inf bbox dilation; 1: exact-overlap
    int64_t* counts,  // (nti*ntj*ntk,) zeros on entry
    int64_t* out_active, int64_t* out_kmax,
    char* err, int errlen) {
  (void)nv;
  if (ni <= 0 || nj <= 0 || nk <= 0 || ti <= 0 || tj <= 0 || tk <= 0) {
    set_err(err, errlen, "invalid dims");
    return 1;
  }
  const BinDims bd = {
      {ni, nj, nk}, {ti, tj, tk},
      (ni + ti - 1) / ti, (nj + tj - 1) / tj, (nk + tk - 1) / tk, 0};
  const int64_t T = bd.nti * bd.ntj * bd.ntk;

  const int nth = pick_threads(nt);
  std::vector<int32_t> chunk_cnt(static_cast<size_t>(nth) * T, 0);
  if (nth == 1) {
    count_chunk(verts, tris, origin, dx, band, prune, bd, 0, nt,
                chunk_cnt.data());
  } else {
    std::vector<std::thread> pool;
    for (int c = 0; c < nth; ++c) {
      const int64_t t0 = nt * c / nth, t1 = nt * (c + 1) / nth;
      pool.emplace_back(count_chunk, verts, tris, origin, dx, band, prune,
                        std::cref(bd), t0, t1, chunk_cnt.data() + c * T);
    }
    for (auto& th : pool) th.join();
  }
  for (int c = 0; c < nth; ++c) {
    const int32_t* src = chunk_cnt.data() + static_cast<size_t>(c) * T;
    for (int64_t i = 0; i < T; ++i) counts[i] += src[i];
  }

  int64_t active = 0, kmax = 0;
  for (int64_t i = 0; i < T; ++i) {
    if (counts[i] > 0) {
      ++active;
      if (counts[i] > kmax) kmax = counts[i];
    }
  }
  *out_active = active;
  *out_kmax = kmax;
  return 0;
}

// Pass 2: fill the padded candidate arrays. `counts` is the pass-1 output
// (it is consumed/overwritten). active_ids: (A,), cand: (A, K) int32,
// valid: (A, K) uint8 — all preallocated by the caller; K >= kmax.
int sdfbin_fill(
    const float* verts, int64_t nv,
    const uint32_t* tris, int64_t nt,
    const double* origin, double dx,
    int32_t ni, int32_t nj, int32_t nk,
    int32_t band, int32_t ti, int32_t tj, int32_t tk,
    int32_t prune,
    int64_t* counts,  // pass-1 per-tile counts; clobbered
    int64_t K,
    int32_t* active_ids, int32_t* cand, uint8_t* valid,
    char* err, int errlen) {
  (void)nv;
  const BinDims bd = {
      {ni, nj, nk}, {ti, tj, tk},
      (ni + ti - 1) / ti, (nj + tj - 1) / tj, (nk + tk - 1) / tk, 0};
  const int64_t T = bd.nti * bd.ntj * bd.ntk;

  // tile -> row index (ascending tile id)
  std::vector<int64_t> row(T, -1);
  int64_t a = 0;
  for (int64_t i = 0; i < T; ++i) {
    if (counts[i] > 0) {
      if (counts[i] > K) {
        set_err(err, errlen, "K smaller than a tile's candidate count");
        return 2;
      }
      row[i] = a;
      active_ids[a] = static_cast<int32_t>(i);
      ++a;
    }
  }

  const int nth = pick_threads(nt);
  // per-chunk per-tile counts -> exclusive per-chunk write offsets: chunk
  // order equals triangle order, so the parallel fill reproduces the
  // serial ascending-triangle candidate order exactly
  std::vector<int32_t> chunk_off(static_cast<size_t>(nth) * T, 0);
  if (nth > 1) {
    std::vector<std::thread> pool;
    for (int c = 0; c < nth; ++c) {
      const int64_t t0 = nt * c / nth, t1 = nt * (c + 1) / nth;
      pool.emplace_back(count_chunk, verts, tris, origin, dx, band, prune,
                        std::cref(bd), t0, t1, chunk_off.data() + c * T);
    }
    for (auto& th : pool) th.join();
    for (int64_t i = 0; i < T; ++i) {
      int32_t base = 0;
      for (int c = 0; c < nth; ++c) {
        const int32_t n = chunk_off[static_cast<size_t>(c) * T + i];
        chunk_off[static_cast<size_t>(c) * T + i] = base;
        base += n;
      }
    }
  }

  auto fill_chunk = [&](int64_t t0, int64_t t1, int32_t* cursor) {
    for (int64_t t = t0; t < t1; ++t) {
      TriGeom g;
      tri_geom(verts, tris + t * 3, origin, dx, &g);
      int64_t tlo[3], thi[3];
      tri_window(g, band, bd, tlo, thi);
      for (int64_t i = tlo[0]; i <= thi[0]; ++i)
        for (int64_t j = tlo[1]; j <= thi[1]; ++j)
          for (int64_t k = tlo[2]; k <= thi[2]; ++k) {
            if (prune && !keep_tile(g, bd.tile, bd.dims, i, j, k, band))
              continue;
            const int64_t lin = (i * bd.ntj + j) * bd.ntk + k;
            const int64_t r = row[lin];
            const int64_t pos = cursor[lin]++;
            cand[r * K + pos] = static_cast<int32_t>(t);
            valid[r * K + pos] = 1;
          }
    }
  };

  if (nth == 1) {
    std::vector<int32_t> cursor(T, 0);
    fill_chunk(0, nt, cursor.data());
  } else {
    std::vector<std::thread> pool;
    for (int c = 0; c < nth; ++c) {
      const int64_t t0 = nt * c / nth, t1 = nt * (c + 1) / nth;
      pool.emplace_back(fill_chunk, t0, t1, chunk_off.data() + c * T);
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
