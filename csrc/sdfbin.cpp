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
#include <vector>

namespace {

void set_err(char* err, int errlen, const char* msg) {
  if (err && errlen > 0) {
    std::strncpy(err, msg, errlen - 1);
    err[errlen - 1] = '\0';
  }
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
    int64_t* counts,  // (nti*ntj*ntk,) zeros on entry
    int64_t* out_active, int64_t* out_kmax,
    char* err, int errlen) {
  (void)nv;
  if (ni <= 0 || nj <= 0 || nk <= 0 || ti <= 0 || tj <= 0 || tk <= 0) {
    set_err(err, errlen, "invalid dims");
    return 1;
  }
  const int64_t nti = (ni + ti - 1) / ti;
  const int64_t ntj = (nj + tj - 1) / tj;
  const int64_t ntk = (nk + tk - 1) / tk;

  for (int64_t t = 0; t < nt; ++t) {
    double fmin[3] = {1e300, 1e300, 1e300};
    double fmax[3] = {-1e300, -1e300, -1e300};
    for (int v = 0; v < 3; ++v) {
      const uint32_t vi = tris[t * 3 + v];
      for (int ax = 0; ax < 3; ++ax) {
        const double f =
            (static_cast<double>(verts[vi * 3 + ax]) - origin[ax]) / dx;
        if (f < fmin[ax]) fmin[ax] = f;
        if (f > fmax[ax]) fmax[ax] = f;
      }
    }
    // reference window: clamp(int(min)-band, 0, n-1) ..
    // clamp(int(max)+band+1, 0, n-1), int() = C truncation
    const int64_t dims[3] = {ni, nj, nk};
    const int64_t tile[3] = {ti, tj, tk};
    int64_t tlo[3], thi[3];
    for (int ax = 0; ax < 3; ++ax) {
      int64_t lo = static_cast<int64_t>(std::trunc(fmin[ax])) - band;
      int64_t hi = static_cast<int64_t>(std::trunc(fmax[ax])) + band + 1;
      if (lo < 0) lo = 0;
      if (lo > dims[ax] - 1) lo = dims[ax] - 1;
      if (hi < 0) hi = 0;
      if (hi > dims[ax] - 1) hi = dims[ax] - 1;
      tlo[ax] = lo / tile[ax];
      thi[ax] = hi / tile[ax];
    }
    for (int64_t a = tlo[0]; a <= thi[0]; ++a)
      for (int64_t b = tlo[1]; b <= thi[1]; ++b)
        for (int64_t c2 = tlo[2]; c2 <= thi[2]; ++c2)
          counts[(a * ntj + b) * ntk + c2] += 1;
  }

  int64_t active = 0, kmax = 0;
  const int64_t T = nti * ntj * ntk;
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
    int64_t* counts,  // pass-1 per-tile counts; clobbered
    int64_t K,
    int32_t* active_ids, int32_t* cand, uint8_t* valid,
    char* err, int errlen) {
  (void)nv;
  const int64_t nti = (ni + ti - 1) / ti;
  const int64_t ntj = (nj + tj - 1) / tj;
  const int64_t ntk = (nk + tk - 1) / tk;
  const int64_t T = nti * ntj * ntk;

  // tile -> row index (ascending tile id), counts[] -> fill cursor
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
      counts[i] = 0;  // becomes the per-tile fill cursor
    }
  }

  for (int64_t t = 0; t < nt; ++t) {
    double fmin[3] = {1e300, 1e300, 1e300};
    double fmax[3] = {-1e300, -1e300, -1e300};
    for (int v = 0; v < 3; ++v) {
      const uint32_t vi = tris[t * 3 + v];
      for (int ax = 0; ax < 3; ++ax) {
        const double f =
            (static_cast<double>(verts[vi * 3 + ax]) - origin[ax]) / dx;
        if (f < fmin[ax]) fmin[ax] = f;
        if (f > fmax[ax]) fmax[ax] = f;
      }
    }
    const int64_t dims[3] = {ni, nj, nk};
    const int64_t tile[3] = {ti, tj, tk};
    int64_t tlo[3], thi[3];
    for (int ax = 0; ax < 3; ++ax) {
      int64_t lo = static_cast<int64_t>(std::trunc(fmin[ax])) - band;
      int64_t hi = static_cast<int64_t>(std::trunc(fmax[ax])) + band + 1;
      if (lo < 0) lo = 0;
      if (lo > dims[ax] - 1) lo = dims[ax] - 1;
      if (hi < 0) hi = 0;
      if (hi > dims[ax] - 1) hi = dims[ax] - 1;
      tlo[ax] = lo / tile[ax];
      thi[ax] = hi / tile[ax];
    }
    for (int64_t i = tlo[0]; i <= thi[0]; ++i)
      for (int64_t j = tlo[1]; j <= thi[1]; ++j)
        for (int64_t k = tlo[2]; k <= thi[2]; ++k) {
          const int64_t lin = (i * ntj + j) * ntk + k;
          const int64_t r = row[lin];
          const int64_t pos = counts[lin]++;
          cand[r * K + pos] = static_cast<int32_t>(t);
          valid[r * K + pos] = 1;
        }
  }
  return 0;
}

}  // extern "C"
