// Native (C++) reference backend for the PDGN point ops, exposed to JAX as
// XLA FFI custom calls on the CPU platform.
//
// This is the TPU-framework equivalent of the reference's native layer:
// lib/pointops/src (pointops_cuda: knnquery, grouping, furthest point
// sampling) and evaluation/pytorch_structural_losses (nndistance /
// approxmatch). The algorithms reproduce those kernels' exact semantics
// (insertion-sort kNN with first-seen tie-breaking, FPS from index 0,
// the 9-round approxmatch balancing with its integer-division
// multipliers) in portable scalar C++ so they serve as
//   * bit-level oracles for the XLA/Pallas compute paths, and
//   * a host-side fallback for exactness debugging.
//
// Registered handlers (all CPU, row-major f32 buffers):
//   pdgn_knnquery     (xyz (b,n,3), new_xyz (b,m,3)) -> idx (b,m,k) s32,
//                                                       dist2 (b,m,k) f32
//   pdgn_nndistance   (x (b,n,3), y (b,m,3)) -> dl (b,n), dr (b,m)
//   pdgn_approxmatch  (x1 (b,n,3), x2 (b,m,3)) -> cost (b,)
//   pdgn_fps          (xyz (b,n,3)) -> idx (b,m) s32   [m from out shape]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

inline float Sq(float v) { return v * v; }

inline float Dist2(const float* a, const float* b) {
  return Sq(a[0] - b[0]) + Sq(a[1] - b[1]) + Sq(a[2] - b[2]);
}

// ---------------------------------------------------------------- knnquery
ffi::Error KnnQueryImpl(ffi::Buffer<ffi::F32> xyz,
                        ffi::Buffer<ffi::F32> new_xyz,
                        ffi::ResultBuffer<ffi::S32> idx,
                        ffi::ResultBuffer<ffi::F32> dist2) {
  const auto xd = xyz.dimensions();
  const auto od = idx->dimensions();
  const int64_t b = xd[0], n = xd[1];
  const int64_t m = od[1], k = od[2];
  const float* xp = xyz.typed_data();
  const float* qp = new_xyz.typed_data();
  int32_t* ip = idx->typed_data();
  float* dp = dist2->typed_data();

  std::vector<double> best(k);
  std::vector<int32_t> besti(k);
  for (int64_t bi = 0; bi < b; ++bi) {
    const float* xb = xp + bi * n * 3;
    for (int64_t mi = 0; mi < m; ++mi) {
      const float* q = qp + (bi * m + mi) * 3;
      std::fill(best.begin(), best.end(), 1e40);
      std::fill(besti.begin(), besti.end(), 0);
      for (int64_t p = 0; p < n; ++p) {
        const float d2 = Dist2(q, xb + p * 3);
        // insertion sort with strict '<': first-seen index wins on ties,
        // matching knnquery_cuda_kernel.cu:32-42
        for (int64_t j = 0; j < k; ++j) {
          if (d2 < best[j]) {
            for (int64_t t = k - 1; t > j; --t) {
              best[t] = best[t - 1];
              besti[t] = besti[t - 1];
            }
            best[j] = d2;
            besti[j] = static_cast<int32_t>(p);
            break;
          }
        }
      }
      for (int64_t j = 0; j < k; ++j) {
        ip[(bi * m + mi) * k + j] = besti[j];
        dp[(bi * m + mi) * k + j] = static_cast<float>(best[j]);
      }
    }
  }
  return ffi::Error::Success();
}

// -------------------------------------------------------------- nndistance
ffi::Error NnDistanceImpl(ffi::Buffer<ffi::F32> x, ffi::Buffer<ffi::F32> y,
                          ffi::ResultBuffer<ffi::F32> dl,
                          ffi::ResultBuffer<ffi::F32> dr) {
  const auto xd = x.dimensions();
  const auto yd = y.dimensions();
  const int64_t b = xd[0], n = xd[1], m = yd[1];
  const float* xp = x.typed_data();
  const float* yp = y.typed_data();
  float* dlp = dl->typed_data();
  float* drp = dr->typed_data();

  for (int64_t bi = 0; bi < b; ++bi) {
    const float* xb = xp + bi * n * 3;
    const float* yb = yp + bi * m * 3;
    for (int64_t i = 0; i < n; ++i) {
      float best = Dist2(xb + i * 3, yb);
      for (int64_t j = 1; j < m; ++j)
        best = std::min(best, Dist2(xb + i * 3, yb + j * 3));
      dlp[bi * n + i] = best;
    }
    for (int64_t j = 0; j < m; ++j) {
      float best = Dist2(yb + j * 3, xb);
      for (int64_t i = 1; i < n; ++i)
        best = std::min(best, Dist2(yb + j * 3, xb + i * 3));
      drp[bi * m + j] = best;
    }
  }
  return ffi::Error::Success();
}

// ------------------------------------------------------------- approxmatch
ffi::Error ApproxMatchImpl(ffi::Buffer<ffi::F32> x1, ffi::Buffer<ffi::F32> x2,
                           ffi::ResultBuffer<ffi::F32> cost) {
  const auto d1 = x1.dimensions();
  const auto d2 = x2.dimensions();
  const int64_t b = d1[0], n = d1[1], m = d2[1];
  const float* p1 = x1.typed_data();
  const float* p2 = x2.typed_data();
  float* cp = cost->typed_data();

  // integer-division multipliers, matching approxmatch.cu:6-12
  const float multiL = (n >= m) ? 1.0f : static_cast<float>(m / n);
  const float multiR = (n >= m) ? static_cast<float>(n / m) : 1.0f;

  std::vector<double> remainL(n), remainR(m), ratioL(n), ratioR(m);
  std::vector<double> D(n * m), K(n * m);
  std::vector<double> match(n * m);

  for (int64_t bi = 0; bi < b; ++bi) {
    const float* a = p1 + bi * n * 3;
    const float* c = p2 + bi * m * 3;
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < m; ++j)
        D[i * m + j] = Dist2(a + i * 3, c + j * 3);
    std::fill(match.begin(), match.end(), 0.0);
    std::fill(remainL.begin(), remainL.end(), multiL);
    std::fill(remainR.begin(), remainR.end(), multiR);

    for (int j = 7; j > -2; --j) {
      const double level = -std::pow(4.0, j);
      for (int64_t t = 0; t < n * m; ++t) K[t] = std::exp(level * D[t]);
      // pass 1
      for (int64_t i = 0; i < n; ++i) {
        double suml = 1e-9;
        for (int64_t l = 0; l < m; ++l) suml += K[i * m + l] * remainR[l];
        ratioL[i] = remainL[i] / suml;
      }
      // pass 2
      for (int64_t l = 0; l < m; ++l) {
        double sumr = 0.0;
        for (int64_t i = 0; i < n; ++i) sumr += K[i * m + l] * ratioL[i];
        sumr *= remainR[l];
        const double consumption = std::min(remainR[l] / (sumr + 1e-9), 1.0);
        ratioR[l] = consumption * remainR[l];
        remainR[l] = std::max(0.0, remainR[l] - sumr);
      }
      // pass 3
      for (int64_t i = 0; i < n; ++i) {
        double suml = 0.0;
        for (int64_t l = 0; l < m; ++l) {
          const double w = K[i * m + l] * ratioL[i] * ratioR[l];
          match[i * m + l] += w;
          suml += w;
        }
        remainL[i] = std::max(0.0, remainL[i] - suml);
      }
    }
    double total = 0.0;
    for (int64_t i = 0; i < n; ++i)
      for (int64_t l = 0; l < m; ++l)
        total += match[i * m + l] * std::sqrt(D[i * m + l]);
    cp[bi] = static_cast<float>(total);
  }
  return ffi::Error::Success();
}

// -------------------------------------------------------------------- fps
ffi::Error FpsImpl(ffi::Buffer<ffi::F32> xyz,
                   ffi::ResultBuffer<ffi::S32> idx) {
  const auto xd = xyz.dimensions();
  const auto od = idx->dimensions();
  const int64_t b = xd[0], n = xd[1], m = od[1];
  const float* xp = xyz.typed_data();
  int32_t* ip = idx->typed_data();

  std::vector<float> mind2(n);
  for (int64_t bi = 0; bi < b; ++bi) {
    const float* xb = xp + bi * n * 3;
    std::fill(mind2.begin(), mind2.end(), 1e10f);
    int64_t last = 0;
    ip[bi * m + 0] = 0;
    for (int64_t s = 1; s < m; ++s) {
      float bestv = -1.0f;
      int64_t besti = 0;
      for (int64_t p = 0; p < n; ++p) {
        mind2[p] = std::min(mind2[p], Dist2(xb + p * 3, xb + last * 3));
        if (mind2[p] > bestv) {
          bestv = mind2[p];
          besti = p;
        }
      }
      last = besti;
      ip[bi * m + s] = static_cast<int32_t>(besti);
    }
  }
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    PdgnKnnQuery, KnnQueryImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::S32>>()
        .Ret<ffi::Buffer<ffi::F32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    PdgnNnDistance, NnDistanceImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    PdgnApproxMatch, ApproxMatchImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    PdgnFps, FpsImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::S32>>());
