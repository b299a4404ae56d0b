// Standalone C++ oracle for the dense-registration metric paths (spherical
// and pinhole).
//
// Purpose (PARITY_AUDIT.md): break the self-reference of the repo's parity
// chain.  tests/ref_impl.py and tests/golden_ref.py are NumPy restatements of
// the reference written by the same author as the JAX pipeline; a
// transcription error made twice would be invisible.  This file is an
// INDEPENDENT C++ implementation of the same scalar semantics, re-derived
// statement-by-statement from the reference source in a fresh read
// (reference /root/reference/include/RegisterPhotoICP.h:2545-2739
// errorPhotoICP_sphere, :2745-3228 calcHessGrad_sphere, :4519-4784
// alignFrames360, :543-554 weightHuber; constants from the ctor :201-221;
// pinhole path :560-775 errorPhotoICP, :776-1100 calcHessGrad with its
// LUT built per alignFrames :4272-4299; occlusion error variants
// :3232-3370 errorPhotoICP_sphereOcc1 and :3720-3860 _sphereOcc2).
// It executes as real C++ with the reference's float arithmetic (or double,
// selectable at runtime) so the Python oracles can be gated against a
// compiled, independently-running program.
//
// No third-party dependencies: 3-vectors and the 6x6 system are plain
// arrays.  This is a test oracle, not product code.
//
// Input: a flat little-endian binary stream on argv[1] (see pack() in
// tools/cpp_oracle.py).  Output: text on stdout, one "key v1 v2 ..." per
// line.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Params {
  double min_depth, max_depth, std_photo, std_depth, thres_sal_int,
      thres_sal_depth;
};

struct Level {
  int h, w;
  std::vector<float> gray_src, depth_src, gray_trg, depth_trg, ggx, ggy, dgx,
      dgy;
};

// round() semantics of C round(): half away from zero.
inline int iround(double x) { return (int)std::lround(x); }

// reference :543-554
template <typename T>
inline T weight_huber(T err, T reg) {
  T e = std::fabs(err);
  if (e < reg) return (T)1;
  return std::sqrt((T)2 * reg * e - reg * reg) / e;
}

// 3x3 * 3 + 3, all in T
template <typename T>
inline void transform_point(const T R[9], const T t[3], const T p[3],
                            T out[3]) {
  for (int r = 0; r < 3; ++r)
    out[r] = R[3 * r] * p[0] + R[3 * r + 1] * p[1] + R[3 * r + 2] * p[2] + t[r];
}

// Per-sweep accumulators; H stored dense 6x6, accumulated in T like the
// reference's 21-scalar float reduction (:3117-3194).
template <typename T>
struct Sweep {
  double error2 = 0.0;
  long n_valid = 0;
  long n_visible = 0;
  T H[36] = {0};
  T g[6] = {0};
};

// One fused pass replicating BOTH errorPhotoICP_sphere and
// calcHessGrad_sphere at a fixed pose.  want_grad toggles the Jacobian/H/g
// part; the residual/count part always matches errorPhotoICP_sphere
// (:2545-2739).  The two reference functions share their control flow
// exactly (same validity, projection, bounds and saliency tests), which is
// what makes the fusion faithful; the only divergence — numVisiblePixels is
// counted pre-saliency in calcHessGrad (:2991) while numValidPts is counted
// post-saliency in the error function (:2709,:2729) — is preserved below.
template <typename T>
void sweep(const Level& lv, const Params& pp, const float pose[16], int method,
           bool want_grad, Sweep<T>* out) {
  const int h = lv.h, w = lv.w;
  const T angle_res = (T)(2.0 * M_PI) / (T)w;
  const T angle_res_inv = (T)1 / angle_res;
  const T half_rows = (T)0.5 * (T)h - (T)0.5;
  const T std_photo = (T)pp.std_photo, std_depth = (T)pp.std_depth;
  const double std_photo_inv_d = 1.0 / pp.std_photo;  // double in :2561
  const T std_photo_inv = (T)1 / std_photo;           // float in :2774
  const T thres_si = (T)pp.thres_sal_int, thres_sd = (T)pp.thres_sal_depth;

  T R[9], t[3];
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) R[3 * r + c] = (T)pose[4 * r + c];
    t[r] = (T)pose[4 * r + 3];
  }

  // LUT_xyz_sphere build (:4553-4587): theta/phi tables in T, valid =
  // min_depth < d < max_depth.
  for (int row = 0; row < h; ++row) {
    const T phi = (half_rows - (T)row) * angle_res;
    const T sin_phi = std::sin(phi), cos_phi = std::cos(phi);
    for (int col = 0; col < w; ++col) {
      const int i = row * w + col;
      const T d1 = (T)lv.depth_src[i];
      if (!((T)pp.min_depth < d1 && d1 < (T)pp.max_depth)) continue;
      const T theta = (T)col * angle_res;
      const T xyz[3] = {d1 * sin_phi, -d1 * cos_phi * std::sin(theta),
                        -d1 * cos_phi * std::cos(theta)};
      T p[3];
      transform_point(R, t, xyz, p);
      const T dist = std::sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2]);
      const T dist_inv = (T)1 / dist;
      const T phi_trg = std::asin(p[0] * dist_inv);
      const T theta_trg = std::atan2(p[1], p[2]) + (T)M_PI;
      const int ri = iround(half_rows - phi_trg * angle_res_inv);
      const int ci = iround(theta_trg * angle_res_inv);
      // bounds test :2684 — note the reference checks ci < w but only
      // asserts ci >= 0 (atan2+pi makes it non-negative); we keep the
      // >= 0 check for safety against -0.5 rounding.
      if (!(ri >= 0 && ri < h && ci >= 0 && ci < w)) continue;
      const int j = ri * w + ci;
      ++out->n_visible;  // :2991 pre-saliency

      // Jacobians (:2995-3026), only needed when want_grad.
      T jw[12];  // 2x6 warp Jacobian rows: (theta=col, phi=row)
      if (want_grad) {
        // jacobianT36 = [I | -skew(p)]; jacobianProj23 * jacobianT36.
        const T z_inv = (T)1 / p[2];
        const T z_inv2 = z_inv * z_inv;
        const T d_atan = (T)1 / ((T)1 + p[1] * p[1] * z_inv2) * angle_res_inv;
        const T jt[3] = {(T)0, d_atan * z_inv, -p[1] * z_inv2 * d_atan};
        const T dist_inv2 = dist_inv * dist_inv;
        const T x_d2 = p[0] * dist_inv2;
        const T d_asin =
            (T)1 / std::sqrt((T)1 - p[0] * x_d2) * angle_res_inv;
        const T jp[3] = {-d_asin * dist_inv * ((T)1 - p[0] * x_d2),
                         d_asin * x_d2 * p[1] * dist_inv,
                         d_asin * x_d2 * p[2] * dist_inv};
        // rows of [jrow] @ [I | -skew(p)]:
        //   cols 0..2: jrow itself;  cols 3..5: jrow x p  (since
        //   -skew(p) applied on the right gives cross products)
        const T rows[2][3] = {{jt[0], jt[1], jt[2]}, {jp[0], jp[1], jp[2]}};
        for (int k = 0; k < 2; ++k) {
          jw[6 * k + 0] = rows[k][0];
          jw[6 * k + 1] = rows[k][1];
          jw[6 * k + 2] = rows[k][2];
          // v @ -skew(p) = (v2*p1 - v1*p2, v0*p2 - v2*p0, v1*p0 - v0*p1)
          jw[6 * k + 3] = rows[k][2] * p[1] - rows[k][1] * p[2];
          jw[6 * k + 4] = rows[k][0] * p[2] - rows[k][2] * p[0];
          jw[6 * k + 5] = rows[k][1] * p[0] - rows[k][0] * p[1];
        }
      }

      if (method == 0 || method == 2) {
        const T gx = (T)lv.ggx[j], gy = (T)lv.ggy[j];
        // :2690-2692 / :3038 — photo-saliency failure skips the depth
        // term too ("continue").
        if (std::fabs(gx) < thres_si && std::fabs(gy) < thres_si) continue;
        const T diff = (T)lv.gray_trg[j] - (T)lv.gray_src[i];
        // :2699 double weight in the error path, :3047 float in hess path.
        const double w_photo_d = (double)weight_huber(diff, std_photo) *
                                 std_photo_inv_d;
        const T werr = (T)(w_photo_d * (double)diff);
        out->error2 += (double)werr * (double)werr;
        ++out->n_valid;
        if (want_grad) {
          const T w_photo = weight_huber(diff, std_photo) * std_photo_inv;
          T jac[6];
          for (int k = 0; k < 6; ++k)
            jac[k] = w_photo * (gx * jw[k] + gy * jw[6 + k]);
          const T werr_f = w_photo * diff;
          for (int a = 0; a < 6; ++a) {
            for (int b = a; b < 6; ++b) out->H[6 * a + b] += jac[a] * jac[b];
            out->g[a] += jac[a] * werr_f;
          }
        }
      }
      if (method == 1 || method == 2) {
        const T depth2 = (T)lv.depth_trg[j];
        if (!std::isfinite(depth2)) continue;  // plain if in :3064; the
        // error path (:2714) also just skips — but a continue here only
        // matters if code followed this block, and nothing does.
        const T dgx = (T)lv.dgx[j], dgy = (T)lv.dgy[j];
        if (std::fabs(dgx) < thres_sd && std::fabs(dgy) < thres_sd) continue;
        const T ddiff = depth2 - dist;
        const T reg = std_depth * depth2;  // :2724 stdDev scaled by depth2
        const T w_depth = weight_huber(ddiff, reg) / reg;
        const T werr = w_depth * ddiff;
        out->error2 += (double)werr * (double)werr;
        ++out->n_valid;
        if (want_grad) {
          // jacobianDepthSrc = p*dist_inv (1x3) through [I | -skew(p)];
          // note (p*dist_inv) x p == 0, so cols 3..5 of that term vanish
          // analytically — keep the explicit form anyway to mirror the
          // reference arithmetic.
          const T v[3] = {p[0] * dist_inv, p[1] * dist_inv, p[2] * dist_inv};
          T jd[6];
          jd[0] = v[0];
          jd[1] = v[1];
          jd[2] = v[2];
          jd[3] = v[2] * p[1] - v[1] * p[2];
          jd[4] = v[0] * p[2] - v[2] * p[0];
          jd[5] = v[1] * p[0] - v[0] * p[1];
          T jac[6];
          for (int k = 0; k < 6; ++k)
            jac[k] = w_depth * (dgx * jw[k] + dgy * jw[6 + k] - jd[k]);
          for (int a = 0; a < 6; ++a) {
            for (int b = a; b < 6; ++b) out->H[6 * a + b] += jac[a] * jac[b];
            out->g[a] += jac[a] * werr;
          }
        }
      }
    }
  }
  // mirror lower triangle
  for (int a = 0; a < 6; ++a)
    for (int b = 0; b < a; ++b) out->H[6 * a + b] = out->H[6 * b + a];
}

// ---------------------------------------------------------------------------
// Occlusion error variants (errorPhotoICP_sphereOcc1 :3232-3370,
// errorPhotoICP_sphereOcc2 :3720-3860).  Sequential transcription — the
// reference body is an OpenMP loop whose z-buffer reads/writes race; the
// single-thread source-pixel order below is its deterministic serial
// execution (the same order tests/ref_impl.py::error_sphere_occ runs in).
//
// Occ1: per-target-pixel invDepthBuffer; a point is skipped iff an earlier
// point on the same target pixel was STRICTLY closer (:3300-3304), else it
// overwrites the buffer.  Residual slots are keyed by TARGET pixel
// (:3322/:3339 — a closer arrival overwrites a displaced point's slot);
// counts increment per accepted-at-processing-time contribution and are
// never rolled back (:3326/:3342).
//
// Occ2: the depth-outlier filter |depth2 - dist| > thres_outliers runs
// BEFORE the buffer write (:3789-3792 — an outlier never displaces a clean
// point; NaN depth2 passes, fabs(NaN) > t being false), then the same
// z-buffer, then ++nValidDepthPts unconditionally pre-saliency (:3802).
// Residual slots are keyed by SOURCE pixel (:3816/:3832 — displaced points
// keep their slots in the sums), and avPhotoResidual divides by the single
// depth count (:3852-3853); both returned counts are that one value.

template <typename T>
struct OccSweep {
  double photo_err2 = 0.0, depth_err2 = 0.0;
  long n_photo = 0, n_depth = 0;
};

template <typename T>
void sweep_occ(const Level& lv, const Params& pp, const float pose[16],
               int method, int occ, double thres_outliers, OccSweep<T>* out) {
  const int h = lv.h, w = lv.w;
  const T angle_res = (T)(2.0 * M_PI) / (T)w;
  const T angle_res_inv = (T)1 / angle_res;
  const T half_rows = (T)0.5 * (T)h - (T)0.5;
  const T std_photo = (T)pp.std_photo, std_depth = (T)pp.std_depth;
  const double std_photo_inv_d = 1.0 / pp.std_photo;  // double in :3747
  const T thres_si = (T)pp.thres_sal_int, thres_sd = (T)pp.thres_sal_depth;
  const T thres_out = (T)thres_outliers;

  T R[9], t[3];
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) R[3 * r + c] = (T)pose[4 * r + c];
    t[r] = (T)pose[4 * r + 3];
  }

  // Eigen::VectorXf::Zero(imgSize) in the reference (:3246-3248) — float
  // slots there; T here so the double build is the all-f64 semantic oracle.
  std::vector<T> res_photo((size_t)h * w, (T)0), res_depth((size_t)h * w, (T)0),
      inv_buf((size_t)h * w, (T)0);

  for (int row = 0; row < h; ++row) {
    const T phi = (half_rows - (T)row) * angle_res;
    const T sin_phi = std::sin(phi), cos_phi = std::cos(phi);
    for (int col = 0; col < w; ++col) {
      const int i = row * w + col;
      const T d1 = (T)lv.depth_src[i];
      if (!((T)pp.min_depth < d1 && d1 < (T)pp.max_depth)) continue;
      const T theta = (T)col * angle_res;
      const T xyz[3] = {d1 * sin_phi, -d1 * cos_phi * std::sin(theta),
                        -d1 * cos_phi * std::cos(theta)};
      T p[3];
      transform_point(R, t, xyz, p);
      const T dist = std::sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2]);
      const T dist_inv = (T)1 / dist;
      const T phi_trg = std::asin(p[0] * dist_inv);
      const T theta_trg = std::atan2(p[1], p[2]) + (T)M_PI;
      const int ri = iround(half_rows - phi_trg * angle_res_inv);
      const int ci = iround(theta_trg * angle_res_inv);
      if (!(ri >= 0 && ri < h && ci >= 0 && ci < w)) continue;
      const int j = ri * w + ci;
      if (occ >= 2) {
        // :3789-3792 — outlier filter BEFORE the buffer write
        const T depth2 = (T)lv.depth_trg[j];
        const T ddiff = depth2 - dist;
        if (std::fabs(ddiff) > thres_out) continue;
      }
      if (inv_buf[j] > (T)0 && dist_inv < inv_buf[j]) continue;  // occluded
      inv_buf[j] = dist_inv;
      if (occ >= 2) ++out->n_depth;  // :3802 pre-saliency, pre-method
      if (method == 0 || method == 2) {
        const T gx = (T)lv.ggx[j], gy = (T)lv.ggy[j];
        if (std::fabs(gx) < thres_si && std::fabs(gy) < thres_si) continue;
        const T diff = (T)lv.gray_trg[j] - (T)lv.gray_src[i];
        const double wp = (double)weight_huber(diff, std_photo) * std_photo_inv_d;
        const T werr = (T)(wp * (double)diff);
        res_photo[occ == 1 ? j : i] = werr * werr;
        if (occ == 1) ++out->n_photo;  // :3326 never rolled back
      }
      if (method == 1 || method == 2) {
        const T depth2 = (T)lv.depth_trg[j];
        if (!std::isfinite(depth2)) continue;
        const T dgx = (T)lv.dgx[j], dgy = (T)lv.dgy[j];
        if (std::fabs(dgx) < thres_sd && std::fabs(dgy) < thres_sd) continue;
        const T ddiff = depth2 - dist;
        const T reg = std_depth * depth2;
        const T wd = weight_huber(ddiff, reg) / reg;
        const T werr = wd * ddiff;
        res_depth[occ == 1 ? j : i] = werr * werr;
        if (occ == 1) ++out->n_depth;
      }
    }
  }
  // second accumulation loop (:3348-3357 / :3839-3848), double reduction
  for (size_t k = 0; k < res_photo.size(); ++k) {
    out->photo_err2 += (double)res_photo[k];
    out->depth_err2 += (double)res_depth[k];
  }
  if (occ >= 2) out->n_photo = out->n_depth;  // :3852-3853 single count
}

// ---------------------------------------------------------------------------
// Pinhole metric path (errorPhotoICP :560-775 / calcHessGrad :776-1100).
//
// Unlike the spherical pair, the two pinhole functions do NOT share control
// flow: the ERROR function has no saliency tests at all, while calcHessGrad
// gates the photo term (:1031-1033) and the depth term (:1058-1060) and
// couples them — both `continue`s sit before the shared accumulation block
// (:1081-1103), so in PHOTO_DEPTH a failed depth-saliency test also drops
// the pixel's PHOTO contribution from H/g (but never from the error sums).
// The fused loop below therefore carries separate, independently-gated
// accumulators for the error stats and for H/g.

template <typename T>
struct PinholeSweep {
  double photo_err2 = 0.0, depth_err2 = 0.0;  // double reductions :562-565
  long n_photo = 0, n_depth = 0;
  T H[36] = {0};
  T g[6] = {0};
};

// kf[4] = full-resolution {fx, fy, ox, oy}; scaled by 2^-level as in
// :570-575 (error) / :786-791 (hessgrad) / :4274-4279 (LUT).
template <typename T>
void sweep_pinhole(const Level& lv, const Params& pp, const float pose[16],
                   const double kf[4], int level, int method,
                   PinholeSweep<T>* out) {
  const int h = lv.h, w = lv.w;
  const T scale = (T)1 / (T)std::pow((T)2, level);
  const T fx = (T)kf[0] * scale, fy = (T)kf[1] * scale;
  const T ox = (T)kf[2] * scale, oy = (T)kf[3] * scale;
  const T inv_fx = (T)1 / fx, inv_fy = (T)1 / fy;
  const T std_photo = (T)pp.std_photo, std_depth = (T)pp.std_depth;
  const T std_photo_inv = (T)1 / std_photo;  // float in :582-583
  const T thres_si = (T)pp.thres_sal_int, thres_sd = (T)pp.thres_sal_depth;

  T R[9], t[3];
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) R[3 * r + c] = (T)pose[4 * r + c];
    t[r] = (T)pose[4 * r + 3];
  }

  for (int row = 0; row < h; ++row) {
    for (int col = 0; col < w; ++col) {
      const int i = row * w + col;
      // LUT_xyz build (:4281-4299): valid iff minDepth < z < maxDepth,
      // x = (c-ox)*z*inv_fx, y = (r-oy)*z*inv_fy.
      const T z1 = (T)lv.depth_src[i];
      if (!((T)pp.min_depth < z1 && z1 < (T)pp.max_depth)) continue;
      const T xyz[3] = {((T)col - ox) * z1 * inv_fx,
                        ((T)row - oy) * z1 * inv_fy, z1};
      T p[3];
      transform_point(R, t, xyz, p);
      // projection (:703-709 / :984-990): x*fx*inv_z + ox, y*fy*inv_z + oy;
      // NO behind-camera guard in the reference.
      const T inv_z = (T)1 / p[2];
      const int ci = iround((double)(p[0] * fx * inv_z + ox));
      const int ri = iround((double)(p[1] * fy * inv_z + oy));
      if (!(ri >= 0 && ri < h && ci >= 0 && ci < w)) continue;
      const int j = ri * w + ci;
      const T depth2 = (T)lv.depth_trg[j];

      // ---- error terms (errorPhotoICP :716-753): UNGATED ----
      if (method == 0 || method == 2) {
        const T diff = (T)lv.gray_trg[j] - (T)lv.gray_src[i];
        const T wp = weight_huber(diff, std_photo) * std_photo_inv;
        const T werr = wp * diff;
        out->photo_err2 += (double)werr * (double)werr;
        ++out->n_photo;
      }
      if (method == 1 || method == 2) {
        if (std::isfinite(depth2)) {  // :740 — the only depth gate here
          const T ddiff = depth2 - p[2];
          const T reg = std_depth * p[2];  // :745-746 scaled by WARPED z
          const T wd = weight_huber(ddiff, reg) / reg;
          const T werr = wd * ddiff;
          out->depth_err2 += (double)werr * (double)werr;
          ++out->n_depth;
        }
      }

      // ---- H/g terms (calcHessGrad :984-1103): saliency-gated, coupled ----
      // 2x6 warp jacobian (:996-1015): row 0 = d(col)/dxi (fx terms),
      // row 1 = d(row)/dxi (fy terms); translation block first.
      const T inv_z2 = inv_z * inv_z;
      const T jw[12] = {
          fx * inv_z, (T)0, -fx * p[0] * inv_z2,
          -fx * p[1] * p[0] * inv_z2, fx * ((T)1 + p[0] * p[0] * inv_z2),
          -fx * p[1] * inv_z,
          (T)0, fy * inv_z, -fy * p[1] * inv_z2,
          -fy * ((T)1 + p[1] * p[1] * inv_z2), fy * p[0] * p[1] * inv_z2,
          fy * p[0] * inv_z};
      T jac_photo[6], jac_depth[6];
      T werr_photo = (T)0, werr_depth = (T)0;
      bool have_depth = false;
      if (method == 0 || method == 2) {
        const T gx = (T)lv.ggx[j], gy = (T)lv.ggy[j];
        // :1031-1033 — photo-saliency failure skips the depth H/g too
        if (std::fabs(gx) < thres_si && std::fabs(gy) < thres_si) continue;
        const T diff = (T)lv.gray_trg[j] - (T)lv.gray_src[i];
        const T wp = weight_huber(diff, std_photo) * std_photo_inv;
        werr_photo = wp * diff;
        for (int k = 0; k < 6; ++k)
          jac_photo[k] = wp * (gx * jw[k] + gy * jw[6 + k]);
      }
      if (method == 1 || method == 2) {
        const T dgx = (T)lv.dgx[j], dgy = (T)lv.dgy[j];
        // :1058-1060 — sits BEFORE the isfinite test and before the shared
        // accumulation block, so it also drops the photo contribution
        if (std::fabs(dgx) < thres_sd && std::fabs(dgy) < thres_sd) continue;
        if (std::isfinite(depth2)) {  // :1063-1064
          const T ddiff = depth2 - p[2];
          const T reg = std_depth * p[2];
          const T wd = weight_huber(ddiff, reg) / reg;
          werr_depth = wd * ddiff;
          const T jz[6] = {(T)0, (T)0, (T)1, p[1], -p[0], (T)0};  // :1073-1074
          for (int k = 0; k < 6; ++k)
            jac_depth[k] = wd * (dgx * jw[k] + dgy * jw[6 + k] - jz[k]);
          have_depth = true;
        }
      }
      // shared accumulation (:1081-1103): photo whenever reached, depth
      // only behind its isfinite re-check
      if (method == 0 || method == 2) {
        for (int a = 0; a < 6; ++a) {
          for (int b = a; b < 6; ++b)
            out->H[6 * a + b] += jac_photo[a] * jac_photo[b];
          out->g[a] += jac_photo[a] * werr_photo;
        }
      }
      if (have_depth) {
        for (int a = 0; a < 6; ++a) {
          for (int b = a; b < 6; ++b)
            out->H[6 * a + b] += jac_depth[a] * jac_depth[b];
          out->g[a] += jac_depth[a] * werr_depth;
        }
      }
    }
  }
  for (int a = 0; a < 6; ++a)
    for (int b = 0; b < a; ++b) out->H[6 * a + b] = out->H[6 * b + a];
}

// ---------------------------------------------------------------------------
// Robot-frame sweep (calcPhotoICPError_robot :4905-5082 /
// calcHessianGradient_robot :5083-5270, all-points branch): the camera rides
// a rig with extrinsic poseCamRobot; the optimized twist lives on the ROBOT
// pose.  Warp: q = camRt^-1 * poseGuess * camRt * xyz (:4923-4924); Jacobian
// chain Proj23 @ R_cam^-1 @ [I | -skew(p_robot')] with p_robot' the
// robot-frame warped point (:5163-5167).  NO saliency gates anywhere in the
// active bodies (verified by reading both loops).
//
// Two reference defects are replaced by the internally consistent pair the
// code plainly intends — mirroring ops/photoicp_pinhole.py and
// tests/ref_impl.py::sweep_robot (PARITY_AUDIT.md records the decision):
// the depth residual uses depth2 - z' (the reference subtracts the SOURCE
// depth :5219 while its Jacobian corresponds to the warped z), and
// jacobianRt_z = row 2 of the T36 chain (the reference's :5236-5238 block
// expression is discarded, so its C++ reads uninitialized memory).
// depth2 <= 0 target pixels are excluded (packed-invalid convention).
// camRt^-1 is the rigid-transform transpose inverse, not Eigen's float
// .inverse() — exact for orthonormal R, and what ref_impl computes.

template <typename T>
void sweep_robot(const Level& lv, const Params& pp, const float pose[16],
                 const float cam_rt[16], const double kf[4], int level,
                 int method, PinholeSweep<T>* out) {
  const int h = lv.h, w = lv.w;
  const T scale = (T)1 / (T)std::pow((T)2, level);
  const T fx = (T)kf[0] * scale, fy = (T)kf[1] * scale;
  const T ox = (T)kf[2] * scale, oy = (T)kf[3] * scale;
  const T inv_fx = (T)1 / fx, inv_fy = (T)1 / fy;
  const T std_photo = (T)pp.std_photo, std_depth = (T)pp.std_depth;
  const T std_photo_inv = (T)1 / std_photo;

  T R[9], t[3], Rc[9], tc[3];
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) {
      R[3 * r + c] = (T)pose[4 * r + c];
      Rc[3 * r + c] = (T)cam_rt[4 * r + c];
    }
    t[r] = (T)pose[4 * r + 3];
    tc[r] = (T)cam_rt[4 * r + 3];
  }

  for (int row = 0; row < h; ++row) {
    for (int col = 0; col < w; ++col) {
      const int i = row * w + col;
      const T z1 = (T)lv.depth_src[i];
      if (!((T)pp.min_depth < z1 && z1 < (T)pp.max_depth)) continue;
      const T xyz[3] = {((T)col - ox) * z1 * inv_fx,
                        ((T)row - oy) * z1 * inv_fy, z1};
      T p_robot[3], pr2[3];
      transform_point(Rc, tc, xyz, p_robot);
      transform_point(R, t, p_robot, pr2);
      // q = Rc^T (pr2 - tc)
      T d[3] = {pr2[0] - tc[0], pr2[1] - tc[1], pr2[2] - tc[2]};
      T q[3];
      for (int r = 0; r < 3; ++r)
        q[r] = Rc[r] * d[0] + Rc[3 + r] * d[1] + Rc[6 + r] * d[2];
      const T inv_z = (T)1 / q[2];
      const int ci = iround((double)(q[0] * fx * inv_z + ox));
      const int ri = iround((double)(q[1] * fy * inv_z + oy));
      if (!(ri >= 0 && ri < h && ci >= 0 && ci < w)) continue;
      const int j = ri * w + ci;

      // T36 = Rc^T @ [I | -skew(pr2)]  (:5163-5167)
      T T36[18];
      for (int r = 0; r < 3; ++r) {
        // columns 0..2 of [I | -skew] are identity; -skew(pr2) columns:
        const T sk[3][3] = {{(T)0, pr2[2], -pr2[1]},
                            {-pr2[2], (T)0, pr2[0]},
                            {pr2[1], -pr2[0], (T)0}};
        for (int c = 0; c < 3; ++c) {
          // (Rc^T)[r][k] = Rc[k][r]
          T acc_i = Rc[3 * c + r];  // Rc^T @ I column c
          T acc_s = (T)0;
          for (int k = 0; k < 3; ++k) acc_s += Rc[3 * k + r] * sk[k][c];
          T36[6 * r + c] = acc_i;
          T36[6 * r + 3 + c] = acc_s;
        }
      }
      const T inv_z2 = inv_z * inv_z;
      // jw = Proj23 @ T36
      T jw[12];
      for (int c = 0; c < 6; ++c) {
        jw[c] = fx * inv_z * T36[c] - fx * q[0] * inv_z2 * T36[12 + c];
        jw[6 + c] = fy * inv_z * T36[6 + c] - fy * q[1] * inv_z2 * T36[12 + c];
      }

      if (method == 0 || method == 2) {
        const T diff = (T)lv.gray_trg[j] - (T)lv.gray_src[i];
        const T wp = weight_huber(diff, std_photo) * std_photo_inv;
        const T werr = wp * diff;
        out->photo_err2 += (double)werr * (double)werr;
        ++out->n_photo;
        const T gx = (T)lv.ggx[j], gy = (T)lv.ggy[j];
        T jac[6];
        for (int k = 0; k < 6; ++k) jac[k] = wp * (gx * jw[k] + gy * jw[6 + k]);
        for (int a = 0; a < 6; ++a) {
          for (int b = a; b < 6; ++b) out->H[6 * a + b] += jac[a] * jac[b];
          out->g[a] += jac[a] * werr;
        }
      }
      if (method == 1 || method == 2) {
        const T depth2 = (T)lv.depth_trg[j];
        if (std::isfinite(depth2) && depth2 > (T)0) {
          const T ddiff = depth2 - q[2];
          const T reg = std_depth * q[2];
          const T wd = weight_huber(ddiff, reg) / reg;
          const T werr = wd * ddiff;
          out->depth_err2 += (double)werr * (double)werr;
          ++out->n_depth;
          const T dgx = (T)lv.dgx[j], dgy = (T)lv.dgy[j];
          T jac[6];
          for (int k = 0; k < 6; ++k)
            jac[k] = wd * (dgx * jw[k] + dgy * jw[6 + k] - T36[12 + k]);
          for (int a = 0; a < 6; ++a) {
            for (int b = a; b < 6; ++b) out->H[6 * a + b] += jac[a] * jac[b];
            out->g[a] += jac[a] * werr;
          }
        }
      }
    }
  }
  for (int a = 0; a < 6; ++a)
    for (int b = 0; b < a; ++b) out->H[6 * a + b] = out->H[6 * b + a];
}

template <typename T>
void run_pinhole_sweep(const Level& lv, const Params& pp, const float pose[16],
                       const double kf[4], int level, int method) {
  PinholeSweep<T> s;
  sweep_pinhole<T>(lv, pp, pose, kf, level, method, &s);
  std::printf("perr2 %.12g\nnphoto %ld\nderr2 %.12g\nndepth %ld\n",
              s.photo_err2, s.n_photo, s.depth_err2, s.n_depth);
  std::printf("H");
  for (int a = 0; a < 6; ++a)
    for (int b = a; b < 6; ++b) std::printf(" %.12g", (double)s.H[6 * a + b]);
  std::printf("\ng");
  for (int a = 0; a < 6; ++a) std::printf(" %.12g", (double)s.g[a]);
  std::printf("\n");
}

// ---------------------------------------------------------------------------
// GN driver (alignFrames360 :4519-4784)

// MRPT CPose3D::exp(xi, pseudo_exponential=true): R = expm(skew(omega)),
// t = xi[0:3] directly (no V matrix).  Computed in double as in :4695-4697.
void pseudo_exp(const double xi[6], double T44[16]) {
  const double wx = xi[3], wy = xi[4], wz = xi[5];
  const double th2 = wx * wx + wy * wy + wz * wz;
  const double th = std::sqrt(th2);
  double A, B;
  if (th < 1e-12) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
  }
  // R = I + A*skew(w) + B*skew(w)^2
  const double W[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
  double W2[9];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      W2[3 * r + c] = 0;
      for (int k = 0; k < 3; ++k) W2[3 * r + c] += W[3 * r + k] * W[3 * k + c];
    }
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      T44[4 * r + c] =
          (r == c ? 1.0 : 0.0) + A * W[3 * r + c] + B * W2[3 * r + c];
  T44[3] = xi[0];
  T44[7] = xi[1];
  T44[11] = xi[2];
  T44[12] = T44[13] = T44[14] = 0.0;
  T44[15] = 1.0;
}

void matmul4f(const float A[16], const float B[16], float out[16]) {
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) {
      float s = 0;
      for (int k = 0; k < 4; ++k) s += A[4 * r + k] * B[4 * k + c];
      out[4 * r + c] = s;
    }
}

// Solve update = -H^-1 g with Gauss-Jordan partial pivoting in T
// (reference: Eigen float .inverse() :4693) — genuinely in T: the float
// build must round like the reference's f32 solve, since the GN
// accept/reject cascade is sensitive at last-ulp level (PERF.md) and the
// parity gate asserts exact per-level iteration counts. Returns false if
// singular.
template <typename T>
bool solve6(const T Hin[36], const T g[6], T upd[6]) {
  T M[6][7];
  for (int r = 0; r < 6; ++r) {
    for (int c = 0; c < 6; ++c) M[r][c] = Hin[6 * r + c];
    M[r][6] = -g[r];
  }
  for (int col = 0; col < 6; ++col) {
    int piv = col;
    for (int r = col + 1; r < 6; ++r)
      if (std::fabs((double)M[r][col]) > std::fabs((double)M[piv][col])) piv = r;
    if (std::fabs((double)M[piv][col]) < 1e-30) return false;
    if (piv != col)
      for (int c = 0; c < 7; ++c) std::swap(M[piv][c], M[col][c]);
    const T inv = (T)1 / M[col][col];
    for (int r = 0; r < 6; ++r) {
      if (r == col) continue;
      const T f = M[r][col] * inv;
      for (int c = col; c < 7; ++c) M[r][c] -= f * M[col][c];
    }
  }
  for (int r = 0; r < 6; ++r) upd[r] = M[r][6] / M[r][r];
  return true;
}

// rank(H + lambda*diag(H)) != 6 test (:4682): full-pivot elimination with
// an Eigen-like threshold.
template <typename T>
bool ill_posed(const T Hin[36], double lam) {
  double M[6][6];
  double maxp = 0;
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) {
      M[r][c] = (double)Hin[6 * r + c] +
                (r == c ? lam * (double)Hin[6 * r + c] : 0.0);
      maxp = std::max(maxp, std::fabs(M[r][c]));
    }
  const double eps =
      (sizeof(T) == 4) ? 1.19209290e-07 : 2.220446049250313e-16;
  const double thr = 6.0 * eps * maxp;
  int rank = 0;
  bool used_r[6] = {false}, used_c[6] = {false};
  for (int step = 0; step < 6; ++step) {
    int pr = -1, pc = -1;
    double best = thr;
    for (int r = 0; r < 6; ++r) {
      if (used_r[r]) continue;
      for (int c = 0; c < 6; ++c) {
        if (used_c[c]) continue;
        if (std::fabs(M[r][c]) > best) best = std::fabs(M[r][c]), pr = r,
        pc = c;
      }
    }
    if (pr < 0) break;
    ++rank;
    used_r[pr] = used_c[pc] = true;
    for (int r = 0; r < 6; ++r) {
      if (used_r[r]) continue;
      const double f = M[r][pc] / M[pr][pc];
      for (int c = 0; c < 6; ++c) M[r][c] -= f * M[pr][c];
    }
  }
  return rank != 6;
}

// Seam-gradient masking (:4538-4549): zero 2 columns at each of the 7
// inter-sensor joints on the four TARGET gradient images.
void mask_seams(Level* lv) {
  const int ws = lv->w / 8;
  if (ws <= 0) return;
  for (int sid = 1; sid < 8; ++sid) {
    for (int col = sid * ws - 1; col < sid * ws + 1 && col < lv->w; ++col) {
      if (col < 0) continue;
      for (int r = 0; r < lv->h; ++r) {
        lv->ggx[r * lv->w + col] = 0.f;
        lv->ggy[r * lv->w + col] = 0.f;
        lv->dgx[r * lv->w + col] = 0.f;
        lv->dgy[r * lv->w + col] = 0.f;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Pyramid construction (buildPyramid :292-308 via cv::pyrDown,
// buildPyramidRange :312-354, calcGradientXY :365-398, buildGradientPyramids
// :429-478) — so a mode-4 run re-derives EVERYTHING from the raw full-res
// images: pyramids, gradients, seam masks, LUT, GN loop.

// cv::pyrDown: separable 5-tap binomial (1,4,6,4,1)/16 blur with
// BORDER_REFLECT_101, then sampling at the even pixels. Computed in double
// (the golden pipeline builds f64 pyramids and packs to f32).
std::vector<double> pyr_down(const std::vector<double>& img, int h, int w,
                             int* oh, int* ow) {
  const int h2 = h / 2, w2 = w / 2;
  *oh = h2;
  *ow = w2;
  const double k[5] = {1. / 16, 4. / 16, 6. / 16, 4. / 16, 1. / 16};
  auto reflect = [](int i, int n) {  // BORDER_REFLECT_101
    if (i < 0) return -i;
    if (i >= n) return 2 * n - i - 2;
    return i;
  };
  std::vector<double> tmp((size_t)h * w), out((size_t)h2 * w2);
  for (int r = 0; r < h; ++r)
    for (int c = 0; c < w; ++c) {
      double s = 0;
      for (int t = -2; t <= 2; ++t) s += k[t + 2] * img[r * w + reflect(c + t, w)];
      tmp[r * w + c] = s;
    }
  for (int r2 = 0; r2 < h2; ++r2)
    for (int c2 = 0; c2 < w2; ++c2) {
      const int r = 2 * r2, c = 2 * c2;
      double s = 0;
      for (int t = -2; t <= 2; ++t) s += k[t + 2] * tmp[reflect(r + t, h) * w + c];
      out[r2 * w2 + c2] = s;
    }
  return out;
}

// buildPyramidRange (:326-354): 2x2 valid-mean, valid iff minDepth<z<maxDepth.
std::vector<double> range_down(const std::vector<double>& img, int h, int w,
                               const Params& pp, int* oh, int* ow) {
  const int h2 = h / 2, w2 = w / 2;
  *oh = h2;
  *ow = w2;
  std::vector<double> out((size_t)h2 * w2, 0.0);
  for (int r = 0; r + 1 < h; r += 2)
    for (int c = 0; c + 1 < w; c += 2) {
      double acc = 0;
      int n = 0;
      for (int i = 0; i < 2; ++i)
        for (int j = 0; j < 2; ++j) {
          const double z = img[(r + i) * w + (c + j)];
          if (z > pp.min_depth && z < pp.max_depth) {
            acc += z;
            ++n;
          }
        }
      if (n > 0) out[(r / 2) * w2 + (c / 2)] = acc / n;
    }
  return out;
}

// calcGradientXY (:365-398): weighted first-order ("Jaimez") gradient —
// fires only where the pixel lies strictly between its two neighbours.
void gradient_xy(const std::vector<double>& src, int h, int w,
                 std::vector<double>* gx, std::vector<double>* gy) {
  gx->assign((size_t)h * w, 0.0);
  gy->assign((size_t)h * w, 0.0);
  for (int r = 1; r + 1 < h; ++r)
    for (int c = 1; c + 1 < w; ++c) {
      const double cur = src[r * w + c];
      double nxt = src[r * w + c + 1], prv = src[r * w + c - 1];
      if ((cur > nxt && cur < prv) || (cur < nxt && cur > prv))
        (*gx)[r * w + c] = 2.0 / (1.0 / (nxt - cur) + 1.0 / (cur - prv));
      nxt = src[(r + 1) * w + c], prv = src[(r - 1) * w + c];
      if ((cur > nxt && cur < prv) || (cur < nxt && cur > prv))
        (*gy)[r * w + c] = 2.0 / (1.0 / (nxt - cur) + 1.0 / (cur - prv));
    }
}

// Re-derive the full level stack from levels[0]'s raw full-res images
// (gradient slots of the input are ignored). Coarsest-first like mode 1.
std::vector<Level> build_levels(const Level& full, const Params& pp,
                                int n_levels) {
  const size_t n0 = (size_t)full.h * full.w;
  std::vector<std::vector<double>> gs(n_levels), ds(n_levels), gt(n_levels),
      dt(n_levels);
  std::vector<int> hs(n_levels), ws(n_levels);
  gs[0].assign(full.gray_src.begin(), full.gray_src.end());
  ds[0].assign(full.depth_src.begin(), full.depth_src.end());
  gt[0].assign(full.gray_trg.begin(), full.gray_trg.end());
  dt[0].assign(full.depth_trg.begin(), full.depth_trg.end());
  (void)n0;
  hs[0] = full.h;
  ws[0] = full.w;
  for (int l = 1; l < n_levels; ++l) {
    int oh, ow;
    gs[l] = pyr_down(gs[l - 1], hs[l - 1], ws[l - 1], &oh, &ow);
    gt[l] = pyr_down(gt[l - 1], hs[l - 1], ws[l - 1], &oh, &ow);
    ds[l] = range_down(ds[l - 1], hs[l - 1], ws[l - 1], pp, &oh, &ow);
    dt[l] = range_down(dt[l - 1], hs[l - 1], ws[l - 1], pp, &oh, &ow);
    hs[l] = oh;
    ws[l] = ow;
  }
  std::vector<Level> levels(n_levels);
  for (int k = 0; k < n_levels; ++k) {
    const int l = n_levels - 1 - k;  // coarsest first
    Level& lv = levels[k];
    lv.h = hs[l];
    lv.w = ws[l];
    const size_t n = (size_t)lv.h * lv.w;
    auto to_f = [n](const std::vector<double>& v, std::vector<float>* out) {
      out->resize(n);
      for (size_t i = 0; i < n; ++i) (*out)[i] = (float)v[i];
    };
    to_f(gs[l], &lv.gray_src);
    to_f(ds[l], &lv.depth_src);
    to_f(gt[l], &lv.gray_trg);
    to_f(dt[l], &lv.depth_trg);
    std::vector<double> gx, gy, dgx, dgy;
    gradient_xy(gt[l], lv.h, lv.w, &gx, &gy);
    gradient_xy(dt[l], lv.h, lv.w, &dgx, &dgy);
    to_f(gx, &lv.ggx);
    to_f(gy, &lv.ggy);
    to_f(dgx, &lv.dgx);
    to_f(dgy, &lv.dgy);
  }
  return levels;
}

template <typename T>
double sweep_error(const Level& lv, const Params& pp, const float pose[16],
                   int method) {
  Sweep<T> s;
  sweep<T>(lv, pp, pose, method, /*want_grad=*/false, &s);
  // :2738 sqrt(error2/numValidPts); no guard in the reference.
  return std::sqrt(s.error2 / (double)(s.n_valid ? s.n_valid : 1));
}

// Full per-level GN loop.  Levels arrive coarsest-first.
template <typename T>
void run_align(std::vector<Level>& levels, const Params& pp, float pose[16],
               int method) {
  for (size_t li = 0; li < levels.size(); ++li) {
    Level& lv = levels[li];
    double lambda = 1.0;  // :4589
    int it = 0;
    const int max_iters = 10;        // :4593
    const double tol_residual = 1e-3;  // :4594
    const double tol_update = 1e-4;    // :4595
    double upd_norm = std::sqrt(6.0);  // update_pose = ones :4596
    double error = sweep_error<T>(lv, pp, pose, method);
    double diff_error = error;  // :4605
    while (it < max_iters && upd_norm > tol_update &&
           diff_error > tol_residual) {
      Sweep<T> s;
      sweep<T>(lv, pp, pose, method, /*want_grad=*/true, &s);
      if (ill_posed<T>(s.H, lambda)) {
        std::printf("illposed level %zu\n", li);
        return;
      }
      T upd[6];
      if (!solve6<T>(s.H, s.g, upd)) {
        std::printf("illposed level %zu\n", li);
        return;
      }
      double nrm = 0;
      for (int k = 0; k < 6; ++k) nrm += (double)upd[k] * (double)upd[k];
      upd_norm = std::sqrt(nrm);
      double xi[6];
      for (int k = 0; k < 6; ++k) xi[k] = (double)upd[k];
      double E[16];
      pseudo_exp(xi, E);
      float Ef[16];
      for (int k = 0; k < 16; ++k) Ef[k] = (float)E[k];
      float pose_tmp[16];
      matmul4f(Ef, pose, pose_tmp);
      const double new_error = sweep_error<T>(lv, pp, pose_tmp, method);
      diff_error = error - new_error;
      if (diff_error > tol_residual) {  // :4715
        lambda /= 5.0;
        std::memcpy(pose, pose_tmp, sizeof(pose_tmp));
        error = new_error;
        ++it;
      }
    }
    std::printf("level %zu iters %d error %.10g\n", li, it, error);
  }
}

template <typename T>
void run(int mode, int method, int do_mask, std::vector<Level>& levels,
         const Params& pp, float pose[16], const double kf[4],
         int pinhole_level, int n_build_levels, double thres_outliers,
         const float cam_rt[16]) {
  if (mode == 8 || mode == 9) {
    if (do_mask)
      for (auto& lv : levels) mask_seams(&lv);
    OccSweep<T> s;
    sweep_occ<T>(levels[0], pp, pose, method, mode == 8 ? 1 : 2,
                 thres_outliers, &s);
    std::printf("perr2 %.12g\nnphoto %ld\nderr2 %.12g\nndepth %ld\n",
                s.photo_err2, s.n_photo, s.depth_err2, s.n_depth);
    return;
  }
  if (mode == 4) {
    // full-chain: re-derive pyramids + gradients from levels[0]'s raw
    // full-res images, then the spherical GN loop (n_levels from the
    // header selects the stack depth)
    std::vector<Level> built = build_levels(levels[0], pp, n_build_levels);
    if (do_mask)
      for (auto& lv : built) mask_seams(&lv);
    run_align<T>(built, pp, pose, method);
    std::printf("pose");
    for (int k = 0; k < 16; ++k) std::printf(" %.10g", (double)pose[k]);
    std::printf("\n");
    return;
  }
  if (do_mask)
    for (auto& lv : levels) mask_seams(&lv);
  if (mode == 10) {
    PinholeSweep<T> s;
    sweep_robot<T>(levels[0], pp, pose, cam_rt, kf, pinhole_level, method, &s);
    std::printf("perr2 %.12g\nnphoto %ld\nderr2 %.12g\nndepth %ld\n",
                s.photo_err2, s.n_photo, s.depth_err2, s.n_depth);
    std::printf("H");
    for (int a = 0; a < 6; ++a)
      for (int b = a; b < 6; ++b) std::printf(" %.12g", (double)s.H[6 * a + b]);
    std::printf("\ng");
    for (int a = 0; a < 6; ++a) std::printf(" %.12g", (double)s.g[a]);
    std::printf("\n");
  } else if (mode == 2) {
    run_pinhole_sweep<T>(levels[0], pp, pose, kf, pinhole_level, method);
  } else if (mode == 0) {
    Sweep<T> s;
    sweep<T>(levels[0], pp, pose, method, /*want_grad=*/true, &s);
    const double err =
        std::sqrt(s.error2 / (double)(s.n_valid ? s.n_valid : 1));
    std::printf("error %.12g\nnvalid %ld\nnvisible %ld\n", err, s.n_valid,
                s.n_visible);
    std::printf("H");
    for (int a = 0; a < 6; ++a)
      for (int b = a; b < 6; ++b) std::printf(" %.12g", (double)s.H[6 * a + b]);
    std::printf("\ng");
    for (int a = 0; a < 6; ++a) std::printf(" %.12g", (double)s.g[a]);
    std::printf("\nSSO %.12g\n",
                (double)s.n_visible / (double)(levels[0].h * levels[0].w));
  } else {
    run_align<T>(levels, pp, pose, method);
    std::printf("pose");
    for (int k = 0; k < 16; ++k) std::printf(" %.10g", (double)pose[k]);
    std::printf("\n");
  }
}

// ---------------------------------------------------------------------------
// Stitch oracle (mode 6): Frame360::stitchImage (Frame360.h:1098-1148) from
// the raw per-sensor RGB u8 + DISTORTED depth u16 (the reference stitches the
// pre-undistortion u16 depth — a quirk the pipeline replicates), with the
// reference's float arithmetic: float trig, float u/v, (int) truncation for
// the pixel fetch, double obliquity scale truncated into the u16 panorama.
// Gray panorama via OpenCV's fixed-point CV_RGB2GRAY on the BGR bytes.

struct StitchSensor {
  float rt_inv[16];
  std::vector<uint8_t> rgb;    // (h, w, 3)
  std::vector<uint16_t> depth; // (h, w)
};

void stitch_oracle(const std::vector<StitchSensor>& sensors, int size_h,
                   int size_w, int sph_h, int sph_w, const double kf[4],
                   std::vector<uint8_t>* gray_out,
                   std::vector<uint16_t>* depth_out) {
  const float fx = (float)kf[0], fy = (float)kf[1];
  const float cx = (float)kf[2], cy = (float)kf[3];
  std::vector<uint8_t> rgb_pan((size_t)sph_h * sph_w * 3, 0);
  depth_out->assign((size_t)sph_h * sph_w, 0);
  const float angle_pixel = (float)(2.0 * M_PI) / (float)sph_w;
  const float off_phi = (float)sph_h / 2 - 0.5f;
  const float off_theta = -(float)size_h * 15 / 2 + 0.5f;  // :1105
  for (int sid = 0; sid < (int)sensors.size(); ++sid) {
    const StitchSensor& s = sensors[sid];
    const int c0 = (7 - sid) * size_h, c1 = (8 - sid) * size_h;  // :1119-1120
    for (int row = 0; row < sph_h; ++row) {
      const float phi = (off_phi - (float)row) * angle_pixel;
      const float vx = std::sin(phi);
      const float cphi = std::cos(phi);
      for (int col = c0; col < c1; ++col) {
        const float theta = ((float)col + off_theta) * angle_pixel;
        const float vp[3] = {vx, cphi * std::sin(theta), cphi * std::cos(theta)};
        float p[3];
        for (int r = 0; r < 3; ++r)
          p[r] = s.rt_inv[4 * r] * vp[0] + s.rt_inv[4 * r + 1] * vp[1] +
                 s.rt_inv[4 * r + 2] * vp[2] + s.rt_inv[4 * r + 3];
        const float u = fx * p[0] / p[2] + cx;
        const float v = fy * p[1] / p[2] + cy;
        if (u >= 0 && u < (float)size_w && v >= 0 && v < (float)size_h) {
          const int ui = (int)u, vi = (int)v;  // cv::Mat.at float->int trunc
          for (int ch = 0; ch < 3; ++ch)
            rgb_pan[((size_t)row * sph_w + col) * 3 + ch] =
                s.rgb[((size_t)vi * size_w + ui) * 3 + ch];
          const uint16_t d = s.depth[(size_t)vi * size_w + ui];
          // :1143 — obliquity scale; pow() promotes to double, the result
          // truncates into the u16 panorama. (The pcl_isfinite(u16) guard
          // is vacuously true.)
          const double ob = std::sqrt(1.0 + std::pow(((double)u - cx) / fx, 2) +
                                      std::pow(((double)v - cy) / fy, 2));
          (*depth_out)[(size_t)row * sph_w + col] = (uint16_t)((double)d * ob);
        }
      }
    }
  }
  // CV_RGB2GRAY fixed point on BGR bytes: (b*4899 + g*9617 + r*1868 + 2^13)>>14
  gray_out->assign((size_t)sph_h * sph_w, 0);
  for (size_t i = 0; i < (size_t)sph_h * sph_w; ++i) {
    const uint32_t b = rgb_pan[3 * i], g = rgb_pan[3 * i + 1],
                   r = rgb_pan[3 * i + 2];
    (*gray_out)[i] = (uint8_t)((b * 4899 + g * 9617 + r * 1868 + (1u << 13)) >> 14);
  }
}

// ---------------------------------------------------------------------------
// CLAMS undistort oracle (mode 7): DiscreteFrustum::interpolatedUndistort
// (CLAMS discrete_depth_distortion_model.cpp:38-69) applied per pixel as
// DiscreteDepthDistortionModel::undistort does (:175-187 — z==0 skipped,
// float in-place update; frustum(v,u) = frustums[v/bin_height][u/bin_width]).

struct ClamsModel {
  int bin_width, bin_height, nx, ny, nbins;
  double bin_depth;
  std::vector<float> multipliers;  // (ny, nx, nbins)
  std::vector<float> counts;       // (ny, nx, nbins)
};

void clams_undistort(const ClamsModel& m, std::vector<float>* depth, int h,
                     int w) {
  for (int v = 0; v < h; ++v) {
    for (int u = 0; u < w; ++u) {
      float& z = (*depth)[(size_t)v * w + u];
      if (z == 0) continue;
      const size_t f =
          ((size_t)(v / m.bin_height) * m.nx + (u / m.bin_width)) * m.nbins;
      const float* mult = &m.multipliers[f];
      const float* cnt = &m.counts[f];
      const int idx =
          std::min(m.nbins - 1, (int)std::floor(z / (float)m.bin_depth));
      const float start = (float)m.bin_depth * idx;
      const int idx1 = (z - start < (float)m.bin_depth / 2) ? idx : idx + 1;
      const int idx0 = idx1 - 1;
      if (idx0 < 0 || idx1 >= m.nbins || cnt[idx0] < 50 || cnt[idx1] < 50) {
        z *= mult[idx];  // plain undistort fallback (:43-46)
        continue;
      }
      const double z0 = (idx0 + 1) * m.bin_depth - m.bin_depth * 0.5;
      const double c1 = (z - z0) / m.bin_depth;
      z *= (float)((1.0 - c1) * mult[idx0] + c1 * mult[idx1]);
    }
  }
}

bool read_exact(std::FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2 && argc != 3) {
    std::fprintf(stderr, "usage: %s <packed-input.bin> [stitch-out.bin]\n",
                 argv[0]);
    return 2;
  }
  std::FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror("open");
    return 2;
  }
  int32_t magic, mode, method, n_levels, use_double, do_mask;
  if (!read_exact(f, &magic, 4) || magic != 0x52503630) {
    std::fprintf(stderr, "bad magic\n");
    return 2;
  }
  if (!read_exact(f, &mode, 4) || !read_exact(f, &method, 4) ||
      !read_exact(f, &n_levels, 4) || !read_exact(f, &use_double, 4) ||
      !read_exact(f, &do_mask, 4)) {
    std::fprintf(stderr, "truncated header\n");
    return 2;
  }
  if (n_levels < 1 || n_levels > 16) {
    std::fprintf(stderr, "implausible n_levels %d\n", n_levels);
    return 2;
  }
  Params pp;
  double raw[6];
  if (!read_exact(f, raw, 48)) {
    std::fprintf(stderr, "truncated params\n");
    return 2;
  }
  pp.min_depth = raw[0];
  pp.max_depth = raw[1];
  pp.std_photo = raw[2];
  pp.std_depth = raw[3];
  pp.thres_sal_int = raw[4];
  pp.thres_sal_depth = raw[5];
  float pose[16];
  if (!read_exact(f, pose, 64)) {
    std::fprintf(stderr, "truncated pose\n");
    return 2;
  }
  // pinhole modes carry an extra block: full-res {fx, fy, ox, oy} + level
  double kf[4] = {0, 0, 0, 0};
  int32_t pinhole_level = 0;
  if (mode == 2 || mode == 10) {
    if (!read_exact(f, kf, 32) || !read_exact(f, &pinhole_level, 4)) {
      std::fprintf(stderr, "truncated pinhole block\n");
      return 2;
    }
  }
  // robot-frame mode carries the camera-on-rig extrinsic after the K block
  float cam_rt[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
  if (mode == 10) {
    if (!read_exact(f, cam_rt, 64)) {
      std::fprintf(stderr, "truncated camRt block\n");
      return 2;
    }
  }
  // occ modes carry the alignFrames360-era outlier threshold (:4525)
  double thres_outliers = 0.3;
  if (mode == 8 || mode == 9) {
    if (!read_exact(f, &thres_outliers, 8)) {
      std::fprintf(stderr, "truncated occ block\n");
      return 2;
    }
  }
  if (mode == 7) {
    // undistort stream: {h, w, bin_width, bin_height, nx, ny, nbins} +
    // bin_depth double + multipliers f32 + counts f32 + depth f32 (h, w)
    int32_t dims[7];
    ClamsModel m;
    if (!read_exact(f, dims, 28) || !read_exact(f, &m.bin_depth, 8)) {
      std::fprintf(stderr, "truncated clams header\n");
      return 2;
    }
    const int h = dims[0], w = dims[1];
    m.bin_width = dims[2];
    m.bin_height = dims[3];
    m.nx = dims[4];
    m.ny = dims[5];
    m.nbins = dims[6];
    const size_t nf = (size_t)m.ny * m.nx * m.nbins;
    m.multipliers.resize(nf);
    m.counts.resize(nf);
    std::vector<float> depth((size_t)h * w);
    if (!read_exact(f, m.multipliers.data(), nf * 4) ||
        !read_exact(f, m.counts.data(), nf * 4) ||
        !read_exact(f, depth.data(), depth.size() * 4)) {
      std::fprintf(stderr, "truncated clams data\n");
      return 2;
    }
    std::fclose(f);
    clams_undistort(m, &depth, h, w);
    if (argc != 3) {
      std::fprintf(stderr, "mode 7 needs an output path\n");
      return 2;
    }
    std::FILE* out = std::fopen(argv[2], "wb");
    if (!out) {
      std::perror("open out");
      return 2;
    }
    std::fwrite(depth.data(), 4, depth.size(), out);
    std::fclose(out);
    std::printf("undistort ok %dx%d\n", h, w);
    return 0;
  }
  if (mode == 6) {
    // stitch stream: K + {size_h, size_w, sph_h, sph_w} + n_levels sensors,
    // each 16 f32 Rt_inv + rgb u8 (h,w,3) + depth u16 (h,w)
    int32_t dims[4];
    if (!read_exact(f, kf, 32) || !read_exact(f, dims, 16)) {
      std::fprintf(stderr, "truncated stitch header\n");
      return 2;
    }
    const int size_h = dims[0], size_w = dims[1], sph_h = dims[2],
              sph_w = dims[3];
    std::vector<StitchSensor> sensors((size_t)n_levels);
    for (auto& s : sensors) {
      s.rgb.resize((size_t)size_h * size_w * 3);
      s.depth.resize((size_t)size_h * size_w);
      if (!read_exact(f, s.rt_inv, 64) ||
          !read_exact(f, s.rgb.data(), s.rgb.size()) ||
          !read_exact(f, s.depth.data(), s.depth.size() * 2)) {
        std::fprintf(stderr, "truncated stitch sensor\n");
        return 2;
      }
    }
    std::fclose(f);
    std::vector<uint8_t> gray;
    std::vector<uint16_t> depth;
    stitch_oracle(sensors, size_h, size_w, sph_h, sph_w, kf, &gray, &depth);
    if (argc != 3) {
      std::fprintf(stderr, "mode 6 needs an output path\n");
      return 2;
    }
    std::FILE* out = std::fopen(argv[2], "wb");
    if (!out) {
      std::perror("open out");
      return 2;
    }
    std::fwrite(gray.data(), 1, gray.size(), out);
    std::fwrite(depth.data(), 2, depth.size(), out);
    std::fclose(out);
    std::printf("stitch ok %dx%d\n", sph_h, sph_w);
    return 0;
  }
  // mode 4 ships ONE raw full-res level; n_levels selects the pyramid
  // depth the oracle builds itself
  const int n_blocks = (mode == 4) ? 1 : n_levels;
  std::vector<Level> levels((size_t)n_blocks);
  for (auto& lv : levels) {
    int32_t hw[2];
    if (!read_exact(f, hw, 8)) {
      std::fprintf(stderr, "truncated\n");
      return 2;
    }
    lv.h = hw[0];
    lv.w = hw[1];
    const size_t n = (size_t)lv.h * lv.w;
    for (auto* arr : {&lv.gray_src, &lv.depth_src, &lv.gray_trg, &lv.depth_trg,
                      &lv.ggx, &lv.ggy, &lv.dgx, &lv.dgy}) {
      arr->resize(n);
      if (!read_exact(f, arr->data(), n * 4)) {
        std::fprintf(stderr, "truncated\n");
        return 2;
      }
    }
  }
  std::fclose(f);
  if (use_double)
    run<double>(mode, method, do_mask, levels, pp, pose, kf, pinhole_level,
                n_levels, thres_outliers, cam_rt);
  else
    run<float>(mode, method, do_mask, levels, pp, pose, kf, pinhole_level,
               n_levels, thres_outliers, cam_rt);
  return 0;
}
