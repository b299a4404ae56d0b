// Standalone C++ oracle for the plane-extraction host layer.
//
// Purpose (PARITY_AUDIT.md / VERDICT r3 #4): break the self-reference of the
// plane layer's parity chain.  core/plane_extraction.py and core/pbmap.py
// were written by the same author as their tests; this file is an
// INDEPENDENT C++ implementation of the same host-side semantics,
// re-derived statement-by-statement from a fresh read of the reference:
//
//   * getPlanesSensor's per-region statistics + filters + local merge
//     (reference /root/reference/include/Frame360.h:979-1075: centroid,
//     normal with the toward-sensor flip :988-992, curvature, inlier
//     offsets :1004-1008, convex hull + mass center/area :1014-1035 with
//     the min_area discard :1034, d :1037, elongation discard :1039-1042,
//     hue histogram :1045, transform(Rt) :1050, isSamePlane(0.99,0.05,0.2)
//     local merge :1053-1068),
//   * groupPlanes (:742-832: per-sensor sequential merge into the global
//     list with prev_planes bookkeeping, maxDistHull 0.5 /
//     maxDistParallelHull 0.09 :747-748, areaHull/curvature gates :762-768,
//     |d| 0.45 + normal dot 0.99 :772-773, vertex/edge hull proximity
//     :780-811, the sensor 6 wraparound :829-830),
//   * mergePlanes (:657-739: pairwise curvature-gated merge at dot>0.99,
//     |dj-dk|<0.45, hull proximity 0.3/0.06, with the erase + reindex +
//     restart-at-j semantics :718-731).
//
// The region growing itself is NOT re-run: per-pixel labels arrive as input
// (the reference's labels come from PCL's OrganizedMultiPlaneSegmentation,
// unavailable here by design) — everything downstream of the labels is
// executed independently.  Plane-statistics functions that live in the
// external MRPT pbmap (calcConvexHull, computeMassCenterAndArea,
// calcElongationAndPpalDir, calcPlaneHistH, mergePlane2, isSamePlane,
// dist3D_Segment_to_Segment2) are implemented fresh from their documented
// reconstruction spec (the same spec core/pbmap.py targets), with
// independent numerics: own Jacobi 3x3 eigensolver, own monotone-chain
// hull, own in-plane basis, own segment-distance clamping.
//
// The hull-proximity tests follow the reference's literal loop pairing over
// a CLOSED contour (first vertex duplicated at the end, as MRPT polygons
// carry): vertex pairs (i, ii) for i,ii in 1..K and edges
// (points[i-1], points[i]) with the parallel-offset evaluated between the
// loop-index vertices — i.e. each edge is paired with its END vertex.
//
// No third-party dependencies.  Double precision throughout (the Python
// side computes these statistics in float64).  Test oracle, not product
// code.
//
// Input: little-endian binary stream on argv[1]:
//   i32 magic 0x504C4E53, i32 n_sensors, i32 min_inliers,
//   f64 min_area, f64 max_elongation, f64 max_curvature;
//   per sensor: i32 H, i32 W, 16*f64 Rt (row-major),
//               H*W*3 f64 xyz (sensor frame), H*W*3 u8 rgb,
//               H*W i32 labels (-1 = unlabeled).
// Output: text on stdout (parsed by tools/planes_oracle.py):
//   "L s idx n cx cy cz nx ny nz d curv area elong"   per local plane
//   "G idx ..."                                        after groupPlanes
//   "F idx ..." + "H idx h0..h73"                      after mergePlanes
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <set>
#include <string>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator*(double s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm(V3 a) { return std::sqrt(dot(a, a)); }

// Cyclic Jacobi eigendecomposition of a symmetric 3x3; eigenvalues
// ascending, eigenvectors as columns of V (V[r][c] = component r of evec c).
void eigh3(const double A_in[3][3], double w[3], double V[3][3]) {
  double A[3][3];
  std::memcpy(A, A_in, sizeof(A));
  double Vm[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(A[0][1]) + std::fabs(A[0][2]) + std::fabs(A[1][2]);
    if (off < 1e-300) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(A[p][q]) < 1e-300) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = Vm[k][p], vkq = Vm[k][q];
          Vm[k][p] = c * vkp - s * vkq;
          Vm[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int idx[3] = {0, 1, 2};
  double d[3] = {A[0][0], A[1][1], A[2][2]};
  std::sort(idx, idx + 3, [&](int a, int b) { return d[a] < d[b]; });
  for (int c = 0; c < 3; ++c) {
    w[c] = d[idx[c]];
    for (int r = 0; r < 3; ++r) V[r][c] = Vm[r][idx[c]];
  }
}

// In-plane orthonormal basis from the normal — deliberately a DIFFERENT
// construction than the Python side's (seed axis chosen by smallest |n.e|,
// Gram-Schmidt): all hull/area/elongation quantities must be basis-invariant.
void plane_basis(V3 n, V3 &u, V3 &v) {
  double ax = std::fabs(n.x), ay = std::fabs(n.y), az = std::fabs(n.z);
  V3 e = (ax <= ay && ax <= az) ? V3{1, 0, 0}
         : (ay <= az)           ? V3{0, 1, 0}
                                : V3{0, 0, 1};
  u = e - dot(e, n) * n;
  u = (1.0 / norm(u)) * u;
  v = cross(n, u);
}

// Andrew monotone chain on 2-D points; returns CCW hull indices, strict
// (collinear boundary points dropped), no duplicated first vertex.
std::vector<int> hull2d(const std::vector<double> &xs,
                        const std::vector<double> &ys) {
  int n = (int)xs.size();
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    if (xs[a] != xs[b]) return xs[a] < xs[b];
    return ys[a] < ys[b];
  });
  auto build = [&](const std::vector<int> &seq) {
    std::vector<int> out;
    for (int i : seq) {
      while (out.size() >= 2) {
        int a = out[out.size() - 1], o = out[out.size() - 2];
        double crossz = (xs[a] - xs[o]) * (ys[i] - ys[o]) -
                        (ys[a] - ys[o]) * (xs[i] - xs[o]);
        if (crossz <= 0)
          out.pop_back();
        else
          break;
      }
      out.push_back(i);
    }
    return out;
  };
  std::vector<int> lower = build(order);
  std::reverse(order.begin(), order.end());
  std::vector<int> upper = build(order);
  std::vector<int> hull;
  for (size_t i = 0; i + 1 < lower.size(); ++i) hull.push_back(lower[i]);
  for (size_t i = 0; i + 1 < upper.size(); ++i) hull.push_back(upper[i]);
  return hull;
}

// Squared distance between 3-D segments [p0,p1] and [q0,q1] (the classic
// clamped closest-point construction mrpt::pbmap::dist3D_Segment_to_Segment2
// implements; used by the reference at Frame360.h:698/795).
double seg_seg_dist2(V3 p0, V3 p1, V3 q0, V3 q1) {
  V3 u = p1 - p0, v = q1 - q0, w = p0 - q0;
  double a = dot(u, u), b = dot(u, v), c = dot(v, v);
  double d = dot(u, w), e = dot(v, w);
  double D = a * c - b * b;
  double sN, sD = D, tN, tD = D;
  if (D < 1e-12) {
    sN = 0.0;
    sD = 1.0;
    tN = e;
    tD = c;
  } else {
    sN = b * e - c * d;
    tN = a * e - b * d;
    if (sN < 0) {
      sN = 0.0;
      tN = e;
      tD = c;
    } else if (sN > sD) {
      sN = sD;
      tN = e + b;
      tD = c;
    }
  }
  if (tN < 0) {
    tN = 0.0;
    if (a > 1e-12) {
      sN = std::min(std::max(-d, 0.0), a);
      sD = a;
    } else {
      sN = 0.0;
      sD = 1.0;
    }
  } else if (tN > tD) {
    tN = tD;
    if (a > 1e-12) {
      sN = std::min(std::max(-d + b, 0.0), a);
      sD = a;
    } else {
      sN = 0.0;
      sD = 1.0;
    }
  }
  double sc = std::fabs(sD) > 1e-12 ? sN / sD : 0.0;
  double tc = std::fabs(tD) > 1e-12 ? tN / tD : 0.0;
  V3 dP = w + sc * u - (tc * v);
  return dot(dP, dP);
}

struct Plane {
  int id = 0;
  V3 normal{}, center{};
  double d = 0, curvature = 0, area = 0, elongation = 1;
  std::vector<V3> pts;       // inlier points
  std::vector<uint8_t> col;  // 3 bytes per inlier
  std::vector<V3> hull;      // open CCW polygon
  double hist[74];
  int n = 0;
};

// calcPlaneHistH reconstruction spec: 72 hue bins + bin 72 dark (V<0.3) +
// bin 73 unsaturated (S<0.2), normalized to sum 1.
void hue_hist(const std::vector<uint8_t> &col, double hist[74]) {
  for (int i = 0; i < 74; ++i) hist[i] = 0.0;
  int n = (int)col.size() / 3;
  for (int i = 0; i < n; ++i) {
    double r = col[3 * i] / 255.0, g = col[3 * i + 1] / 255.0,
           b = col[3 * i + 2] / 255.0;
    double v = std::max(r, std::max(g, b));
    double mn = std::min(r, std::min(g, b));
    double s = v > 1e-9 ? (v - mn) / std::max(v, 1e-9) : 0.0;
    double delta = std::max(v - mn, 1e-9);
    double h;
    if (v == r) {
      h = std::fmod((g - b) / delta, 6.0);
      if (h < 0) h += 6.0;
    } else if (v == g) {
      h = (b - r) / delta + 2.0;
    } else {
      h = (r - g) / delta + 4.0;
    }
    h *= 60.0;
    int bin = (int)(h / 360.0 * 72);
    if (bin < 0) bin = 0;
    if (bin > 71) bin = 71;
    if (v < 0.3)
      bin = 72;
    else if (s < 0.2)
      bin = 73;
    hist[bin] += 1.0;
  }
  double total = 0;
  for (int i = 0; i < 74; ++i) total += hist[i];
  if (total > 0)
    for (int i = 0; i < 74; ++i) hist[i] /= total;
}

// calcConvexHull + computeMassCenterAndArea + calcElongationAndPpalDir
// reconstruction: hull of contour points projected into the plane basis,
// shoelace area, elongation = sqrt of the hull-vertex second-moment ratio.
void compute_hull_area(Plane &p, const std::vector<V3> &contour) {
  V3 u, v;
  plane_basis(p.normal, u, v);
  int n = (int)contour.size();
  std::vector<double> xs(n), ys(n);
  for (int i = 0; i < n; ++i) {
    V3 rel = contour[i] - p.center;
    xs[i] = dot(rel, u);
    ys[i] = dot(rel, v);
  }
  if (n < 3) {
    p.hull = contour;
    p.area = 0.0;
    return;
  }
  std::vector<int> hidx = hull2d(xs, ys);
  if ((int)hidx.size() < 3) {
    p.hull.clear();
    for (int i : hidx) p.hull.push_back(contour[i]);
    p.area = 0.0;
    return;
  }
  p.hull.clear();
  for (int i : hidx) p.hull.push_back(contour[i]);
  int k = (int)hidx.size();
  double area2 = 0;
  for (int i = 0; i < k; ++i) {
    int j = (i + 1) % k;
    area2 += xs[hidx[i]] * ys[hidx[j]] - xs[hidx[j]] * ys[hidx[i]];
  }
  p.area = std::fabs(0.5 * area2);
  // elongation from hull-vertex second moments
  double mx = 0, my = 0;
  for (int i : hidx) {
    mx += xs[i];
    my += ys[i];
  }
  mx /= k;
  my /= k;
  double a = 0, b = 0, c = 0;
  for (int i : hidx) {
    double dx = xs[i] - mx, dy = ys[i] - my;
    a += dx * dx;
    b += dx * dy;
    c += dy * dy;
  }
  a /= k;
  b /= k;
  c /= k;
  double half_tr = 0.5 * (a + c);
  double disc = std::sqrt(std::max(half_tr * half_tr - (a * c - b * b), 0.0));
  double wmax = half_tr + disc, wmin = half_tr - disc;
  p.elongation = std::sqrt(std::max(wmax, 1e-12) / std::max(wmin, 1e-12));
}

// The reference's hull-proximity decision (Frame360.h:680-711 mergePlanes
// form, :780-811 groupPlanes form): a) vertex-vertex within maxDist AND the
// difference nearly parallel to plane j (offset < maxParallel along n_j);
// c) edge-edge segment distance within maxDist with the offset evaluated
// between the loop-index (edge END) vertices.  Loops run over the CLOSED
// contour starting at index 1.
bool same_surface(const Plane &pj, const Plane &pk, double max_dist,
                  double max_par) {
  if (pj.hull.size() < 2 || pk.hull.size() < 2) return false;
  // closed contours: prepend the last vertex so index 0 duplicates the end
  std::vector<V3> cj, ck;
  cj.push_back(pj.hull.back());
  for (auto &q : pj.hull) cj.push_back(q);
  ck.push_back(pk.hull.back());
  for (auto &q : pk.hull) ck.push_back(q);
  // a) + b): vertex-vertex
  for (size_t i = 1; i < cj.size(); ++i)
    for (size_t ii = 1; ii < ck.size(); ++ii) {
      V3 diff = cj[i] - ck[ii];
      if (norm(diff) < max_dist && std::fabs(dot(pj.normal, diff)) < max_par)
        return true;
    }
  // c): edge-edge
  for (size_t i = 1; i < cj.size(); ++i)
    for (size_t ii = 1; ii < ck.size(); ++ii) {
      double d2 = seg_seg_dist2(cj[i], cj[i - 1], ck[ii], ck[ii - 1]);
      if (std::sqrt(d2) < max_dist) {
        V3 diff = cj[i] - ck[ii];
        if (std::fabs(dot(pj.normal, diff)) < max_par) return true;
      }
    }
  return false;
}

// isSamePlane(plane, cosAngle, dist, proximity) reconstruction: normal
// agreement, center offset along the normal, hull proximity (distance only,
// no parallel gate).
bool is_same_plane(const Plane &pj, const Plane &pk, double cos_thr,
                   double dist_thr, double prox_thr) {
  if (dot(pj.normal, pk.normal) < cos_thr) return false;
  V3 cdiff = pk.center - pj.center;
  if (std::fabs(dot(pj.normal, cdiff)) > dist_thr) return false;
  // vertex-vertex
  for (auto &a : pj.hull)
    for (auto &b : pk.hull)
      if (norm(a - b) < prox_thr) return true;
  // edge-edge over closed polygons
  int k1 = (int)pj.hull.size(), k2 = (int)pk.hull.size();
  double thr2 = prox_thr * prox_thr;
  for (int i = 0; i < k1; ++i)
    for (int j = 0; j < k2; ++j)
      if (seg_seg_dist2(pj.hull[i], pj.hull[(i + 1) % k1], pk.hull[j],
                        pk.hull[(j + 1) % k2]) < thr2)
        return true;
  return false;
}

// mergePlane2 reconstruction: union of inliers, parameters re-estimated
// from the union (centroid / covariance eigendecomposition / toward-sensor
// flip / curvature), hull re-hulled from the two hulls' vertices, histogram
// from the union colors.
void merge_plane2(Plane &pj, Plane &pk) {
  pj.pts.insert(pj.pts.end(), pk.pts.begin(), pk.pts.end());
  pj.col.insert(pj.col.end(), pk.col.begin(), pk.col.end());
  int n = (int)pj.pts.size();
  V3 c{0, 0, 0};
  for (auto &q : pj.pts) c = c + q;
  c = (1.0 / n) * c;
  double A[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (auto &q : pj.pts) {
    V3 r = q - c;
    double rr[3] = {r.x, r.y, r.z};
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) A[a][b] += rr[a] * rr[b];
  }
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) A[a][b] /= n;
  double w[3], V[3][3];
  eigh3(A, w, V);
  V3 nrm{V[0][0], V[1][0], V[2][0]};
  if (dot(nrm, c) > 0) nrm = -1.0 * nrm;
  pj.center = c;
  pj.normal = nrm;
  pj.d = -dot(nrm, c);
  pj.curvature = w[0] / std::max(w[0] + w[1] + w[2], 1e-12);
  pj.n = n;
  std::vector<V3> hull_pts = pj.hull;
  hull_pts.insert(hull_pts.end(), pk.hull.begin(), pk.hull.end());
  compute_hull_area(pj, hull_pts);
  hue_hist(pj.col, pj.hist);
}

void print_plane(const char *tag, int sensor, int idx, const Plane &p) {
  if (sensor >= 0)
    std::printf("%s %d %d", tag, sensor, idx);
  else
    std::printf("%s %d", tag, idx);
  std::printf(" %d %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n",
              p.n, p.center.x, p.center.y, p.center.z, p.normal.x, p.normal.y,
              p.normal.z, p.d, p.curvature, p.area, p.elongation);
}

// =================== segment mode (magic "PLNT") ===================
//
// Sequential scalar region growing re-derived from the semantics of PCL's
// OrganizedMultiPlaneSegmentation at the reference's configuration
// (/root/reference/include/Frame360.h:958-977; PCL itself is not in this
// image, so this is a documented best-effort reconstruction — VERDICT r4
// #2).  It independently executes the stage ops/planes_seg.py redesigns as
// a parallel flood fill:
//
//   * connectivity: two 4-adjacent valid pixels are connected when their
//     normals agree within the angular threshold (dot > cos(0.039812)) and
//     their plane offsets d = n.p differ by < 0.02 m (PCL's
//     PlaneCoefficientComparator; predicate evaluated in f32 like the
//     device path so borderline pixels cannot split the gate);
//   * labeling: classic sequential union-find over row-major left/up edges
//     (PCL's OrganizedConnectedComponentSegmentation is a sequential
//     scanline CCL; the predicate is symmetric, so component SETS are
//     schedule-independent and must match the scan-based flood fill
//     EXACTLY).  Roots are component-minimum pixel indices — the same
//     label convention segment_planes emits, so labels compare bit-equal;
//   * models: components with >= min_inliers PRE-refine pixels are fit by
//     centroid + covariance eigendecomposition (smallest-eigenvector
//     normal, toward-sensor flip, curvature = l0/trace) — PCL fits models
//     in segment(), BEFORE refinement, and Frame360 reads regions[i] from
//     those pre-refine fits;
//   * segment-stage curvature gate: PCL's segment() drops regions with
//     curvature >= maximum_curvature_ (default believed 0.001; the
//     reference never calls setMaximumCurvature).  UNVERIFIABLE in this
//     image — the gate is a parameter here (the test passes +inf to mirror
//     the in-repo pipeline, which gates curvature only at the merge
//     layers; tests/test_seg_oracle.py measures what a 0.001 gate would
//     change on the bundled frames and records the answer);
//   * refine: unlabeled valid-xyz pixels 4-adjacent to a MODEL region are
//     absorbed when their point fits that region's plane within the
//     distance threshold (PCL's PlaneRefinementComparator tests against
//     the model coefficients, and only accepted models grow).  Schedule:
//     synchronized dilation sweeps to a fixed point with largest-label
//     tie-break on contested pixels — PCL's own in-place scan order is
//     implementation-defined, so the in-repo tie-break is mirrored to keep
//     the comparison about SEMANTICS (who may grow, against which model,
//     within what threshold), not scan order.

struct SegModel {
  int label;          // pre-refine component root (min pixel index)
  V3 center, normal;  // segment-stage eigen fit
  double curvature;
};

int uf_find(std::vector<int32_t> &par, int i) {
  while (par[i] != i) {
    par[i] = par[par[i]];  // path halving; min-union keeps roots at minima
    i = par[i];
  }
  return i;
}

void segment_ccl(const std::vector<float> &xyz, const std::vector<float> &nrm,
                 int H, int W, float cos_thr, float dist_thr,
                 std::vector<int32_t> &labels) {
  size_t HW = (size_t)H * W;
  std::vector<char> valid(HW);
  std::vector<float> dpix(HW, 0.f);
  for (size_t i = 0; i < HW; ++i) {
    const float *p = &xyz[3 * i], *n = &nrm[3 * i];
    bool ok = std::isfinite(p[0]) && std::isfinite(p[1]) &&
              std::isfinite(p[2]) && std::isfinite(n[0]) &&
              std::isfinite(n[1]) && std::isfinite(n[2]);
    valid[i] = ok;
    // f32 with the device's (a*b + c*d) + e*f association
    if (ok) dpix[i] = (n[0] * p[0] + n[1] * p[1]) + n[2] * p[2];
  }
  auto connected = [&](size_t a, size_t b) {
    const float *na = &nrm[3 * a], *nb = &nrm[3 * b];
    float dotn = (na[0] * nb[0] + na[1] * nb[1]) + na[2] * nb[2];
    return dotn > cos_thr && std::fabs(dpix[a] - dpix[b]) < dist_thr;
  };
  std::vector<int32_t> par(HW);
  for (size_t i = 0; i < HW; ++i) par[i] = (int32_t)i;
  auto unite = [&](int a, int b) {
    int ra = uf_find(par, a), rb = uf_find(par, b);
    if (ra == rb) return;
    if (ra < rb)
      par[rb] = ra;
    else
      par[ra] = rb;
  };
  for (int r = 0; r < H; ++r)
    for (int c = 0; c < W; ++c) {
      size_t i = (size_t)r * W + c;
      if (!valid[i]) continue;
      if (c > 0 && valid[i - 1] && connected(i, i - 1))
        unite((int)i, (int)(i - 1));
      if (r > 0 && valid[i - W] && connected(i, i - W))
        unite((int)i, (int)(i - W));
    }
  labels.assign(HW, -1);
  for (size_t i = 0; i < HW; ++i)
    if (valid[i]) labels[i] = uf_find(par, (int)i);
}

std::vector<SegModel> fit_models(const std::vector<float> &xyz,
                                 const std::vector<int32_t> &labels,
                                 int min_inliers, double seg_max_curv) {
  // members per root, ascending root id
  std::vector<std::pair<int, int>> lab_px;
  for (size_t i = 0; i < labels.size(); ++i)
    if (labels[i] >= 0) lab_px.push_back({labels[i], (int)i});
  std::sort(lab_px.begin(), lab_px.end());
  std::vector<SegModel> models;
  size_t a = 0;
  while (a < lab_px.size()) {
    size_t b = a;
    while (b < lab_px.size() && lab_px[b].first == lab_px[a].first) ++b;
    int n = (int)(b - a);
    if (n >= min_inliers) {
      V3 c{0, 0, 0};
      for (size_t k = a; k < b; ++k) {
        const float *p = &xyz[3 * (size_t)lab_px[k].second];
        c = c + V3{p[0], p[1], p[2]};
      }
      c = (1.0 / n) * c;
      double A[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
      for (size_t k = a; k < b; ++k) {
        const float *p = &xyz[3 * (size_t)lab_px[k].second];
        V3 r = V3{p[0], p[1], p[2]} - c;
        double rr[3] = {r.x, r.y, r.z};
        for (int u = 0; u < 3; ++u)
          for (int v = 0; v < 3; ++v) A[u][v] += rr[u] * rr[v];
      }
      for (int u = 0; u < 3; ++u)
        for (int v = 0; v < 3; ++v) A[u][v] /= n;
      double w[3], V[3][3];
      eigh3(A, w, V);
      V3 nr{V[0][0], V[1][0], V[2][0]};
      if (dot(nr, c) > 0) nr = -1.0 * nr;
      double curv = w[0] / std::max(w[0] + w[1] + w[2], 1e-12);
      if (curv < seg_max_curv)
        models.push_back({lab_px[a].first, c, nr, curv});
    }
    a = b;
  }
  return models;
}

void refine_labels(const std::vector<float> &xyz, int H, int W,
                   std::vector<int32_t> &labels,
                   const std::vector<SegModel> &models, float dist_thr) {
  size_t HW = (size_t)H * W;
  // model lookup by label; fit test in f32 like the device path
  std::vector<int> midx;  // parallel arrays: label -> (n, d)
  std::vector<float> mn, md;
  std::vector<int32_t> model_of(HW, -1);  // per-pixel model index or -1
  for (size_t m = 0; m < models.size(); ++m) {
    midx.push_back(models[m].label);
    mn.push_back((float)models[m].normal.x);
    mn.push_back((float)models[m].normal.y);
    mn.push_back((float)models[m].normal.z);
    md.push_back((float)dot(models[m].normal, models[m].center));
  }
  auto model_index = [&](int lab) {
    for (size_t m = 0; m < midx.size(); ++m)
      if (midx[m] == lab) return (int)m;
    return -1;
  };
  for (size_t i = 0; i < HW; ++i)
    if (labels[i] >= 0) model_of[i] = model_index(labels[i]);

  std::vector<char> valid(HW);
  for (size_t i = 0; i < HW; ++i) {
    const float *p = &xyz[3 * i];
    valid[i] = std::isfinite(p[0]) && std::isfinite(p[1]) &&
               std::isfinite(p[2]);
  }
  const int drc[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
  bool changed = true;
  while (changed) {
    changed = false;
    std::vector<std::pair<size_t, int>> grow;  // (pixel, model idx)
    for (int r = 0; r < H; ++r)
      for (int c = 0; c < W; ++c) {
        size_t i = (size_t)r * W + c;
        if (labels[i] >= 0 || !valid[i]) continue;
        int best_m = -1, best_lab = -1;
        for (auto &d4 : drc) {
          int rr = r + d4[0], cc = c + d4[1];
          if (rr < 0 || rr >= H || cc < 0 || cc >= W) continue;
          size_t j = (size_t)rr * W + cc;
          int m = model_of[j];
          if (m < 0) continue;  // unlabeled or non-model region
          const float *p = &xyz[3 * i];
          float fit = std::fabs(
              ((mn[3 * m] * p[0] + mn[3 * m + 1] * p[1]) +
               mn[3 * m + 2] * p[2]) -
              md[m]);
          if (fit < dist_thr && labels[j] > best_lab) {
            best_lab = labels[j];
            best_m = m;
          }
        }
        if (best_m >= 0) grow.push_back({i, best_m});
      }
    for (auto &g : grow) {
      labels[g.first] = midx[g.second];
      model_of[g.first] = g.second;
      changed = true;
    }
  }
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: planes_oracle <input.bin>\n");
    return 2;
  }
  FILE *f = std::fopen(argv[1], "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  auto rd = [&](void *dst, size_t nbytes) {
    if (std::fread(dst, 1, nbytes, f) != nbytes) {
      std::fprintf(stderr, "truncated input\n");
      std::exit(2);
    }
  };
  int32_t magic, n_sensors, min_inliers;
  rd(&magic, 4);
  rd(&n_sensors, 4);
  rd(&min_inliers, 4);
  const bool seg_mode = (magic == 0x504C4E54);  // "PLNT": labels computed here
  if (magic != 0x504C4E53 && !seg_mode) {
    std::fprintf(stderr, "bad magic\n");
    return 2;
  }
  double min_area, max_elong, max_curv;
  rd(&min_area, 8);
  rd(&max_elong, 8);
  rd(&max_curv, 8);
  double angular = 0.0, distance = 0.0, seg_max_curv = 0.0;
  FILE *labf = nullptr;  // label sidecar: per sensor, pre- then post-refine
  if (seg_mode) {
    rd(&angular, 8);
    rd(&distance, 8);
    rd(&seg_max_curv, 8);
    if (argc >= 3) labf = std::fopen(argv[2], "wb");
  }

  std::vector<std::vector<Plane>> local(n_sensors);
  for (int s = 0; s < n_sensors; ++s) {
    int32_t H, W;
    rd(&H, 4);
    rd(&W, 4);
    double Rt[16];
    rd(Rt, sizeof(Rt));
    std::vector<double> xyz((size_t)H * W * 3);
    std::vector<float> xyzf;
    std::vector<uint8_t> rgb((size_t)H * W * 3);
    std::vector<int32_t> labels((size_t)H * W);
    std::vector<SegModel> models;  // seg_mode: per-model pre-refine fits
    if (seg_mode) {
      // f32 xyz + normals (the device path's types, so the connectivity
      // predicate evaluates the same arithmetic)
      xyzf.resize((size_t)H * W * 3);
      rd(xyzf.data(), xyzf.size() * 4);
      for (size_t i = 0; i < xyzf.size(); ++i) xyz[i] = xyzf[i];
      rd(rgb.data(), rgb.size());
      std::vector<float> nrm((size_t)H * W * 3);
      rd(nrm.data(), nrm.size() * 4);
      float cos_thr = (float)std::cos(angular);
      segment_ccl(xyzf, nrm, H, W, cos_thr, (float)distance, labels);
      if (labf) std::fwrite(labels.data(), 4, labels.size(), labf);
      models = fit_models(xyzf, labels, min_inliers, seg_max_curv);
      refine_labels(xyzf, H, W, labels, models, (float)distance);
      if (labf) std::fwrite(labels.data(), 4, labels.size(), labf);
    } else {
      rd(xyz.data(), xyz.size() * 8);
      rd(rgb.data(), rgb.size());
      rd(labels.data(), labels.size() * 4);
    }

    // group pixels by label (ascending label id, like the per-region loop)
    int max_lab = -1;
    for (auto l : labels) max_lab = std::max(max_lab, (int)l);
    std::vector<std::vector<int>> members(max_lab + 1);
    for (size_t i = 0; i < labels.size(); ++i)
      if (labels[i] >= 0) members[labels[i]].push_back((int)i);

    // seg_mode: only accepted models become planes (PCL's segment() keeps
    // the region list to models; refine may only have GROWN their member
    // sets), and their center/normal/curvature are the PRE-refine fits
    // (Frame360 reads regions[i] / model_coefficients[i] from segment()).
    std::vector<int> lab_order;
    if (seg_mode) {
      for (auto &m : models) lab_order.push_back(m.label);
    } else {
      for (int lab = 0; lab <= max_lab; ++lab) lab_order.push_back(lab);
    }

    for (size_t oi = 0; oi < lab_order.size(); ++oi) {
      int lab = lab_order[oi];
      const auto &px = members[lab];
      int n = (int)px.size();
      if (n < min_inliers) continue;
      Plane p;
      p.n = n;
      p.pts.reserve(n);
      p.col.reserve(3 * n);
      V3 c{0, 0, 0};
      for (int i : px) {
        V3 q{xyz[3 * (size_t)i], xyz[3 * (size_t)i + 1],
             xyz[3 * (size_t)i + 2]};
        p.pts.push_back(q);
        c = c + q;
        p.col.push_back(rgb[3 * (size_t)i]);
        p.col.push_back(rgb[3 * (size_t)i + 1]);
        p.col.push_back(rgb[3 * (size_t)i + 2]);
      }
      c = (1.0 / n) * c;
      double A[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
      for (auto &q : p.pts) {
        V3 r = q - c;
        double rr[3] = {r.x, r.y, r.z};
        for (int a = 0; a < 3; ++a)
          for (int b = 0; b < 3; ++b) A[a][b] += rr[a] * rr[b];
      }
      for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b) A[a][b] /= n;
      double w[3], V[3][3];
      eigh3(A, w, V);
      V3 nrm{V[0][0], V[1][0], V[2][0]};
      // toward-sensor flip (:988-992)
      if (dot(nrm, c) > 0) nrm = -1.0 * nrm;
      p.center = c;
      p.normal = nrm;
      p.curvature = w[0] / std::max(w[0] + w[1] + w[2], 1e-12);
      if (seg_mode) {
        p.center = models[oi].center;
        p.normal = models[oi].normal;
        p.curvature = models[oi].curvature;
      }
      compute_hull_area(p, p.pts);
      if (p.area < min_area) continue;  // :1034
      p.d = -dot(p.normal, p.center);
      if (p.elongation > max_elong) continue;  // :1041
      hue_hist(p.col, p.hist);
      // transform(Rt) (:1050): rotate/translate all geometry, recompute d
      {
        V3 R0{Rt[0], Rt[1], Rt[2]}, R1{Rt[4], Rt[5], Rt[6]},
            R2{Rt[8], Rt[9], Rt[10]};
        V3 t{Rt[3], Rt[7], Rt[11]};
        auto xf = [&](V3 q) {
          return V3{dot(R0, q) + t.x, dot(R1, q) + t.y, dot(R2, q) + t.z};
        };
        auto rot = [&](V3 q) { return V3{dot(R0, q), dot(R1, q), dot(R2, q)}; };
        p.normal = rot(p.normal);
        p.center = xf(p.center);
        p.d = -dot(p.normal, p.center);
        for (auto &q : p.pts) q = xf(q);
        for (auto &q : p.hull) q = xf(q);
      }
      // local same-plane merge (:1053-1068)
      bool same = false;
      if (p.curvature < max_curv)
        for (auto &prev : local[s])
          if (prev.curvature < max_curv &&
              is_same_plane(prev, p, 0.99, 0.05, 0.2)) {
            merge_plane2(prev, p);
            same = true;
            break;
          }
      if (!same) {
        p.id = (int)local[s].size();
        local[s].push_back(p);
      }
    }
    for (size_t i = 0; i < local[s].size(); ++i)
      print_plane("L", s, (int)i, local[s][i]);
  }

  // ---- groupPlanes (:742-832) ----
  double maxDistHull = 0.5, maxDistParallelHull = 0.09;
  std::vector<Plane> planes = local[0];
  std::set<int> prev_planes, first_planes;
  for (auto &p : planes) first_planes.insert(p.id);
  prev_planes = first_planes;
  for (int s = 1; s < n_sensors; ++s) {
    std::set<int> next_prev;
    for (auto &cand : local[s]) {
      int j = -1;
      bool bSame = false;
      if (cand.area > 0.5 || cand.curvature < max_curv)
        for (int it : prev_planes) {
          j = it;
          if (planes[j].area < 0.5 || planes[j].curvature > max_curv) continue;
          if (std::fabs(planes[j].d - cand.d) < 0.45 &&
              dot(planes[j].normal, cand.normal) > 0.99 &&
              same_surface(planes[j], cand, maxDistHull, maxDistParallelHull)) {
            bSame = true;
            break;
          }
        }
      if (bSame) {
        next_prev.insert(planes[j].id);
        Plane tmp = cand;
        merge_plane2(planes[j], tmp);
      } else {
        Plane add = cand;
        add.id = (int)planes.size();
        next_prev.insert(add.id);
        planes.push_back(add);
      }
    }
    prev_planes = next_prev;
    if (s == 6)  // 8->1 wraparound (:829-830)
      prev_planes.insert(first_planes.begin(), first_planes.end());
  }
  for (size_t i = 0; i < planes.size(); ++i)
    print_plane("G", -1, (int)i, planes[i]);

  // ---- mergePlanes (:657-739): literal erase/reindex/restart ----
  for (size_t j = 0; j < planes.size(); j++)
    if (planes[j].curvature < max_curv)
      for (size_t k = j + 1; k < planes.size(); k++)
        if (planes[k].curvature < max_curv) {
          bool bSame = false;
          if (dot(planes[j].normal, planes[k].normal) > 0.99 &&
              std::fabs(planes[j].d - planes[k].d) < 0.45)
            bSame = same_surface(planes[j], planes[k], 0.3, 0.06);
          if (bSame) {
            merge_plane2(planes[j], planes[k]);
            for (size_t h2 = k + 1; h2 < planes.size(); h2++)
              --planes[h2].id;
            planes.erase(planes.begin() + k);
            j--;
            k = planes.size();
          }
        }

  std::printf("final %d\n", (int)planes.size());
  for (size_t i = 0; i < planes.size(); ++i) {
    print_plane("F", -1, (int)i, planes[i]);
    std::printf("H %d", (int)i);
    for (int b = 0; b < 74; ++b) std::printf(" %.17g", planes[i].hist[b]);
    std::printf("\n");
  }
  std::fclose(f);
  if (labf) std::fclose(labf);
  return 0;
}
