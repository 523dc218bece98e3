// Small self-contained 3x3 linear algebra for the evaluation tools.
// Own implementation (API-compatible role of the reference's
// cpp/include/linalg.hpp + the Umeyama in cpp/tools/ate_keyframes.cpp,
// re-derived from the standard formulas).
#pragma once
#include <array>
#include <cmath>
#include <vector>

namespace ev {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  Vec3 unit() const {
    double n = norm();
    return n > 1e-300 ? (*this) * (1.0 / n) : Vec3{0, 0, 0};
  }
};

struct Mat3 {
  double m[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  static Mat3 I() {
    Mat3 r;
    r.m[0][0] = r.m[1][1] = r.m[2][2] = 1.0;
    return r;
  }
  Vec3 operator*(const Vec3& v) const {
    return {m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z,
            m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z,
            m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z};
  }
  Mat3 operator*(const Mat3& o) const {
    Mat3 r;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += m[i][k] * o.m[k][j];
        r.m[i][j] = s;
      }
    return r;
  }
  Mat3 t() const {
    Mat3 r;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) r.m[i][j] = m[j][i];
    return r;
  }
  double det() const {
    return m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
           m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
           m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
  }
};

// Jacobi eigen-decomposition of a symmetric 3x3: A = V diag(w) V^T,
// eigenvalues ascending.
inline void eig_sym3(const Mat3& A, double w[3], Mat3& V) {
  double a[3][3];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) a[i][j] = A.m[i][j];
  V = Mat3::I();
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = std::fabs(a[0][1]) + std::fabs(a[0][2]) + std::fabs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(a[p][q]) < 1e-300) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V.m[k][p], vkq = V.m[k][q];
          V.m[k][p] = c * vkp - s * vkq;
          V.m[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int idx[3] = {0, 1, 2};
  double d[3] = {a[0][0], a[1][1], a[2][2]};
  // ascending sort (3 elements)
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (d[idx[j]] < d[idx[i]]) std::swap(idx[i], idx[j]);
  Mat3 Vs;
  for (int c = 0; c < 3; ++c) {
    w[c] = d[idx[c]];
    for (int r = 0; r < 3; ++r) Vs.m[r][c] = V.m[r][idx[c]];
  }
  V = Vs;
}

// SVD of a general 3x3: A = U diag(s) V^T, singular values descending.
inline void svd3(const Mat3& A, Mat3& U, double s[3], Mat3& V) {
  Mat3 AtA = A.t() * A;
  double w[3];
  Mat3 Vw;
  eig_sym3(AtA, w, Vw);
  // descending
  Mat3 Vd;
  for (int c = 0; c < 3; ++c) {
    s[c] = std::sqrt(std::max(w[2 - c], 0.0));
    for (int r = 0; r < 3; ++r) Vd.m[r][c] = Vw.m[r][2 - c];
  }
  V = Vd;
  // U columns = A v_c / s_c, with Gram-Schmidt completion for tiny s
  Vec3 u[3];
  for (int c = 0; c < 3; ++c) {
    Vec3 vcol{V.m[0][c], V.m[1][c], V.m[2][c]};
    Vec3 av = A * vcol;
    if (s[c] > 1e-12 * (s[0] + 1e-300)) {
      u[c] = av * (1.0 / s[c]);
    } else {
      u[c] = {0, 0, 0};
    }
  }
  // re-orthonormalize
  if (u[0].norm() < 1e-12) u[0] = {1, 0, 0};
  u[0] = u[0].unit();
  u[1] = u[1] - u[0] * u[0].dot(u[1]);
  if (u[1].norm() < 1e-12) {
    Vec3 h = std::fabs(u[0].x) < 0.9 ? Vec3{1, 0, 0} : Vec3{0, 1, 0};
    u[1] = u[0].cross(h);
  }
  u[1] = u[1].unit();
  // Complete U with the cross product, then orient it to match A v2 so
  // that U diag(s) V^T = A for full-rank A (without this sign check the
  // reconstruction is off by a reflection whenever A v2 is anti-parallel
  // to u0 x u1, which makes the Umeyama rotation grossly suboptimal).
  // Keep the right-handed completion when s2 ~ 0 (rank-2 input); mirrors
  // the batched JAX twin in sfm_tpu/ops/linalg.py (svd3_jacobi).
  u[2] = u[0].cross(u[1]);
  {
    Vec3 v2{V.m[0][2], V.m[1][2], V.m[2][2]};
    Vec3 av2 = A * v2;
    double d2 = u[2].dot(av2);
    if (std::fabs(d2) > 1e-9 && d2 < 0) u[2] = u[2] * -1.0;
  }
  for (int c = 0; c < 3; ++c) {
    U.m[0][c] = u[c].x;
    U.m[1][c] = u[c].y;
    U.m[2][c] = u[c].z;
  }
}

// SO(3) log: rotation matrix -> axis-angle vector.
inline Vec3 so3_log(const Mat3& R) {
  double tr = R.m[0][0] + R.m[1][1] + R.m[2][2];
  double c = std::max(-1.0, std::min(1.0, (tr - 1.0) * 0.5));
  double th = std::acos(c);
  Vec3 v{R.m[2][1] - R.m[1][2], R.m[0][2] - R.m[2][0], R.m[1][0] - R.m[0][1]};
  if (th < 1e-9) return v * 0.5;
  double sn = std::sin(th);
  if (std::fabs(sn) < 1e-9) {
    // near pi: axis from diagonal of (R+I)/2
    Vec3 a{std::sqrt(std::max(0.0, (R.m[0][0] + 1) / 2)),
           std::sqrt(std::max(0.0, (R.m[1][1] + 1) / 2)),
           std::sqrt(std::max(0.0, (R.m[2][2] + 1) / 2))};
    if (v.x < 0) a.x = -a.x;
    if (v.y < 0) a.y = -a.y;
    if (v.z < 0) a.z = -a.z;
    return a.unit() * th;
  }
  return v * (th / (2.0 * sn));
}

// axis-angle -> rotation matrix (Rodrigues)
inline Mat3 so3_exp(const Vec3& w) {
  double th = w.norm();
  Mat3 R = Mat3::I();
  if (th < 1e-12) return R;
  Vec3 a = w * (1.0 / th);
  double c = std::cos(th), s = std::sin(th), C = 1 - c;
  R.m[0][0] = c + a.x * a.x * C;
  R.m[0][1] = a.x * a.y * C - a.z * s;
  R.m[0][2] = a.x * a.z * C + a.y * s;
  R.m[1][0] = a.y * a.x * C + a.z * s;
  R.m[1][1] = c + a.y * a.y * C;
  R.m[1][2] = a.y * a.z * C - a.x * s;
  R.m[2][0] = a.z * a.x * C - a.y * s;
  R.m[2][1] = a.z * a.y * C + a.x * s;
  R.m[2][2] = c + a.z * a.z * C;
  return R;
}

struct Sim3 {
  double s = 1.0;
  Mat3 R = Mat3::I();
  Vec3 t{};
};

// Umeyama least-squares alignment dst ~= s R src + t.
inline Sim3 umeyama(const std::vector<Vec3>& src, const std::vector<Vec3>& dst,
                    bool with_scale) {
  const size_t n = src.size();
  Vec3 ms{}, md{};
  for (size_t i = 0; i < n; ++i) {
    ms = ms + src[i];
    md = md + dst[i];
  }
  ms = ms * (1.0 / n);
  md = md * (1.0 / n);
  Mat3 cov{};
  double var_s = 0;
  for (size_t i = 0; i < n; ++i) {
    Vec3 a = dst[i] - md, b = src[i] - ms;
    cov.m[0][0] += a.x * b.x; cov.m[0][1] += a.x * b.y; cov.m[0][2] += a.x * b.z;
    cov.m[1][0] += a.y * b.x; cov.m[1][1] += a.y * b.y; cov.m[1][2] += a.y * b.z;
    cov.m[2][0] += a.z * b.x; cov.m[2][1] += a.z * b.y; cov.m[2][2] += a.z * b.z;
    var_s += b.dot(b);
  }
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) cov.m[i][j] /= double(n);
  var_s /= double(n);
  Mat3 U, V;
  double s[3];
  svd3(cov, U, s, V);
  double d3 = (U.det() * V.det() < 0) ? -1.0 : 1.0;
  Mat3 D = Mat3::I();
  D.m[2][2] = d3;
  Sim3 out;
  out.R = U * D * V.t();
  out.s = with_scale && var_s > 1e-300
              ? (s[0] + s[1] + d3 * s[2]) / var_s
              : 1.0;
  out.t = md - out.R * ms * out.s;
  return out;
}

}  // namespace ev
