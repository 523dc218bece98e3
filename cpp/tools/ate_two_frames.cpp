// ATE RMSE for one keyframe PAIR with closed-form minimal alignment:
// rotate the estimated baseline onto the GT baseline (Rodrigues from
// cross/dot, antiparallel-safe), optionally scale by the length ratio
// (Sim(3)), translate midpoints. Same CLI/report as the reference tool
// (ref: cpp/tools/ate_two_frames.cpp — re-implemented from the geometry).
//
//   ate_two_frames --par P --keyframes K --i A --j B [--sim3|--se3]
#include <cmath>
#include <cstdio>
#include <string>
#include <vector>

#include "eval/io.hpp"
#include "eval/linalg3.hpp"

// Minimal rotation taking unit vector a onto unit vector b.
static ev::Mat3 rotation_align(const ev::Vec3& a, const ev::Vec3& b) {
  const double c = a.dot(b);
  ev::Vec3 axis = a.cross(b);
  const double s = axis.norm();
  if (s < 1e-12) {
    if (c > 0) return ev::Mat3::I();
    // antiparallel: rotate pi about any axis orthogonal to a
    ev::Vec3 h = std::fabs(a.x) < 0.9 ? ev::Vec3{1, 0, 0} : ev::Vec3{0, 1, 0};
    ev::Vec3 ax = a.cross(h).unit();
    return ev::so3_exp(ax * M_PI);
  }
  const double ang = std::atan2(s, c);
  return ev::so3_exp(axis.unit() * ang);
}

int main(int argc, char** argv) {
  std::string par_path, kf_path;
  int ii = 0, jj = 1;
  bool with_scale = true;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) throw std::runtime_error("missing value for " + a);
      return argv[++i];
    };
    if (a == "--par") par_path = next();
    else if (a == "--keyframes") kf_path = next();
    else if (a == "--i") ii = std::stoi(next());
    else if (a == "--j") jj = std::stoi(next());
    else if (a == "--sim3") with_scale = true;
    else if (a == "--se3") with_scale = false;
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (par_path.empty() || kf_path.empty()) {
    std::fprintf(stderr,
                 "usage: ate_two_frames --par P --keyframes K --i A --j B "
                 "[--sim3|--se3]\n");
    return 2;
  }
  try {
    const auto recs = ev::read_par(par_path);
    const auto rows = ev::read_keyframes_csv(kf_path);
    if (ii < 0 || jj < 0 || ii >= int(rows.size()) || jj >= int(rows.size()))
      throw std::runtime_error("--i/--j out of range");
    const auto& ri = rows[ii];
    const auto& rj = rows[jj];
    const ev::Vec3 gi = ev::find_par(recs, ri.image).center();
    const ev::Vec3 gj = ev::find_par(recs, rj.image).center();

    const ev::Vec3 be = rj.center - ri.center;
    const ev::Vec3 bg = gj - gi;
    const double le = be.norm(), lg = bg.norm();
    const double s = (with_scale && le > 1e-300) ? lg / le : 1.0;
    const ev::Mat3 R = rotation_align(be.unit(), bg.unit());
    // align midpoints after rotate+scale
    const ev::Vec3 me = (ri.center + rj.center) * 0.5;
    const ev::Vec3 mg = (gi + gj) * 0.5;
    auto apply = [&](const ev::Vec3& p) {
      return R * (p - me) * s + mg;
    };
    const double e0 = (apply(ri.center) - gi).norm();
    const double e1 = (apply(rj.center) - gj).norm();
    const double rmse = std::sqrt(0.5 * (e0 * e0 + e1 * e1));

    std::printf("\nATE (two frames)\n");
    std::printf("  mode: %s\n", with_scale ? "Sim(3)" : "SE(3)");
    std::printf("  frames: [%d] %s  [%d] %s\n", ii, ri.image.c_str(), jj,
                rj.image.c_str());
    std::printf("  baseline_est: %g\n", le);
    std::printf("  baseline_gt:  %g\n", lg);
    std::printf("  scale (s): %g\n", s);
    std::printf("  ATE_RMSE: %g\n", rmse);
    std::printf("  per_frame_error:\n");
    std::printf("    %s: %g\n", ri.image.c_str(), e0);
    std::printf("    %s: %g\n", rj.image.c_str(), e1);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
