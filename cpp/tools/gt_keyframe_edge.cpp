// Ground-truth relative edge between two keyframes, optionally compared
// with the estimated edge from posegraph_edges.csv. Same CLI/report as
// the reference tool (ref: cpp/tools/gt_keyframe_edge.cpp — the GT edge
// is R_ij = Rj Ri^T, t_ij = tj - R_ij ti; rotation error is
// |log(R_est R_gt^T)| in degrees; translation-direction error is the
// minimum angle vs +/- the GT direction).
//
//   gt_keyframe_edge --par P --keyframes K --i A --j B [--edges E]
//                    [--emit-csv]
#include <cmath>
#include <cstdio>
#include <string>
#include <vector>

#include "eval/io.hpp"
#include "eval/linalg3.hpp"

int main(int argc, char** argv) {
  std::string par_path, kf_path, edges_path;
  int ii = 0, jj = 1;
  bool emit_csv = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) throw std::runtime_error("missing value for " + a);
      return argv[++i];
    };
    if (a == "--par") par_path = next();
    else if (a == "--keyframes") kf_path = next();
    else if (a == "--edges") edges_path = next();
    else if (a == "--i") ii = std::stoi(next());
    else if (a == "--j") jj = std::stoi(next());
    else if (a == "--emit-csv") emit_csv = true;
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (par_path.empty() || kf_path.empty()) {
    std::fprintf(stderr,
                 "usage: gt_keyframe_edge --par P --keyframes K --i A --j B "
                 "[--edges E] [--emit-csv]\n");
    return 2;
  }
  try {
    const auto recs = ev::read_par(par_path);
    const auto rows = ev::read_keyframes_csv(kf_path);
    if (ii < 0 || jj < 0 || ii >= int(rows.size()) || jj >= int(rows.size()))
      throw std::runtime_error("--i/--j out of range");
    const auto& pi = ev::find_par(recs, rows[ii].image);
    const auto& pj = ev::find_par(recs, rows[jj].image);
    // GT relative pose i->j (world->cam convention of the par file)
    const ev::Mat3 R_gt = pj.R * pi.R.t();
    const ev::Vec3 t_gt = pj.t - R_gt * pi.t;
    const ev::Vec3 rvec_gt = ev::so3_log(R_gt);
    const ev::Vec3 tdir_gt = t_gt.unit();

    if (emit_csv) {
      std::printf("i,j,kind,rvec_x,rvec_y,rvec_z,t_x,t_y,t_z\n");
      std::printf("%d,%d,gt,%.17g,%.17g,%.17g,%.17g,%.17g,%.17g\n", ii, jj,
                  rvec_gt.x, rvec_gt.y, rvec_gt.z, t_gt.x, t_gt.y, t_gt.z);
      return 0;
    }

    std::printf("Keyframe edge (ground truth)\n");
    std::printf("  i=%d (%s)\n  j=%d (%s)\n", ii, rows[ii].image.c_str(), jj,
                rows[jj].image.c_str());
    std::printf("  rvec_gt = [%f, %f, %f]\n", rvec_gt.x, rvec_gt.y, rvec_gt.z);
    std::printf("  tdir_gt = [%f, %f, %f]\n", tdir_gt.x, tdir_gt.y, tdir_gt.z);

    if (!edges_path.empty()) {
      const auto edges = ev::read_edges_csv(edges_path);
      const ev::EdgeRow* found = nullptr;
      for (const auto& e : edges)
        if (e.i == ii && e.j == jj) { found = &e; break; }
      if (!found) {
        std::printf("\nEstimated edge: not found in %s\n", edges_path.c_str());
        return 1;
      }
      const ev::Mat3 R_est = ev::so3_exp(found->rvec);
      const ev::Vec3 tdir_est = found->t.unit();
      std::printf("\nEstimated edge (from %s)\n", edges_path.c_str());
      std::printf("  kind     = %s\n", found->kind.c_str());
      std::printf("  rvec_est = [%f, %f, %f]\n", found->rvec.x, found->rvec.y,
                  found->rvec.z);
      std::printf("  tdir_est = [%f, %f, %f]\n", tdir_est.x, tdir_est.y,
                  tdir_est.z);
      const double rot_err =
          ev::so3_log(R_est * R_gt.t()).norm() * 180.0 / M_PI;
      const double cdot =
          std::min(1.0, std::fabs(tdir_est.dot(tdir_gt)));
      const double dir_err = std::acos(cdot) * 180.0 / M_PI;
      std::printf("\nErrors vs ground truth\n");
      std::printf("  rotation error (deg)            = %f\n", rot_err);
      std::printf("  translation direction error (deg)= %f\n", dir_err);
    }
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
