// ATE RMSE over N keyframes after Umeyama Sim(3)/SE(3) alignment.
// Same CLI and report structure as the reference tool
// (ref: cpp/tools/ate_keyframes.cpp — re-implemented from the standard
// Umeyama formulation, not copied).
//
//   ate_keyframes --par <templeR_par.txt> --keyframes <centers.csv>
//                 --start S --count N [--sim3|--se3]
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "eval/io.hpp"
#include "eval/linalg3.hpp"

int main(int argc, char** argv) {
  std::string par_path, kf_path;
  int start = 0, count = -1;
  bool with_scale = true;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) throw std::runtime_error("missing value for " + a);
      return argv[++i];
    };
    if (a == "--par") par_path = next();
    else if (a == "--keyframes") kf_path = next();
    else if (a == "--start") start = std::stoi(next());
    else if (a == "--count") count = std::stoi(next());
    else if (a == "--sim3") with_scale = true;
    else if (a == "--se3") with_scale = false;
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (par_path.empty() || kf_path.empty()) {
    std::fprintf(stderr,
                 "usage: ate_keyframes --par P --keyframes K --start S "
                 "--count N [--sim3|--se3]\n");
    return 2;
  }
  try {
    const auto recs = ev::read_par(par_path);
    auto rows = ev::read_keyframes_csv(kf_path);
    if (count < 0) count = int(rows.size()) - start;
    if (start < 0 || start + count > int(rows.size()) || count < 2)
      throw std::runtime_error("invalid --start/--count range");
    rows = {rows.begin() + start, rows.begin() + start + count};

    std::vector<ev::Vec3> est, gt;
    for (const auto& r : rows) {
      est.push_back(r.center);
      gt.push_back(ev::find_par(recs, r.image).center());
    }
    const auto T = ev::umeyama(est, gt, with_scale);
    std::vector<double> err;
    double sq = 0;
    for (size_t k = 0; k < est.size(); ++k) {
      ev::Vec3 a = T.R * est[k] * T.s + T.t;
      double e = (a - gt[k]).norm();
      err.push_back(e);
      sq += e * e;
    }
    double rmse = std::sqrt(sq / err.size());
    std::vector<double> srt = err;
    std::sort(srt.begin(), srt.end());
    // element-at-n/2 convention matches the reference tool's output
    double med = srt[srt.size() / 2];
    double mean = 0, mx = 0;
    for (double e : err) { mean += e; mx = std::max(mx, e); }
    mean /= err.size();

    std::printf("\nATE (N keyframes)\n");
    std::printf("  mode: %s\n", with_scale ? "Sim(3)" : "SE(3)");
    std::printf("  start: %d  count: %d\n", start, count);
    std::printf("  keyframes:\n");
    for (size_t k = 0; k < rows.size(); ++k)
      std::printf("    [%zu] %s\n", k, rows[k].image.c_str());
    if (with_scale) std::printf("  scale (s): %g\n", T.s);
    std::printf("  ATE_RMSE: %g\n", rmse);
    std::printf("  mean/median/max: %g / %g / %g\n", mean, med, mx);
    std::printf("  per_frame_error:\n");
    for (size_t k = 0; k < rows.size(); ++k)
      std::printf("    %s: %g\n", rows[k].image.c_str(), err[k]);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
