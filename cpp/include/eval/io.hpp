// Parsers for the artifact/GT files the evaluation tools consume:
// Middlebury par files, keyframe-center CSVs, pose-graph edge CSVs.
// Own implementation of the formats described in SURVEY.md
// (ref: cpp/tools/ate_keyframes.cpp:120-205, gt_keyframe_edge.cpp:217+).
#pragma once
#include <fstream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "eval/linalg3.hpp"

namespace ev {

struct ParRecord {
  std::string img;
  Mat3 K, R;  // R: world->camera
  Vec3 t;
  Vec3 center() const { return (R.t() * t) * -1.0; }
};

inline std::vector<ParRecord> read_par(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open par file: " + path);
  int n = 0;
  f >> n;
  std::vector<ParRecord> out;
  out.reserve(n);
  for (int i = 0; i < n && f; ++i) {
    ParRecord r;
    f >> r.img;
    double v[21];
    for (double& x : v)
      if (!(f >> x)) return out;
    int k = 0;
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) r.K.m[a][b] = v[k++];
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) r.R.m[a][b] = v[k++];
    r.t = {v[18], v[19], v[20]};
    out.push_back(r);
  }
  return out;
}

inline std::vector<std::string> split_csv(const std::string& line) {
  std::vector<std::string> out;
  std::stringstream ss(line);
  std::string tok;
  while (std::getline(ss, tok, ',')) out.push_back(tok);
  return out;
}

struct KeyframeRow {
  int kf_id = 0, frame_idx = 0;
  std::string image;
  Vec3 center;
};

inline std::vector<KeyframeRow> read_keyframes_csv(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open keyframes csv: " + path);
  std::string line;
  std::getline(f, line);
  auto hdr = split_csv(line);
  std::map<std::string, int> col;
  for (size_t i = 0; i < hdr.size(); ++i) col[hdr[i]] = int(i);
  for (const char* need : {"image", "x", "y", "z"})
    if (!col.count(need))
      throw std::runtime_error(std::string("keyframes csv missing column: ") + need);
  std::vector<KeyframeRow> out;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    auto v = split_csv(line);
    KeyframeRow r;
    if (col.count("kf_id")) r.kf_id = std::stoi(v[col["kf_id"]]);
    if (col.count("frame_idx")) r.frame_idx = std::stoi(v[col["frame_idx"]]);
    r.image = v[col["image"]];
    r.center = {std::stod(v[col["x"]]), std::stod(v[col["y"]]),
                std::stod(v[col["z"]])};
    out.push_back(r);
  }
  return out;
}

struct EdgeRow {
  int i = 0, j = 0;
  std::string kind = "odom";
  Vec3 rvec, t;
};

inline std::vector<EdgeRow> read_edges_csv(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open edges csv: " + path);
  std::string line;
  std::getline(f, line);
  auto hdr = split_csv(line);
  std::map<std::string, int> col;
  for (size_t i = 0; i < hdr.size(); ++i) col[hdr[i]] = int(i);
  for (const char* need :
       {"i", "j", "kind", "rvec_x", "rvec_y", "rvec_z", "t_x", "t_y", "t_z"})
    if (!col.count(need))
      throw std::runtime_error(std::string("edges csv missing column: ") + need);
  std::vector<EdgeRow> out;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    auto v = split_csv(line);
    EdgeRow r;
    r.i = std::stoi(v[col["i"]]);
    r.j = std::stoi(v[col["j"]]);
    r.kind = v[col["kind"]];
    r.rvec = {std::stod(v[col["rvec_x"]]), std::stod(v[col["rvec_y"]]),
              std::stod(v[col["rvec_z"]])};
    r.t = {std::stod(v[col["t_x"]]), std::stod(v[col["t_y"]]),
           std::stod(v[col["t_z"]])};
    out.push_back(r);
  }
  return out;
}

inline const ParRecord& find_par(const std::vector<ParRecord>& recs,
                                 const std::string& img) {
  for (const auto& r : recs)
    if (r.img == img) return r;
  throw std::runtime_error("image not in par file: " + img);
}

}  // namespace ev
