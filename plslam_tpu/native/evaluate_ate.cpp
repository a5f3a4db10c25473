// Native trajectory evaluation: ATE RMSE between two TUM-format files
// (t x y z qx qy qz qw per line) with timestamp association and optional
// similarity alignment (Umeyama, rotation+translation, no scale) — the
// evaluation step of the reference's EuRoC workflow
// (config/asl/gt-ass/*/groundtruth.txt + SaveKeyFrameTrajectoryTUM output)
// as a standalone C++ tool for production pipelines without Python.
//
// Build:  make -C plslam_tpu/native evaluate_ate
// Usage:  evaluate_ate EST.txt GT.txt [--max-dt 0.02] [--no-align]
// Output: one JSON line {"ate_rmse": ..., "n_pairs": ...}

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

struct Sample {
  double t;
  std::array<double, 3> p;
};

static std::vector<Sample> read_tum(const std::string& path) {
  std::vector<Sample> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    for (char& c : line)
      if (c == ',') c = ' ';
    std::istringstream ss(line);
    std::vector<double> v;
    double x;
    while (ss >> x) v.push_back(x);
    if (v.size() == 12) {  // reference gt-ass 3x4 pose rows (no timestamp)
      out.push_back({double(out.size()), {v[3], v[7], v[11]}});
    } else if (v.size() >= 4) {  // TUM: t x y z [q...]
      double t = v[0] > 1e14 ? v[0] * 1e-9 : v[0];
      out.push_back({t, {v[1], v[2], v[3]}});
    }
  }
  return out;
}

// 3x3 SVD via Jacobi eigen-decomposition of A^T A (A is 3x3; enough for
// the Umeyama rotation).  Returns U, S, V with A = U diag(S) V^T.
static void svd3(const double A[3][3], double U[3][3], double S[3],
                 double V[3][3]) {
  double ATA[3][3];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      ATA[i][j] = 0;
      for (int k = 0; k < 3; k++) ATA[i][j] += A[k][i] * A[k][j];
    }
  // Jacobi rotations on ATA -> V, eigvals
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  double a[3][3];
  std::memcpy(a, ATA, sizeof(a));
  for (int sweep = 0; sweep < 50; sweep++) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int order[3] = {0, 1, 2};
  double ev[3] = {a[0][0], a[1][1], a[2][2]};
  std::sort(order, order + 3, [&](int i, int j) { return ev[i] > ev[j]; });
  for (int j = 0; j < 3; j++) {
    S[j] = std::sqrt(std::max(ev[order[j]], 0.0));
    for (int i = 0; i < 3; i++) V[i][j] = v[i][order[j]];
  }
  // U = A V S^-1 (guard tiny singular values)
  for (int j = 0; j < 3; j++) {
    double inv = S[j] > 1e-12 ? 1.0 / S[j] : 0.0;
    for (int i = 0; i < 3; i++) {
      U[i][j] = 0;
      for (int k = 0; k < 3; k++) U[i][j] += A[i][k] * V[k][j];
      U[i][j] *= inv;
    }
  }
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s EST.txt GT.txt [--max-dt D] [--no-align]\n",
                 argv[0]);
    return 2;
  }
  double max_dt = 0.02;
  bool align = true;
  for (int i = 3; i < argc; i++) {
    if (!std::strcmp(argv[i], "--max-dt") && i + 1 < argc)
      max_dt = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--no-align"))
      align = false;
  }
  auto est = read_tum(argv[1]);
  auto gt = read_tum(argv[2]);
  if (est.empty() || gt.empty()) {
    std::fprintf(stderr, "empty trajectory\n");
    return 1;
  }

  // associate by nearest timestamp (gt sorted)
  std::vector<std::array<double, 3>> E, G;
  size_t j = 0;
  for (const auto& s : est) {
    while (j + 1 < gt.size() &&
           std::abs(gt[j + 1].t - s.t) <= std::abs(gt[j].t - s.t))
      j++;
    if (std::abs(gt[j].t - s.t) <= max_dt) {
      E.push_back(s.p);
      G.push_back(gt[j].p);
    }
  }
  if (E.size() < 2) {
    std::fprintf(stderr, "no associated pairs (max_dt=%g)\n", max_dt);
    return 1;
  }
  size_t n = E.size();

  if (align) {  // Umeyama rotation+translation
    double me[3] = {0, 0, 0}, mg[3] = {0, 0, 0};
    for (size_t k = 0; k < n; k++)
      for (int d = 0; d < 3; d++) {
        me[d] += E[k][d] / n;
        mg[d] += G[k][d] / n;
      }
    double C[3][3] = {};
    for (size_t k = 0; k < n; k++)
      for (int i = 0; i < 3; i++)
        for (int jj = 0; jj < 3; jj++)
          C[i][jj] += (G[k][i] - mg[i]) * (E[k][jj] - me[jj]) / n;
    double U[3][3], S[3], V[3][3];
    svd3(C, U, S, V);
    // R = U diag(1,1,det(UV^T)) V^T
    double det = 0;
    {
      double UVt[3][3] = {};
      for (int i = 0; i < 3; i++)
        for (int jj = 0; jj < 3; jj++)
          for (int k = 0; k < 3; k++) UVt[i][jj] += U[i][k] * V[jj][k];
      det = UVt[0][0] * (UVt[1][1] * UVt[2][2] - UVt[1][2] * UVt[2][1]) -
            UVt[0][1] * (UVt[1][0] * UVt[2][2] - UVt[1][2] * UVt[2][0]) +
            UVt[0][2] * (UVt[1][0] * UVt[2][1] - UVt[1][1] * UVt[2][0]);
    }
    double D[3] = {1, 1, det >= 0 ? 1.0 : -1.0};
    double R[3][3] = {};
    for (int i = 0; i < 3; i++)
      for (int jj = 0; jj < 3; jj++)
        for (int k = 0; k < 3; k++)
          R[i][jj] += U[i][k] * D[k] * V[jj][k];
    double tvec[3];
    for (int d = 0; d < 3; d++) {
      tvec[d] = mg[d];
      for (int k = 0; k < 3; k++) tvec[d] -= R[d][k] * me[k];
    }
    for (size_t k = 0; k < n; k++) {
      double p[3];
      for (int d = 0; d < 3; d++) {
        p[d] = tvec[d];
        for (int kk = 0; kk < 3; kk++) p[d] += R[d][kk] * E[k][kk];
      }
      for (int d = 0; d < 3; d++) E[k][d] = p[d];
    }
  }

  double se = 0;
  for (size_t k = 0; k < n; k++)
    for (int d = 0; d < 3; d++) {
      double e = E[k][d] - G[k][d];
      se += e * e;
    }
  std::printf("{\"ate_rmse\": %.6f, \"n_pairs\": %zu}\n",
              std::sqrt(se / n), n);
  return 0;
}
