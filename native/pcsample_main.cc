// pcsample CLI — drop-in for the reference's missing PCL mesh sampler
// (prepare_data/data_prep_util.py:23-28 command shape:
//  pcsample <obj> <ply> -n_samples N -leaf_size L).
// Reads a Wavefront OBJ, samples N points uniformly by area, applies a
// voxel-grid filter of leaf L, writes an ASCII PLY.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

extern "C" {
int sample_mesh(const float*, int64_t, const int32_t*, int64_t, int64_t,
                uint64_t, float*);
int64_t voxel_downsample(const float*, int64_t, float, float*);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s in.obj out.ply [-n_samples N] [-leaf_size L]\n",
                 argv[0]);
    return 1;
  }
  int64_t n_samples = 2048;
  float leaf = 0.0f;
  for (int i = 3; i + 1 < argc; i += 2) {
    if (!std::strcmp(argv[i], "-n_samples")) n_samples = std::atoll(argv[i + 1]);
    if (!std::strcmp(argv[i], "-leaf_size")) leaf = std::atof(argv[i + 1]);
  }

  std::ifstream in(argv[1]);
  if (!in) { std::fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
  std::vector<float> verts;
  std::vector<int32_t> faces;
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      float x, y, z;
      ss >> x >> y >> z;
      verts.push_back(x); verts.push_back(y); verts.push_back(z);
    } else if (tag == "f") {
      std::vector<int32_t> poly;
      std::string tok;
      while (ss >> tok) {
        poly.push_back(std::atoi(tok.c_str()) - 1);  // OBJ is 1-based
      }
      for (size_t t = 2; t < poly.size(); ++t) {  // fan-triangulate
        faces.push_back(poly[0]);
        faces.push_back(poly[t - 1]);
        faces.push_back(poly[t]);
      }
    }
  }

  std::vector<float> sampled(3 * n_samples);
  if (sample_mesh(verts.data(), verts.size() / 3, faces.data(),
                  faces.size() / 3, n_samples, 0xC0FFEE, sampled.data())) {
    std::fprintf(stderr, "sampling failed\n");
    return 1;
  }
  std::vector<float> filtered(3 * n_samples);
  int64_t m = voxel_downsample(sampled.data(), n_samples, leaf,
                               filtered.data());

  std::ofstream out(argv[2]);
  out << "ply\nformat ascii 1.0\nelement vertex " << m
      << "\nproperty float x\nproperty float y\nproperty float z\n"
         "end_header\n";
  for (int64_t i = 0; i < m; ++i)
    out << filtered[3 * i] << ' ' << filtered[3 * i + 1] << ' '
        << filtered[3 * i + 2] << '\n';
  return 0;
}
