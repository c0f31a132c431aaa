// dbg_driver.cpp — stage-by-stage instrumentation of the reference 3D
// pipeline (parity debugging only). Exposes the protected stage methods
// via a derived class and dumps node sets between stages.
//
// Usage: dbg_driver <in3d.bin> <out.bin>   (same input as ref_driver 3d,
// 2 frames expected). Output: int32 n1, pos1[3*n1]  (after frame1)
//                             int32 n2a, pos2a[...] (frame2 after reeval)
//                             int32 n2b, pos2b[...] (frame2 after newmeas)

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "GPisMap3.h"

struct P3 : GPisMap3 {
  using GPisMap3::preprocData;
  using GPisMap3::regressObs;
  using GPisMap3::updateMapPoints;
  using GPisMap3::addNewMeas;
  using GPisMap3::updateGPs;
};

static std::vector<float> read_floats(FILE* f, size_t n) {
  std::vector<float> v(n);
  if (fread(v.data(), sizeof(float), n, f) != n) exit(1);
  return v;
}
static int read_i32(FILE* f) {
  int v;
  if (fread(&v, 4, 1, f) != 1) exit(1);
  return v;
}
static void dump(FILE* out, GPisMap3& g) {
  std::vector<float> p;
  g.getAllPoints(p);
  int n = (int)(p.size() / 3);
  fwrite(&n, 4, 1, out);
  fwrite(p.data(), 4, p.size(), out);
  fprintf(stderr, "nodes: %d\n", n);
}

int main(int argc, char** argv) {
  if (argc != 3) return 2;
  FILE* in = fopen(argv[1], "rb");
  int width = read_i32(in);
  int height = read_i32(in);
  int nframes = read_i32(in);
  int ntest = read_i32(in);
  (void)ntest;
  FILE* out = fopen(argv[2], "wb");

  P3 gpm;
  for (int f = 0; f < nframes && f < 2; ++f) {
    std::vector<float> intr = read_floats(in, 4);
    std::vector<float> pose = read_floats(in, 12);
    std::vector<float> depth = read_floats(in, (size_t)width * height);
    camParam c(intr[0], intr[1], intr[2], intr[3], (float)width,
               (float)height);
    gpm.resetCam(c);
    if (f == 0) {
      gpm.update(depth.data(), width * height, pose);
      dump(out, gpm);
    } else {
      gpm.preprocData(depth.data(), width * height, pose);
      gpm.regressObs();
      gpm.updateMapPoints();
      dump(out, gpm);
      gpm.addNewMeas();
      dump(out, gpm);
      gpm.updateGPs();
    }
  }
  fclose(in);
  fclose(out);
  return 0;
}
