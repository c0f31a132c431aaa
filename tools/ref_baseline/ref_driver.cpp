// ref_driver.cpp — golden-output capture driver for the REFERENCE C++ core.
//
// Compiles the unmodified reference sources (read-only at /root/reference)
// behind a tiny file-based CLI so parity tests and BASELINE.md numbers can
// be produced without MATLAB (the mex layer is the only MATLAB dependency;
// see BASELINE.md "Baseline protocol"). This driver is tooling only — it is
// NOT part of the gpismap_tpu framework and links no framework code.
//
// Usage:
//   ref_driver 2d <input.bin> <output.bin>
//   ref_driver 3d <input.bin> <output.bin>
//
// 2D input (little-endian):
//   int32 nbeams, nframes, ntest
//   float thetas[nbeams]
//   per frame: float pose[6]; float ranges[nbeams]
//   float xtest[2*ntest]
// 2D output:
//   float update_seconds[nframes]
//   float test_seconds
//   float res[6*ntest]
//
// 3D input:
//   int32 width, height, nframes, ntest
//   per frame: float fx, fy, cx, cy; float pose[12];
//              float depth[width*height]  (column-major: k = col*h + row)
//   float xtest[3*ntest]
// 3D output:
//   float update_seconds[nframes]
//   float test_seconds
//   float res[8*ntest]

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "GPisMap.h"
#include "GPisMap3.h"

static std::vector<float> read_floats(FILE* f, size_t n) {
  std::vector<float> v(n);
  if (fread(v.data(), sizeof(float), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(1);
  }
  return v;
}

static int read_i32(FILE* f) {
  int v;
  if (fread(&v, 4, 1, f) != 1) {
    fprintf(stderr, "short read (i32)\n");
    exit(1);
  }
  return v;
}

static double now_s() {
  using namespace std::chrono;
  return duration_cast<duration<double>>(
             high_resolution_clock::now().time_since_epoch())
      .count();
}

static int run2d(const char* in_path, const char* out_path) {
  FILE* in = fopen(in_path, "rb");
  if (!in) return 1;
  int nbeams = read_i32(in);
  int nframes = read_i32(in);
  int ntest = read_i32(in);
  std::vector<float> thetas = read_floats(in, nbeams);

  GPisMap gpm;
  std::vector<float> upd_t(nframes);
  for (int fidx = 0; fidx < nframes; ++fidx) {
    std::vector<float> pose = read_floats(in, 6);
    std::vector<float> ranges = read_floats(in, nbeams);
    double t0 = now_s();
    gpm.update(thetas.data(), ranges.data(), nbeams, pose);
    upd_t[fidx] = (float)(now_s() - t0);
  }
  std::vector<float> xtest = read_floats(in, (size_t)2 * ntest);
  fclose(in);

  std::vector<float> res((size_t)6 * ntest, 0.f);
  double t0 = now_s();
  gpm.test(xtest.data(), 2, ntest, res.data());
  float test_t = (float)(now_s() - t0);

  FILE* out = fopen(out_path, "wb");
  fwrite(upd_t.data(), 4, nframes, out);
  fwrite(&test_t, 4, 1, out);
  fwrite(res.data(), 4, res.size(), out);
  fclose(out);
  return 0;
}

static int run3d(const char* in_path, const char* out_path) {
  FILE* in = fopen(in_path, "rb");
  if (!in) return 1;
  int width = read_i32(in);
  int height = read_i32(in);
  int nframes = read_i32(in);
  int ntest = read_i32(in);

  GPisMap3 gpm;
  std::vector<float> upd_t(nframes);
  std::vector<float> counts(nframes);
  for (int fidx = 0; fidx < nframes; ++fidx) {
    std::vector<float> intr = read_floats(in, 4);
    std::vector<float> pose = read_floats(in, 12);
    std::vector<float> depth = read_floats(in, (size_t)width * height);
    camParam c(intr[0], intr[1], intr[2], intr[3], (float)width,
               (float)height);
    gpm.resetCam(c);
    double t0 = now_s();
    gpm.update(depth.data(), width * height, pose);
    upd_t[fidx] = (float)(now_s() - t0);
    std::vector<float> pf;
    gpm.getAllPoints(pf);
    counts[fidx] = (float)(pf.size() / 3);
    fprintf(stderr, "frame %d: %d nodes\n", fidx, (int)(pf.size() / 3));
  }
  std::vector<float> xtest = read_floats(in, (size_t)3 * ntest);
  fclose(in);

  std::vector<float> res((size_t)8 * ntest, 0.f);
  double t0 = now_s();
  gpm.test(xtest.data(), 3, ntest, res.data());
  float test_t = (float)(now_s() - t0);

  std::vector<float> pts;
  gpm.getAllPoints(pts);
  int npts = (int)(pts.size() / 3);

  FILE* out = fopen(out_path, "wb");
  fwrite(upd_t.data(), 4, nframes, out);
  fwrite(&test_t, 4, 1, out);
  fwrite(res.data(), 4, res.size(), out);
  fwrite(&npts, 4, 1, out);
  fwrite(pts.data(), 4, pts.size(), out);
  fclose(out);
  return 0;
}

int main(int argc, char** argv) {
  if (argc != 4) {
    fprintf(stderr, "usage: %s 2d|3d <in.bin> <out.bin>\n", argv[0]);
    return 2;
  }
  if (strcmp(argv[1], "2d") == 0) return run2d(argv[2], argv[3]);
  if (strcmp(argv[1], "3d") == 0) return run3d(argv[2], argv[3]);
  fprintf(stderr, "unknown mode\n");
  return 2;
}
