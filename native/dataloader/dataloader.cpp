// Native KITTI point-cloud loader: velodyne .bin decode + velodyne->rect
// transform + image-frustum filter in a single pass.
//
// The TPU-native counterpart of the reference's C++/CUDA data-path ops for
// the input pipeline: the Python path (calib_utils + obj_utils equivalents)
// makes several numpy temporaries per sample; this does one file read and
// one fused loop, exposed over a plain C ABI for ctypes.
//
// Build: make (produces libhfr_dataloader.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Composes rect = R0 (3x3, row-major) * Tr (3x4, row-major) once, then for
// each velodyne point p: q = rect * [p, 1]; keeps points with q.z > 0 whose
// projection by P2 (3x4) lands inside (0, img_w) x (0, img_h).
//
// out: caller-allocated float32 buffer of max_out * 4 ([x, y, z, intensity]
// in the rect frame). Returns the number of points written, or -1 on IO
// error, or -2 if the buffer is too small.
int hfr_load_and_filter(
    const char* velo_path,
    const double* tr,    // 3x4 velodyne->cam
    const double* r0,    // 3x3 rect
    const double* p2,    // 3x4 projection
    float img_w,
    float img_h,
    float* out,
    int max_out) {
  FILE* f = std::fopen(velo_path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  long n = bytes / (4 * sizeof(float));
  float* raw = (float*)std::malloc(n * 4 * sizeof(float));
  if (!raw) {
    std::fclose(f);
    return -1;
  }
  size_t got = std::fread(raw, sizeof(float), n * 4, f);
  std::fclose(f);
  if ((long)got != n * 4) {
    std::free(raw);
    return -1;
  }

  // rect = r0 * tr : (3x4)
  double m[12];
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 4; ++j) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += r0[i * 3 + k] * tr[k * 4 + j];
      m[i * 4 + j] = acc;
    }
  }

  int count = 0;
  for (long i = 0; i < n; ++i) {
    const float* p = raw + i * 4;
    double x = m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3];
    double y = m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7];
    double z = m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11];
    if (z <= 0) continue;

    double u = p2[0] * x + p2[1] * y + p2[2] * z + p2[3];
    double v = p2[4] * x + p2[5] * y + p2[6] * z + p2[7];
    double w = p2[8] * x + p2[9] * y + p2[10] * z + p2[11];
    u /= w;
    v /= w;
    if (u <= 0 || u >= img_w || v <= 0 || v >= img_h) continue;

    if (count >= max_out) {
      std::free(raw);
      return -2;
    }
    out[count * 4 + 0] = (float)x;
    out[count * 4 + 1] = (float)y;
    out[count * 4 + 2] = (float)z;
    out[count * 4 + 3] = p[3];
    ++count;
  }
  std::free(raw);
  return count;
}

}  // extern "C"
