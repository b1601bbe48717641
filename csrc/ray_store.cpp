// Native data-loader runtime: multithreaded flat ray-store builder.
//
// The tensorf stack precomputes (origin, direction) for EVERY pixel of
// EVERY image into a flat [N*H*W, 6] store before training
// (tensorf-myc/dataLoader/blender.py:63-129 builds all_rays on the host).
// That is a pure host-side data-loader job, so it lives in C++ here: one
// worker thread per image, OpenCV-convention pixel grid, camera-to-world
// rotation, normalized directions — identical math to
// myc_nerfs_tpu/geom/rays.get_ray_directions(blender=False) +
// get_rays_from_directions (tested against them).
//
// C ABI (ctypes-friendly):
//   rs_build(c2w [N,3,4] row-major float, N, H, W,
//            fx, fy, cx, cy, out [N*H*W, 6] float, n_threads)

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

void rs_build(const float* c2w, int64_t n_images, int64_t H, int64_t W,
              float fx, float fy, float cx, float cy, float* out,
              int64_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  auto worker = [&](int64_t img_begin, int64_t img_end) {
    for (int64_t n = img_begin; n < img_end; ++n) {
      const float* M = c2w + n * 12;  // [3,4] row-major
      const float ox = M[3], oy = M[7], oz = M[11];
      float* dst = out + n * H * W * 6;
      for (int64_t j = 0; j < H; ++j) {
        const float v = (static_cast<float>(j) + 0.5f - cy) / fy;
        for (int64_t i = 0; i < W; ++i) {
          const float u = (static_cast<float>(i) + 0.5f - cx) / fx;
          // camera-frame dir (u, v, 1) rotated by R = M[:, :3]
          float dx = M[0] * u + M[1] * v + M[2];
          float dy = M[4] * u + M[5] * v + M[6];
          float dz = M[8] * u + M[9] * v + M[10];
          const float inv = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
          float* p = dst + (j * W + i) * 6;
          p[0] = ox; p[1] = oy; p[2] = oz;
          p[3] = dx * inv; p[4] = dy * inv; p[5] = dz * inv;
        }
      }
    }
  };
  const int64_t t = std::min<int64_t>(n_threads, std::max<int64_t>(n_images, 1));
  std::vector<std::thread> pool;
  const int64_t per = (n_images + t - 1) / t;
  for (int64_t k = 0; k < t; ++k) {
    const int64_t b = k * per, e = std::min(n_images, b + per);
    if (b >= e) break;
    pool.emplace_back(worker, b, e);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
