// lvt_data: native host-side data path for larvanet_tpu.
//
// The training hot loop's host work is (a) PNG decode into the uint8
// cache and (b) per-step assembly of augmented patch batches
// (crop -> rot90 -> flip -> float32 NHWC). The reference does both in
// Python threads (dataloaders/div2k_train_loader_queue.py); here they
// are a small C++ library driven via ctypes:
//   * lvt_decode_png  — libpng decode to RGB8 (any bit depth/palette
//                       normalized to 8-bit RGB, matching cv2/PIL).
//   * lvt_patch_batch — multithreaded batch assembly with the exact
//                       augmentation semantics of the reference
//                       (crop aligned to scale, rot90 k in 1..4, 50%
//                       horizontal flip — div2k_train_loader.py:77-95),
//                       writing float32 NHWC directly into caller
//                       buffers (zero copies on the Python side).
//
// Build: native/build.sh (g++ -O3 -shared, links libpng16).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

void lvt_free(void* p) { free(p); }

// Decode a PNG file to tightly-packed RGB8. Returns 0 on success.
int lvt_decode_png(const char* path, uint8_t** out, int* out_h, int* out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return -2; }
  uint8_t* buf = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    free(buf);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // Normalize to 8-bit RGB (drop alpha like cv2.IMREAD_COLOR / PIL convert("RGB")).
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  const size_t stride = w * 3;
  buf = static_cast<uint8_t*>(malloc(stride * h));
  if (!buf) { png_destroy_read_struct(&png, &info, nullptr); fclose(fp); return -4; }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = buf + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  *out = buf;
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  return 0;
}

namespace {

// splitmix64: per-sample deterministic stream from (seed, index).
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed) {}
  uint64_t next() { return s = splitmix64(s); }
  // unbiased-enough bounded draw for image dims
  int below(int n) { return static_cast<int>(next() % static_cast<uint64_t>(n)); }
};

// Copy a cropped patch applying rot90(k) then horizontal flip, u8 HWC -> f32 HWC.
// Geometry matches numpy: rot90 counterclockwise in (H, W); flip reverses W last.
void write_patch(const uint8_t* img, int img_w, int y0, int x0, int p,
                 int k, bool flip, float* out) {
  for (int oy = 0; oy < p; ++oy) {
    for (int ox = 0; ox < p; ++ox) {
      int fx = flip ? (p - 1 - ox) : ox;  // undo flip to find rotated coord
      int ry, rx;  // coordinate in the un-rotated crop
      switch (k & 3) {
        case 0: ry = oy;          rx = fx;          break;
        case 1: ry = fx;          rx = p - 1 - oy;  break;  // rot90 ccw
        case 2: ry = p - 1 - oy;  rx = p - 1 - fx;  break;
        default: ry = p - 1 - fx; rx = oy;          break;  // k=3
      }
      const uint8_t* src = img + (static_cast<size_t>(y0 + ry) * img_w + (x0 + rx)) * 3;
      float* dst = out + (static_cast<size_t>(oy) * p + ox) * 3;
      dst[0] = src[0];
      dst[1] = src[1];
      dst[2] = src[2];
    }
  }
}

}  // namespace

// Assemble an augmented patch batch. Returns 0 on success.
//   lr_imgs/hr_imgs: per-image RGB8 pointers (HR dims = LR dims * scale)
//   lr_dims: [h0, w0, h1, w1, ...] for the LR images
//   out_lr: float32 [batch, p, p, 3]; out_hr: float32 [batch, p*s, p*s, 3]
int lvt_patch_batch(const uint8_t** lr_imgs, const uint8_t** hr_imgs,
                    const int* lr_dims, int num_images,
                    int batch, int patch, int scale, uint64_t seed,
                    float* out_lr, float* out_hr, int num_threads) {
  if (num_images <= 0 || batch <= 0 || patch <= 0 || scale <= 0) return -1;
  if (num_threads <= 0) num_threads = 1;

  std::atomic<int> bad{0};
  auto worker = [&](int t0, int t1) {
    for (int b = t0; b < t1; ++b) {
      Rng rng(splitmix64(seed ^ (0xABCDEF12345678ull + static_cast<uint64_t>(b))));
      int idx = rng.below(num_images);
      int h = lr_dims[2 * idx], w = lr_dims[2 * idx + 1];
      if (h <= patch || w <= patch) { bad.store(b + 1); continue; }
      int y0 = rng.below(h - patch);
      int x0 = rng.below(w - patch);
      int k = rng.below(4) + 1;          // rot90 k in 1..4 (ref :87)
      bool flip = (rng.next() & 1) != 0;  // 50% flip (ref :92)
      const int hp = patch * scale;
      write_patch(lr_imgs[idx], w, y0, x0, patch, k, flip,
                  out_lr + static_cast<size_t>(b) * patch * patch * 3);
      write_patch(hr_imgs[idx], w * scale, y0 * scale, x0 * scale, hp, k, flip,
                  out_hr + static_cast<size_t>(b) * hp * hp * 3);
    }
  };

  int threads = num_threads < batch ? num_threads : batch;
  std::vector<std::thread> pool;
  int per = (batch + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int lo = t * per, hi = lo + per < batch ? lo + per : batch;
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
  return bad.load() ? -2 : 0;
}

}  // extern "C"
