// Native data-loader core: threaded PNG decode + bilinear resize + f32
// normalize, writing straight into caller-provided batch buffers.
//
// TPU-native replacement for the reference's DataLoader worker processes
// (training/trainer.py:81-83 num_workers + pin_memory): instead of Python
// worker processes pickling tensors over pipes, a C++ thread pool decodes
// PNG frames (libpng) directly into the numpy batch array the host will
// feed to the device. No GIL, no copies, no subprocesses.
//
// Exposed C ABI (consumed by playableenvironments_tpu/data/native_loader.py
// over ctypes):
//   pe_png_size(path, &h, &w)                      -> 0 on success
//   pe_decode_png(path, th, tw, out)               -> decode one file
//   pe_decode_png_batch(paths, n, th, tw, out, t)  -> threaded batch decode
//
// Output layout: float32 RGB in [0, 1], shape (th, tw, 3) per image
// (or the file's own size when th == 0). Batch output is (n, th, tw, 3)
// contiguous. Resize is standard bilinear with half-pixel centers
// (align_corners=false; matches jax.image.resize method="bilinear").

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode a PNG into 8-bit RGB. Returns 0 on success.
int decode_rgb8(const char* path, std::vector<uint8_t>* pixels, int* height,
                int* width) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return 3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  // Normalize every input variant to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_set_strip_alpha(png);  // harmless if no alpha
  png_read_update_info(png, info);

  pixels->resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = pixels->data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *height = static_cast<int>(h);
  *width = static_cast<int>(w);
  return 0;
}

// Separable anti-aliased triangle (bilinear) resample — the PIL /
// jax.image.resize(method="bilinear") convention: half-pixel centers, filter
// support widened by the scale factor when downscaling. Precomputes the
// per-output-pixel tap list for one axis.
struct Taps {
  std::vector<int> start;    // first source index per output pixel
  std::vector<int> count;    // taps per output pixel
  std::vector<float> weight; // flattened normalized weights
  std::vector<int> offset;   // start into `weight` per output pixel
};

Taps make_taps(int src_n, int dst_n) {
  Taps taps;
  taps.start.resize(dst_n);
  taps.count.resize(dst_n);
  taps.offset.resize(dst_n);
  const float scale = static_cast<float>(src_n) / dst_n;
  const float support = scale > 1.0f ? scale : 1.0f;
  for (int i = 0; i < dst_n; ++i) {
    const float center = (i + 0.5f) * scale;
    int lo = static_cast<int>(center - support + 0.5f);
    int hi = static_cast<int>(center + support + 0.5f);
    if (lo < 0) lo = 0;
    if (hi > src_n) hi = src_n;
    taps.start[i] = lo;
    taps.count[i] = hi - lo;
    taps.offset[i] = static_cast<int>(taps.weight.size());
    float total = 0.0f;
    for (int j = lo; j < hi; ++j) {
      float d = (j + 0.5f - center) / support;
      float w = 1.0f - (d < 0 ? -d : d);
      if (w < 0) w = 0;
      taps.weight.push_back(w);
      total += w;
    }
    if (total > 0)
      for (int j = 0; j < taps.count[i]; ++j)
        taps.weight[taps.offset[i] + j] /= total;
  }
  return taps;
}

void resize_bilinear(const uint8_t* src, int sh, int sw, float* dst, int th,
                     int tw) {
  const float scale = 1.0f / 255.0f;
  Taps ty = make_taps(sh, th);
  Taps tx = make_taps(sw, tw);
  // Horizontal pass into a (sh, tw, 3) buffer, then vertical.
  std::vector<float> mid(static_cast<size_t>(sh) * tw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* out_row = mid.data() + static_cast<size_t>(y) * tw * 3;
    for (int x = 0; x < tw; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* w = tx.weight.data() + tx.offset[x];
      const uint8_t* p = row + static_cast<size_t>(tx.start[x]) * 3;
      for (int j = 0; j < tx.count[x]; ++j, p += 3) {
        acc0 += w[j] * p[0];
        acc1 += w[j] * p[1];
        acc2 += w[j] * p[2];
      }
      out_row[x * 3 + 0] = acc0;
      out_row[x * 3 + 1] = acc1;
      out_row[x * 3 + 2] = acc2;
    }
  }
  for (int y = 0; y < th; ++y) {
    float* out_row = dst + static_cast<size_t>(y) * tw * 3;
    const float* w = ty.weight.data() + ty.offset[y];
    std::memset(out_row, 0, sizeof(float) * tw * 3);
    for (int j = 0; j < ty.count[y]; ++j) {
      const float* mid_row =
          mid.data() + static_cast<size_t>(ty.start[y] + j) * tw * 3;
      const float wj = w[j];
      for (int x = 0; x < tw * 3; ++x) out_row[x] += wj * mid_row[x];
    }
    for (int x = 0; x < tw * 3; ++x) out_row[x] *= scale;
  }
}

int decode_one(const char* path, int target_h, int target_w, float* out) {
  std::vector<uint8_t> pixels;
  int h = 0, w = 0;
  int rc = decode_rgb8(path, &pixels, &h, &w);
  if (rc) return rc;
  if (target_h <= 0 || (target_h == h && target_w == w)) {
    const float scale = 1.0f / 255.0f;
    size_t n = static_cast<size_t>(h) * w * 3;
    for (size_t i = 0; i < n; ++i) out[i] = pixels[i] * scale;
  } else {
    resize_bilinear(pixels.data(), h, w, out, target_h, target_w);
  }
  return 0;
}

}  // namespace

extern "C" {

int pe_png_size(const char* path, int* height, int* width) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  *height = static_cast<int>(png_get_image_height(png, info));
  *width = static_cast<int>(png_get_image_width(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode one PNG to f32 RGB [0,1]. target_h <= 0 means keep native size
// (caller must have sized `out` via pe_png_size).
int pe_decode_png(const char* path, int target_h, int target_w, float* out) {
  return decode_one(path, target_h, target_w, out);
}

// Threaded batch decode: n paths into out[n, target_h, target_w, 3].
// Returns 0 if every file decoded, else the first nonzero file status.
// A fixed target size is REQUIRED here (unlike pe_decode_png): native-size
// decodes would need per-image strides, and a zero stride would race every
// worker onto the same buffer. Returns 4 on target_h/target_w <= 0.
int pe_decode_png_batch(const char** paths, int n, int target_h, int target_w,
                        float* out, int threads) {
  if (n <= 0) return 0;
  if (target_h <= 0 || target_w <= 0) return 4;
  if (threads <= 0) threads = 1;
  if (threads > n) threads = n;
  const size_t stride = static_cast<size_t>(target_h) * target_w * 3;
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = decode_one(paths[i], target_h, target_w, out + stride * i);
      if (rc) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return status.load();
}

}  // extern "C"

namespace {

// Encode 8-bit RGB rows into a PNG file. Returns 0 on success.
int encode_one(const char* path, int height, int width, const float* rgb) {
  std::vector<uint8_t> bytes(static_cast<size_t>(height) * width * 3);
  const size_t count = bytes.size();
  for (size_t i = 0; i < count; ++i) {
    float v = rgb[i] * 255.0f + 0.5f;
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    bytes[i] = static_cast<uint8_t>(v);
  }
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return 1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(height);
  for (int r = 0; r < height; ++r) {
    rows[r] = bytes.data() + static_cast<size_t>(r) * width * 3;
  }
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

// Encode one f32 RGB [0,1] (h, w, 3) image to a PNG file.
int pe_encode_png(const char* path, int height, int width, const float* rgb) {
  return encode_one(path, height, width, rgb);
}

// Threaded batch encode: data[n, h, w, 3] to n PNG files.
int pe_encode_png_batch(const char** paths, int n, int height, int width,
                        const float* data, int threads) {
  if (n <= 0) return 0;
  if (threads <= 0) threads = 1;
  if (threads > n) threads = n;
  const size_t stride = static_cast<size_t>(height) * width * 3;
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = encode_one(paths[i], height, width, data + stride * i);
      if (rc) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return status.load();
}

}  // extern "C"
