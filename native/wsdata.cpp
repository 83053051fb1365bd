// wsdata: native image-decode runtime for wsunet_tpu.
//
// The reference framework decodes PNGs per image with PIL/OpenCV inside a
// joblib *process* pool (src/fabrika.py:92-100) — fork+pickle overhead per
// sweep and one decode per process.  Here decode is a C++ thread pool over
// libpng, feeding the batched pipeline directly (GIL released for the
// whole batch; one contiguous uint8 output buffer shared with numpy).
//
// Grayscale conversion for color sources matches OpenCV's BGR2GRAY
// (BT.601 with round-half-away-from-zero on the fixed-point result), so
// the Y plane equals the reference's imread4_u8(...)[..., 3].
//
// Build: make -C native   (produces native/libwsdata.so)

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// BT.601 luma in 15-bit fixed point, the same coefficients OpenCV uses
// (imgproc color_lut.hpp; cv2 >= 5 descales at shift 15, not 14).
constexpr int kShift = 15;
constexpr int kRY = 9798;   // 0.299 * 2^15
constexpr int kGY = 19235;  // 0.587 * 2^15
constexpr int kBY = 3735;   // 0.114 * 2^15
constexpr int kRound = 1 << (kShift - 1);

inline uint8_t rgb_to_gray(uint8_t r, uint8_t g, uint8_t b) {
  return static_cast<uint8_t>((kRY * r + kGY * g + kBY * b + kRound) >> kShift);
}

// Decode one PNG into an 8-bit grayscale buffer of exactly h*w pixels.
// Returns 0 on success, nonzero error code otherwise.
int decode_gray_one(const char* path, uint8_t* out, int h, int w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;

  if (!png_image_begin_read_from_file(&image, path)) return 1;
  if (static_cast<int>(image.height) != h ||
      static_cast<int>(image.width) != w) {
    png_image_free(&image);
    return 2;
  }

  const bool is_gray =
      (image.format & PNG_FORMAT_FLAG_COLOR) == 0;
  if (is_gray) {
    image.format = PNG_FORMAT_GRAY;
    if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) return 3;
    return 0;
  }

  // color source: read RGB, convert with OpenCV-compatible rounding
  image.format = PNG_FORMAT_RGB;
  std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * 3);
  if (!png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr))
    return 3;
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    out[i] = rgb_to_gray(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]);
  }
  return 0;
}

// Decode one PNG into an 8-bit [h, w, 4] R,G,B,Y buffer (the reference's
// imread4_u8 layout, src/_defs/imread.py:19-27).  Grayscale sources
// replicate the plane into R=G=B=Y, exactly like cv2.imread's 3-channel
// promotion followed by BGR2GRAY.
int decode_rgby_one(const char* path, uint8_t* out, int h, int w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;

  if (!png_image_begin_read_from_file(&image, path)) return 1;
  if (static_cast<int>(image.height) != h ||
      static_cast<int>(image.width) != w) {
    png_image_free(&image);
    return 2;
  }
  const size_t n = static_cast<size_t>(h) * w;

  const bool is_gray = (image.format & PNG_FORMAT_FLAG_COLOR) == 0;
  if (is_gray) {
    image.format = PNG_FORMAT_GRAY;
    std::vector<uint8_t> gray(n);
    if (!png_image_finish_read(&image, nullptr, gray.data(), 0, nullptr))
      return 3;
    for (size_t i = 0; i < n; ++i) {
      const uint8_t v = gray[i];
      out[4 * i] = v;
      out[4 * i + 1] = v;
      out[4 * i + 2] = v;
      out[4 * i + 3] = v;
    }
    return 0;
  }

  image.format = PNG_FORMAT_RGB;
  std::vector<uint8_t> rgb(n * 3);
  if (!png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr))
    return 3;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    out[4 * i] = r;
    out[4 * i + 1] = g;
    out[4 * i + 2] = b;
    out[4 * i + 3] = rgb_to_gray(r, g, b);
  }
  return 0;
}

}  // namespace

extern "C" {

// Probe image dimensions. Returns 0 on success.
int ws_png_probe(const char* path, int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  png_image_free(&image);
  return 0;
}

// Decode one grayscale plane. Returns 0 on success.
int ws_png_decode_gray(const char* path, uint8_t* out, int h, int w) {
  return decode_gray_one(path, out, h, w);
}

// Decode n same-sized images into out[n*h*w] with an internal thread
// pool. Returns the number of failed images (0 == all good).
int ws_png_decode_gray_batch(const char** paths, int n, uint8_t* out,
                             int h, int w, int threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(h) * w;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (decode_gray_one(paths[i], out + stride * i, h, w) != 0) {
        failures.fetch_add(1);
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Decode n same-sized images into out[n*h*w*4] (R,G,B,Y per pixel) with
// an internal thread pool. Returns the number of failed images.
int ws_png_decode_rgby_batch(const char** paths, int n, uint8_t* out,
                             int h, int w, int threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(h) * w * 4;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (decode_rgby_one(paths[i], out + stride * i, h, w) != 0) {
        failures.fetch_add(1);
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
