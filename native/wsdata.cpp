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

#include <libdeflate.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
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

// ---------------------------------------------------------------------
// Fast path: whole-file chunk parse + one-shot libdeflate inflate +
// hand-rolled defilter.  libpng's row-at-a-time zlib streaming is the
// measured bottleneck (~4.6 ms for a 512x512 gray PNG on one core);
// libdeflate inflates the concatenated IDAT in a single call.
//
// Deliberately restricted to the subset where byte parity with the
// libpng/PIL path is structural: 8-bit, non-interlaced, gray (ctype 0)
// or RGB (ctype 2), and no color-management or alpha chunks (gAMA/
// sRGB/iCCP/cHRM/tRNS/bKGD trigger transforms in the simplified libpng
// API).  Anything else returns kNotEligible and takes the libpng path.
// CRCs are not verified (the zlib adler32 already covers the pixel
// stream; chunk CRCs only re-cover the same bytes).

constexpr int kNotEligible = -1;

struct PngRaw {
  int h = 0, w = 0, channels = 0;
  size_t rowbytes = 0;               // 1 filter byte + w*channels
  std::vector<uint8_t> scan;         // h*rowbytes, defiltered in place
  const uint8_t* row(int y) const { return scan.data() + y * rowbytes + 1; }
};

inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

// Paeth rows dominate real photographs (493/512 rows on the fixture
// covers), and the bpp=1 recurrence is serial in `a` — keep the carry
// in a register and make the 3-way select branchless (cmov) instead of
// re-loading cur[i-1] and branching per byte: ~3x on the defilter.
inline int paeth_step_bpp1(int a, int b, int c, int x) {
  const int p = b - c;                    // (a+b-c) - a
  const int q = a - c;                    // (a+b-c) - b
  const int pa = std::abs(p);
  const int pb = std::abs(q);
  const int pc = std::abs(p + q);
  int pred = (pb <= pc) ? b : c;
  pred = (pa <= pb && pa <= pc) ? a : pred;
  return static_cast<uint8_t>(x + pred);
}

inline void paeth_row_bpp1(uint8_t* cur, const uint8_t* prev, size_t n) {
  int a = static_cast<uint8_t>(cur[0] + prev[0]);  // b=prev, c=0 -> pred=b
  cur[0] = static_cast<uint8_t>(a);
  for (size_t i = 1; i < n; ++i) {
    a = paeth_step_bpp1(a, prev[i], prev[i - 1], cur[i]);
    cur[i] = static_cast<uint8_t>(a);
  }
}

// Wavefront defilter over K consecutive Paeth rows.  One Paeth row is
// latency-bound: each byte's ~10-cycle select chain depends on the byte
// to its left, so the core idles on the dependency.  But row r at
// column i needs row r-1 only up to column i — advancing K rows along
// an anti-diagonal keeps K independent chains in flight and turns the
// loop throughput-bound: measured 2.0-2.6x over the single-row loop on
// the fixture covers (512x512 gray, one core).  `base` points at the
// first run row's data byte (past the filter tag); the row above it is
// already defiltered.  Bit-exact: every byte still consumes exactly the
// operands the sequential order produced.
// K rows per wave: 8 gray chains fill the pipeline; RGB has 3 chains
// per row already, so 4 rows (12 chains) before register spill wins.
template <int BPP>
constexpr int wave_rows() { return BPP == 1 ? 8 : 4; }

template <int BPP>
inline void paeth_wave(uint8_t* base, size_t rowbytes, int w_px) {
  constexpr int K = wave_rows<BPP>();
  uint8_t* row[K + 1];
  row[0] = base - rowbytes;
  for (int r = 0; r < K; ++r)
    row[r + 1] = base + static_cast<size_t>(r) * rowbytes;
  int a[K][BPP];
  auto step = [&](int r, int i) {
    uint8_t* cur = row[r + 1] + static_cast<size_t>(i) * BPP;
    const uint8_t* up = row[r] + static_cast<size_t>(i) * BPP;
    if (i == 0) {
      for (int ch = 0; ch < BPP; ++ch) {  // left = upleft = 0 -> pred = up
        a[r][ch] = static_cast<uint8_t>(cur[ch] + up[ch]);
        cur[ch] = static_cast<uint8_t>(a[r][ch]);
      }
    } else {
      for (int ch = 0; ch < BPP; ++ch) {
        a[r][ch] = paeth_step_bpp1(a[r][ch], up[ch], up[ch - BPP], cur[ch]);
        cur[ch] = static_cast<uint8_t>(a[r][ch]);
      }
    }
  };
  // leading triangle: row r enters the wavefront at diagonal step s == r
  for (int s = 0; s < K; ++s)
    for (int r = 0; r <= s; ++r) step(r, s - r);
  // steady state: all K rows active at pixels >= 1 (requires w_px > K)
  for (int s = K; s < w_px; ++s)
    for (int r = 0; r < K; ++r) step(r, s - r);
  // trailing triangle
  for (int s = w_px; s < w_px + K - 1; ++s)
    for (int r = s - w_px + 1; r < K; ++r) step(r, s - r);
}

// One decompressor per decode thread, reused across batches and freed
// when the thread joins (a raw thread_local pointer would leak ~32 KB
// per worker thread per batch, since the batch calls spawn fresh
// std::threads every time).
struct TlsDecompressor {
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  ~TlsDecompressor() {
    if (d) libdeflate_free_decompressor(d);
  }
};

// expect_h/expect_w are the caller's known dimensions: they gate the
// scanline allocation, so a corrupt/hostile IHDR claiming huge dims
// (anything <= 2^24 passes the sanity caps) fails fast with error 2
// instead of attempting a multi-terabyte resize.
int fast_png_read(const char* path, PngRaw* img, int expect_h,
                  int expect_w) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 45) { std::fclose(f); return 1; }
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  const size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return 1;

  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(buf.data(), kSig, 8) != 0) return kNotEligible;
  auto be32 = [&buf](size_t o) {
    return (static_cast<uint32_t>(buf[o]) << 24) |
           (static_cast<uint32_t>(buf[o + 1]) << 16) |
           (static_cast<uint32_t>(buf[o + 2]) << 8) | buf[o + 3];
  };
  if (be32(8) != 13 || std::memcmp(&buf[12], "IHDR", 4) != 0)
    return kNotEligible;
  const uint32_t w = be32(16), h = be32(20);
  const uint8_t depth = buf[24], ctype = buf[25];
  const uint8_t compression = buf[26], filter = buf[27], interlace = buf[28];
  // compression/filter method must be 0 (the only defined values):
  // decoding a nonzero-method file under method-0 semantics would
  // fabricate pixels where libpng rejects the file as malformed
  if (depth != 8 || compression != 0 || filter != 0 || interlace != 0 ||
      w == 0 || h == 0)
    return kNotEligible;
  if (w > 1u << 24 || h > 1u << 24) return kNotEligible;
  if (static_cast<int>(h) != expect_h || static_cast<int>(w) != expect_w)
    return 2;  // same verdict the libpng path reaches after its probe
  int channels;
  if (ctype == 0) channels = 1;
  else if (ctype == 2) channels = 3;
  else return kNotEligible;  // palette / alpha: libpng path

  std::vector<uint8_t> idat;
  idat.reserve(buf.size());
  size_t off = 33;  // signature + IHDR chunk
  while (off + 12 <= buf.size()) {
    const uint32_t len = be32(off);
    if (len > buf.size() || off + 12 + len > buf.size()) return kNotEligible;
    const uint8_t* tag = &buf[off + 4];
    if (std::memcmp(tag, "IDAT", 4) == 0) {
      idat.insert(idat.end(), buf.begin() + off + 8,
                  buf.begin() + off + 8 + len);
    } else if (std::memcmp(tag, "IEND", 4) == 0) {
      break;
    } else if (std::memcmp(tag, "gAMA", 4) == 0 ||
               std::memcmp(tag, "sRGB", 4) == 0 ||
               std::memcmp(tag, "iCCP", 4) == 0 ||
               std::memcmp(tag, "cHRM", 4) == 0 ||
               std::memcmp(tag, "tRNS", 4) == 0 ||
               std::memcmp(tag, "bKGD", 4) == 0) {
      return kNotEligible;  // would trigger a libpng transform
    }
    off += 12 + static_cast<size_t>(len);
  }
  if (idat.empty()) return kNotEligible;

  img->h = static_cast<int>(h);
  img->w = static_cast<int>(w);
  img->channels = channels;
  const size_t stride = static_cast<size_t>(w) * channels;
  img->rowbytes = 1 + stride;
  img->scan.resize(static_cast<size_t>(h) * img->rowbytes);

  thread_local TlsDecompressor tls;
  if (!tls.d) return 1;
  size_t outn = 0;
  const libdeflate_result rc = libdeflate_zlib_decompress(
      tls.d, idat.data(), idat.size(), img->scan.data(), img->scan.size(),
      &outn);
  if (rc != LIBDEFLATE_SUCCESS || outn != img->scan.size())
    return kNotEligible;  // odd stream; let libpng decide

  // defilter in place (PNG filters 0-4; bpp == channels at 8 bit)
  const int bpp = channels;
  uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* rowp = img->scan.data() + static_cast<size_t>(y) * img->rowbytes;
    const uint8_t filt = rowp[0];
    uint8_t* cur = rowp + 1;
    // Paeth runs take the K-row wavefront (see paeth_wave)
    const int kwave = (bpp == 1) ? wave_rows<1>() : wave_rows<3>();
    if (filt == 4 && prev && static_cast<int>(w) > kwave) {
      uint32_t run = 1;
      while (y + run < h &&
             img->scan[static_cast<size_t>(y + run) * img->rowbytes] == 4)
        ++run;
      uint32_t done = 0;
      while (run - done >= static_cast<uint32_t>(kwave)) {
        uint8_t* wbase = img->scan.data() +
                         static_cast<size_t>(y + done) * img->rowbytes + 1;
        if (bpp == 1)
          paeth_wave<1>(wbase, img->rowbytes, static_cast<int>(w));
        else
          paeth_wave<3>(wbase, img->rowbytes, static_cast<int>(w));
        done += kwave;
      }
      for (; done < run; ++done) {
        uint8_t* rcur = img->scan.data() +
                        static_cast<size_t>(y + done) * img->rowbytes + 1;
        const uint8_t* rprev =
            img->scan.data() +
            static_cast<size_t>(y + done - 1) * img->rowbytes + 1;
        if (bpp == 1) {
          paeth_row_bpp1(rcur, rprev, stride);
        } else {
          for (int i = 0; i < bpp; ++i)
            rcur[i] = static_cast<uint8_t>(rcur[i] + rprev[i]);
          for (size_t i = bpp; i < stride; ++i)
            rcur[i] = static_cast<uint8_t>(
                rcur[i] + paeth(rcur[i - bpp], rprev[i], rprev[i - bpp]));
        }
      }
      y += run - 1;  // loop ++y lands on the first non-Paeth row
      prev = img->scan.data() + static_cast<size_t>(y) * img->rowbytes + 1;
      continue;
    }
    switch (filt) {
      case 0:  // None
        break;
      case 1:  // Sub
        for (size_t i = bpp; i < stride; ++i)
          cur[i] = static_cast<uint8_t>(cur[i] + cur[i - bpp]);
        break;
      case 2:  // Up
        if (prev)
          for (size_t i = 0; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(cur[i] + prev[i]);
        break;
      case 3:  // Average
        if (prev) {
          for (int i = 0; i < bpp; ++i)
            cur[i] = static_cast<uint8_t>(cur[i] + (prev[i] >> 1));
          for (size_t i = bpp; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(
                cur[i] + ((cur[i - bpp] + prev[i]) >> 1));
        } else {
          for (size_t i = bpp; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(cur[i] + (cur[i - bpp] >> 1));
        }
        break;
      case 4:  // Paeth
        if (prev) {
          if (bpp == 1) {
            paeth_row_bpp1(cur, prev, stride);
            break;
          }
          for (int i = 0; i < bpp; ++i)
            cur[i] = static_cast<uint8_t>(cur[i] + prev[i]);
          for (size_t i = bpp; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(
                cur[i] + paeth(cur[i - bpp], prev[i], prev[i - bpp]));
        } else {
          for (size_t i = bpp; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(cur[i] + cur[i - bpp]);
        }
        break;
      default:
        return kNotEligible;
    }
    prev = cur;
  }
  return 0;
}

// Decode one PNG into an 8-bit grayscale buffer of exactly h*w pixels.
// Returns 0 on success, nonzero error code otherwise.
int decode_gray_one(const char* path, uint8_t* out, int h, int w) {
  {
    PngRaw img;
    const int rc = fast_png_read(path, &img, h, w);
    if (rc == 0) {
      if (img.channels == 1) {
        for (int y = 0; y < h; ++y)
          std::memcpy(out + static_cast<size_t>(y) * w, img.row(y), w);
        return 0;
      }
      for (int y = 0; y < h; ++y) {
        const uint8_t* r = img.row(y);
        uint8_t* o = out + static_cast<size_t>(y) * w;
        for (int x = 0; x < w; ++x)
          o[x] = rgb_to_gray(r[3 * x], r[3 * x + 1], r[3 * x + 2]);
      }
      return 0;
    }
    if (rc > 0) return rc;
    // kNotEligible: fall through to libpng
  }
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
  {
    PngRaw img;
    const int rc = fast_png_read(path, &img, h, w);
    if (rc == 0) {
      if (img.channels == 1) {
        for (int y = 0; y < h; ++y) {
          const uint8_t* r = img.row(y);
          uint8_t* o = out + static_cast<size_t>(y) * w * 4;
          for (int x = 0; x < w; ++x) {
            const uint8_t v = r[x];
            o[4 * x] = v;
            o[4 * x + 1] = v;
            o[4 * x + 2] = v;
            o[4 * x + 3] = v;
          }
        }
        return 0;
      }
      for (int y = 0; y < h; ++y) {
        const uint8_t* r = img.row(y);
        uint8_t* o = out + static_cast<size_t>(y) * w * 4;
        for (int x = 0; x < w; ++x) {
          const uint8_t rr = r[3 * x], gg = r[3 * x + 1], bb = r[3 * x + 2];
          o[4 * x] = rr;
          o[4 * x + 1] = gg;
          o[4 * x + 2] = bb;
          o[4 * x + 3] = rgb_to_gray(rr, gg, bb);
        }
      }
      return 0;
    }
    if (rc > 0) return rc;
  }
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
      // an exception escaping a std::thread (e.g. bad_alloc on a
      // corrupt file) would std::terminate the whole process; convert
      // it to a per-image failure like every other decode error
      int rc;
      try {
        rc = decode_gray_one(paths[i], out + stride * i, h, w);
      } catch (...) {
        rc = 1;
      }
      if (rc != 0) failures.fetch_add(1);
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
      int rc;
      try {
        rc = decode_rgby_one(paths[i], out + stride * i, h, w);
      } catch (...) {
        rc = 1;  // see decode_gray_batch: never let an exception escape
      }
      if (rc != 0) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
