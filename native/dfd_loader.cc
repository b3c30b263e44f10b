// dfd_loader: native image decode + resize for the TPU input pipeline.
//
// The reference pipeline decodes with PIL inside DataLoader worker processes
// (reference: trainers/efficientnet.py:216-233). This library is the
// TPU-native runtime equivalent: a C++ decode path (libjpeg with DCT-domain
// scaled decode, libpng) plus PIL-quality triangle-filter resampling and a
// thread-pool batch API, exposed through a C ABI consumed via ctypes
// (deepfakedetection_tpu/data/native.py). Output is uint8 RGB HWC,
// shorter-side resized to `target` then center-cropped/padded to
// target x target — exactly the host-side geometry the device pipeline
// expects (data/decode.py).
//
// Build: see native/Makefile (g++ -O3 -shared -ljpeg -lpng).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_last_error;

struct ImageU8 {
  int w = 0;
  int h = 0;
  int c = 0;
  std::vector<unsigned char> data;  // HWC
};

// ---------------------------------------------------------------------------
// JPEG decode (with scaled decode: pick the largest 1/N <= needed upscale)
// ---------------------------------------------------------------------------

int g_scaled_decode = 0;  // see the comment at the use site in decode_jpeg

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  char buf[JMSG_LENGTH_MAX];
  (*cinfo->err->format_message)(cinfo, buf);
  g_last_error = std::string("jpeg: ") + buf;
  longjmp(mgr->jump, 1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, int target, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: decode at scale num/8 so the shorter side stays
  // >= target (keeps the later triangle resample a mild downscale).
  // OPT-IN (dfd_set_scaled_decode / DFD_NATIVE_SCALED_DECODE=1): the
  // scaled decode is a DIFFERENT downsampling chain than PIL's
  // full-res-decode + one-stage triangle, and a round-4 measurement showed
  // that serving a PIL-trained model through it costs real accuracy on
  // noise-sensitive content (hard-set B3: 0.8745 vs 0.9340 top-1, AUC
  // 0.9488 vs 0.9754 — docs/BENCHMARKS.md). Default is full-res decode:
  // bit-faithful source pixels, ~0.3 ms slower per 480p JPEG.
  if (target > 0 && g_scaled_decode) {
    int shorter = std::min(static_cast<int>(cinfo.image_width),
                           static_cast<int>(cinfo.image_height));
    int num = 8;
    while (num > 1 && (shorter * (num - 1)) / 8 >= target) num--;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);

  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  int row_stride = out->w * cinfo.output_components;
  std::vector<unsigned char> row(row_stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    unsigned char* dst =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline - 1) * out->w * 3;
    if (cinfo.output_components == 3) {
      std::memcpy(dst, row.data(), static_cast<size_t>(out->w) * 3);
    } else {  // grayscale → replicate
      for (int x = 0; x < out->w; ++x) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

struct PngReadState {
  const unsigned char* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->len) {
    png_error(png, "png: truncated");
  }
  std::memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

bool decode_png(const unsigned char* buf, size_t len, ImageU8* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) {
    g_last_error = "png: bad signature";
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    g_last_error = "png: decode error";
    return false;
  }
  PngReadState st{buf, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) {
    rows[y] = out->data.data() + static_cast<size_t>(y) * out->w * 3;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------------------
// Triangle-filter (bilinear-with-antialias, PIL-style) separable resample
// ---------------------------------------------------------------------------

struct FilterTaps {
  std::vector<int> start;     // first source index per output pixel
  std::vector<int> count;     // taps per output pixel
  std::vector<float> weight;  // flattened weights [out * max_count]
  int max_count = 0;
};

FilterTaps build_taps(int in_size, int out_size) {
  FilterTaps t;
  double scale = static_cast<double>(in_size) / out_size;
  double support = std::max(1.0, scale);  // triangle filter, widened on downscale
  t.max_count = static_cast<int>(std::ceil(support * 2.0)) + 2;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(static_cast<size_t>(out_size) * t.max_count, 0.f);
  for (int xo = 0; xo < out_size; ++xo) {
    double center = (xo + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(std::floor(center - support)));
    int hi = std::min(in_size, static_cast<int>(std::ceil(center + support)));
    double sum = 0.0;
    int cnt = 0;
    int first = -1;
    for (int xi = lo; xi < hi; ++xi) {
      double d = std::abs((xi + 0.5 - center) / support);
      double w = std::max(0.0, 1.0 - d);
      if (w <= 0.0) {
        if (first >= 0) break;  // trailing zeros: window done
        continue;               // leading zeros: shift the window start
      }
      if (first < 0) first = xi;
      t.weight[static_cast<size_t>(xo) * t.max_count + cnt] = static_cast<float>(w);
      sum += w;
      cnt++;
    }
    if (cnt == 0) {  // degenerate: nearest
      first = std::min(in_size - 1, std::max(0, static_cast<int>(center)));
      t.weight[static_cast<size_t>(xo) * t.max_count] = 1.f;
      cnt = 1;
      sum = 1.0;
    }
    for (int k = 0; k < cnt; ++k) {
      t.weight[static_cast<size_t>(xo) * t.max_count + k] /= static_cast<float>(sum);
    }
    t.start[xo] = first;
    t.count[xo] = cnt;
  }
  return t;
}

void resample(const ImageU8& in, int out_w, int out_h, ImageU8* out) {
  FilterTaps tx = build_taps(in.w, out_w);
  FilterTaps ty = build_taps(in.h, out_h);
  // horizontal pass → float intermediate [in.h, out_w, 3]
  std::vector<float> tmp(static_cast<size_t>(in.h) * out_w * 3);
  for (int y = 0; y < in.h; ++y) {
    const unsigned char* src = in.data.data() + static_cast<size_t>(y) * in.w * 3;
    float* dst = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xo = 0; xo < out_w; ++xo) {
      float r = 0, g = 0, b = 0;
      int s = tx.start[xo], n = tx.count[xo];
      const float* w = &tx.weight[static_cast<size_t>(xo) * tx.max_count];
      for (int k = 0; k < n; ++k) {
        const unsigned char* p = src + 3 * (s + k);
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      dst[3 * xo] = r;
      dst[3 * xo + 1] = g;
      dst[3 * xo + 2] = b;
    }
  }
  // vertical pass → uint8 out. Tap-major loop order: each tap contributes a
  // full-row AXPY over contiguous floats, which the compiler vectorizes —
  // measured 10x over the pixel-major form (0.615 → 0.063 ms at 320x240 →
  // 298x224), where the variable-count inner tap loop blocked SIMD. The
  // accumulation order per output value is unchanged (k ascending), so the
  // results are bit-identical.
  out->w = out_w;
  out->h = out_h;
  out->c = 3;
  out->data.resize(static_cast<size_t>(out_w) * out_h * 3);
  const int row_len = out_w * 3;
  std::vector<float> acc(row_len);
  for (int yo = 0; yo < out_h; ++yo) {
    int s = ty.start[yo], n = ty.count[yo];
    const float* w = &ty.weight[static_cast<size_t>(yo) * ty.max_count];
    const float* row0 = &tmp[static_cast<size_t>(s) * row_len];
    const float w0 = w[0];
    for (int x = 0; x < row_len; ++x) acc[x] = w0 * row0[x];
    for (int k = 1; k < n; ++k) {
      const float* rowk = &tmp[static_cast<size_t>(s + k) * row_len];
      const float wk = w[k];
      for (int x = 0; x < row_len; ++x) acc[x] += wk * rowk[x];
    }
    unsigned char* dst = out->data.data() + static_cast<size_t>(yo) * row_len;
    for (int x = 0; x < row_len; ++x) {
      int v = static_cast<int>(acc[x] + 0.5f);
      dst[x] = static_cast<unsigned char>(std::clamp(v, 0, 255));
    }
  }
}

// torchvision CenterCrop anchor: int(round((size - target)/2.0)) with
// round-half-to-even (matches data/decode.py _crop_anchor; floor division
// shifts the crop 1px when (size - target) % 4 == 3). Smaller-than-crop
// images pad top-left by (target - size)/2 first (functional.center_crop
// padding_ltrb), so the content anchor is -((target - size) / 2).
static int center_anchor(int size, int target) {
  if (size < target) return -((target - size) / 2);
  int diff = size - target;
  if (diff % 2 == 0) return diff / 2;
  int fl = diff / 2;  // floor for non-negative diff; value is fl + 0.5
  return (fl % 2 == 0) ? fl : fl + 1;
}

// shorter-side resize to resize_target then DIRECT center crop/pad to
// crop_target x crop_target (single-crop torchvision anchors — composing
// two center crops would shift 1px on odd remainders)
void shape_to_square(const ImageU8& in, int resize_target, int crop_target,
                     unsigned char* out) {
  // Output size TRUNCATES (int cast), matching torchvision 0.24's
  // _compute_resized_output_size: new_long = int(target * long / short).
  int rw, rh;
  if (in.w <= in.h) {
    rw = resize_target;
    rh = std::max(1, static_cast<int>(
                       static_cast<double>(in.h) * resize_target / in.w));
  } else {
    rh = resize_target;
    rw = std::max(1, static_cast<int>(
                       static_cast<double>(in.w) * resize_target / in.h));
  }
  ImageU8 resized;
  resample(in, rw, rh, &resized);
  std::memset(out, 0, static_cast<size_t>(crop_target) * crop_target * 3);
  int top = center_anchor(rh, crop_target);
  int left = center_anchor(rw, crop_target);
  for (int y = 0; y < crop_target; ++y) {
    int sy = y + top;
    if (sy < 0 || sy >= rh) continue;
    int sx0 = std::max(0, left);
    int sx1 = std::min(rw, left + crop_target);
    if (sx1 <= sx0) continue;
    std::memcpy(
        out + (static_cast<size_t>(y) * crop_target + (sx0 - left)) * 3,
        resized.data.data() + (static_cast<size_t>(sy) * rw + sx0) * 3,
        static_cast<size_t>(sx1 - sx0) * 3);
  }
}

bool read_file(const char* path, std::vector<unsigned char>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_last_error = std::string("open failed: ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(len));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  if (got != out->size()) {
    g_last_error = std::string("short read: ") + path;
    return false;
  }
  return true;
}

bool decode_any(const unsigned char* buf, size_t len, int target, ImageU8* img) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf, len, target, img);
  }
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    return decode_png(buf, len, img);
  }
  g_last_error = "unsupported image format (need JPEG or PNG)";
  return false;
}

}  // namespace

extern "C" {

int dfd_version() { return 2; }

// Toggle the DCT-scaled JPEG fast path (default off — see decode_jpeg).
void dfd_set_scaled_decode(int enable) { g_scaled_decode = enable ? 1 : 0; }

const char* dfd_last_error() { return g_last_error.c_str(); }

// Decode one file: shorter-side resize to resize_target, center crop to
// crop_target → uint8 RGB [crop, crop, 3]. Returns 0 on success.
int dfd_decode_image_rc(const char* path, int resize_target, int crop_target,
                        unsigned char* out) {
  std::vector<unsigned char> buf;
  if (!read_file(path, &buf)) return 1;
  ImageU8 img;
  if (!decode_any(buf.data(), buf.size(), resize_target, &img)) return 2;
  shape_to_square(img, resize_target, crop_target, out);
  return 0;
}

// Decode one image file → uint8 RGB [target, target, 3]. Returns 0 on success.
int dfd_decode_image(const char* path, int target, unsigned char* out) {
  return dfd_decode_image_rc(path, target, target, out);
}

// Decode from an in-memory buffer (web-UI / streaming path).
int dfd_decode_buffer(const unsigned char* buf, long len, int target,
                      unsigned char* out) {
  ImageU8 img;
  if (!decode_any(buf, static_cast<size_t>(len), target, &img)) return 2;
  shape_to_square(img, target, target, out);
  return 0;
}

// Thread-pool batch decode from in-memory buffers (tar-shard datasets,
// data/shards.py: bytes arrive from one seek+read per member). Same worker
// pattern and resize/crop semantics as dfd_decode_batch_rc. Returns the
// count of failures; per-image status in `status`.
int dfd_decode_buffer_batch_rc(const unsigned char** bufs, const long* lens,
                               int n, int resize_target, int crop_target,
                               unsigned char* out, int* status,
                               int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  size_t stride = static_cast<size_t>(crop_target) * crop_target * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ImageU8 img;
      int rc = 0;
      if (!decode_any(bufs[i], static_cast<size_t>(lens[i]), resize_target,
                      &img)) {
        rc = 2;
      } else {
        shape_to_square(img, resize_target, crop_target, out + stride * i);
      }
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int spawn = std::min(n_threads, n);
  threads.reserve(spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

// Thread-pool batch decode with separate resize/crop targets. paths: array
// of n C strings; out: n*crop²*3 bytes. status: per-image 0/err. Returns
// count of failures.
int dfd_decode_batch_rc(const char** paths, int n, int resize_target,
                        int crop_target, unsigned char* out, int* status,
                        int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  size_t stride = static_cast<size_t>(crop_target) * crop_target * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = dfd_decode_image_rc(paths[i], resize_target, crop_target,
                                   out + stride * i);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int spawn = std::min(n_threads, n);
  threads.reserve(spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

// Back-compat: equal resize/crop targets.
int dfd_decode_batch(const char** paths, int n, int target, unsigned char* out,
                     int* status, int n_threads) {
  return dfd_decode_batch_rc(paths, n, target, target, out, status, n_threads);
}

}  // extern "C"
