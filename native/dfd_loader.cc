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

// libjpeg-turbo partial-decode API: exported by the system libjpeg.so
// (turbo 2.1.5) but absent from the stock jpeglib.h shipped with it.
// jpeg_crop_scanline restricts IDCT + color conversion to a column region
// (values inside the region are identical to a full decode; the library
// widens the region to iMCU/upsampling-safe boundaries itself), and
// jpeg_skip_scanlines skips the IDCT for leading rows. Both only shrink
// WORK, never change decoded bytes — verified by tests/test_native.py's
// full-chain comparisons against PIL.
extern "C" {
void jpeg_crop_scanline(j_decompress_ptr cinfo, JDIMENSION* xoffset,
                        JDIMENSION* width);
JDIMENSION jpeg_skip_scanlines(j_decompress_ptr cinfo, JDIMENSION num_lines);
}

namespace {

thread_local std::string g_last_error;

struct ImageU8 {
  int w = 0;
  int h = 0;
  int c = 0;
  std::vector<unsigned char> data;  // HWC
};

// Decoded-subimage bookkeeping: the full post-scaling image is fw x fh;
// the ImageU8 payload holds only [y0, y0+h) x [x0, x0+w) of it (full-image
// coordinates). A full decode has x0 = y0 = 0, w = fw, h = fh.
struct DecodeRegion {
  int fw = 0;
  int fh = 0;
  int x0 = 0;
  int y0 = 0;
};

// The source-tap support interval of output pixels [o0, o1) under the
// triangle filter build_taps() uses — a (possibly slightly wider) superset
// of the union of its trimmed tap windows, safe to decode-restrict to.
void tap_support(int in_size, int out_size, int o0, int o1, int* s0, int* s1) {
  double scale = static_cast<double>(in_size) / out_size;
  double support = std::max(1.0, scale);
  *s0 = std::max(0, static_cast<int>(std::floor((o0 + 0.5) * scale - support)));
  *s1 = std::min(in_size,
                 static_cast<int>(std::ceil((o1 - 0.5) * scale + support)));
  if (*s1 <= *s0) *s1 = std::min(in_size, *s0 + 1);
}

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

// Shorter-side resize dims (torchvision semantics — see shape_to_square).
void resize_dims(int w, int h, int resize_target, int* rw, int* rh) {
  if (w <= h) {
    *rw = resize_target;
    *rh = std::max(
        1, static_cast<int>(static_cast<double>(h) * resize_target / w));
  } else {
    *rh = resize_target;
    *rw = std::max(
        1, static_cast<int>(static_cast<double>(w) * resize_target / h));
  }
}

int center_anchor(int size, int target);  // defined below

// The source region (post-scaling decode coordinates) that the fused
// resample+crop actually reads: the tap support of the output columns/rows
// that survive the center crop. Everything outside it is decoded-then-
// discarded work the partial-decode API can skip.
void used_source_region(int fw, int fh, int resize_target, int crop_target,
                        int* sx0, int* sx1, int* sy0, int* sy1) {
  int rw, rh;
  resize_dims(fw, fh, resize_target, &rw, &rh);
  int left = center_anchor(rw, crop_target);
  int top = center_anchor(rh, crop_target);
  int ox0 = std::max(0, left), ox1 = std::min(rw, left + crop_target);
  int oy0 = std::max(0, top), oy1 = std::min(rh, top + crop_target);
  tap_support(fw, rw, ox0, ox1, sx0, sx1);
  tap_support(fh, rh, oy0, oy1, sy0, sy1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, int target,
                 int crop_target, ImageU8* out, DecodeRegion* reg) {
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
  // bit-faithful source pixels, partial-decode-restricted below to the
  // pixels the fused resample+crop actually consumes.
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

  const int fw = static_cast<int>(cinfo.output_width);
  const int fh = static_cast<int>(cinfo.output_height);
  reg->fw = fw;
  reg->fh = fh;
  reg->x0 = 0;
  reg->y0 = 0;
  int read_y1 = fh;

  // Full-res path: restrict IDCT + color conversion to the column range
  // the fused resample+crop reads (jpeg_crop_scanline; the library widens
  // to iMCU/upsampling-safe bounds and yields bytes identical to a full
  // decode), and skip the IDCT for rows outside the used row range
  // (jpeg_skip_scanlines + early stop). djpeg's -crop uses exactly this
  // composition. Entropy decoding still walks every MCU — that floor is
  // the format's, not ours.
  if (target > 0 && crop_target > 0 && !g_scaled_decode) {
    int sx0, sx1, sy0, sy1;
    used_source_region(fw, fh, target, crop_target, &sx0, &sx1, &sy0, &sy1);
    // Context margin: h2v2 fancy upsampling interpolates chroma across
    // neighboring samples, so the row/column right AT a partial-decode
    // boundary can differ from a full decode by a few LSB (measured: left
    // region edge only, |Δ| ≤ 3). Widen the decoded region so any boundary
    // pixels sit OUTSIDE the resample's tap support and are never read.
    constexpr int kEdgeMargin = 8;
    sx0 = std::max(0, sx0 - kEdgeMargin);
    sx1 = std::min(fw, sx1 + kEdgeMargin);
    sy0 = std::max(0, sy0 - kEdgeMargin);
    sy1 = std::min(fh, sy1 + kEdgeMargin);
    if (sx1 - sx0 < fw) {
      JDIMENSION xoff = static_cast<JDIMENSION>(sx0);
      JDIMENSION width = static_cast<JDIMENSION>(sx1 - sx0);
      jpeg_crop_scanline(&cinfo, &xoff, &width);
      reg->x0 = static_cast<int>(xoff);
    }
    if (sy0 > 0) {
      jpeg_skip_scanlines(&cinfo, static_cast<JDIMENSION>(sy0));
      reg->y0 = static_cast<int>(cinfo.output_scanline);
    }
    read_y1 = sy1;
  }

  out->w = static_cast<int>(cinfo.output_width);  // post-crop width
  out->h = read_y1 - reg->y0;
  out->c = 3;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  if (cinfo.output_components == 3) {
    // read scanlines directly into the output buffer, several per call
    std::vector<JSAMPROW> rows(std::max(1, out->h));
    for (int y = 0; y < out->h; ++y) {
      rows[y] = out->data.data() + static_cast<size_t>(y) * out->w * 3;
    }
    while (static_cast<int>(cinfo.output_scanline) < read_y1) {
      int got = static_cast<int>(cinfo.output_scanline) - reg->y0;
      jpeg_read_scanlines(&cinfo, rows.data() + got,
                          static_cast<JDIMENSION>(read_y1 - reg->y0 - got));
    }
  } else {  // defensive: grayscale → replicate (JCS_RGB makes this rare)
    std::vector<unsigned char> row(
        static_cast<size_t>(out->w) * cinfo.output_components);
    while (static_cast<int>(cinfo.output_scanline) < read_y1) {
      unsigned char* rp = row.data();
      jpeg_read_scanlines(&cinfo, &rp, 1);
      unsigned char* dst =
          out->data.data() +
          (static_cast<size_t>(cinfo.output_scanline) - 1 - reg->y0) * out->w * 3;
      for (int x = 0; x < out->w; ++x) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x];
      }
    }
  }
  if (read_y1 >= fh) {
    jpeg_finish_decompress(&cinfo);
  } else {
    jpeg_abort_decompress(&cinfo);  // stop early: trailing rows unused
  }
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

// Fixed-tap-count channel dots: unrolled FMA chains over planar floats,
// sequential adds (k ascending — same accumulation order as the generic
// loop), with 3 independent chains for ILP. The switch on the (nearly
// constant) tap count removes the variable-bound inner loop that blocked
// instruction-level scheduling in the interleaved-u8 form.
template <int N>
inline void dot3(const float* w, const float* pr, const float* pg,
                 const float* pb, float* r, float* g, float* b) {
  float rr = w[0] * pr[0], gg = w[0] * pg[0], bb = w[0] * pb[0];
  for (int k = 1; k < N; ++k) {
    rr += w[k] * pr[k];
    gg += w[k] * pg[k];
    bb += w[k] * pb[k];
  }
  *r = rr;
  *g = gg;
  *b = bb;
}

// Per-batch-thread scratch: reused across the images of a batch so the
// float intermediate / planar rows are not reallocated (and re-zeroed) per
// image. Freed at thread exit (batch workers are per-call threads).
struct ResampleScratch {
  std::vector<float> tmp;
  std::vector<float> pr, pg, pb;
  std::vector<float> acc;
};
thread_local ResampleScratch g_scratch;

// Resample the decoded subimage `in` (region `reg` of the virtual full
// image) and write ONLY the output region [ox0,ox1) x [oy0,oy1) of the
// virtual [rw x rh] resized image, at dst (row stride dst_stride bytes).
// Weights/accumulation are identical to a full resample of the full image
// — the region machinery only skips outputs nothing consumes.
void resample_region(const ImageU8& in, const DecodeRegion& reg, int rw,
                     int rh, int ox0, int ox1, int oy0, int oy1,
                     unsigned char* dst, size_t dst_stride) {
  FilterTaps tx = build_taps(reg.fw, rw);
  FilterTaps ty = build_taps(reg.fh, rh);
  const int ow = ox1 - ox0;
  if (ow <= 0 || oy1 <= oy0) return;
  // source rows the vertical taps of [oy0, oy1) touch
  int sy0, sy1;
  tap_support(reg.fh, rh, oy0, oy1, &sy0, &sy1);
  sy0 = std::max(sy0, reg.y0);
  sy1 = std::min(sy1, reg.y0 + in.h);
  const int n_rows = sy1 - sy0;

  // horizontal pass → float intermediate [n_rows, ow, 3]; planar u8→f32
  // row conversion feeds contiguous per-channel dots
  ResampleScratch& sc = g_scratch;
  sc.tmp.resize(static_cast<size_t>(n_rows) * ow * 3);
  sc.pr.resize(in.w);
  sc.pg.resize(in.w);
  sc.pb.resize(in.w);
  for (int y = sy0; y < sy1; ++y) {
    const unsigned char* src =
        in.data.data() + static_cast<size_t>(y - reg.y0) * in.w * 3;
    for (int x = 0; x < in.w; ++x) {
      sc.pr[x] = src[3 * x];
      sc.pg[x] = src[3 * x + 1];
      sc.pb[x] = src[3 * x + 2];
    }
    float* drow = sc.tmp.data() + static_cast<size_t>(y - sy0) * ow * 3;
    for (int xo = ox0; xo < ox1; ++xo) {
      const int s = tx.start[xo] - reg.x0;  // tap indices are full-image
      const int n = tx.count[xo];
      const float* w = &tx.weight[static_cast<size_t>(xo) * tx.max_count];
      float r, g, b;
      const float* ar = &sc.pr[s];
      const float* ag = &sc.pg[s];
      const float* ab = &sc.pb[s];
      switch (n) {
        case 1: dot3<1>(w, ar, ag, ab, &r, &g, &b); break;
        case 2: dot3<2>(w, ar, ag, ab, &r, &g, &b); break;
        case 3: dot3<3>(w, ar, ag, ab, &r, &g, &b); break;
        case 4: dot3<4>(w, ar, ag, ab, &r, &g, &b); break;
        case 5: dot3<5>(w, ar, ag, ab, &r, &g, &b); break;
        case 6: dot3<6>(w, ar, ag, ab, &r, &g, &b); break;
        case 7: dot3<7>(w, ar, ag, ab, &r, &g, &b); break;
        case 8: dot3<8>(w, ar, ag, ab, &r, &g, &b); break;
        default: {
          float rr = 0, gg = 0, bb = 0;
          for (int k = 0; k < n; ++k) {
            rr += w[k] * ar[k];
            gg += w[k] * ag[k];
            bb += w[k] * ab[k];
          }
          r = rr;
          g = gg;
          b = bb;
        }
      }
      float* d = drow + 3 * (xo - ox0);
      d[0] = r;
      d[1] = g;
      d[2] = b;
    }
  }

  // vertical pass → uint8 region rows. Tap-major loop order: each tap
  // contributes a full-row AXPY over contiguous floats, which the compiler
  // vectorizes — measured 10x over the pixel-major form (0.615 → 0.063 ms
  // at 320x240 → 298x224), where the variable-count inner tap loop blocked
  // SIMD. The accumulation order per output value is unchanged (k
  // ascending), so the results are bit-identical.
  const int row_len = ow * 3;
  sc.acc.resize(row_len);
  float* acc = sc.acc.data();
  for (int yo = oy0; yo < oy1; ++yo) {
    const int s = ty.start[yo] - sy0;
    const int n = ty.count[yo];
    const float* w = &ty.weight[static_cast<size_t>(yo) * ty.max_count];
    const float* row0 = &sc.tmp[static_cast<size_t>(s) * row_len];
    const float w0 = w[0];
    for (int x = 0; x < row_len; ++x) acc[x] = w0 * row0[x];
    for (int k = 1; k < n; ++k) {
      const float* rowk = &sc.tmp[static_cast<size_t>(s + k) * row_len];
      const float wk = w[k];
      for (int x = 0; x < row_len; ++x) acc[x] += wk * rowk[x];
    }
    unsigned char* d = dst + static_cast<size_t>(yo - oy0) * dst_stride;
    for (int x = 0; x < row_len; ++x) {
      int v = static_cast<int>(acc[x] + 0.5f);
      d[x] = static_cast<unsigned char>(std::clamp(v, 0, 255));
    }
  }
}

// Whole-image resample (microbench / non-crop callers).
[[maybe_unused]] void resample(const ImageU8& in, int out_w, int out_h,
                               ImageU8* out) {
  out->w = out_w;
  out->h = out_h;
  out->c = 3;
  out->data.resize(static_cast<size_t>(out_w) * out_h * 3);
  DecodeRegion reg{in.w, in.h, 0, 0};
  resample_region(in, reg, out_w, out_h, 0, out_w, 0, out_h,
                  out->data.data(), static_cast<size_t>(out_w) * 3);
}

// torchvision CenterCrop anchor: int(round((size - target)/2.0)) with
// round-half-to-even (matches data/decode.py _crop_anchor; floor division
// shifts the crop 1px when (size - target) % 4 == 3). Smaller-than-crop
// images pad top-left by (target - size)/2 first (functional.center_crop
// padding_ltrb), so the content anchor is -((target - size) / 2).
int center_anchor(int size, int target) {
  if (size < target) return -((target - size) / 2);
  int diff = size - target;
  if (diff % 2 == 0) return diff / 2;
  int fl = diff / 2;  // floor for non-negative diff; value is fl + 0.5
  return (fl % 2 == 0) ? fl : fl + 1;
}

// shorter-side resize to resize_target then DIRECT center crop/pad to
// crop_target x crop_target (single-crop torchvision anchors — composing
// two center crops would shift 1px on odd remainders). The resample runs
// fused with the crop: only the output pixels inside the crop window are
// ever computed (resample_region), and `in` may itself be just the
// partial-decoded source region (reg).
void shape_to_square(const ImageU8& in, const DecodeRegion& reg,
                     int resize_target, int crop_target, unsigned char* out) {
  // Output size TRUNCATES (int cast), matching torchvision 0.24's
  // _compute_resized_output_size: new_long = int(target * long / short).
  int rw, rh;
  resize_dims(reg.fw, reg.fh, resize_target, &rw, &rh);
  int top = center_anchor(rh, crop_target);
  int left = center_anchor(rw, crop_target);
  int ox0 = std::max(0, left), ox1 = std::min(rw, left + crop_target);
  int oy0 = std::max(0, top), oy1 = std::min(rh, top + crop_target);
  std::memset(out, 0, static_cast<size_t>(crop_target) * crop_target * 3);
  if (ox1 <= ox0 || oy1 <= oy0) return;
  unsigned char* dst =
      out + (static_cast<size_t>(oy0 - top) * crop_target + (ox0 - left)) * 3;
  resample_region(in, reg, rw, rh, ox0, ox1, oy0, oy1, dst,
                  static_cast<size_t>(crop_target) * 3);
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

bool decode_any(const unsigned char* buf, size_t len, int target,
                int crop_target, ImageU8* img, DecodeRegion* reg) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf, len, target, crop_target, img, reg);
  }
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    if (!decode_png(buf, len, img)) return false;
    *reg = DecodeRegion{img->w, img->h, 0, 0};
    return true;
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
  DecodeRegion reg;
  if (!decode_any(buf.data(), buf.size(), resize_target, crop_target, &img,
                  &reg)) {
    return 2;
  }
  shape_to_square(img, reg, resize_target, crop_target, out);
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
  DecodeRegion reg;
  if (!decode_any(buf, static_cast<size_t>(len), target, target, &img, &reg)) {
    return 2;
  }
  shape_to_square(img, reg, target, target, out);
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
    ImageU8 img;  // reused: keeps its capacity across the batch's images
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      DecodeRegion reg;
      int rc = 0;
      if (!decode_any(bufs[i], static_cast<size_t>(lens[i]), resize_target,
                      crop_target, &img, &reg)) {
        rc = 2;
      } else {
        shape_to_square(img, reg, resize_target, crop_target, out + stride * i);
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
