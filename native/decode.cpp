// Native batch image decoder/augmenter for the TPU input pipeline.
//
// TPU-native equivalent of the reference's torchvision DataLoader worker
// processes (`/root/reference/train.py:44-53`): a thread pool decodes
// JPEG/PNG (libjpeg / libpng), applies RandomResizedCrop + horizontal flip
// (train) or plain resize (eval) with bilinear sampling, and writes a ready
// uint8 NHWC batch.  Called from Python via ctypes (the call releases the
// GIL, so decode overlaps the TPU step).
//
// JPEG fast path (libjpeg-turbo): the crop window only depends on the
// header dimensions, so decode runs at the smallest IDCT scale M/8 whose
// scaled crop still covers the output size with margin, restricted to the
// crop's scanline/column region (jpeg_skip_scanlines / jpeg_crop_scanline).
// On a 512^2 source with a 224 target this cuts decode work ~4x — the same
// strategy as PIL's Image.draft() / tf.io.decode_and_crop_jpeg / DALI.
// PNG has no scaled decode; it keeps the full-resolution path.
//
// C API:
//   int mic_decode_batch(const char** paths, int n, int out_size, int train,
//                        unsigned long long seed, unsigned char* out,
//                        int threads);
// Returns the number of images that failed to decode (their slots zeroed).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB, HWC
  int h = 0, w = 0;
};

// Crop box in image coordinates (float: scaled-decode boxes are fractional).
struct Box {
  float y = 0, x = 0, h = 0, w = 0;
};

// ---------------- JPEG ----------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool is_jpeg(const uint8_t* buf, size_t len) {
  return len > 2 && buf[0] == 0xFF && buf[1] == 0xD8;
}

// Header-only parse: full image dimensions without any IDCT work.
bool jpeg_dims(const uint8_t* buf, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Decode at IDCT scale M/8.  With `region`, `box` is given in FULL-image
// coordinates; only the covering scanline/column window is decoded and
// `box` is remapped into the returned image's coordinates.  libjpeg-turbo's
// jpeg_crop_scanline may widen the column window to an iMCU boundary — the
// actual offsets are folded into the remapped box.
bool decode_jpeg_scaled(const uint8_t* buf, size_t len, int M, bool region,
                        Image* img, Box* box) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr to RGB
  cinfo.scale_num = (unsigned)M;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  const int ow = cinfo.output_width, oh = cinfo.output_height;

  // map the box into scaled coordinates using the EXACT output dims
  // (libjpeg rounds scaled dims up, so the ratio is not exactly M/8)
  int y0 = 0, y1 = oh;
  if (region) {
    const float ry = float(oh) / cinfo.image_height;
    const float rx = float(ow) / cinfo.image_width;
    box->y *= ry;
    box->h *= ry;
    box->x *= rx;
    box->w *= rx;
#ifdef JCS_EXTENSIONS  // libjpeg-turbo: partial-window decode
    // bilinear sampling needs one pixel beyond each box edge
    int px0 = (int)floorf(box->x) - 1, px1 = (int)ceilf(box->x + box->w) + 2;
    if (px0 < 0) px0 = 0;
    if (px1 > ow) px1 = ow;
    if (px1 - px0 < ow) {
      JDIMENSION cx = (JDIMENSION)px0, cw = (JDIMENSION)(px1 - px0);
      jpeg_crop_scanline(&cinfo, &cx, &cw);  // may widen to iMCU bounds
      box->x -= (float)cx;
    }
    y0 = (int)floorf(box->y) - 1;
    if (y0 < 0) y0 = 0;
    y1 = (int)ceilf(box->y + box->h) + 2;
    if (y1 > oh) y1 = oh;
    box->y -= (float)y0;
#endif
  }

  img->w = (int)cinfo.output_width;  // after any column crop
  img->h = y1 - y0;
  img->data.resize(size_t(img->w) * img->h * 3);
#ifdef JCS_EXTENSIONS
  while ((int)cinfo.output_scanline < y0) {
    JDIMENSION skipped =
        jpeg_skip_scanlines(&cinfo, (JDIMENSION)(y0 - cinfo.output_scanline));
    if (skipped == 0) break;
  }
#endif
  while ((int)cinfo.output_scanline < y1) {
    uint8_t* dst = img->data.data() +
                   size_t((int)cinfo.output_scanline - y0) * img->w * 3;
    JSAMPROW rows[1] = {dst};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  if ((int)cinfo.output_scanline < oh)
    jpeg_abort_decompress(&cinfo);  // skip the rows below the box
  else
    jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------
struct PngReadCtx {
  const uint8_t* buf;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, ctx->buf + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* img) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->data.resize(size_t(img->w) * img->h * 3);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; y++)
    rows[y] = img->data.data() + size_t(y) * img->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* img) {
  if (is_jpeg(buf, len)) {
    Box full;
    return decode_jpeg_scaled(buf, len, 8, false, img, &full);
  }
  if (len > 8 && buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf, len, img);
  Box full;
  return decode_jpeg_scaled(buf, len, 8, false, img, &full) ||
         decode_png(buf, len, img);
}

// bilinear sample from a (float) crop box of src into out_size x out_size.
// Table-driven fixed-point (8-bit weights, like cv2's INTER_LINEAR): the
// per-pixel float index math was ~45% of the whole decode pipeline.
void crop_resize(const Image& src, const Box& b, int out_size, bool flip,
                 uint8_t* out) {
  const float sy = b.h / out_size;
  const float sx = b.w / out_size;
  std::vector<int> xi0(out_size), xi1(out_size), yi0(out_size), yi1(out_size);
  std::vector<int32_t> wx(out_size), wy(out_size);  // weight of the +1 tap
  for (int x = 0; x < out_size; x++) {
    float fx = (x + 0.5f) * sx - 0.5f + b.x;
    int x0 = (int)floorf(fx);
    int32_t w = (int32_t)lrintf((fx - x0) * 256.f);
    int x1 = x0 + 1;
    if (x0 < 0) x0 = 0;
    if (x1 >= src.w) x1 = src.w - 1;
    if (x0 >= src.w) x0 = src.w - 1;
    int ox = flip ? (out_size - 1 - x) : x;  // flip via the index table
    xi0[ox] = x0 * 3;
    xi1[ox] = x1 * 3;
    wx[ox] = w;
  }
  for (int y = 0; y < out_size; y++) {
    float fy = (y + 0.5f) * sy - 0.5f + b.y;
    int y0 = (int)floorf(fy);
    wy[y] = (int32_t)lrintf((fy - y0) * 256.f);
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= src.h) y1 = src.h - 1;
    if (y0 >= src.h) y0 = src.h - 1;
    yi0[y] = y0;
    yi1[y] = y1;
  }
  for (int y = 0; y < out_size; y++) {
    const uint8_t* r0 = src.data.data() + size_t(yi0[y]) * src.w * 3;
    const uint8_t* r1 = src.data.data() + size_t(yi1[y]) * src.w * 3;
    const int32_t vy = wy[y], uy = 256 - vy;
    uint8_t* dst = out + size_t(y) * out_size * 3;
    for (int x = 0; x < out_size; x++) {
      const int a0 = xi0[x], a1 = xi1[x];
      const int32_t vx = wx[x], ux = 256 - vx;
      for (int c = 0; c < 3; c++) {
        int32_t top = ux * r0[a0 + c] + vx * r0[a1 + c];
        int32_t bot = ux * r1[a0 + c] + vx * r1[a1 + c];
        dst[x * 3 + c] = (uint8_t)((uy * top + vy * bot + 32768) >> 16);
      }
    }
  }
}

bool load_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(len);
  size_t rd = fread(buf->data(), 1, len, f);
  fclose(f);
  return rd == size_t(len);
}

// Crop selection as a pure function of (h, w, seed) — identical for the
// full-resolution and scaled-decode paths, so pixels stay deterministic
// per seed regardless of which decode strategy runs.
// torchvision RandomResizedCrop(scale=(0.08,1), ratio=(3/4,4/3)) + HFlip.
void pick_box(bool train, int h, int w, uint64_t seed, Box* b, bool* flip) {
  *flip = false;
  if (!train) {
    *b = Box{0.f, 0.f, float(h), float(w)};
    return;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> uni(0.f, 1.f);
  const float area = float(h) * w;
  int ch = -1, cw = -1, cy = 0, cx = 0;
  for (int attempt = 0; attempt < 10; attempt++) {
    float target = area * (0.08f + uni(rng) * (1.0f - 0.08f));
    float lr = logf(3.f / 4.f) + uni(rng) * (logf(4.f / 3.f) - logf(3.f / 4.f));
    float ar = expf(lr);
    int tw = (int)lroundf(sqrtf(target * ar));
    int th = (int)lroundf(sqrtf(target / ar));
    if (tw > 0 && tw <= w && th > 0 && th <= h) {
      cw = tw;
      ch = th;
      cy = (int)(uni(rng) * (h - th + 1));
      cx = (int)(uni(rng) * (w - tw + 1));
      break;
    }
  }
  if (ch < 0) {  // fallback: center crop of the short side
    int s = h < w ? h : w;
    ch = cw = s;
    cy = (h - s) / 2;
    cx = (w - s) / 2;
  }
  *flip = uni(rng) < 0.5f;
  *b = Box{float(cy), float(cx), float(ch), float(cw)};
}

// Smallest IDCT scale M/8 whose scaled crop still covers the output size.
// Only power-of-two scales: libjpeg-turbo has SIMD kernels for the 1x1 /
// 2x2 / 4x4 reduced IDCTs but falls back to scalar C for 3..7/8 — measured
// SLOWER than SIMD full decode despite doing less arithmetic.  M=8 (full
// resolution) when the source is not meaningfully larger than the target,
// so small images keep the exact full-decode path.
int pick_scale(float box_min_dim, int out_size) {
  for (int m = 1; m < 8; m *= 2) {
    if (box_min_dim * m / 8.f >= float(out_size)) return m;
  }
  return 8;
}

void process_one(const char* path, int out_size, bool train, uint64_t seed,
                 uint8_t* out, std::atomic<int>* failures) {
  std::vector<uint8_t> buf;
  Image img;
  Box box;
  bool flip = false;
  if (!load_file(path, &buf)) goto fail;

  if (is_jpeg(buf.data(), buf.size())) {
    int fw = 0, fh = 0;
    if (!jpeg_dims(buf.data(), buf.size(), &fw, &fh)) goto fail;
    pick_box(train, fh, fw, seed, &box, &flip);
    const int M = pick_scale(box.h < box.w ? box.h : box.w, out_size);
    if (!decode_jpeg_scaled(buf.data(), buf.size(), M, /*region=*/true,
                            &img, &box))
      goto fail;
    crop_resize(img, box, out_size, flip, out);
    return;
  }

  if (!decode_any(buf.data(), buf.size(), &img)) goto fail;
  pick_box(train, img.h, img.w, seed, &box, &flip);
  crop_resize(img, box, out_size, flip, out);
  return;

fail:
  memset(out, 0, size_t(out_size) * out_size * 3);
  failures->fetch_add(1);
}

}  // namespace

extern "C" {

int mic_decode_batch(const char** paths, int n, int out_size, int train,
                     unsigned long long seed, unsigned char* out,
                     int threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  if (threads < 1) threads = 1;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      process_one(paths[i], out_size, train != 0,
                  seed * 0x9E3779B97F4A7C15ull + i,
                  out + size_t(i) * out_size * out_size * 3, &failures);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads - 1; t++) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
