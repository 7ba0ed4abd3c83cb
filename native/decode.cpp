// Native batch image decoder/augmenter for the TPU input pipeline.
//
// TPU-native equivalent of the reference's torchvision DataLoader worker
// processes (`/root/reference/train.py:44-53`): a thread pool decodes
// JPEG/PNG (libjpeg / libpng), applies RandomResizedCrop + horizontal flip
// (train) or plain resize (eval) with bilinear sampling, and writes a ready
// uint8 NHWC batch.  Called from Python via ctypes (the call releases the
// GIL, so decode overlaps the TPU step).
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

// ---------------- JPEG ----------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* img) {
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
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->data.resize(size_t(img->w) * img->h * 3);
  std::vector<uint8_t> row(size_t(img->w) * cinfo.output_components);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = img->data.data() + size_t(cinfo.output_scanline) * img->w * 3;
    uint8_t* rp = dst;
    JSAMPROW rows[1] = {rp};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
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
  if (len > 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, img);
  if (len > 8 && buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf, len, img);
  // try both as fallback
  return decode_jpeg(buf, len, img) || decode_png(buf, len, img);
}

// bilinear sample from a crop box of src into out_size x out_size (+ flip)
void crop_resize(const Image& src, int cy, int cx, int ch, int cw,
                 int out_size, bool flip, uint8_t* out) {
  const float sy = float(ch) / out_size;
  const float sx = float(cw) / out_size;
  for (int y = 0; y < out_size; y++) {
    float fy = (y + 0.5f) * sy - 0.5f + cy;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= src.h) y1 = src.h - 1;
    if (y0 >= src.h) y0 = src.h - 1;
    for (int x = 0; x < out_size; x++) {
      float fx = (x + 0.5f) * sx - 0.5f + cx;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 >= src.w) x1 = src.w - 1;
      if (x0 >= src.w) x0 = src.w - 1;
      int ox = flip ? (out_size - 1 - x) : x;
      uint8_t* dst = out + (size_t(y) * out_size + ox) * 3;
      for (int c = 0; c < 3; c++) {
        float v00 = src.data[(size_t(y0) * src.w + x0) * 3 + c];
        float v01 = src.data[(size_t(y0) * src.w + x1) * 3 + c];
        float v10 = src.data[(size_t(y1) * src.w + x0) * 3 + c];
        float v11 = src.data[(size_t(y1) * src.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[c] = (uint8_t)(v + 0.5f);
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

void process_one(const char* path, int out_size, bool train, uint64_t seed,
                 uint8_t* out, std::atomic<int>* failures) {
  std::vector<uint8_t> buf;
  Image img;
  if (!load_file(path, &buf) || !decode_any(buf.data(), buf.size(), &img)) {
    memset(out, 0, size_t(out_size) * out_size * 3);
    failures->fetch_add(1);
    return;
  }
  if (!train) {
    crop_resize(img, 0, 0, img.h, img.w, out_size, false, out);
    return;
  }
  // torchvision RandomResizedCrop(scale=(0.08,1), ratio=(3/4,4/3)) + HFlip
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> uni(0.f, 1.f);
  const float area = float(img.h) * img.w;
  int ch = -1, cw = -1, cy = 0, cx = 0;
  for (int attempt = 0; attempt < 10; attempt++) {
    float target = area * (0.08f + uni(rng) * (1.0f - 0.08f));
    float lr = logf(3.f / 4.f) + uni(rng) * (logf(4.f / 3.f) - logf(3.f / 4.f));
    float ar = expf(lr);
    int tw = (int)lroundf(sqrtf(target * ar));
    int th = (int)lroundf(sqrtf(target / ar));
    if (tw > 0 && tw <= img.w && th > 0 && th <= img.h) {
      cw = tw;
      ch = th;
      cy = (int)(uni(rng) * (img.h - th + 1));
      cx = (int)(uni(rng) * (img.w - tw + 1));
      break;
    }
  }
  if (ch < 0) {  // fallback: center crop of the short side
    int s = img.h < img.w ? img.h : img.w;
    ch = cw = s;
    cy = (img.h - s) / 2;
    cx = (img.w - s) / 2;
  }
  bool flip = uni(rng) < 0.5f;
  crop_resize(img, cy, cx, ch, cw, out_size, flip, out);
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
