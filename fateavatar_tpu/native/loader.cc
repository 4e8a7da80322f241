// Native data-loader: threaded PNG/JPEG decode + bilinear resize.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (train/base.py:54-68 forks 4 python workers that decode with
// PIL). Here: a C++ thread pool decodes straight into pinned float buffers
// the Python side hands to the device — no fork, no GIL, no per-frame
// Python object churn. Exposed via a C ABI consumed with ctypes
// (fateavatar_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cc -o libfaloader.so
//        -lpng -ljpeg -lz -lpthread

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // interleaved, c channels
};

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->w = (int)w;
  out->h = (int)h;
  out->c = channels;
  out->data.resize((size_t)w * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png(f, out);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg(f, out);
  fclose(f);
  return ok;
}

// Bilinear resize (align-corners=false, PIL-like) to RGBA float [0,1].
void resize_to_rgba(const Image& img, int ow, int oh, float* out) {
  const float sx = (float)img.w / ow;
  const float sy = (float)img.h / oh;
  for (int y = 0; y < oh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= img.h ? img.h - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= img.h ? img.h - 1 : y1);
    for (int x = 0; x < ow; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = x0 < 0 ? 0 : (x0 >= img.w ? img.w - 1 : x0);
      x1 = x1 < 0 ? 0 : (x1 >= img.w ? img.w - 1 : x1);
      float* dst = out + ((size_t)y * ow + x) * 4;
      for (int ch = 0; ch < 4; ch++) {
        float v;
        if (ch < img.c) {
          const uint8_t* p = img.data.data();
          float v00 = p[((size_t)y0 * img.w + x0) * img.c + ch];
          float v01 = p[((size_t)y0 * img.w + x1) * img.c + ch];
          float v10 = p[((size_t)y1 * img.w + x0) * img.c + ch];
          float v11 = p[((size_t)y1 * img.w + x1) * img.c + ch];
          v = (v00 * (1 - wx) + v01 * wx) * (1 - wy) +
              (v10 * (1 - wx) + v11 * wx) * wy;
          v *= (1.0f / 255.0f);
        } else {
          v = 1.0f;  // missing channels: opaque alpha / grey fill
        }
        dst[ch] = v;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image to RGBA float [oh, ow, 4]. Returns source channel count
// (3 or 4) on success, -1 on failure.
int fa_decode_image(const char* path, int ow, int oh, float* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  resize_to_rgba(img, ow, oh, out);
  return img.c;
}

// Threaded batch decode: paths -> [n, oh, ow, 4]. channels_out[i] gets the
// per-image source channel count (-1 on failure). Returns count of failures.
int fa_decode_batch(const char** paths, int n, int ow, int oh, float* out,
                    int* channels_out, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int c = fa_decode_image(paths[i], ow, oh,
                              out + (size_t)i * ow * oh * 4);
      channels_out[i] = c;
      if (c < 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  int nt = nthreads < n ? nthreads : n;
  for (int t = 0; t < nt; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
