// Native data-loader core for erfnet_pytorch_tpu.
//
// The reference delegates its host input pipeline to torch DataLoader worker
// *processes* doing PIL decode+resize (SURVEY.md §1 data layer, §2b rows
// "pinned-memory DataLoader").  This native equivalent removes both the
// process boundary and the GIL: a std::thread pool decodes PNG/JPEG
// (libpng/libjpeg) and resizes with PIL-compatible filters directly into
// caller-provided buffers, exposed to Python via a C ABI (ctypes).
//
//   images: triangle-filter ("bilinear" in PIL terms, area-weighted when
//           downscaling) resize of RGB888 -> float32 [0,1] HWC
//   labels: nearest resize (centers at (i+0.5)*scale, floor) -> int32
//
// Build: see build.py (plain g++ -O3 -fPIC -shared, links png/jpeg/z).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <png.h>
#include <csetjmp>
#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

// Decode a PNG to 8-bit buffer. channels_out: 3 (RGB) or 1 (gray).
bool decode_png(const char* path, int channels_out, std::vector<uint8_t>* out,
                int* w, int* h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { std::fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr);
               std::fclose(fp); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE && channels_out == 3)
    png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (channels_out == 3) {
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {  // 1 channel: label maps are gray or palette-indexed
    if (color_type == PNG_COLOR_TYPE_RGB ||
        color_type == PNG_COLOR_TYPE_RGB_ALPHA)
      png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    png_set_strip_alpha(png);
    // palette stays as raw indices (PIL 'P' -> convert('L') differs; the
    // Cityscapes _labelTrainIds files are 8-bit gray, the common case)
  }
  png_read_update_info(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  size_t want = static_cast<size_t>(channels_out) * width;
  out->resize(static_cast<size_t>(height) * want);
  std::vector<uint8_t> row(rowbytes);
  for (png_uint_32 y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    std::memcpy(out->data() + static_cast<size_t>(y) * want, row.data(),
                std::min(rowbytes, want));
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const char* path, std::vector<uint8_t>* out, int* w, int* h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = out->data() +
        static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

bool decode_image(const char* path, int channels, std::vector<uint8_t>* out,
                  int* w, int* h) {
  size_t n = std::strlen(path);
  auto ends = [&](const char* suf) {
    size_t m = std::strlen(suf);
    if (n < m) return false;
    for (size_t i = 0; i < m; ++i)
      if (std::tolower(path[n - m + i]) != suf[i]) return false;
    return true;
  };
  if (ends(".png")) return decode_png(path, channels, out, w, h);
  if (channels == 3 && (ends(".jpg") || ends(".jpeg")))
    return decode_jpeg(path, out, w, h);
  return decode_png(path, channels, out, w, h);
}

// ---------------------------------------------------------------------------
// Encoding
// ---------------------------------------------------------------------------

// Write an 8-bit PNG.  color_type: PNG_COLOR_TYPE_{GRAY,RGB,PALETTE}.
// palette (pal_n RGB triplets) only for PALETTE.  level: zlib 0-9.
// Low levels pin the filter to SUB (libpng's per-row all-filters search
// costs more than the deflate it saves on flat segmentation maps).
bool encode_png(const char* path, const uint8_t* data, int h, int w,
                int color_type, const uint8_t* palette, int pal_n,
                int level) {
  if (pal_n < 0 || pal_n > 256) return false;  // PNG PLTE hard limit
  // trivially-destructible palette storage declared before setjmp: a
  // longjmp across a live std::vector would skip its destructor (UB)
  png_color pal[256];
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  if (!png) { std::fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_write_struct(&png, nullptr);
               std::fclose(fp); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, level);
  png_set_filter(png, PNG_FILTER_TYPE_BASE,
                 level >= 6 ? PNG_ALL_FILTERS : PNG_FILTER_SUB);
  png_set_IHDR(png, info, w, h, 8, color_type, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  if (color_type == PNG_COLOR_TYPE_PALETTE) {
    for (int i = 0; i < pal_n; ++i) {
      pal[i].red = palette[3 * i + 0];
      pal[i].green = palette[3 * i + 1];
      pal[i].blue = palette[3 * i + 2];
    }
    png_set_PLTE(png, info, pal, pal_n);
  }
  png_write_info(png, info);
  int bpp = color_type == PNG_COLOR_TYPE_RGB ? 3 : 1;
  for (int y = 0; y < h; ++y)
    png_write_row(png, const_cast<png_bytep>(
        data + static_cast<size_t>(y) * w * bpp));
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return true;
}

// ---------------------------------------------------------------------------
// PIL-compatible resize
// ---------------------------------------------------------------------------

// Precomputed triangle-filter taps for one output axis (PIL's BILINEAR with
// support scaled by the downscale factor — i.e. area-weighted averaging).
struct Taps {
  std::vector<int> first;      // first source index per output pixel
  std::vector<int> count;      // number of taps
  std::vector<float> weight;   // flattened weights [out][count]
  int max_count = 0;
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // bilinear filter support = 1
  int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.first.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(static_cast<size_t>(out_size) * kmax, 0.f);
  t.max_count = kmax;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double sum = 0.0;
    std::vector<double> k(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double v = std::abs(arg) < 1.0 ? 1.0 - std::abs(arg) : 0.0;
      k[x - xmin] = v;
      sum += v;
    }
    t.first[xx] = xmin;
    t.count[xx] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i)
      t.weight[static_cast<size_t>(xx) * kmax + i] =
          sum > 0 ? static_cast<float>(k[i] / sum) : 0.f;
  }
  return t;
}

inline uint8_t clip8(float v) {
  // PIL's clip8: fixed-point accumulate + round-half-up; the float
  // equivalent is add-0.5-truncate with saturation.
  int i = static_cast<int>(v + 0.5f);
  return static_cast<uint8_t>(i < 0 ? 0 : i > 255 ? 255 : i);
}

// Bilinear RGB888 -> uint8 HWC, two-pass, rounding to uint8 BETWEEN the
// passes exactly like PIL's 8-bit resample (ImagingResampleHorizontal_8bpc
// writes clip8 rows that the vertical pass re-reads) — this is what keeps
// the native backend within 1 LSB of the reference's torchvision
// Resize(BILINEAR) and therefore inside the mIoU-parity budget
// (SURVEY.md §7 hard parts).
void resize_bilinear_u8(const uint8_t* src, int in_h, int in_w,
                        int out_h, int out_w, uint8_t* dst) {
  Taps tx = make_taps(in_w, out_w);
  Taps ty = make_taps(in_h, out_h);
  // horizontal pass: (in_h, out_w, 3) uint8 (PIL-rounded)
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * 3;
    uint8_t* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const float* wts = &tx.weight[static_cast<size_t>(xx) * tx.max_count];
      int x0 = tx.first[xx], cnt = tx.count[xx];
      float r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const uint8_t* p = row + static_cast<size_t>(x0 + i) * 3;
        r += wts[i] * p[0];
        g += wts[i] * p[1];
        b += wts[i] * p[2];
      }
      trow[xx * 3 + 0] = clip8(r);
      trow[xx * 3 + 1] = clip8(g);
      trow[xx * 3 + 2] = clip8(b);
    }
  }
  // vertical pass -> dst
  for (int yy = 0; yy < out_h; ++yy) {
    const float* wts = &ty.weight[static_cast<size_t>(yy) * ty.max_count];
    int y0 = ty.first[yy], cnt = ty.count[yy];
    uint8_t* drow = dst + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w * 3; ++xx) {
      float acc = 0;
      for (int i = 0; i < cnt; ++i)
        acc += wts[i] * tmp[static_cast<size_t>(y0 + i) * out_w * 3 + xx];
      drow[xx] = clip8(acc);
    }
  }
}

// Bilinear RGB888 -> float32 [0,1] HWC: exactly the uint8 resize / 255
// (ToTensor semantics), so the f32 and raw-uint8 loader outputs are
// bit-consistent and both match the reference's PIL->ToTensor pipeline.
void resize_bilinear_to_float(const uint8_t* src, int in_h, int in_w,
                              int out_h, int out_w, float* dst) {
  std::vector<uint8_t> u8(static_cast<size_t>(out_h) * out_w * 3);
  resize_bilinear_u8(src, in_h, in_w, out_h, out_w, u8.data());
  size_t n = u8.size();
  // true division (not reciprocal-multiply): bit-equal to numpy's
  // u8.astype(float32) / 255.0, the ToTensor the consumers replicate
  for (size_t i = 0; i < n; ++i) dst[i] = u8[i] / 255.0f;
}

// Nearest resize for labels -> int32 (PIL NEAREST: floor((i+0.5)*scale)).
void resize_nearest_to_int32(const uint8_t* src, int in_h, int in_w,
                             int out_h, int out_w, int32_t* dst) {
  for (int yy = 0; yy < out_h; ++yy) {
    int sy = std::min(static_cast<int>((yy + 0.5) * in_h / out_h), in_h - 1);
    const uint8_t* row = src + static_cast<size_t>(sy) * in_w;
    for (int xx = 0; xx < out_w; ++xx) {
      int sx = std::min(static_cast<int>((xx + 0.5) * in_w / out_w),
                        in_w - 1);
      dst[static_cast<size_t>(yy) * out_w + xx] = row[sx];
    }
  }
}

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> f) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> f;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        f = std::move(q_.front());
        q_.pop();
      }
      f();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

struct Latch {
  std::mutex mu;
  std::condition_variable cv;
  int remaining;
  explicit Latch(int n) : remaining(n) {}
  void Done() {
    std::unique_lock<std::mutex> lk(mu);
    if (--remaining == 0) cv.notify_all();
  }
  void Wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return remaining == 0; });
  }
};

}  // namespace

extern "C" int load_label_i32(const char* path, int out_h, int out_w,
                              int32_t* out);

namespace {

// Shared body of loader_batch / loader_batch_u8: per-sample image decode
// into `out_imgs` (pixel type + decoder vary), label decode into
// `out_labs` (or constant `fill` when the path is NULL/empty), one
// atomic rc for error propagation, Latch for completion.  Keeping this
// in one place means the error/fill contract cannot drift between the
// f32 and u8 paths.
template <typename T>
int batch_fill(void* pool_ptr, const char** img_paths,
               const char** lab_paths, int n, int h, int w, T* out_imgs,
               int32_t* out_labs, int fill,
               int (*load_image)(const char*, int, int, T*)) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  Latch latch(n);
  std::atomic<int> rc{0};
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      T* img_dst = out_imgs + static_cast<size_t>(i) * h * w * 3;
      if (load_image(img_paths[i], h, w, img_dst) != 0) rc = -1;
      int32_t* lab_dst = out_labs + static_cast<size_t>(i) * h * w;
      const char* lp = lab_paths ? lab_paths[i] : nullptr;
      if (lp && lp[0]) {
        if (load_label_i32(lp, h, w, lab_dst) != 0) rc = -1;
      } else {
        std::fill(lab_dst, lab_dst + static_cast<size_t>(h) * w, fill);
      }
      latch.Done();
    });
  }
  latch.Wait();
  return rc.load();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* loader_create(int num_threads) { return new Pool(num_threads); }

void loader_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Decode+resize one RGB image to float32 [0,1] (out_h, out_w, 3).
int load_image_f32(const char* path, int out_h, int out_w, float* out) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!decode_image(path, 3, &buf, &w, &h)) return -1;
  resize_bilinear_to_float(buf.data(), h, w, out_h, out_w, out);
  return 0;
}

// Decode+resize one RGB image to raw uint8 (out_h, out_w, 3) — the
// bandwidth-lean host->device form (4x less H2D than f32; the /255
// normalize runs on-device where XLA fuses it into the first conv).
int load_image_u8(const char* path, int out_h, int out_w, uint8_t* out) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!decode_image(path, 3, &buf, &w, &h)) return -1;
  resize_bilinear_u8(buf.data(), h, w, out_h, out_w, out);
  return 0;
}

// Decode+resize one label map to int32 (out_h, out_w), nearest.
int load_label_i32(const char* path, int out_h, int out_w, int32_t* out) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!decode_image(path, 1, &buf, &w, &h)) return -1;
  resize_nearest_to_int32(buf.data(), h, w, out_h, out_w, out);
  return 0;
}

// Parallel batch fill: images (n, h, w, 3) f32 and labels (n, h, w) i32.
// lab_paths[i] may be NULL/"" -> labels filled with `fill`.
int loader_batch(void* pool_ptr, const char** img_paths,
                 const char** lab_paths, int n, int h, int w,
                 float* out_imgs, int32_t* out_labs, int fill) {
  return batch_fill(pool_ptr, img_paths, lab_paths, n, h, w, out_imgs,
                    out_labs, fill, load_image_f32);
}

// Same as loader_batch with raw uint8 images (values are exactly the f32
// path's * 255 — the PIL-rounded resize output).
int loader_batch_u8(void* pool_ptr, const char** img_paths,
                    const char** lab_paths, int n, int h, int w,
                    uint8_t* out_imgs, int32_t* out_labs, int fill) {
  return batch_fill(pool_ptr, img_paths, lab_paths, n, h, w, out_imgs,
                    out_labs, fill, load_image_u8);
}

// Write one 8-bit PNG.  mode: 0 gray (h, w), 1 RGB (h, w, 3),
// 2 palette-indexed (h, w) with `palette` = pal_n RGB triplets.
int save_png_u8(const char* path, const uint8_t* data, int h, int w,
                int mode, const uint8_t* palette, int pal_n, int level) {
  int ct = mode == 1 ? PNG_COLOR_TYPE_RGB
         : mode == 2 ? PNG_COLOR_TYPE_PALETTE
                     : PNG_COLOR_TYPE_GRAY;
  return encode_png(path, data, h, w, ct, palette, pal_n, level) ? 0 : -1;
}

// Parallel batch write: data is (n, h, w[, 3]) uint8, one PNG per path.
// The GIL is released for the whole batch (one ctypes call); the eval
// CLIs' output loop is otherwise serial PIL encodes (SURVEY.md §3.3's
// device->host .cpu() + PIL save boundary).
int writer_batch(void* pool_ptr, const char** paths, const uint8_t* data,
                 int n, int h, int w, int mode, const uint8_t* palette,
                 int pal_n, int level) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  Latch latch(n);
  std::atomic<int> rc{0};
  size_t stride = static_cast<size_t>(h) * w * (mode == 1 ? 3 : 1);
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      if (save_png_u8(paths[i], data + stride * i, h, w, mode, palette,
                      pal_n, level) != 0)
        rc = -1;
      latch.Done();
    });
  }
  latch.Wait();
  return rc.load();
}

}  // extern "C"
