// Native stereo dataloader: threaded PNG decode + bilinear rectification
// with a prefetch ring buffer.
//
// TPU-native equivalent of the reference's IO layer (src2/dataset.cpp
// imread + pinholeStereoCamera.cpp remap, both on the caller thread):
// here a worker pool decodes and rectifies frames ahead of the consumer so
// the accelerator never stalls on host IO.  Exposed as a C ABI consumed
// via ctypes (plslam_tpu/native/loader.py).
//
// Build: make -C plslam_tpu/native   (g++ -O3 -shared, links libpng).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  std::vector<uint8_t> gray;
};

bool load_png_gray(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->gray.resize(static_cast<size_t>(w) * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i) rows[i] = out->gray.data() + i * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// Bilinear remap (cv2.remap INTER_LINEAR semantics) with border clamp.
void remap_bilinear(const Image& src, const float* map_x, const float* map_y,
                    int out_w, int out_h, float* out) {
  const int W = src.width, H = src.height;
  for (int i = 0; i < out_h; ++i) {
    for (int j = 0; j < out_w; ++j) {
      float x = map_x[i * out_w + j];
      float y = map_y[i * out_w + j];
      if (x < 0) x = 0;
      if (y < 0) y = 0;
      if (x > W - 1.000001f) x = W - 1.000001f;
      if (y > H - 1.000001f) y = H - 1.000001f;
      int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
      int x1 = x0 + 1 < W ? x0 + 1 : W - 1;
      int y1 = y0 + 1 < H ? y0 + 1 : H - 1;
      float fx = x - x0, fy = y - y0;
      float v00 = src.gray[y0 * W + x0];
      float v01 = src.gray[y0 * W + x1];
      float v10 = src.gray[y1 * W + x0];
      float v11 = src.gray[y1 * W + x1];
      out[i * out_w + j] = (1 - fy) * ((1 - fx) * v00 + fx * v01) +
                           fy * ((1 - fx) * v10 + fx * v11);
    }
  }
}

struct Frame {
  int index = -1;
  std::vector<float> left;
  std::vector<float> right;
  bool ok = false;
};

class Loader {
 public:
  Loader(std::vector<std::string> files_l, std::vector<std::string> files_r,
         int out_w, int out_h, const float* mlx, const float* mly,
         const float* mrx, const float* mry, int n_threads, int queue_cap)
      : files_l_(std::move(files_l)),
        files_r_(std::move(files_r)),
        out_w_(out_w),
        out_h_(out_h),
        cap_(queue_cap) {
    size_t n = static_cast<size_t>(out_w) * out_h;
    if (mlx) {
      map_lx_.assign(mlx, mlx + n);
      map_ly_.assign(mly, mly + n);
      map_rx_.assign(mrx, mrx + n);
      map_ry_.assign(mry, mry + n);
    }
    next_to_schedule_ = 0;
    for (int t = 0; t < n_threads; ++t)
      workers_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& w : workers_) w.join();
  }

  int size() const { return static_cast<int>(files_l_.size()); }

  // Blocks until frame `index` is ready; frames must be consumed in order.
  bool get(int index, float* left, float* right) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [&] {
      return stop_ || done_.count(index) > 0;
    });
    if (stop_ && done_.count(index) == 0) return false;
    Frame f = std::move(done_[index]);
    done_.erase(index);
    lk.unlock();
    cv_space_.notify_all();
    if (!f.ok) return false;
    std::memcpy(left, f.left.data(), f.left.size() * sizeof(float));
    std::memcpy(right, f.right.data(), f.right.size() * sizeof(float));
    return true;
  }

 private:
  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [&] {
          return stop_ ||
                 (next_to_schedule_ < size() &&
                  static_cast<int>(done_.size()) + in_flight_ < cap_);
        });
        if (stop_) return;
        idx = next_to_schedule_++;
        ++in_flight_;
      }
      Frame f = load(idx);
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_[idx] = std::move(f);
        --in_flight_;
      }
      cv_data_.notify_all();
    }
  }

  Frame load(int idx) {
    Frame f;
    f.index = idx;
    Image il, ir;
    if (!load_png_gray(files_l_[idx].c_str(), &il) ||
        !load_png_gray(files_r_[idx].c_str(), &ir))
      return f;
    size_t n = static_cast<size_t>(out_w_) * out_h_;
    f.left.resize(n);
    f.right.resize(n);
    if (!map_lx_.empty()) {
      remap_bilinear(il, map_lx_.data(), map_ly_.data(), out_w_, out_h_,
                     f.left.data());
      remap_bilinear(ir, map_rx_.data(), map_ry_.data(), out_w_, out_h_,
                     f.right.data());
    } else {
      for (size_t i = 0; i < n; ++i) f.left[i] = il.gray[i];
      for (size_t i = 0; i < n; ++i) f.right[i] = ir.gray[i];
    }
    f.ok = true;
    return f;
  }

  std::vector<std::string> files_l_, files_r_;
  int out_w_, out_h_, cap_;
  std::vector<float> map_lx_, map_ly_, map_rx_, map_ry_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::map<int, Frame> done_;
  int next_to_schedule_ = 0;
  int in_flight_ = 0;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* loader_create(const char** files_l, const char** files_r, int n_files,
                    int out_w, int out_h, const float* mlx, const float* mly,
                    const float* mrx, const float* mry, int n_threads,
                    int queue_cap) {
  std::vector<std::string> fl(files_l, files_l + n_files);
  std::vector<std::string> fr(files_r, files_r + n_files);
  return new Loader(std::move(fl), std::move(fr), out_w, out_h, mlx, mly, mrx,
                    mry, n_threads, queue_cap);
}

int loader_get(void* handle, int index, float* left, float* right) {
  return static_cast<Loader*>(handle)->get(index, left, right) ? 1 : 0;
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// standalone single-image helpers (used by tests)
int decode_png_gray(const char* path, float* out, int max_len, int* w, int* h) {
  Image img;
  if (!load_png_gray(path, &img)) return 0;
  int n = img.width * img.height;
  if (n > max_len) return 0;
  for (int i = 0; i < n; ++i) out[i] = img.gray[i];
  *w = img.width;
  *h = img.height;
  return 1;
}

void remap_f32(const float* src, int src_w, int src_h, const float* map_x,
               const float* map_y, int out_w, int out_h, float* out) {
  Image img;
  img.width = src_w;
  img.height = src_h;
  img.gray.resize(static_cast<size_t>(src_w) * src_h);
  for (size_t i = 0; i < img.gray.size(); ++i)
    img.gray[i] = static_cast<uint8_t>(src[i] < 0 ? 0 : src[i] > 255 ? 255 : src[i]);
  remap_bilinear(img, map_x, map_y, out_w, out_h, out);
}
}
