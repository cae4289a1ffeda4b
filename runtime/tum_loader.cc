// Native runtime: multithreaded prefetching TUM RGB-D frame loader.
//
// The reference's data path is a synchronous cv::imread per frame inside
// the tracking loop (SURVEY.md §4.2 rgbd_tum main loop). Here decode IO
// runs in a C++ thread pool ahead of the accelerator pipeline: workers
// read + decode PNG pairs (8-bit RGB/gray -> float32 grayscale; 16-bit
// depth -> float32 meters via DepthMapFactor) into a bounded in-order
// queue the Python driver pops from. Exposed through a C ABI consumed
// with ctypes (no pybind11 in this environment).
//
// Build: see runtime/build.sh (g++ -O3 -shared, links libpng+zlib).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> gray;   // H*W luminance
  std::vector<float> depth;  // H*W meters
  double timestamp = 0.0;
  int width = 0, height = 0;
  bool ok = false;
};

struct PngImage {
  std::vector<uint8_t> data;  // row-major, channels interleaved
  int width = 0, height = 0, channels = 0, bit_depth = 0;
};

bool read_png(const char* path, PngImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  png_byte color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && out->bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // keep 16-bit depth images big-endian -> swap to host order
  if (out->bit_depth == 16) png_set_swap(png);
  png_read_update_info(png, info);
  out->channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->height);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

struct Loader {
  std::vector<std::string> rgb_paths, depth_paths;
  std::vector<double> timestamps;
  float depth_factor = 5000.0f;
  int n_threads = 4;
  size_t queue_cap = 8;
  // expected decode dims; frames that do not match are delivered as
  // failed (rc 0) instead of overflowing the caller's fixed buffers
  int expected_width = 0, expected_height = 0;

  std::map<size_t, Frame> ready;      // in-order delivery buffer
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<size_t> next_to_decode{0};
  size_t next_to_deliver = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    while (!stop.load()) {
      size_t idx = next_to_decode.fetch_add(1);
      if (idx >= rgb_paths.size()) return;
      Frame f = decode(idx);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || ready.size() < queue_cap ||
               idx < next_to_deliver + queue_cap;
      });
      if (stop.load()) return;
      ready.emplace(idx, std::move(f));
      cv_ready.notify_all();
    }
  }

  Frame decode(size_t idx) {
    Frame f;
    f.timestamp = timestamps[idx];
    PngImage rgb, dep;
    if (!read_png(rgb_paths[idx].c_str(), &rgb) ||
        !read_png(depth_paths[idx].c_str(), &dep))
      return f;
    f.width = rgb.width;
    f.height = rgb.height;
    if (rgb.width != expected_width || rgb.height != expected_height)
      return f;  // dims mismatch the configured camera: fail, don't overflow
    f.gray.resize((size_t)rgb.width * rgb.height);
    if (rgb.channels >= 3 && rgb.bit_depth == 8) {
      // ITU-R BT.601 luma, matching cv::cvtColor(RGB2GRAY)
      for (size_t i = 0; i < f.gray.size(); ++i) {
        const uint8_t* p = rgb.data.data() + i * rgb.channels;
        f.gray[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    } else if (rgb.channels == 1 && rgb.bit_depth == 8) {
      for (size_t i = 0; i < f.gray.size(); ++i)
        f.gray[i] = (float)rgb.data[i];
    } else {
      return f;
    }
    if (dep.bit_depth != 16 || dep.channels != 1 ||
        dep.width != rgb.width || dep.height != rgb.height)
      return f;
    f.depth.resize(f.gray.size());
    const uint16_t* dp = reinterpret_cast<const uint16_t*>(dep.data.data());
    const float inv = 1.0f / depth_factor;
    for (size_t i = 0; i < f.depth.size(); ++i)
      f.depth[i] = (float)dp[i] * inv;
    f.ok = true;
    return f;
  }
};

}  // namespace

extern "C" {

void* tum_loader_create(const char** rgb_paths, const char** depth_paths,
                        const double* timestamps, int n_frames,
                        float depth_factor, int n_threads, int queue_cap,
                        int expected_width, int expected_height) {
  auto* L = new Loader();
  L->rgb_paths.assign(rgb_paths, rgb_paths + n_frames);
  L->depth_paths.assign(depth_paths, depth_paths + n_frames);
  L->timestamps.assign(timestamps, timestamps + n_frames);
  L->depth_factor = depth_factor;
  L->n_threads = n_threads;
  L->queue_cap = (size_t)queue_cap;
  L->expected_width = expected_width;
  L->expected_height = expected_height;
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Pops the next frame in order. Returns 1 on success, 0 on decode error
// for that frame (stream continues), -1 when exhausted.
int tum_loader_next(void* handle, float* gray_out, float* depth_out,
                    double* timestamp_out, int* width_out, int* height_out) {
  auto* L = static_cast<Loader*>(handle);
  if (L->next_to_deliver >= L->rgb_paths.size()) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  size_t want = L->next_to_deliver;
  L->cv_ready.wait(lk, [&] { return L->ready.count(want) > 0; });
  Frame f = std::move(L->ready[want]);
  L->ready.erase(want);
  L->next_to_deliver++;
  L->cv_space.notify_all();
  lk.unlock();
  *timestamp_out = f.timestamp;
  *width_out = f.width;
  *height_out = f.height;
  if (!f.ok) return 0;
  std::memcpy(gray_out, f.gray.data(), f.gray.size() * sizeof(float));
  std::memcpy(depth_out, f.depth.data(), f.depth.size() * sizeof(float));
  return 1;
}

void tum_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
