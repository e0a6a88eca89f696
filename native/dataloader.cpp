// Native data loader for rvio_tpu: fast PNG decode + threaded prefetch.
//
// The TPU-native equivalent of the reference's host-side I/O shell
// (reference: src/rvio_mono.cc + src/rvio/InputBuffer.{h,cc}): the compute
// path lives in XLA, but feeding 20 Hz image streams at replay speed needs
// native decode throughput — the pure-python PNG unfilter loops are ~1000x
// too slow for bulk EuRoC replay.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image):
//   rvio_png_info(path, &w, &h)            -> 0 on success
//   rvio_png_decode(path, out, w*h)        -> 0 on success (8-bit gray)
//   rvio_batch_create(n_threads)           -> pool handle
//   rvio_batch_submit(pool, idx, path)     -> enqueue decode into slot idx
//   rvio_batch_wait(pool, out, w, h, n)    -> join all, copy into (n,h,w)
//   rvio_batch_destroy(pool)
//
// Supports 8-bit grayscale / RGB / RGBA / gray+alpha PNGs (EuRoC cam0 is
// gray8); RGB converts with BT.601 luma like cv::cvtColor.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Png {
  uint32_t w = 0, h = 0;
  int channels = 0;
  std::vector<uint8_t> gray;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

// Decode one PNG file to 8-bit grayscale.
bool decode(const char* path, Png& png, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(sz);
  if (fread(data.data(), 1, sz, f) != size_t(sz)) { fclose(f); return false; }
  fclose(f);

  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (sz < 8 || memcmp(data.data(), sig, 8) != 0) return false;

  size_t pos = 8;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    const uint8_t* ctype = &data[pos + 4];
    const uint8_t* chunk = &data[pos + 8];
    if (pos + 12 + len > data.size()) return false;
    if (!memcmp(ctype, "IHDR", 4)) {
      png.w = be32(chunk);
      png.h = be32(chunk + 4);
      bit_depth = chunk[8];
      color_type = chunk[9];
      interlace = chunk[12];
      if (bit_depth != 8 || interlace) return false;
      png.channels = color_type == 0 ? 1 : color_type == 2 ? 3
                      : color_type == 4 ? 2 : color_type == 6 ? 4 : 0;
      if (!png.channels) return false;
      if (header_only) return true;
    } else if (!memcmp(ctype, "IDAT", 4)) {
      idat.insert(idat.end(), chunk, chunk + len);
    } else if (!memcmp(ctype, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (!png.w || !png.h || idat.empty()) return false;

  const int ch = png.channels;
  const size_t stride = size_t(png.w) * ch;
  std::vector<uint8_t> raw((stride + 1) * png.h);
  if (!inflate_all(idat, raw)) return false;

  std::vector<uint8_t> img(stride * png.h);
  std::vector<uint8_t> zero(stride, 0);
  const uint8_t* prev = zero.data();
  for (uint32_t y = 0; y < png.h; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t* dst = &img[stride * y];
    const int ftype = src[0];
    ++src;
    switch (ftype) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (i >= size_t(ch) ? dst[i - ch] : 0);
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) dst[i] = src[i] + prev[i];
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(ch) ? dst[i - ch] : 0;
          dst[i] = src[i] + ((left + prev[i]) >> 1);
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(ch) ? dst[i - ch] : 0;
          int c = i >= size_t(ch) ? prev[i - ch] : 0;
          dst[i] = src[i] + paeth(a, prev[i], c);
        }
        break;
      default:
        return false;
    }
    prev = dst;
  }

  png.gray.resize(size_t(png.w) * png.h);
  if (ch == 1) {
    png.gray.assign(img.begin(), img.end());
  } else {
    for (size_t i = 0; i < size_t(png.w) * png.h; ++i) {
      const uint8_t* px = &img[i * ch];
      if (ch >= 3) {
        // BT.601 luma, fixed point (matches cv::cvtColor weights)
        png.gray[i] = uint8_t((299 * px[0] + 587 * px[1] + 114 * px[2] + 500)
                              / 1000);
      } else {
        png.gray[i] = px[0];  // gray+alpha
      }
    }
  }
  return true;
}

// ---- threaded batch prefetcher (the InputBuffer-equivalent runtime) ----

struct Pool {
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  std::queue<std::pair<int, std::string>> tasks;
  std::vector<Png> results;
  std::atomic<int> pending{0};
  std::atomic<bool> stop{false};
  std::mutex done_mu;
  std::condition_variable done_cv;

  explicit Pool(int n_threads) {
    results.reserve(1024);
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  ~Pool() {
    stop = true;
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void run() {
    for (;;) {
      std::pair<int, std::string> task;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !tasks.empty(); });
        if (stop && tasks.empty()) return;
        task = std::move(tasks.front());
        tasks.pop();
      }
      Png png;
      decode(task.second.c_str(), png, false);
      {
        std::lock_guard<std::mutex> lk(mu);
        if (task.first >= int(results.size())) results.resize(task.first + 1);
        results[size_t(task.first)] = std::move(png);
      }
      if (--pending == 0) done_cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int rvio_png_info(const char* path, int* w, int* h) {
  Png png;
  if (!decode(path, png, true)) return -1;
  *w = int(png.w);
  *h = int(png.h);
  return 0;
}

int rvio_png_decode(const char* path, uint8_t* out, long out_len) {
  Png png;
  if (!decode(path, png, false)) return -1;
  if (long(png.gray.size()) != out_len) return -2;
  memcpy(out, png.gray.data(), png.gray.size());
  return 0;
}

void* rvio_batch_create(int n_threads) { return new Pool(n_threads); }

void rvio_batch_submit(void* pool, int idx, const char* path) {
  Pool* p = static_cast<Pool*>(pool);
  ++p->pending;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->tasks.emplace(idx, path);
  }
  p->cv.notify_one();
}

int rvio_batch_wait(void* pool, uint8_t* out, int w, int h, int n) {
  Pool* p = static_cast<Pool*>(pool);
  {
    std::unique_lock<std::mutex> lk(p->done_mu);
    p->done_cv.wait(lk, [p] { return p->pending.load() == 0; });
  }
  std::lock_guard<std::mutex> lk(p->mu);
  const size_t frame = size_t(w) * h;
  for (int i = 0; i < n; ++i) {
    if (i >= int(p->results.size())) return -1;
    const Png& png = p->results[i];
    if (int(png.w) != w || int(png.h) != h) return -2;
    memcpy(out + frame * i, png.gray.data(), frame);
  }
  p->results.clear();
  return 0;
}

void rvio_batch_destroy(void* pool) { delete static_cast<Pool*>(pool); }

}  // extern "C"
