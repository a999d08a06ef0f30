// Native data-loading runtime — the TPU framework's counterpart of the
// reference's C++ IO path (vido_slam/demo/run_vido_slam.cc: Bayer demosaic,
// .flo reads, image listing all happen in C++ before TrackRGBD).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (vido_slam_tpu/io/native.py). Components:
//   - bilinear BayerBG -> BGR demosaic (the per-frame hot pixel loop);
//   - middlebury .flo reader;
//   - a threaded file prefetcher: worker threads read raw file bytes ahead
//     of the consumer so disk latency overlaps TPU compute.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Demosaic: OpenCV BayerBG layout (R at (0,0), G at (0,1)/(1,0), B at (1,1)),
// bilinear interpolation, BGR output.
// ---------------------------------------------------------------------------

static inline float at_clamped(const uint8_t* raw, int h, int w, int y, int x) {
  y = y < 0 ? 0 : (y >= h ? h - 1 : y);
  x = x < 0 ? 0 : (x >= w ? w - 1 : x);
  return (float)raw[y * w + x];
}

void vido_demosaic_bg2bgr(const uint8_t* raw, int h, int w, uint8_t* bgr) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const bool even_row = (y % 2) == 0;
      const bool even_col = (x % 2) == 0;
      float r, g, b;
      const float c = at_clamped(raw, h, w, y, x);
      if (even_row && even_col) {  // R site
        r = c;
        g = 0.25f * (at_clamped(raw, h, w, y - 1, x) + at_clamped(raw, h, w, y + 1, x) +
                     at_clamped(raw, h, w, y, x - 1) + at_clamped(raw, h, w, y, x + 1));
        b = 0.25f * (at_clamped(raw, h, w, y - 1, x - 1) + at_clamped(raw, h, w, y - 1, x + 1) +
                     at_clamped(raw, h, w, y + 1, x - 1) + at_clamped(raw, h, w, y + 1, x + 1));
      } else if (!even_row && !even_col) {  // B site
        b = c;
        g = 0.25f * (at_clamped(raw, h, w, y - 1, x) + at_clamped(raw, h, w, y + 1, x) +
                     at_clamped(raw, h, w, y, x - 1) + at_clamped(raw, h, w, y, x + 1));
        r = 0.25f * (at_clamped(raw, h, w, y - 1, x - 1) + at_clamped(raw, h, w, y - 1, x + 1) +
                     at_clamped(raw, h, w, y + 1, x - 1) + at_clamped(raw, h, w, y + 1, x + 1));
      } else if (even_row) {  // G site on an R row: R left/right, B up/down
        g = c;
        r = 0.5f * (at_clamped(raw, h, w, y, x - 1) + at_clamped(raw, h, w, y, x + 1));
        b = 0.5f * (at_clamped(raw, h, w, y - 1, x) + at_clamped(raw, h, w, y + 1, x));
      } else {  // G site on a B row: B left/right, R up/down
        g = c;
        b = 0.5f * (at_clamped(raw, h, w, y, x - 1) + at_clamped(raw, h, w, y, x + 1));
        r = 0.5f * (at_clamped(raw, h, w, y - 1, x) + at_clamped(raw, h, w, y + 1, x));
      }
      uint8_t* px = bgr + (y * w + x) * 3;
      px[0] = (uint8_t)(b + 0.5f);
      px[1] = (uint8_t)(g + 0.5f);
      px[2] = (uint8_t)(r + 0.5f);
    }
  }
}

// ---------------------------------------------------------------------------
// .flo reader. Returns 0 on success; fills h/w; caller provides a buffer of
// at least max_floats floats (call with buf=null to query the size).
// ---------------------------------------------------------------------------

int vido_read_flo(const char* path, float* buf, int64_t max_floats, int* h,
                  int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic = 0;
  int32_t iw = 0, ih = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic < 202021.0f || magic > 202022.0f) {
    fclose(f);
    return -2;
  }
  if (fread(&iw, 4, 1, f) != 1 || fread(&ih, 4, 1, f) != 1) {
    fclose(f);
    return -3;
  }
  *w = iw;
  *h = ih;
  const int64_t n = (int64_t)iw * ih * 2;
  if (buf == nullptr) {
    fclose(f);
    return 0;
  }
  if (n > max_floats) {
    fclose(f);
    return -4;
  }
  const size_t got = fread(buf, 4, (size_t)n, f);
  fclose(f);
  return got == (size_t)n ? 0 : -5;
}

// ---------------------------------------------------------------------------
// Threaded file prefetcher.
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  std::deque<std::pair<int, std::vector<uint8_t>>> ready;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> next_to_read{0};
  std::atomic<bool> stop{false};
  size_t max_ahead = 8;
  int next_to_serve = 0;
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      int idx = next_to_read.fetch_add(1);
      if (idx >= (int)paths.size()) return;
      std::vector<uint8_t> data;
      FILE* f = fopen(paths[idx].c_str(), "rb");
      if (f) {
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        data.resize(sz);
        if (fread(data.data(), 1, sz, f) != (size_t)sz) data.clear();
        fclose(f);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] {
        return stop.load() || ready.size() < max_ahead ||
               idx < next_to_serve + (int)max_ahead;
      });
      if (stop.load()) return;
      ready.emplace_back(idx, std::move(data));
      cv.notify_all();
    }
  }
};

void* vido_prefetcher_create(const char** paths, int n, int n_threads,
                             int max_ahead) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n);
  p->max_ahead = max_ahead > 0 ? max_ahead : 8;
  for (int i = 0; i < (n_threads > 0 ? n_threads : 2); ++i)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Blocks until file `idx` is available; returns its size (or -1) and copies
// up to max_bytes into buf (buf=null: just report the size and keep it).
int64_t vido_prefetcher_get(void* handle, int idx, uint8_t* buf,
                            int64_t max_bytes) {
  auto* p = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  for (;;) {
    for (auto it = p->ready.begin(); it != p->ready.end(); ++it) {
      if (it->first == idx) {
        int64_t sz = (int64_t)it->second.size();
        if (buf == nullptr) return sz;
        if (sz > max_bytes) return -2;
        std::memcpy(buf, it->second.data(), sz);
        p->ready.erase(it);
        p->next_to_serve = idx + 1;
        p->cv.notify_all();
        return sz;
      }
    }
    if (p->next_to_read.load() >= (int)p->paths.size() && p->ready.empty())
      return -1;
    p->cv.wait(lk);
  }
}

void vido_prefetcher_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  p->stop.store(true);
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
