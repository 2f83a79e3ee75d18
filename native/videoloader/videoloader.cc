// videoloader: native threaded clip-loading runtime for videomamba_tpu.
//
// The reference repo delegates input pipelines to out-of-tree tooling (it
// ships no dataset/loader code; README.md:92-127 assumes the caller hands
// the model (B, C, T, H, W) tensors). Feeding the TPU serving path at
// ~1,600 frames/s needs host-side decode + augmentation off the Python
// thread, so this library implements the torch-DataLoader-equivalent as a
// small C++17 runtime:
//
//   * readers for .npy (uint8, C-order) and the trivial "VMRAW001" shard
//     format (header + raw uint8 frames), frame-addressed via pread so a
//     clip read touches only the sampled frames;
//   * clip sampling (random/center start, temporal stride, clamp-at-end),
//     short-side bilinear resize, random/center crop, horizontal flip,
//     mean/std normalisation, layout transpose to (C, T, H, W) float32;
//   * a worker pool + bounded ring of batch buffers with in-order
//     delivery. Per-sample RNG is seeded by (seed, epoch, sample index),
//     so results are bit-deterministic regardless of thread scheduling.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread videoloader.cc -o libvideoloader.so

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

#include "jpeg.h"

namespace {

// ---------------------------------------------------------------------------
// Video file metadata + frame-addressed reads
// ---------------------------------------------------------------------------

struct VideoMeta {
  std::string path;
  int64_t data_offset = 0;  // byte offset of frame 0
  int32_t T = 0, H = 0, W = 0, C = 0;
  bool jpeg = false;              // VMJPG001: per-frame JPEG payloads
  std::vector<int64_t> offsets;   // jpeg only: T+1 offsets from data start
  bool ok = false;
  std::string error;
};

bool parse_npy_header(FILE* f, VideoMeta* m) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    hlen = b[0] | (b[1] << 8);
    m->data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    m->data_offset = 12 + hlen;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) return false;
  if (header.find("'|u1'") == std::string::npos &&
      header.find("'uint8'") == std::string::npos) {
    m->error = "npy dtype must be uint8 ('|u1')";
    return false;
  }
  if (header.find("'fortran_order': False") == std::string::npos) {
    m->error = "npy must be C-order";
    return false;
  }
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  size_t lp = header.find('(', sp), rp = header.find(')', sp);
  if (lp == std::string::npos || rp == std::string::npos) return false;
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  long dims[4] = {0, 0, 0, 0};
  int nd = 0;
  const char* p = shape.c_str();
  while (*p && nd < 4) {
    while (*p == ' ' || *p == ',') ++p;
    if (!*p) break;
    char* end = nullptr;
    dims[nd++] = strtol(p, &end, 10);
    if (end == p) break;
    p = end;
  }
  if (nd != 4) {
    m->error = "npy shape must be (T, H, W, C)";
    return false;
  }
  m->T = dims[0]; m->H = dims[1]; m->W = dims[2]; m->C = dims[3];
  return true;
}

bool parse_vraw_header(FILE* f, VideoMeta* m) {
  char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "VMRAW001", 8) != 0) {
    m->error = "bad VMRAW001 magic";
    return false;
  }
  uint32_t dims[4];
  if (fread(dims, 4, 4, f) != 4) return false;
  m->T = dims[0]; m->H = dims[1]; m->W = dims[2]; m->C = dims[3];
  m->data_offset = 24;
  return true;
}

bool parse_vmjpg_header(FILE* f, VideoMeta* m) {
  char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "VMJPG001", 8) != 0) {
    m->error = "bad VMJPG001 magic";
    return false;
  }
  uint32_t dims[4];
  if (fread(dims, 4, 4, f) != 4) return false;
  m->T = dims[0]; m->H = dims[1]; m->W = dims[2]; m->C = dims[3];
  if (m->C != 3) {
    m->error = "VMJPG001 requires C=3";
    return false;
  }
  if (m->T <= 0 || m->T > (1 << 24)) {
    m->error = "bad VMJPG001 frame count";
    return false;
  }
  m->offsets.resize(m->T + 1);
  std::vector<uint64_t> raw(m->T + 1);
  if (fread(raw.data(), 8, m->T + 1, f) != size_t(m->T + 1)) return false;
  for (int i = 0; i <= m->T; ++i) {
    if (raw[i] > uint64_t(INT64_MAX)) {
      m->error = "VMJPG001 offset out of range";
      return false;
    }
    m->offsets[i] = int64_t(raw[i]);
  }
  for (int i = 0; i < m->T; ++i) {
    if (m->offsets[i + 1] < m->offsets[i]) {
      m->error = "non-monotonic VMJPG001 offsets";
      return false;
    }
  }
  m->data_offset = 24 + 8 * int64_t(m->T + 1);
  // A corrupt shard can declare arbitrarily large offsets, which would turn
  // into huge per-frame read buffers in decode(); reject anything that does
  // not fit inside the actual file.
  struct stat st;
  if (fstat(fileno(f), &st) != 0) {
    m->error = "fstat failed for VMJPG001 shard";
    return false;
  }
  if (m->offsets[0] < 0 ||
      m->data_offset + m->offsets[m->T] > int64_t(st.st_size)) {
    m->error = "VMJPG001 offsets exceed file size";
    return false;
  }
  m->jpeg = true;
  return true;
}

VideoMeta read_meta(const std::string& path) {
  VideoMeta m;
  m.path = path;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    m.error = "cannot open " + path;
    return m;
  }
  char magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got == 8 && memcmp(magic, "\x93NUMPY", 6) == 0) {
    ok = parse_npy_header(f, &m);
    if (!ok && m.error.empty()) m.error = "bad npy header: " + path;
  } else if (got == 8 && memcmp(magic, "VMJPG001", 8) == 0) {
    ok = parse_vmjpg_header(f, &m);
    if (!ok && m.error.empty()) m.error = "bad vmjpg header: " + path;
  } else {
    ok = parse_vraw_header(f, &m);
    if (!ok && m.error.empty()) m.error = "bad vraw header: " + path;
  }
  fclose(f);
  if (ok && (m.T <= 0 || m.H <= 0 || m.W <= 0 || m.C <= 0)) {
    ok = false;
    m.error = "non-positive dims in " + path;
  }
  m.ok = ok;
  return m;
}

// Read one frame (H*W*C uint8) at frame index t via pread (thread-safe,
// no shared file offset).
bool read_frame(int fd, const VideoMeta& m, int t, uint8_t* dst) {
  int64_t frame_bytes = int64_t(m.H) * m.W * m.C;
  int64_t off = m.data_offset + frame_bytes * t;
  int64_t got = 0;
  while (got < frame_bytes) {
    ssize_t r = pread(fd, dst + got, frame_bytes - got, off + got);
    if (r <= 0) return false;
    got += r;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Image ops (uint8 in, float32 out)
// ---------------------------------------------------------------------------

// Bilinear resize, align_corners=False convention (src = (i+0.5)*scale-0.5,
// clamped) — matches ops/resample.py's linear kernel so host and on-device
// resampling agree.
void resize_bilinear(const uint8_t* src, int sh, int sw, int c,
                     float* dst, int dh, int dw) {
  float sy = float(sh) / dh, sx = float(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> wx(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    if (fx > sw - 1) fx = float(sw - 1);
    x0[x] = int(fx);
    x1[x] = x0[x] + 1 < sw ? x0[x] + 1 : sw - 1;
    wx[x] = fx - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = float(sh - 1);
    int y0 = int(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    const uint8_t* r0 = src + int64_t(y0) * sw * c;
    const uint8_t* r1 = src + int64_t(y1) * sw * c;
    float* out = dst + int64_t(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = r0 + int64_t(x0[x]) * c;
      const uint8_t* p01 = r0 + int64_t(x1[x]) * c;
      const uint8_t* p10 = r1 + int64_t(x0[x]) * c;
      const uint8_t* p11 = r1 + int64_t(x1[x]) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] + (p01[k] - p00[k]) * wx[x];
        float bot = p10[k] + (p11[k] - p10[k]) * wx[x];
        out[int64_t(x) * c + k] = top + (bot - top) * wy;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Loader
// ---------------------------------------------------------------------------

struct Config {
  int clip_len = 8;
  int stride = 1;       // temporal stride between sampled frames
  int short_side = 0;   // 0 => no resize (input must already match crop)
  int crop = 224;
  int batch = 4;
  int threads = 4;
  int prefetch = 3;     // in-flight batch buffers
  float mean[3] = {0.485f, 0.456f, 0.406f};
  float stdv[3] = {0.229f, 0.224f, 0.225f};
  bool train = false;   // random start/crop + hflip vs center/center
};

enum class SlotState { kFree, kFilling, kReady };

struct BatchSlot {
  std::vector<float> buf;      // (batch, C, clip_len, crop, crop)
  std::vector<int64_t> labels;
  int remaining = 0;           // guarded by Loader::mu
  SlotState state = SlotState::kFree;
  int count = 0;  // valid samples (< batch on the final partial batch)
};

struct Task {
  int ring_slot;
  int sample;      // index into metas/labels; -1 => zero-fill padding
  int slot_in_batch;
};

struct Loader {
  Config cfg;
  std::vector<VideoMeta> metas;
  std::vector<int64_t> labels;

  std::vector<BatchSlot> ring;
  std::mutex mu;
  std::condition_variable cv_worker;   // tasks available
  std::condition_variable cv_consumer; // batch ready
  std::condition_variable cv_sched;    // ring slot freed
  std::condition_variable cv_drain;    // in-flight decodes done
  std::deque<Task> tasks;
  int active_decodes = 0;              // guarded by mu
  std::vector<std::thread> workers;
  std::thread scheduler;
  std::atomic<bool> stop{false};
  std::atomic<bool> epoch_cancel{false};

  // epoch state
  std::vector<int> order;
  int64_t epoch_seed = 0;
  int64_t epoch_idx = -1;
  int n_batches = 0;
  int next_deliver = 0;   // batch index the consumer gets next
  bool epoch_active = false;

  std::string last_error;
  char err_snapshot[512] = {0};  // stable buffer handed to ctypes callers

  int64_t sample_floats() const {
    return int64_t(3) * cfg.clip_len * cfg.crop * cfg.crop;
  }
  int64_t batch_floats() const { return sample_floats() * cfg.batch; }

  void set_error(const std::string& e) {
    std::lock_guard<std::mutex> l(mu);
    if (last_error.empty()) last_error = e;
  }

  // Decode one sample into slot `s` of ring buffer `ring_slot`. The outer
  // decode() catches exceptions (e.g. allocation failures on corrupt
  // inputs) so a bad sample surfaces through last_error instead of
  // std::terminate-ing the worker thread.
  void decode(const Task& t) {
    try {
      decode_impl(t);
    } catch (const std::exception& e) {
      set_error(std::string("decode exception: ") + e.what());
      float* out =
          ring[t.ring_slot].buf.data() + int64_t(t.slot_in_batch) * sample_floats();
      memset(out, 0, sample_floats() * sizeof(float));
    }
  }
  void decode_impl(const Task& t);
  void worker_main();
  void scheduler_main(int64_t);
  void start(int64_t seed, bool shuffle, bool drop_last, int64_t epoch_index);
  int next(float* out, int64_t* labels_out);
  void shutdown();
};

void Loader::decode_impl(const Task& t) {
  BatchSlot& slot = ring[t.ring_slot];
  float* out = slot.buf.data() + int64_t(t.slot_in_batch) * sample_floats();
  if (t.sample < 0) {
    memset(out, 0, sample_floats() * sizeof(float));
    return;
  }
  const VideoMeta& m = metas[t.sample];
  slot.labels[t.slot_in_batch] = labels[t.sample];

  // Deterministic per-sample RNG: (seed, epoch, sample) — thread-order free.
  std::mt19937 rng(uint32_t(epoch_seed * 1000003 + epoch_idx * 9176 +
                            t.sample * 2654435761u));

  const int CL = cfg.clip_len, S = cfg.crop;
  int span = (CL - 1) * cfg.stride + 1;
  int start = 0;
  if (m.T > span) {
    start = cfg.train
        ? std::uniform_int_distribution<int>(0, m.T - span)(rng)
        : (m.T - span) / 2;
  }
  bool flip = cfg.train && std::uniform_int_distribution<int>(0, 1)(rng);

  // Resize geometry (short-side) shared by all frames of the clip.
  int rh = m.H, rw = m.W;
  if (cfg.short_side > 0) {
    float scale = float(cfg.short_side) / std::min(m.H, m.W);
    rh = int(std::lround(m.H * scale));
    rw = int(std::lround(m.W * scale));
  }
  if (rh < S || rw < S) {
    set_error("resized frame smaller than crop for " + m.path);
    memset(out, 0, sample_floats() * sizeof(float));
    return;
  }
  int cy = cfg.train && rh > S
      ? std::uniform_int_distribution<int>(0, rh - S)(rng) : (rh - S) / 2;
  int cx = cfg.train && rw > S
      ? std::uniform_int_distribution<int>(0, rw - S)(rng) : (rw - S) / 2;

  int fd = open(m.path.c_str(), O_RDONLY);
  if (fd < 0) {
    set_error("open failed: " + m.path);
    memset(out, 0, sample_floats() * sizeof(float));
    return;
  }
  std::vector<uint8_t> frame(int64_t(m.H) * m.W * m.C);
  const bool needs_resize = (rh != m.H || rw != m.W);
  std::vector<float> resized;
  if (needs_resize) resized.resize(int64_t(rh) * rw * m.C);
  // Normalisation is affine in the pixel value: precompute a 256-entry LUT
  // per channel for the uint8 fast path, and (scale, bias) for the resized
  // (float) path. Identical math: (v/255 - mean) / std.
  float lut[3][256], nscale[3], nbias[3];
  for (int k = 0; k < 3; ++k) {
    nscale[k] = 1.0f / (255.0f * cfg.stdv[k]);
    nbias[k] = -cfg.mean[k] / cfg.stdv[k];
    for (int v = 0; v < 256; ++v) lut[k][v] = v * nscale[k] + nbias[k];
  }
  const int nc = std::min(m.C, 3);
  std::vector<uint8_t> jbuf;
  bool ok = true;
  for (int i = 0; i < CL; ++i) {
    int ti = start + i * cfg.stride;
    if (ti > m.T - 1) ti = m.T - 1;  // clamp: repeat last frame
    if (m.jpeg) {
      int64_t beg = m.data_offset + m.offsets[ti];
      int64_t len = m.offsets[ti + 1] - m.offsets[ti];
      jbuf.resize(len);
      int64_t got_b = 0;
      while (got_b < len) {
        ssize_t r = pread(fd, jbuf.data() + got_b, len - got_b, beg + got_b);
        if (r <= 0) break;
        got_b += r;
      }
      int jw = 0, jh = 0;
      std::string jerr;
      if (got_b < len ||
          !vmjpeg::decode_rgb(jbuf.data(), len, &frame, &jw, &jh, &jerr)) {
        set_error("jpeg decode failed (" + jerr + "): " + m.path);
        ok = false;
        break;
      }
      if (jw != m.W || jh != m.H) {
        set_error("jpeg frame size mismatch: " + m.path);
        ok = false;
        break;
      }
    } else if (!read_frame(fd, m, ti, frame.data())) {
      set_error("short read: " + m.path);
      ok = false;
      break;
    }
    if (needs_resize)
      resize_bilinear(frame.data(), m.H, m.W, m.C, resized.data(), rh, rw);
    // crop + normalise + transpose HWC -> (C, T, H, W) slot, channel-major
    // loops so writes are contiguous per output row
    const int c = m.C;
    for (int k = 0; k < nc; ++k) {
      float* och = out + (int64_t(k) * CL + i) * S * S;
      for (int y = 0; y < S; ++y) {
        float* orow = och + int64_t(y) * S;
        if (needs_resize) {
          const float* row =
              resized.data() + (int64_t(cy + y) * rw + cx) * c + k;
          if (flip) {
            for (int x = 0; x < S; ++x)
              orow[x] = row[int64_t(S - 1 - x) * c] * nscale[k] + nbias[k];
          } else {
            for (int x = 0; x < S; ++x)
              orow[x] = row[int64_t(x) * c] * nscale[k] + nbias[k];
          }
        } else {
          const uint8_t* row =
              frame.data() + (int64_t(cy + y) * rw + cx) * c + k;
          if (flip) {
            for (int x = 0; x < S; ++x)
              orow[x] = lut[k][row[int64_t(S - 1 - x) * c]];
          } else {
            for (int x = 0; x < S; ++x) orow[x] = lut[k][row[int64_t(x) * c]];
          }
        }
      }
    }
    for (int k = nc; k < 3; ++k) {
      float* ch = out + (int64_t(k) * CL + i) * S * S;
      for (int j = 0; j < S * S; ++j) ch[j] = nbias[k];
    }
  }
  close(fd);
  if (!ok) memset(out, 0, sample_floats() * sizeof(float));
}

void Loader::worker_main() {
  while (true) {
    Task t;
    {
      std::unique_lock<std::mutex> l(mu);
      cv_worker.wait(l, [&] { return stop || !tasks.empty(); });
      if (stop && tasks.empty()) return;
      t = tasks.front();
      tasks.pop_front();
      ++active_decodes;
    }
    decode(t);
    {
      std::lock_guard<std::mutex> l(mu);
      --active_decodes;
      if (!epoch_cancel) {
        BatchSlot& slot = ring[t.ring_slot];
        if (--slot.remaining == 0) {
          slot.state = SlotState::kReady;
          cv_consumer.notify_all();
        }
      }
      cv_drain.notify_all();
    }
  }
}

void Loader::scheduler_main(int64_t) {
  const int P = ring.size();
  for (int b = 0; b < n_batches; ++b) {
    int rs = b % P;
    {
      std::unique_lock<std::mutex> l(mu);
      cv_sched.wait(l, [&] {
        return stop || epoch_cancel || ring[rs].state == SlotState::kFree;
      });
      if (stop || epoch_cancel) return;
      BatchSlot& slot = ring[rs];
      slot.state = SlotState::kFilling;
      int base = b * cfg.batch;
      slot.count = std::min(cfg.batch, int(order.size()) - base);
      slot.remaining = cfg.batch;
      for (int s = 0; s < cfg.batch; ++s) {
        int sample = s < slot.count ? order[base + s] : -1;
        if (sample < 0) slot.labels[s] = -1;
        tasks.push_back(Task{rs, sample, s});
      }
      cv_worker.notify_all();
    }
  }
}

void Loader::start(int64_t seed, bool shuffle, bool drop_last,
                   int64_t epoch_index) {
  // Cancel any in-flight epoch, drain, reset ring.
  {
    std::lock_guard<std::mutex> l(mu);
    epoch_cancel = true;
    tasks.clear();
    cv_sched.notify_all();
  }
  if (scheduler.joinable()) scheduler.join();
  {
    std::unique_lock<std::mutex> l(mu);
    // drain in-flight decodes, then reset every ring slot
    cv_drain.wait(l, [&] {
      return stop || (active_decodes == 0 && tasks.empty());
    });
    for (auto& slot : ring) slot.state = SlotState::kFree;
    epoch_cancel = false;
    epoch_seed = seed;
    // explicit epoch index makes checkpoint-resume replays bit-exact;
    // -1 keeps the auto-incrementing behaviour
    epoch_idx = epoch_index >= 0 ? epoch_index : epoch_idx + 1;
    next_deliver = 0;
    order.resize(metas.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int(i);
    if (shuffle) {
      std::mt19937_64 rng(uint64_t(seed) * 6364136223846793005ull + 1442695040888963407ull);
      for (size_t i = order.size(); i > 1; --i) {
        size_t j = rng() % i;
        std::swap(order[i - 1], order[j]);
      }
    }
    n_batches = drop_last ? int(order.size()) / cfg.batch
                          : int(order.size() + cfg.batch - 1) / cfg.batch;
    epoch_active = true;
  }
  scheduler = std::thread(&Loader::scheduler_main, this, epoch_idx);
}

int Loader::next(float* out, int64_t* labels_out) {
  std::unique_lock<std::mutex> l(mu);
  if (!epoch_active || next_deliver >= n_batches) return 0;
  int rs = next_deliver % int(ring.size());
  cv_consumer.wait(l, [&] { return stop || ring[rs].state == SlotState::kReady; });
  if (stop) return 0;
  BatchSlot& slot = ring[rs];
  memcpy(out, slot.buf.data(), batch_floats() * sizeof(float));
  memcpy(labels_out, slot.labels.data(), cfg.batch * sizeof(int64_t));
  int count = slot.count;
  slot.state = SlotState::kFree;
  next_deliver += 1;
  if (next_deliver >= n_batches) epoch_active = false;
  cv_sched.notify_all();
  return count;
}

void Loader::shutdown() {
  {
    std::lock_guard<std::mutex> l(mu);
    stop = true;
    epoch_cancel = true;
    tasks.clear();
    cv_worker.notify_all();
    cv_consumer.notify_all();
    cv_sched.notify_all();
  }
  if (scheduler.joinable()) scheduler.join();
  for (auto& w : workers)
    if (w.joinable()) w.join();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* vml_create(const char** paths, const int64_t* labels, int32_t n,
                 int32_t clip_len, int32_t stride, int32_t short_side,
                 int32_t crop, int32_t batch, int32_t threads,
                 int32_t prefetch, const float* mean, const float* stdv,
                 int32_t train_mode, char* err, int32_t errlen) {
  auto fail = [&](const std::string& msg) -> void* {
    if (err && errlen > 0) {
      snprintf(err, errlen, "%s", msg.c_str());
    }
    return nullptr;
  };
  if (n <= 0) return fail("no input files");
  if (clip_len <= 0 || crop <= 0 || batch <= 0) return fail("bad config");
  auto ld = std::make_unique<Loader>();
  ld->cfg.clip_len = clip_len;
  ld->cfg.stride = std::max(1, stride);
  ld->cfg.short_side = short_side;
  ld->cfg.crop = crop;
  ld->cfg.batch = batch;
  ld->cfg.threads = std::max(1, threads);
  ld->cfg.prefetch = std::max(2, prefetch);
  ld->cfg.train = train_mode != 0;
  if (mean && stdv) {
    for (int k = 0; k < 3; ++k) {
      ld->cfg.mean[k] = mean[k];
      ld->cfg.stdv[k] = stdv[k];
    }
  }
  ld->metas.reserve(n);
  ld->labels.reserve(n);
  for (int i = 0; i < n; ++i) {
    VideoMeta m = read_meta(paths[i]);
    if (!m.ok) return fail(m.error);
    if (short_side <= 0 && (m.H < crop || m.W < crop))
      return fail("frames smaller than crop and no resize: " + m.path);
    ld->metas.push_back(std::move(m));
    ld->labels.push_back(labels ? labels[i] : i);
  }
  ld->ring.resize(ld->cfg.prefetch);
  for (auto& slot : ld->ring) {
    slot.buf.resize(ld->batch_floats());
    slot.labels.resize(batch);
  }
  for (int i = 0; i < ld->cfg.threads; ++i)
    ld->workers.emplace_back(&Loader::worker_main, ld.get());
  return ld.release();
}

int32_t vml_start_epoch(void* h, int64_t seed, int32_t shuffle,
                        int32_t drop_last, int64_t epoch_index) {
  auto* ld = static_cast<Loader*>(h);
  ld->start(seed, shuffle != 0, drop_last != 0, epoch_index);
  return ld->n_batches;
}

int32_t vml_next(void* h, float* out, int64_t* labels_out) {
  return static_cast<Loader*>(h)->next(out, labels_out);
}

int64_t vml_batch_floats(void* h) {
  return static_cast<Loader*>(h)->batch_floats();
}

const char* vml_last_error(void* h) {
  // Workers may mutate last_error concurrently via set_error; snapshot it
  // under the lock into a stable per-loader buffer so the returned pointer
  // never dangles or tears.
  auto* ld = static_cast<Loader*>(h);
  std::lock_guard<std::mutex> l(ld->mu);
  snprintf(ld->err_snapshot, sizeof(ld->err_snapshot), "%s",
           ld->last_error.c_str());
  return ld->err_snapshot;
}

void vml_destroy(void* h) {
  auto* ld = static_cast<Loader*>(h);
  ld->shutdown();
  delete ld;
}

}  // extern "C"
