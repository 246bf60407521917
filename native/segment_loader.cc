// Native training-data loader: mmap'd WAV corpus -> random float32 segments
// through a worker-thread pool and a bounded ring buffer.
//
// This is the framework's native runtime component for host-side IO (the
// upstream reference is pure Python end-to-end; its config schema still
// describes a multi-process loader: file_reader_procs / batch_creat_procs /
// batch_cache_config, reference config_utils.py:400-404).  Python threads
// serialize on the GIL for the parse+convert inner loop; this library does
// decode and segment assembly in C++ and hands NumPy a ready float32 block.
//
// C API (ctypes-friendly, no pybind11 dependency):
//   void* sl_create(const char** paths, int n_paths, int segment_len,
//                   int sample_rate, int n_workers, int queue_depth,
//                   unsigned seed);
//   int   sl_next_batch(void* h, float* out, int batch);   // -> 0 ok
//   long  sl_total_samples(void* h);
//   int   sl_n_files(void* h);
//   void  sl_destroy(void* h);
//
// WAV support: PCM16 / PCM24 / PCM32 / IEEE float32, mono or multichannel
// (downmixed), native sample rate must equal `sample_rate` (the Python side
// resamples offline otherwise).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct WavView {
  const uint8_t* data = nullptr;  // mmap base
  size_t size = 0;                // mapped bytes
  const uint8_t* samples = nullptr;
  size_t n_frames = 0;  // per-channel sample count
  int channels = 1;
  int bits = 16;
  bool is_float = false;
  int sample_rate = 0;
};

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

// Minimal RIFF/WAVE parser: walks chunks, fills a WavView. Returns false on
// malformed or unsupported input.
static bool parse_wav(WavView& w) {
  if (w.size < 44 || std::memcmp(w.data, "RIFF", 4) || std::memcmp(w.data + 8, "WAVE", 4))
    return false;
  size_t off = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data_ptr = nullptr;
  size_t data_len = 0;
  while (off + 8 <= w.size) {
    const uint8_t* hdr = w.data + off;
    uint32_t len = rd_u32(hdr + 4);
    if (!std::memcmp(hdr, "fmt ", 4) && len >= 16) {
      fmt = rd_u16(hdr + 8);
      channels = rd_u16(hdr + 10);
      rate = rd_u32(hdr + 12);
      bits = rd_u16(hdr + 22);
    } else if (!std::memcmp(hdr, "data", 4)) {
      data_ptr = hdr + 8;
      data_len = len;
      if (data_ptr + data_len > w.data + w.size) data_len = w.data + w.size - data_ptr;
    }
    off += 8 + len + (len & 1);  // chunks are word-aligned
  }
  if (!data_ptr || !channels || !bits) return false;
  if (fmt == 3) {
    if (bits != 32) return false;
    w.is_float = true;
  } else if (fmt == 1) {
    if (bits != 16 && bits != 24 && bits != 32) return false;
  } else {
    return false;
  }
  w.samples = data_ptr;
  w.channels = channels;
  w.bits = bits;
  w.sample_rate = (int)rate;
  w.n_frames = data_len / (channels * (bits / 8));
  return w.n_frames > 0;
}

// decode frames [start, start+len) downmixed to mono float32
static void decode(const WavView& w, size_t start, size_t len, float* out) {
  const int ch = w.channels;
  const size_t stride = (size_t)ch * (w.bits / 8);
  const uint8_t* base = w.samples + start * stride;
  if (w.is_float) {
    for (size_t i = 0; i < len; ++i) {
      const uint8_t* f = base + i * stride;
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) {
        float v;
        std::memcpy(&v, f + c * 4, 4);
        acc += v;
      }
      out[i] = acc / ch;
    }
  } else if (w.bits == 16) {
    for (size_t i = 0; i < len; ++i) {
      const uint8_t* f = base + i * stride;
      int32_t acc = 0;
      for (int c = 0; c < ch; ++c) acc += (int16_t)rd_u16(f + c * 2);
      out[i] = (float)acc / ch / 32768.0f;
    }
  } else if (w.bits == 24) {
    for (size_t i = 0; i < len; ++i) {
      const uint8_t* f = base + i * stride;
      int64_t acc = 0;
      for (int c = 0; c < ch; ++c) {
        const uint8_t* p = f + c * 3;
        int32_t v = ((int32_t)p[0] << 8) | ((int32_t)p[1] << 16) | ((int32_t)p[2] << 24);
        acc += v >> 8;
      }
      out[i] = (float)acc / ch / 8388608.0f;
    }
  } else {  // PCM32
    for (size_t i = 0; i < len; ++i) {
      const uint8_t* f = base + i * stride;
      int64_t acc = 0;
      for (int c = 0; c < ch; ++c) acc += (int32_t)rd_u32(f + c * 4);
      out[i] = (float)((double)acc / ch / 2147483648.0);
    }
  }
}

struct Loader {
  std::vector<WavView> files;
  std::vector<void*> maps;
  std::vector<size_t> map_sizes;
  int segment_len;
  int queue_depth;
  std::deque<std::vector<float>> queue;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mt19937 base_rng;

  void worker(unsigned seed) {
    std::mt19937 rng(seed);
    std::uniform_int_distribution<size_t> file_pick(0, files.size() - 1);
    while (!stop.load()) {
      const WavView& w = files[file_pick(rng)];
      std::vector<float> seg((size_t)segment_len);
      if ((size_t)segment_len >= w.n_frames) {
        decode(w, 0, w.n_frames, seg.data());
        std::fill(seg.begin() + w.n_frames, seg.end(), 0.f);
      } else {
        std::uniform_int_distribution<size_t> pos(0, w.n_frames - segment_len);
        decode(w, pos(rng), (size_t)segment_len, seg.data());
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] { return stop.load() || (int)queue.size() < queue_depth; });
      if (stop.load()) return;
      queue.push_back(std::move(seg));
      cv_get.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* sl_create(const char** paths, int n_paths, int segment_len, int sample_rate,
                int n_workers, int queue_depth, unsigned seed) {
  auto* L = new Loader();
  L->segment_len = segment_len;
  L->queue_depth = queue_depth > 0 ? queue_depth : 64;
  L->base_rng.seed(seed);
  for (int i = 0; i < n_paths; ++i) {
    int fd = ::open(paths[i], O_RDONLY);
    if (fd < 0) continue;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 44) {
      ::close(fd);
      continue;
    }
    void* m = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (m == MAP_FAILED) continue;
    WavView w;
    w.data = (const uint8_t*)m;
    w.size = (size_t)st.st_size;
    if (parse_wav(w) && w.sample_rate == sample_rate) {
      L->files.push_back(w);
      L->maps.push_back(m);
      L->map_sizes.push_back((size_t)st.st_size);
    } else {
      munmap(m, (size_t)st.st_size);
    }
  }
  if (L->files.empty()) {
    delete L;
    return nullptr;
  }
  int nw = n_workers > 0 ? n_workers : 2;
  for (int i = 0; i < nw; ++i) L->workers.emplace_back(&Loader::worker, L, seed + 1 + i);
  return L;
}

int sl_next_batch(void* h, float* out, int batch) {
  auto* L = (Loader*)h;
  for (int b = 0; b < batch; ++b) {
    std::vector<float> seg;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_get.wait(lk, [&] { return L->stop.load() || !L->queue.empty(); });
      if (L->stop.load()) return -1;
      seg = std::move(L->queue.front());
      L->queue.pop_front();
      L->cv_put.notify_one();
    }
    std::memcpy(out + (size_t)b * L->segment_len, seg.data(), sizeof(float) * L->segment_len);
  }
  return 0;
}

long sl_total_samples(void* h) {
  auto* L = (Loader*)h;
  long total = 0;
  for (auto& w : L->files) total += (long)w.n_frames;
  return total;
}

int sl_n_files(void* h) { return (int)((Loader*)h)->files.size(); }

void sl_destroy(void* h) {
  auto* L = (Loader*)h;
  L->stop.store(true);
  L->cv_put.notify_all();
  L->cv_get.notify_all();
  for (auto& t : L->workers) t.join();
  for (size_t i = 0; i < L->maps.size(); ++i) munmap(L->maps[i], L->map_sizes[i]);
  delete L;
}

}  // extern "C"
