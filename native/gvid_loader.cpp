// gvid_loader: native host-side video batch loader + prefetcher.
//
// TPU-native replacement for the reference's OpenCV-decode-in-DataLoader-
// workers pipeline (/root/reference/genie/module/data.py:171-233). Video
// clips are stored in a packed binary ".gvid" container (uint8 RGB frames,
// fixed geometry) so the hot path is a straight mmap read + uint8->float32
// conversion -- no codec in the loop. A thread pool prefetches upcoming
// batches into a bounded ring of pinned host buffers while the TPU consumes
// the current one.
//
// File layout (little endian):
//   magic   u32  'GVID' (0x44495647)
//   version u32  (1)
//   num_videos u32
//   frames  u32   frames per video
//   height  u32
//   width   u32
//   channels u32
//   reserved u32
//   payload: num_videos * frames * height * width * channels bytes (uint8)
//
// C ABI (consumed by ctypes in open_genie_tpu/data/native.py):
//   gvid_open / gvid_info / gvid_close
//   gvid_load_batch      -- synchronous gather of clip slices
//   gvid_prefetch_start / gvid_prefetch_submit / gvid_prefetch_get /
//   gvid_prefetch_stop   -- async pipelined loading

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct GvidHeader {
  uint32_t magic;
  uint32_t version;
  uint32_t num_videos;
  uint32_t frames;
  uint32_t height;
  uint32_t width;
  uint32_t channels;
  uint32_t reserved;
};

constexpr uint32_t kMagic = 0x44495647;  // 'GVID'

struct Batch {
  std::vector<float> data;
  int64_t ticket = -1;
};

struct GvidFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  GvidHeader hdr{};

  // Prefetcher state.
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::deque<std::pair<int64_t, std::vector<int64_t>>> pending;  // ticket, spec
  std::deque<Batch> done;
  std::atomic<bool> stop{false};
  int batch_clips = 0;
  int clip_frames = 0;

  size_t video_bytes() const {
    return size_t(hdr.frames) * hdr.height * hdr.width * hdr.channels;
  }
  size_t frame_bytes() const {
    return size_t(hdr.height) * hdr.width * hdr.channels;
  }
};

void load_one(const GvidFile* f, int64_t video_idx, int64_t start_frame,
              int clip_frames, float* out) {
  const uint8_t* base = f->map + sizeof(GvidHeader) +
                        size_t(video_idx) * f->video_bytes() +
                        size_t(start_frame) * f->frame_bytes();
  const size_t n = size_t(clip_frames) * f->frame_bytes();
  constexpr float kInv = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) out[i] = base[i] * kInv;
}

void worker_loop(GvidFile* f) {
  for (;;) {
    std::pair<int64_t, std::vector<int64_t>> job;
    {
      std::unique_lock<std::mutex> lk(f->mu);
      f->cv_work.wait(lk, [f] { return f->stop.load() || !f->pending.empty(); });
      if (f->stop.load()) return;
      job = std::move(f->pending.front());
      f->pending.pop_front();
    }
    const auto& spec = job.second;  // [v0, s0, v1, s1, ...]
    const int n = f->batch_clips;
    Batch b;
    b.ticket = job.first;
    b.data.resize(size_t(n) * f->clip_frames * f->frame_bytes());
    const size_t clip_floats = size_t(f->clip_frames) * f->frame_bytes();
    for (int i = 0; i < n; ++i) {
      load_one(f, spec[2 * i], spec[2 * i + 1], f->clip_frames,
               b.data.data() + i * clip_floats);
    }
    {
      std::lock_guard<std::mutex> lk(f->mu);
      f->done.push_back(std::move(b));
    }
    f->cv_done.notify_all();
  }
}

}  // namespace

extern "C" {

void* gvid_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { ::close(fd); return nullptr; }
  madvise(map, st.st_size, MADV_WILLNEED);

  auto* f = new GvidFile();
  f->fd = fd;
  f->map = static_cast<const uint8_t*>(map);
  f->map_size = st.st_size;
  std::memcpy(&f->hdr, map, sizeof(GvidHeader));
  if (f->hdr.magic != kMagic || f->hdr.version != 1) {
    munmap(map, st.st_size);
    ::close(fd);
    delete f;
    return nullptr;
  }
  return f;
}

void gvid_info(void* handle, uint32_t* out5) {
  auto* f = static_cast<GvidFile*>(handle);
  out5[0] = f->hdr.num_videos;
  out5[1] = f->hdr.frames;
  out5[2] = f->hdr.height;
  out5[3] = f->hdr.width;
  out5[4] = f->hdr.channels;
}

// Synchronous: gather `n` clips of `clip_frames` frames. spec is
// [video_idx, start_frame] * n. out is (n, clip_frames, H, W, C) float32.
int gvid_load_batch(void* handle, const int64_t* spec, int n,
                    int clip_frames, float* out) {
  auto* f = static_cast<GvidFile*>(handle);
  const size_t clip_floats = size_t(clip_frames) * f->frame_bytes();
  for (int i = 0; i < n; ++i) {
    int64_t v = spec[2 * i], s = spec[2 * i + 1];
    if (v < 0 || v >= f->hdr.num_videos) return -1;
    if (s < 0 || s + clip_frames > f->hdr.frames) return -2;
    load_one(f, v, s, clip_frames, out + size_t(i) * clip_floats);
  }
  return 0;
}

int gvid_prefetch_start(void* handle, int batch_clips, int clip_frames,
                        int num_threads) {
  auto* f = static_cast<GvidFile*>(handle);
  f->batch_clips = batch_clips;
  f->clip_frames = clip_frames;
  f->stop.store(false);
  for (int i = 0; i < num_threads; ++i)
    f->workers.emplace_back(worker_loop, f);
  return 0;
}

int gvid_prefetch_submit(void* handle, int64_t ticket, const int64_t* spec) {
  auto* f = static_cast<GvidFile*>(handle);
  std::vector<int64_t> s(spec, spec + 2 * f->batch_clips);
  {
    std::lock_guard<std::mutex> lk(f->mu);
    f->pending.emplace_back(ticket, std::move(s));
  }
  f->cv_work.notify_one();
  return 0;
}

// Blocks until the batch with `ticket` is ready, copies it to `out`.
int gvid_prefetch_get(void* handle, int64_t ticket, float* out) {
  auto* f = static_cast<GvidFile*>(handle);
  std::unique_lock<std::mutex> lk(f->mu);
  for (;;) {
    for (auto it = f->done.begin(); it != f->done.end(); ++it) {
      if (it->ticket == ticket) {
        std::memcpy(out, it->data.data(), it->data.size() * sizeof(float));
        f->done.erase(it);
        return 0;
      }
    }
    f->cv_done.wait(lk);
  }
}

void gvid_prefetch_stop(void* handle) {
  auto* f = static_cast<GvidFile*>(handle);
  f->stop.store(true);
  f->cv_work.notify_all();
  for (auto& t : f->workers) t.join();
  f->workers.clear();
  f->pending.clear();
  f->done.clear();
}

void gvid_close(void* handle) {
  auto* f = static_cast<GvidFile*>(handle);
  if (!f) return;
  if (!f->workers.empty()) gvid_prefetch_stop(f);
  munmap(const_cast<uint8_t*>(f->map), f->map_size);
  ::close(f->fd);
  delete f;
}

// Writer (used by the dataset-conversion tool).
int gvid_write(const char* path, const uint8_t* data, uint32_t num_videos,
               uint32_t frames, uint32_t height, uint32_t width,
               uint32_t channels) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  GvidHeader hdr{kMagic, 1, num_videos, frames, height, width, channels, 0};
  fwrite(&hdr, sizeof(hdr), 1, fp);
  size_t n = size_t(num_videos) * frames * height * width * channels;
  size_t written = fwrite(data, 1, n, fp);
  fclose(fp);
  return written == n ? 0 : -2;
}

}  // extern "C"
