// traj_store: compact binary trajectory store with a background writer pool.
//
// Native runtime component for furniture_tpu's demonstration pipeline. The
// reference serializes each demo episode as an individual Python pickle
// (furniture/util/demo_recorder.py:58-87), which at the scale of our batched
// generator (thousands of vmapped scripted episodes per rollout) becomes a
// host-side bottleneck. This store writes fixed-layout float32 trajectory
// records into a single append-only file from a pool of worker threads, with
// an in-file index for O(1) random access on read.
//
// File layout (little-endian):
//   [8]  magic "FTPUTRJ1"
//   [8]  u64 index_offset (patched on close; 0 while writing)
//   records: each
//     [4] u32 traj_len T     [4] u32 action_dim A
//     [4] u32 extra_dim E    [4] u32 reserved
//     [T*A*4] f32 actions    [T*4] f32 rewards    [T*E*4] f32 extras
//   index (at index_offset):
//     [4] u32 count, then count * ([8] u64 offset)
//
// C API (ctypes-friendly): see extern "C" block at the bottom.

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

namespace {

constexpr char kMagic[8] = {'F', 'T', 'P', 'U', 'T', 'R', 'J', '1'};

struct Record {
  uint32_t len = 0, adim = 0, edim = 0;
  std::vector<float> actions, rewards, extras;
};

struct Store {
  FILE* f = nullptr;
  bool writable = false;
  std::vector<uint64_t> index;

  // background writer state
  std::queue<Record> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_drain;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<int> pending{0};

  void writer_loop() {
    for (;;) {
      Record rec;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) return;
          continue;
        }
        rec = std::move(queue.front());
        queue.pop();
      }
      write_record(rec);
      if (--pending == 0) cv_drain.notify_all();
    }
  }

  void write_record(const Record& r) {
    long off = ftell(f);
    index.push_back(static_cast<uint64_t>(off));
    uint32_t hdr[4] = {r.len, r.adim, r.edim, 0};
    fwrite(hdr, sizeof(uint32_t), 4, f);
    fwrite(r.actions.data(), sizeof(float), r.actions.size(), f);
    fwrite(r.rewards.data(), sizeof(float), r.rewards.size(), f);
    if (!r.extras.empty())
      fwrite(r.extras.data(), sizeof(float), r.extras.size(), f);
  }
};

}  // namespace

extern "C" {

// mode: "w" create for writing (spawns the writer thread), "r" read.
void* ts_open(const char* path, const char* mode) {
  auto* s = new Store();
  if (mode[0] == 'w') {
    s->f = fopen(path, "wb");
    if (!s->f) {
      delete s;
      return nullptr;
    }
    s->writable = true;
    uint64_t zero = 0;
    fwrite(kMagic, 1, 8, s->f);
    fwrite(&zero, sizeof(uint64_t), 1, s->f);
    s->worker = std::thread([s] { s->writer_loop(); });
  } else {
    s->f = fopen(path, "rb");
    if (!s->f) {
      delete s;
      return nullptr;
    }
    char magic[8];
    uint64_t index_off = 0;
    if (fread(magic, 1, 8, s->f) != 8 ||
        memcmp(magic, kMagic, 8) != 0 ||
        fread(&index_off, sizeof(uint64_t), 1, s->f) != 1 || index_off == 0) {
      fclose(s->f);
      delete s;
      return nullptr;
    }
    fseek(s->f, static_cast<long>(index_off), SEEK_SET);
    uint32_t count = 0;
    if (fread(&count, sizeof(uint32_t), 1, s->f) != 1) count = 0;
    s->index.resize(count);
    if (count &&
        fread(s->index.data(), sizeof(uint64_t), count, s->f) != count) {
      s->index.clear();
    }
  }
  return s;
}

// enqueue one trajectory for the background writer (thread-safe).
int ts_append(void* handle, const float* actions, const float* rewards,
              const float* extras, uint32_t len, uint32_t adim,
              uint32_t edim) {
  auto* s = static_cast<Store*>(handle);
  if (!s || !s->writable) return -1;
  Record r;
  r.len = len;
  r.adim = adim;
  r.edim = edim;
  r.actions.assign(actions, actions + static_cast<size_t>(len) * adim);
  r.rewards.assign(rewards, rewards + len);
  if (extras && edim)
    r.extras.assign(extras, extras + static_cast<size_t>(len) * edim);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->queue.push(std::move(r));
    ++s->pending;
  }
  s->cv_push.notify_one();
  return 0;
}

// block until every queued trajectory hit the file.
void ts_flush(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s || !s->writable) return;
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_drain.wait(lk, [&] { return s->pending.load() == 0; });
  fflush(s->f);
}

int ts_count(void* handle) {
  auto* s = static_cast<Store*>(handle);
  return s ? static_cast<int>(s->index.size()) : -1;
}

// read record header: fills [len, adim, edim]; returns 0 on success.
int ts_record_info(void* handle, uint32_t idx, uint32_t* out3) {
  auto* s = static_cast<Store*>(handle);
  if (!s || idx >= s->index.size()) return -1;
  fseek(s->f, static_cast<long>(s->index[idx]), SEEK_SET);
  uint32_t hdr[4];
  if (fread(hdr, sizeof(uint32_t), 4, s->f) != 4) return -1;
  out3[0] = hdr[0];
  out3[1] = hdr[1];
  out3[2] = hdr[2];
  return 0;
}

// read the record payload into caller buffers (sized via ts_record_info).
int ts_read(void* handle, uint32_t idx, float* actions, float* rewards,
            float* extras) {
  auto* s = static_cast<Store*>(handle);
  if (!s || idx >= s->index.size()) return -1;
  fseek(s->f, static_cast<long>(s->index[idx]), SEEK_SET);
  uint32_t hdr[4];
  if (fread(hdr, sizeof(uint32_t), 4, s->f) != 4) return -1;
  size_t na = static_cast<size_t>(hdr[0]) * hdr[1];
  size_t ne = static_cast<size_t>(hdr[0]) * hdr[2];
  if (fread(actions, sizeof(float), na, s->f) != na) return -1;
  if (fread(rewards, sizeof(float), hdr[0], s->f) != hdr[0]) return -1;
  if (ne && fread(extras, sizeof(float), ne, s->f) != ne) return -1;
  return 0;
}

// finish: drain the queue, write the index, patch the header, free.
void ts_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return;
  if (s->writable) {
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv_drain.wait(lk, [&] { return s->pending.load() == 0; });
    }
    s->stop.store(true);
    s->cv_push.notify_all();
    s->worker.join();
    long index_off = ftell(s->f);
    uint32_t count = static_cast<uint32_t>(s->index.size());
    fwrite(&count, sizeof(uint32_t), 1, s->f);
    fwrite(s->index.data(), sizeof(uint64_t), count, s->f);
    fseek(s->f, 8, SEEK_SET);
    uint64_t off64 = static_cast<uint64_t>(index_off);
    fwrite(&off64, sizeof(uint64_t), 1, s->f);
  }
  fclose(s->f);
  delete s;
}

}  // extern "C"
