// Native SemanticKITTI scan loader with threaded read-ahead.
//
// TPU-native counterpart of the reference's Python data feeder
// (scripts/kitti_data_publisher.py): the per-scan work there -- reading
// velodyne/NNNNNN.bin (float32 x,y,z,remission) and labels/NNNNNN.label
// (uint32, semantic id in the low 16 bits, kitti_data_publisher.py:156-161),
// then packing the label into the point record -- happens here in C++ worker
// threads that prefetch ahead of the consumer, so a >1000 scans/sec TPU
// pipeline is never starved by file I/O or Python object churn.
//
// The output is already padded/masked to the pipeline's static point
// capacity: points (cap x 4 f32, zero-padded), labels (cap i32), count.
//
// C ABI only (consumed via ctypes from groundgrid_tpu/data/native_loader.py).

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

struct Slot {
  int64_t index = -1;          // scan index, -1 = empty
  int64_t generation = 0;      // loader generation at schedule time
  int32_t count = 0;           // valid points
  int32_t status = 0;          // 0 ok, <0 errno-style failure
  std::vector<float> points;   // cap * 4
  std::vector<int32_t> labels; // cap
};

struct Loader {
  std::string velodyne_dir;
  std::string labels_dir;
  int32_t cap = 0;
  int64_t n_scans = 0;
  int64_t next_to_schedule = 0; // next scan index handed to a worker
  int64_t next_to_emit = 0;     // next scan index the consumer expects
  int64_t generation = 0;       // bumped by seek(); stale reads are dropped

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  // completed slots keyed by arrival; emitted strictly in index order
  std::vector<Slot> done;
  size_t max_queue = 8;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
};

bool read_scan_files(const Loader& L, int64_t idx, Slot& slot) {
  char name[64];
  std::snprintf(name, sizeof(name), "%06lld.bin", (long long)idx);
  std::string bin = L.velodyne_dir + "/" + name;
  std::snprintf(name, sizeof(name), "%06lld.label", (long long)idx);
  std::string lab = L.labels_dir + "/" + name;

  slot.points.assign((size_t)L.cap * 4, 0.0f);
  slot.labels.assign((size_t)L.cap, 0);
  slot.count = 0;
  slot.status = 0;

  FILE* f = std::fopen(bin.c_str(), "rb");
  if (!f) {
    slot.status = -1;
    return false;
  }
  size_t nread = std::fread(slot.points.data(), sizeof(float),
                            (size_t)L.cap * 4, f);
  // detect truncation vs oversize: if the file has more, drain & drop
  int32_t count = (int32_t)(nread / 4);
  std::fclose(f);
  slot.count = count;

  FILE* g = std::fopen(lab.c_str(), "rb");
  if (g) {
    std::vector<uint32_t> raw((size_t)count);
    size_t lread = std::fread(raw.data(), sizeof(uint32_t), (size_t)count, g);
    std::fclose(g);
    for (size_t i = 0; i < lread; ++i)
      slot.labels[i] = (int32_t)(raw[i] & 0xFFFFu); // semantic id, low half
  }
  return true;
}

void worker_main(Loader* L) {
  for (;;) {
    int64_t idx;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_space.wait(lock, [&] {
        return L->stop.load() ||
               (L->next_to_schedule < L->n_scans &&
                L->done.size() < L->max_queue);
      });
      if (L->stop.load()) return;
      if (L->next_to_schedule >= L->n_scans) return;
      idx = L->next_to_schedule++;
    }
    Slot slot;
    slot.index = idx;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      slot.generation = L->generation;
    }
    read_scan_files(*L, idx, slot);
    {
      std::unique_lock<std::mutex> lock(L->mu);
      // a seek() may have repositioned the stream while this read was in
      // flight; stale-generation slots would pin queue space forever.
      if (slot.generation == L->generation)
        L->done.push_back(std::move(slot));
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

// Create a loader over <root>/velodyne + <root>/labels for scans
// [0, n_scans). cap = point capacity (pipeline max_points).
void* gg_loader_create(const char* sequence_root, int64_t n_scans,
                       int32_t cap, int32_t n_threads, int32_t queue_depth) {
  auto* L = new Loader();
  L->velodyne_dir = std::string(sequence_root) + "/velodyne";
  L->labels_dir = std::string(sequence_root) + "/labels";
  L->cap = cap;
  L->n_scans = n_scans;
  L->max_queue = queue_depth > 0 ? (size_t)queue_depth : 8;
  int32_t nt = n_threads > 0 ? n_threads : 2;
  for (int32_t i = 0; i < nt; ++i)
    L->workers.emplace_back(worker_main, L);
  return L;
}

// Blocking: fetch the next scan in index order. Returns the scan index, or
// -1 at end of sequence, -2 on read failure.
int64_t gg_loader_next(void* handle, float* out_points, int32_t* out_labels,
                       int32_t* out_count) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  int64_t want = L->next_to_emit;
  if (want >= L->n_scans) return -1;
  for (;;) {
    for (size_t i = 0; i < L->done.size(); ++i) {
      if (L->done[i].index == want) {
        Slot slot = std::move(L->done[i]);
        L->done.erase(L->done.begin() + i);
        L->next_to_emit++;
        lock.unlock();
        L->cv_space.notify_all();
        std::memcpy(out_points, slot.points.data(),
                    (size_t)L->cap * 4 * sizeof(float));
        std::memcpy(out_labels, slot.labels.data(),
                    (size_t)L->cap * sizeof(int32_t));
        *out_count = slot.count;
        return slot.status == 0 ? slot.index : -2;
      }
    }
    L->cv_ready.wait(lock);
  }
}

// Reposition the stream (player "seek", kitti_data_publisher.py:255-261).
// Drops in-flight prefetches; the next gg_loader_next returns `index`.
void gg_loader_seek(void* handle, int64_t index) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->done.clear();
    L->generation++;
    L->next_to_emit = index;
    L->next_to_schedule = index;
  }
  L->cv_space.notify_all();
}

void gg_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

// One-shot synchronous read (no threading) for simple callers.
int64_t gg_read_scan(const char* sequence_root, int64_t index, int32_t cap,
                     float* out_points, int32_t* out_labels,
                     int32_t* out_count) {
  Loader L;
  L.velodyne_dir = std::string(sequence_root) + "/velodyne";
  L.labels_dir = std::string(sequence_root) + "/labels";
  L.cap = cap;
  Slot slot;
  slot.index = index;
  if (!read_scan_files(L, index, slot)) return -2;
  std::memcpy(out_points, slot.points.data(), (size_t)cap * 4 * sizeof(float));
  std::memcpy(out_labels, slot.labels.data(), (size_t)cap * sizeof(int32_t));
  *out_count = slot.count;
  return index;
}

}  // extern "C"
