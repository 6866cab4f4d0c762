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
#include <cmath>
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
  // sorted-scan preparation outputs (prep mode only): map-frame SoA
  // coordinates, labels and the applied permutation, all cell-sorted
  std::vector<float> sx, sy, sz;
  std::vector<int32_t> slabels;
  std::vector<int32_t> order;
  // wire preparation outputs (wire mode): s16 centimetre offsets + s16
  // labels, cell-sorted by the DEQUANTIZED coordinates
  std::vector<int16_t> qx, qy, qz, qlabels;
};

// Sorted-scan preparation parameters (gg_loader_create_sorted): the per-scan
// poses and pre-tracked grid centers for the whole sequence, plus the grid
// geometry. The cell prediction must be bit-exact with the device binning
// (core/rasterize.py bin_points): f32 center+half add, f32 multiply by the
// f32 reciprocal of the resolution (TPU f32 division is not IEEE-exact, so
// the device multiplies too), floorf. Compile with -ffp-contract=off so the
// compiler cannot fuse these into FMAs the device won't perform.
struct Prep {
  bool enabled = false;
  bool wire = false;           // s16 wire prep instead of f32 sorted prep
  std::vector<double> poses;   // n_scans * 16, row-major map<-velo
  std::vector<float> centers;  // n_scans * 2
  float inv_res = 0.0f;
  float half = 0.0f;
  int32_t n = 0;
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
  Prep prep;
};

// Map-frame transform + cell-sorted reorder (pipeline.prepare_scan in C++).
// Stable counting sort by flat cell id reproduces numpy's stable argsort
// bit-for-bit, so the emitted scan is byte-identical to the Python prep.
void prep_scan(const Loader& L, int64_t idx, Slot& s) {
  const double* T = L.prep.poses.data() + (size_t)idx * 16;
  const float c0h = L.prep.centers[2 * idx] + L.prep.half;
  const float c1h = L.prep.centers[2 * idx + 1] + L.prep.half;
  const float inv_res = L.prep.inv_res;
  const int32_t n = L.prep.n;
  const int64_t n2 = (int64_t)n * n;
  const int32_t cap = L.cap;
  const int32_t count = s.count;

  std::vector<float> mx(cap, 0.0f), my(cap, 0.0f), mz(cap, 0.0f);
  std::vector<int32_t> cells(cap, (int32_t)n2);
  for (int32_t i = 0; i < count; ++i) {
    const double x = s.points[(size_t)i * 4 + 0];
    const double y = s.points[(size_t)i * 4 + 1];
    const double z = s.points[(size_t)i * 4 + 2];
    const float xf = (float)(T[0] * x + T[1] * y + T[2] * z + T[3]);
    const float yf = (float)(T[4] * x + T[5] * y + T[6] * z + T[7]);
    const float zf = (float)(T[8] * x + T[9] * y + T[10] * z + T[11]);
    mx[i] = xf;
    my[i] = yf;
    mz[i] = zf;
    const float g0 = std::floor((c0h - xf) * inv_res);
    const float g1 = std::floor((c1h - yf) * inv_res);
    if (g0 >= 0.0f && g0 < (float)n && g1 >= 0.0f && g1 < (float)n)
      cells[i] = (int32_t)g0 * n + (int32_t)g1;
  }

  // stable counting sort: cnt[c+1] = #points with cell < c+1 after scan
  std::vector<int32_t> cnt((size_t)n2 + 2, 0);
  for (int32_t i = 0; i < cap; ++i) cnt[(size_t)cells[i] + 1]++;
  for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];

  s.sx.assign(cap, 0.0f);
  s.sy.assign(cap, 0.0f);
  s.sz.assign(cap, 0.0f);
  s.slabels.assign(cap, 0);
  s.order.assign(cap, 0);
  for (int32_t i = 0; i < cap; ++i) {
    const int32_t pos = cnt[cells[i]]++;
    s.sx[pos] = mx[i];
    s.sy[pos] = my[i];
    s.sz[pos] = mz[i];
    s.slabels[pos] = s.labels[i];
    s.order[pos] = i;
  }
}

// s16 wire preparation (pipeline.prepare_scan_wire in C++): quantize to
// int16 centimetres relative to (center_x, center_y, origin_z), then bin and
// stable-sort by the cell ids of the *dequantized* f32 coordinates (exactly
// what the device will reconstruct), so the device-side sortedness check
// passes. Bit-exact with the numpy prep: double transform -> float cast,
// (v - ref) * 100.0f under FE_TONEAREST nearbyintf (numpy np.rint is also
// round-half-even), dequant as q * 0.01f + ref with -ffp-contract=off.
void prep_scan_wire(const Loader& L, int64_t idx, Slot& s) {
  const double* T = L.prep.poses.data() + (size_t)idx * 16;
  const float ref0 = L.prep.centers[2 * idx];
  const float ref1 = L.prep.centers[2 * idx + 1];
  const float ref2 = (float)T[11];  // origin z (t_map_velo[2,3]) as f32
  const float c0h = ref0 + L.prep.half;
  const float c1h = ref1 + L.prep.half;
  const float inv_res = L.prep.inv_res;
  const int32_t n = L.prep.n;
  const int64_t n2 = (int64_t)n * n;
  const int32_t cap = L.cap;
  const int32_t count = s.count;

  std::vector<int16_t> wx(cap, 0), wy(cap, 0), wz(cap, 0);
  std::vector<int32_t> cells(cap, (int32_t)n2);
  for (int32_t i = 0; i < count; ++i) {
    const double x = s.points[(size_t)i * 4 + 0];
    const double y = s.points[(size_t)i * 4 + 1];
    const double z = s.points[(size_t)i * 4 + 2];
    const float xf = (float)(T[0] * x + T[1] * y + T[2] * z + T[3]);
    const float yf = (float)(T[4] * x + T[5] * y + T[6] * z + T[7]);
    const float zf = (float)(T[8] * x + T[9] * y + T[10] * z + T[11]);
    float q0 = std::nearbyintf((xf - ref0) * 100.0f);
    float q1 = std::nearbyintf((yf - ref1) * 100.0f);
    float q2 = std::nearbyintf((zf - ref2) * 100.0f);
    q0 = q0 < -32768.0f ? -32768.0f : (q0 > 32767.0f ? 32767.0f : q0);
    q1 = q1 < -32768.0f ? -32768.0f : (q1 > 32767.0f ? 32767.0f : q1);
    q2 = q2 < -32768.0f ? -32768.0f : (q2 > 32767.0f ? 32767.0f : q2);
    wx[i] = (int16_t)q0;
    wy[i] = (int16_t)q1;
    wz[i] = (int16_t)q2;
    // bin the dequantized coordinates -- what the device reconstructs
    const float dqx = (float)wx[i] * 0.01f + ref0;
    const float dqy = (float)wy[i] * 0.01f + ref1;
    const float g0 = std::floor((c0h - dqx) * inv_res);
    const float g1 = std::floor((c1h - dqy) * inv_res);
    if (g0 >= 0.0f && g0 < (float)n && g1 >= 0.0f && g1 < (float)n)
      cells[i] = (int32_t)g0 * n + (int32_t)g1;
  }

  std::vector<int32_t> cnt((size_t)n2 + 2, 0);
  for (int32_t i = 0; i < cap; ++i) cnt[(size_t)cells[i] + 1]++;
  for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];

  s.qx.assign(cap, 0);
  s.qy.assign(cap, 0);
  s.qz.assign(cap, 0);
  s.qlabels.assign(cap, 0);
  s.order.assign(cap, 0);
  for (int32_t i = 0; i < cap; ++i) {
    const int32_t pos = cnt[cells[i]]++;
    s.qx[pos] = wx[i];
    s.qy[pos] = wy[i];
    s.qz[pos] = wz[i];
    s.qlabels[pos] = (int16_t)s.labels[i];
    s.order[pos] = i;
  }
}

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
    int64_t gen;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_space.wait(lock, [&] {
        return L->stop.load() ||
               (L->next_to_schedule < L->n_scans &&
                L->done.size() < L->max_queue);
      });
      if (L->stop.load()) return;
      if (L->next_to_schedule >= L->n_scans) return;
      // generation is captured under the SAME lock that assigns the index:
      // a seek() racing between two separate critical sections could tag a
      // stale-index slot with the fresh generation, letting it survive the
      // stale-drop below and permanently occupy a queue slot.
      idx = L->next_to_schedule++;
      gen = L->generation;
    }
    Slot slot;
    slot.index = idx;
    slot.generation = gen;
    read_scan_files(*L, idx, slot);
    if (slot.status == 0 && L->prep.enabled) {
      if (L->prep.wire)
        prep_scan_wire(*L, idx, slot);
      else
        prep_scan(*L, idx, slot);
    }
    {
      std::unique_lock<std::mutex> lock(L->mu);
      // a seek() may have repositioned the stream while this read was in
      // flight; stale-generation slots would pin queue space forever. Also
      // drop duplicates defensively (same index already queued).
      bool dup = false;
      for (const auto& d : L->done)
        if (d.index == slot.index) { dup = true; break; }
      if (slot.generation == L->generation && !dup)
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

// Sorted-prep variant of gg_loader_create: workers additionally transform
// each scan to the map frame, bin against the pre-tracked grid center and
// stable-sort by flat cell id (config.sorted_scans host preparation).
// poses: n_scans x 16 doubles (row-major map<-velo); centers: n_scans x 2
// f32 (pipeline.CenterTracker outputs).
static void* create_prep_loader(const char* sequence_root, int64_t n_scans,
                                int32_t cap, int32_t n_threads,
                                int32_t queue_depth, const double* poses,
                                const float* centers, float resolution,
                                float half_length, int32_t n_cells,
                                bool wire) {
  auto* L = new Loader();
  L->velodyne_dir = std::string(sequence_root) + "/velodyne";
  L->labels_dir = std::string(sequence_root) + "/labels";
  L->cap = cap;
  L->n_scans = n_scans;
  L->max_queue = queue_depth > 0 ? (size_t)queue_depth : 8;
  L->prep.enabled = true;
  L->prep.wire = wire;  // set BEFORE workers start (they prefetch eagerly)
  L->prep.poses.assign(poses, poses + (size_t)n_scans * 16);
  L->prep.centers.assign(centers, centers + (size_t)n_scans * 2);
  L->prep.inv_res = 1.0f / resolution;
  L->prep.half = half_length;
  L->prep.n = n_cells;
  int32_t nt = n_threads > 0 ? n_threads : 2;
  for (int32_t i = 0; i < nt; ++i) L->workers.emplace_back(worker_main, L);
  return L;
}

void* gg_loader_create_sorted(const char* sequence_root, int64_t n_scans,
                              int32_t cap, int32_t n_threads,
                              int32_t queue_depth, const double* poses,
                              const float* centers, float resolution,
                              float half_length, int32_t n_cells) {
  return create_prep_loader(sequence_root, n_scans, cap, n_threads,
                            queue_depth, poses, centers, resolution,
                            half_length, n_cells, /*wire=*/false);
}

// Wire-prep variant of gg_loader_create_sorted: workers quantize each scan
// to the s16 wire format (pipeline.prepare_scan_wire semantics) and
// stable-sort by the dequantized coordinates' cell ids.
void* gg_loader_create_wire(const char* sequence_root, int64_t n_scans,
                            int32_t cap, int32_t n_threads,
                            int32_t queue_depth, const double* poses,
                            const float* centers, float resolution,
                            float half_length, int32_t n_cells) {
  return create_prep_loader(sequence_root, n_scans, cap, n_threads,
                            queue_depth, poses, centers, resolution,
                            half_length, n_cells, /*wire=*/true);
}

// Blocking: fetch the next *wire-prepared* scan (s16 quantized SoA + the
// applied permutation). Same return convention as gg_loader_next.
int64_t gg_loader_next_wire(void* handle, int16_t* out_qx, int16_t* out_qy,
                            int16_t* out_qz, int16_t* out_labels,
                            int32_t* out_order, int32_t* out_count) {
  auto* L = static_cast<Loader*>(handle);
  if (!L->prep.enabled || !L->prep.wire) return -3;
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
        if (slot.status != 0) return -2;
        const size_t cap = (size_t)L->cap;
        std::memcpy(out_qx, slot.qx.data(), cap * sizeof(int16_t));
        std::memcpy(out_qy, slot.qy.data(), cap * sizeof(int16_t));
        std::memcpy(out_qz, slot.qz.data(), cap * sizeof(int16_t));
        std::memcpy(out_labels, slot.qlabels.data(), cap * sizeof(int16_t));
        std::memcpy(out_order, slot.order.data(), cap * sizeof(int32_t));
        *out_count = slot.count;
        return slot.index;
      }
    }
    L->cv_ready.wait(lock);
  }
}

// Blocking: fetch the next *prepared* scan (sorted SoA map-frame arrays +
// the applied permutation). Same return convention as gg_loader_next.
int64_t gg_loader_next_sorted(void* handle, float* out_px, float* out_py,
                              float* out_pz, int32_t* out_labels,
                              int32_t* out_order, int32_t* out_count) {
  auto* L = static_cast<Loader*>(handle);
  // loaders created without sorted prep have empty sx/sy/sz/order buffers;
  // reject instead of memcpy-ing from them (UB through the C ABI).
  if (!L->prep.enabled) return -3;
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
        if (slot.status != 0) return -2;
        const size_t cap = (size_t)L->cap;
        std::memcpy(out_px, slot.sx.data(), cap * sizeof(float));
        std::memcpy(out_py, slot.sy.data(), cap * sizeof(float));
        std::memcpy(out_pz, slot.sz.data(), cap * sizeof(float));
        std::memcpy(out_labels, slot.slabels.data(), cap * sizeof(int32_t));
        std::memcpy(out_order, slot.order.data(), cap * sizeof(int32_t));
        *out_count = slot.count;
        return slot.index;
      }
    }
    L->cv_ready.wait(lock);
  }
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
