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

// ---------------------------------------------------------------------------
// Error-free f32 transforms mirroring groundgrid_tpu/core/exactf32.py: the
// cell prediction must be BIT-EXACT with the device's f64-faithful ds
// binning (rasterize.faithful_cells), so the identical f32 op sequence runs
// here. Compile with -ffp-contract=off so the compiler cannot fuse any of
// these into FMAs (which would silently break the error-free property).
// ---------------------------------------------------------------------------

static inline float gg_two_sum(float a, float b, float* e) {
  const float s = a + b;
  const float bb = s - a;
  *e = (a - (s - bb)) + (b - bb);
  return s;
}

// exactf32.ds_add_f32: normalized (ah + al) + b
static inline void gg_ds_add_f32(float ah, float al, float b, float* h, float* l) {
  float se;
  const float sh = gg_two_sum(ah, b, &se);
  *h = gg_two_sum(sh, se + al, l);
}

// exactf32.ds_add: normalized (ah + al) + (bh + bl)
static inline void gg_ds_add(float ah, float al, float bh, float bl,
                             float* h, float* l) {
  float se;
  const float sh = gg_two_sum(ah, bh, &se);
  *h = gg_two_sum(sh, se + (al + bl), l);
}

// exactf32.split with xp=np (host constants only)
static inline void gg_split(float c, float* hi, float* lo) {
  const float t = c * 4097.0f;
  const float d = t - c;
  *hi = t - d;
  *lo = c - *hi;
}

// exactf32.two_prod_int_const: exact m*c for integer-valued m (|m| < 2^21)
// and a presplit constant c = ch + cl
static inline void gg_two_prod_int_const(float m, float c, float ch, float cl,
                                         float* p, float* e) {
  *p = m * c;
  const float mh = std::floor(m * (1.0f / 2048.0f) + 0.5f) * 2048.0f;
  const float ml = m - mh;
  *e = ((mh * ch - *p) + mh * cl + ml * ch) + ml * cl;
}

// Per-axis binning constants (exactf32.res_ds + the center-edge ds pair)
struct BinAxis {
  float sh, sl;  // ds image of (center + half) for this axis
};

struct BinConsts {
  float rh, rl;          // ds image of the f64 resolution
  float rhh, rhl;        // split of rh
  float rlh, rll;        // split of rl
  float inv_res;
};

// exactf32.ds_bin: floor((s - x) / res) faithful to the f64 oracle.
// Branchless (bool arithmetic, no short-circuit) so the batch loop below
// autovectorizes; identical op sequence per element in every clone.
static inline float gg_ds_bin(const BinAxis& a, const BinConsts& c, float x) {
  float relh, rell;
  gg_ds_add_f32(a.sh, a.sl, -x, &relh, &rell);
  const float m = std::floor(relh * c.inv_res);
  float p1h, p1l, p2h, p2l;
  gg_two_prod_int_const(m, c.rh, c.rhh, c.rhl, &p1h, &p1l);
  gg_two_prod_int_const(m, c.rl, c.rlh, c.rll, &p2h, &p2l);
  float dh, dl, th, tl;
  gg_ds_add(relh, rell, -p1h, -p1l, &th, &tl);
  gg_ds_add(th, tl, -p2h, -p2l, &dh, &dl);
  const bool below = (dh < 0.0f) | ((dh == 0.0f) & (dl < 0.0f));
  float eh, el;
  gg_ds_add(dh, dl, -c.rh, -c.rl, &eh, &el);
  const bool at_or_above = !((eh < 0.0f) | ((eh == 0.0f) & (el < 0.0f)));
  return m + (at_or_above ? 1.0f : 0.0f) - (below ? 1.0f : 0.0f);
}

// ---------------------------------------------------------------------------
// Batched prep passes. The per-scan host work (THROUGHPUT_r4: ~20 ms/scan,
// 11.5 ms of it in the scalar transform+bin loop) is restructured into SoA
// batch loops that GCC autovectorizes; `target_clones` adds an AVX2 clone
// with glibc ifunc runtime dispatch, so the cached .so stays portable to
// baseline x86-64 hosts (the -mtune=native concern in the Makefile) while
// modern hosts get 8-wide code. -ffp-contract=off applies to every clone
// (it is a compile-unit flag), so no clone can fuse the ds arithmetic into
// FMAs; vectorizing across points never reorders a per-point chain, so all
// clones are bit-identical to the scalar path.
// ---------------------------------------------------------------------------

#define GG_CLONES __attribute__((target_clones("arch=x86-64-v3", "default")))

// map-frame transform, AoS f64 input -> SoA f32: exact numpy order
// ((T0*x + T1*y) + T2*z) + T3 per row (pipeline.prepare_scan).
GG_CLONES
static void gg_transform_batch(const double* T, const float* aos,
                               int32_t count, float* mx, float* my,
                               float* mz) {
  for (int32_t i = 0; i < count; ++i) {
    const double x = aos[(size_t)i * 4 + 0];
    const double y = aos[(size_t)i * 4 + 1];
    const double z = aos[(size_t)i * 4 + 2];
    mx[i] = (float)(T[0] * x + T[1] * y + T[2] * z + T[3]);
    my[i] = (float)(T[4] * x + T[5] * y + T[6] * z + T[7]);
    mz[i] = (float)(T[8] * x + T[9] * y + T[10] * z + T[11]);
  }
}

GG_CLONES
static void gg_bin_axis_batch(const BinAxis a, const BinConsts c,
                              const float* v, int32_t count, float* g) {
  for (int32_t i = 0; i < count; ++i) g[i] = gg_ds_bin(a, c, v[i]);
}

// flat cell id with out-of-bounds -> n*n sentinel, branchless
GG_CLONES
static void gg_cells_batch(const float* g0, const float* g1, int32_t count,
                           int32_t n, int32_t* cells) {
  const int32_t n2 = n * n;
  for (int32_t i = 0; i < count; ++i) {
    const bool in = (g0[i] >= 0.0f) & (g0[i] < (float)n) & (g1[i] >= 0.0f) &
                    (g1[i] < (float)n);
    const int32_t c = (int32_t)g0[i] * n + (int32_t)g1[i];
    cells[i] = in ? c : n2;
  }
}

// s16 wire quantization: round-half-even (FE_TONEAREST nearbyintf == numpy
// np.rint), clamp to s16, and the dequantized f32 the device reconstructs.
// `inv_s`/`s` are the reciprocal pair of a power-of-two step
// (pipeline.wire_scales), so both multiplies are exact and bit-match the
// numpy prep's f32 ops.
GG_CLONES
static void gg_quantize_batch(const float* v, float ref, float inv_s, float s,
                              int32_t count, int16_t* q, float* dq) {
  for (int32_t i = 0; i < count; ++i) {
    float t = std::nearbyintf((v[i] - ref) * inv_s);
    t = t < -32768.0f ? -32768.0f : (t > 32767.0f ? 32767.0f : t);
    q[i] = (int16_t)t;
    dq[i] = (float)q[i] * s + ref;
  }
}

// Reusable per-thread scratch: fresh vectors per scan cost ~5 ms/scan in
// allocation + zeroing churn; capacity persists across scans per worker.
struct Scratch {
  std::vector<float> mx, my, mz, g0, g1, dqx, dqy, dqz;
  std::vector<int16_t> wx, wy, wz;
  std::vector<int32_t> cells, cnt;
};

// stable counting sort of [0, count) by flat cell id; returns via `cnt` the
// running bucket cursors (consumed immediately by the scatter in the caller).
static void gg_cell_histogram(const int32_t* cells, int32_t count, int64_t n2,
                              std::vector<int32_t>& cnt) {
  cnt.assign((size_t)n2 + 2, 0);
  for (int32_t i = 0; i < count; ++i) cnt[(size_t)cells[i] + 1]++;
  for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
}

// Sorted-scan preparation parameters (gg_loader_create_sorted): the per-scan
// poses and pre-tracked f64 grid centers for the whole sequence, plus the
// grid geometry. The cell prediction is the f64-faithful ds binning above,
// bit-exact with the device (core/rasterize.py faithful_cells) and the host
// numpy prep (pipeline.predict_cells).
struct Prep {
  bool enabled = false;
  bool wire = false;           // s16 wire prep instead of f32 sorted prep
  std::vector<double> poses;   // n_scans * 16, row-major map<-velo
  std::vector<double> centers; // n_scans * 2 (f64 tracker recurrence)
  BinConsts bc;
  double half = 0.0;
  int32_t n = 0;
  // per-axis wire steps (pipeline.wire_scales: powers of two, xy from the
  // grid half-span, z one power finer); caller-supplied, Python is the
  // single source of truth for the derivation
  float wire_sxy = 0.0f;
  float wire_sz = 0.0f;
};

// Per-scan (center + half) ds pair, matching rasterize.faithful_cells:
// f64 center -> (hi, lo) split (exactf32.f64_to_ds), ds_add with the ds
// image of the F64 half_length (cells*res/2 is not f32-exact; an f32 half
// lost 1.4e-6 m of edge precision -- the residual mis-binning seed).
static inline BinAxis gg_center_axis(double c64, double half64) {
  const float hi = (float)c64;
  const float lo = (float)(c64 - (double)hi);
  const float hh = (float)half64;
  const float hl = (float)(half64 - (double)hh);
  BinAxis a;
  gg_ds_add(hi, lo, hh, hl, &a.sh, &a.sl);
  return a;
}

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
  // recycled slots: buffer capacity persists across scans (fresh per-scan
  // vectors cost ~5 ms/scan in allocation + zeroing churn)
  std::vector<Slot> free_slots;
  size_t max_queue = 8;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  Prep prep;
};

// Map-frame transform + cell-sorted reorder (pipeline.prepare_scan in C++).
// Stable counting sort by flat cell id reproduces numpy's stable argsort
// bit-for-bit, so the emitted scan is byte-identical to the Python prep.
// Only the live prefix [0, count) is transformed and sorted; the zero pad
// tail has cell id n², sorts stably after every live point (including
// out-of-bounds live points in the same sentinel bucket), and is written
// directly.
void prep_scan(const Loader& L, int64_t idx, Slot& s, Scratch& sc) {
  const double* T = L.prep.poses.data() + (size_t)idx * 16;
  const BinAxis a0 = gg_center_axis(L.prep.centers[2 * idx], L.prep.half);
  const BinAxis a1 = gg_center_axis(L.prep.centers[2 * idx + 1], L.prep.half);
  const BinConsts& bc = L.prep.bc;
  const int32_t n = L.prep.n;
  const int64_t n2 = (int64_t)n * n;
  const int32_t cap = L.cap;
  const int32_t count = s.count;

  sc.mx.resize(cap);
  sc.my.resize(cap);
  sc.mz.resize(cap);
  sc.g0.resize(cap);
  sc.g1.resize(cap);
  sc.cells.resize(cap);
  gg_transform_batch(T, s.points.data(), count, sc.mx.data(), sc.my.data(),
                     sc.mz.data());
  gg_bin_axis_batch(a0, bc, sc.mx.data(), count, sc.g0.data());
  gg_bin_axis_batch(a1, bc, sc.my.data(), count, sc.g1.data());
  gg_cells_batch(sc.g0.data(), sc.g1.data(), count, n, sc.cells.data());

  gg_cell_histogram(sc.cells.data(), count, n2, sc.cnt);

  s.sx.resize(cap);
  s.sy.resize(cap);
  s.sz.resize(cap);
  s.slabels.resize(cap);
  s.order.resize(cap);
  for (int32_t i = 0; i < count; ++i) {
    const int32_t pos = sc.cnt[sc.cells[i]]++;
    s.sx[pos] = sc.mx[i];
    s.sy[pos] = sc.my[i];
    s.sz[pos] = sc.mz[i];
    s.slabels[pos] = s.labels[i];
    s.order[pos] = i;
  }
  for (int32_t i = count; i < cap; ++i) {
    s.sx[i] = 0.0f;
    s.sy[i] = 0.0f;
    s.sz[i] = 0.0f;
    s.slabels[i] = 0;
    s.order[i] = i;
  }
}

// s16 wire preparation (pipeline.prepare_scan_wire in C++): quantize to
// int16 steps of the per-axis power-of-two scales relative to
// (center_x, center_y, origin_z), then bin and stable-sort by the cell ids
// of the *dequantized* f32 coordinates (exactly what the device will
// reconstruct), so the device-side sortedness check passes. Bit-exact with
// the numpy prep: double transform -> float cast, (v - ref) * (1/s) under
// FE_TONEAREST nearbyintf (numpy np.rint is also round-half-even), dequant
// as q * s + ref with -ffp-contract=off; both multiplies exact (s = 2^-k).
void prep_scan_wire(const Loader& L, int64_t idx, Slot& s, Scratch& sc) {
  const double* T = L.prep.poses.data() + (size_t)idx * 16;
  // the wire quantization refs are the f32 HI center (pipeline dequant adds
  // w.center[0], the hi); binning uses the full ds pair
  const float ref0 = (float)L.prep.centers[2 * idx];
  const float ref1 = (float)L.prep.centers[2 * idx + 1];
  const float ref2 = (float)T[11];  // origin z (t_map_velo[2,3]) as f32
  const BinAxis a0 = gg_center_axis(L.prep.centers[2 * idx], L.prep.half);
  const BinAxis a1 = gg_center_axis(L.prep.centers[2 * idx + 1], L.prep.half);
  const BinConsts& bc = L.prep.bc;
  const int32_t n = L.prep.n;
  const int64_t n2 = (int64_t)n * n;
  const int32_t cap = L.cap;
  const int32_t count = s.count;

  sc.mx.resize(cap);
  sc.my.resize(cap);
  sc.mz.resize(cap);
  sc.g0.resize(cap);
  sc.g1.resize(cap);
  sc.dqx.resize(cap);
  sc.dqy.resize(cap);
  sc.dqz.resize(cap);
  sc.wx.resize(cap);
  sc.wy.resize(cap);
  sc.wz.resize(cap);
  sc.cells.resize(cap);
  const float sxy = L.prep.wire_sxy, isxy = 1.0f / sxy;
  const float sz = L.prep.wire_sz, isz = 1.0f / sz;
  gg_transform_batch(T, s.points.data(), count, sc.mx.data(), sc.my.data(),
                     sc.mz.data());
  gg_quantize_batch(sc.mx.data(), ref0, isxy, sxy, count, sc.wx.data(),
                    sc.dqx.data());
  gg_quantize_batch(sc.my.data(), ref1, isxy, sxy, count, sc.wy.data(),
                    sc.dqy.data());
  // z dequant is never binned; dqz is a discard buffer (aliasing mz as the
  // output would defeat vectorization via the compiler's overlap check)
  gg_quantize_batch(sc.mz.data(), ref2, isz, sz, count, sc.wz.data(),
                    sc.dqz.data());
  // bin the dequantized coordinates -- what the device reconstructs
  gg_bin_axis_batch(a0, bc, sc.dqx.data(), count, sc.g0.data());
  gg_bin_axis_batch(a1, bc, sc.dqy.data(), count, sc.g1.data());
  gg_cells_batch(sc.g0.data(), sc.g1.data(), count, n, sc.cells.data());

  gg_cell_histogram(sc.cells.data(), count, n2, sc.cnt);

  s.qx.resize(cap);
  s.qy.resize(cap);
  s.qz.resize(cap);
  s.qlabels.resize(cap);
  s.order.resize(cap);
  for (int32_t i = 0; i < count; ++i) {
    const int32_t pos = sc.cnt[sc.cells[i]]++;
    s.qx[pos] = sc.wx[i];
    s.qy[pos] = sc.wy[i];
    s.qz[pos] = sc.wz[i];
    s.qlabels[pos] = (int16_t)s.labels[i];
    s.order[pos] = i;
  }
  for (int32_t i = count; i < cap; ++i) {
    s.qx[i] = 0;
    s.qy[i] = 0;
    s.qz[i] = 0;
    s.qlabels[i] = 0;
    s.order[i] = i;
  }
}

bool read_scan_files(const Loader& L, int64_t idx, Slot& slot) {
  char name[64];
  std::snprintf(name, sizeof(name), "%06lld.bin", (long long)idx);
  std::string bin = L.velodyne_dir + "/" + name;
  std::snprintf(name, sizeof(name), "%06lld.label", (long long)idx);
  std::string lab = L.labels_dir + "/" + name;

  // resize (not assign): recycled slots keep capacity; only the unread tail
  // needs zeroing, matching the zero-padded contract byte for byte
  slot.points.resize((size_t)L.cap * 4);
  slot.labels.resize((size_t)L.cap);
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
  if (nread < (size_t)L.cap * 4)
    std::memset(slot.points.data() + nread, 0,
                ((size_t)L.cap * 4 - nread) * sizeof(float));

  size_t lread = 0;
  FILE* g = std::fopen(lab.c_str(), "rb");
  if (g) {
    static thread_local std::vector<uint32_t> raw;
    raw.resize((size_t)count);
    lread = std::fread(raw.data(), sizeof(uint32_t), (size_t)count, g);
    std::fclose(g);
    for (size_t i = 0; i < lread; ++i)
      slot.labels[i] = (int32_t)(raw[i] & 0xFFFFu); // semantic id, low half
  }
  if (lread < (size_t)L.cap)
    std::memset(slot.labels.data() + lread, 0,
                ((size_t)L.cap - lread) * sizeof(int32_t));
  return true;
}

void worker_main(Loader* L) {
  Scratch scratch;  // per-worker; capacity persists across scans
  for (;;) {
    int64_t idx;
    int64_t gen;
    Slot slot;
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
      if (!L->free_slots.empty()) {
        slot = std::move(L->free_slots.back());
        L->free_slots.pop_back();
      }
    }
    slot.index = idx;
    slot.generation = gen;
    read_scan_files(*L, idx, slot);
    if (slot.status == 0 && L->prep.enabled) {
      if (L->prep.wire)
        prep_scan_wire(*L, idx, slot, scratch);
      else
        prep_scan(*L, idx, slot, scratch);
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
      else
        L->free_slots.push_back(std::move(slot));
    }
    L->cv_ready.notify_all();
  }
}

// return an emitted slot's buffers to the recycle pool
void gg_recycle(Loader* L, Slot&& slot) {
  std::lock_guard<std::mutex> lk(L->mu);
  L->free_slots.push_back(std::move(slot));
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
// f64 (pipeline.CenterTracker's double recurrence); resolution as a double
// so the ds constants (exactf32.res_ds) split the same f64 value.
static void* create_prep_loader(const char* sequence_root, int64_t n_scans,
                                int32_t cap, int32_t n_threads,
                                int32_t queue_depth, const double* poses,
                                const double* centers, double resolution,
                                double half_length, int32_t n_cells,
                                bool wire, double wire_sxy, double wire_sz) {
  auto* L = new Loader();
  L->velodyne_dir = std::string(sequence_root) + "/velodyne";
  L->labels_dir = std::string(sequence_root) + "/labels";
  L->cap = cap;
  L->n_scans = n_scans;
  L->max_queue = queue_depth > 0 ? (size_t)queue_depth : 8;
  L->prep.enabled = true;
  L->prep.wire = wire;  // set BEFORE workers start (they prefetch eagerly)
  L->prep.wire_sxy = (float)wire_sxy;
  L->prep.wire_sz = (float)wire_sz;
  L->prep.poses.assign(poses, poses + (size_t)n_scans * 16);
  L->prep.centers.assign(centers, centers + (size_t)n_scans * 2);
  // exactf32.res_ds: ds image of the f64 resolution + presplit halves
  BinConsts& bc = L->prep.bc;
  bc.rh = (float)resolution;
  bc.rl = (float)(resolution - (double)bc.rh);
  gg_split(bc.rh, &bc.rhh, &bc.rhl);
  gg_split(bc.rl, &bc.rlh, &bc.rll);
  bc.inv_res = 1.0f / (float)resolution;
  L->prep.half = half_length;
  L->prep.n = n_cells;
  int32_t nt = n_threads > 0 ? n_threads : 2;
  for (int32_t i = 0; i < nt; ++i) L->workers.emplace_back(worker_main, L);
  return L;
}

void* gg_loader_create_sorted(const char* sequence_root, int64_t n_scans,
                              int32_t cap, int32_t n_threads,
                              int32_t queue_depth, const double* poses,
                              const double* centers, double resolution,
                              double half_length, int32_t n_cells) {
  return create_prep_loader(sequence_root, n_scans, cap, n_threads,
                            queue_depth, poses, centers, resolution,
                            half_length, n_cells, /*wire=*/false, 0.0, 0.0);
}

// Wire-prep variant of gg_loader_create_sorted: workers quantize each scan
// to the s16 wire format (pipeline.prepare_scan_wire semantics) and
// stable-sort by the dequantized coordinates' cell ids. wire_sxy / wire_sz
// are the per-axis power-of-two steps (pipeline.wire_scales — Python owns
// the derivation from the grid geometry).
void* gg_loader_create_wire(const char* sequence_root, int64_t n_scans,
                            int32_t cap, int32_t n_threads,
                            int32_t queue_depth, const double* poses,
                            const double* centers, double resolution,
                            double half_length, int32_t n_cells,
                            double wire_sxy, double wire_sz) {
  return create_prep_loader(sequence_root, n_scans, cap, n_threads,
                            queue_depth, poses, centers, resolution,
                            half_length, n_cells, /*wire=*/true, wire_sxy,
                            wire_sz);
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
        if (slot.status != 0) {
          gg_recycle(L, std::move(slot));
          return -2;
        }
        const size_t cap = (size_t)L->cap;
        std::memcpy(out_qx, slot.qx.data(), cap * sizeof(int16_t));
        std::memcpy(out_qy, slot.qy.data(), cap * sizeof(int16_t));
        std::memcpy(out_qz, slot.qz.data(), cap * sizeof(int16_t));
        std::memcpy(out_labels, slot.qlabels.data(), cap * sizeof(int16_t));
        std::memcpy(out_order, slot.order.data(), cap * sizeof(int32_t));
        *out_count = slot.count;
        const int64_t ret = slot.index;
        gg_recycle(L, std::move(slot));
        return ret;
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
        if (slot.status != 0) {
          gg_recycle(L, std::move(slot));
          return -2;
        }
        const size_t cap = (size_t)L->cap;
        std::memcpy(out_px, slot.sx.data(), cap * sizeof(float));
        std::memcpy(out_py, slot.sy.data(), cap * sizeof(float));
        std::memcpy(out_pz, slot.sz.data(), cap * sizeof(float));
        std::memcpy(out_labels, slot.slabels.data(), cap * sizeof(int32_t));
        std::memcpy(out_order, slot.order.data(), cap * sizeof(int32_t));
        *out_count = slot.count;
        const int64_t ret = slot.index;
        gg_recycle(L, std::move(slot));
        return ret;
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
        const int64_t ret = slot.status == 0 ? slot.index : -2;
        gg_recycle(L, std::move(slot));
        return ret;
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
    for (auto& d : L->done) L->free_slots.push_back(std::move(d));
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
