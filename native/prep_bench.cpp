// Phase-level microbenchmark for the host prep path (prep_scan /
// prep_scan_wire in loader.cpp). Times each phase of the per-scan host work
// separately so optimization effort lands where the milliseconds are:
//   A  f64 transform + ds cell binning loop
//   B  stable sort by cell id (counting sort baseline)
//   C  output buffer allocation/zero + scatter
//   F  full prep_scan via the same code path the loader workers run
//
// Build: g++ -O3 -mtune=native -std=c++17 -ffp-contract=off \
//            prep_bench.cpp -o build/prep_bench -pthread
// (compiles loader.cpp by inclusion; everything there is in an anonymous
//  namespace, so its internals are reachable here.)

#include "loader.cpp"

#include <chrono>
#include <random>

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

int main(int argc, char** argv) {
  const int32_t cap = 131072;
  const int32_t count = 131072;
  const int32_t n = 364;
  const double res = 1.0 / 3.0;
  const int reps = argc > 1 ? std::atoi(argv[1]) : 32;

  // synthetic scan: disk of radius 55 m in the velodyne frame
  std::mt19937 rng(42);
  std::uniform_real_distribution<float> ur(0.0f, 1.0f);
  Slot s;
  s.points.assign((size_t)cap * 4, 0.0f);
  s.labels.assign(cap, 0);
  s.count = count;
  for (int32_t i = 0; i < count; ++i) {
    const float r = 3.5f + 51.5f * std::sqrt(ur(rng));
    const float th = 6.2831853f * ur(rng);
    s.points[(size_t)i * 4 + 0] = r * std::cos(th);
    s.points[(size_t)i * 4 + 1] = r * std::sin(th);
    s.points[(size_t)i * 4 + 2] = -1.7f + 0.2f * ur(rng);
    s.labels[i] = (int32_t)(ur(rng) * 30.0f);
  }

  Loader L;
  L.cap = cap;
  L.prep.enabled = true;
  L.prep.n = n;
  L.prep.half = (double)n * res / 2.0;
  BinConsts& bc = L.prep.bc;
  bc.rh = (float)res;
  bc.rl = (float)(res - (double)bc.rh);
  gg_split(bc.rh, &bc.rhh, &bc.rhl);
  gg_split(bc.rl, &bc.rlh, &bc.rll);
  bc.inv_res = 1.0f / (float)res;
  // one pose: slight yaw + offset so the transform is not identity
  double T[16] = {0.9998, -0.02, 0.0, 103.4, 0.02, 0.9998, 0.0, -47.2,
                  0.0,    0.0,   1.0, 1.73,  0.0,  0.0,    0.0, 1.0};
  L.prep.poses.assign(T, T + 16);
  double centers[2] = {103.4, -47.2};
  L.prep.centers.assign(centers, centers + 2);

  const BinAxis a0 = gg_center_axis(centers[0], L.prep.half);
  const BinAxis a1 = gg_center_axis(centers[1], L.prep.half);
  const int64_t n2 = (int64_t)n * n;

  // ---- phase A: transform + bin ----
  std::vector<float> mx(cap), my(cap), mz(cap);
  std::vector<int32_t> cells(cap);
  double tA = 1e9;
  for (int r = 0; r < reps; ++r) {
    auto t0 = Clock::now();
    std::fill(cells.begin(), cells.end(), (int32_t)n2);
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
      const float g0 = gg_ds_bin(a0, bc, xf);
      const float g1 = gg_ds_bin(a1, bc, yf);
      if (g0 >= 0.0f && g0 < (float)n && g1 >= 0.0f && g1 < (float)n)
        cells[i] = (int32_t)g0 * n + (int32_t)g1;
    }
    tA = std::min(tA, ms_since(t0));
  }
  std::printf("A transform+bin      %8.3f ms\n", tA);

  // ---- phase B: counting sort (cnt build + prefix) ----
  std::vector<int32_t> cnt((size_t)n2 + 2, 0);
  double tB = 1e9;
  for (int r = 0; r < reps; ++r) {
    auto t0 = Clock::now();
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int32_t i = 0; i < cap; ++i) cnt[(size_t)cells[i] + 1]++;
    for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
    tB = std::min(tB, ms_since(t0));
  }
  std::printf("B count+prefix       %8.3f ms\n", tB);

  // ---- phase C: output alloc + scatter ----
  double tC = 1e9;
  for (int r = 0; r < reps; ++r) {
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int32_t i = 0; i < cap; ++i) cnt[(size_t)cells[i] + 1]++;
    for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
    auto t0 = Clock::now();
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
    tC = std::min(tC, ms_since(t0));
  }
  std::printf("C alloc+scatter      %8.3f ms\n", tC);

  // ---- batch passes (the production path) ----
  Scratch sc;
  prep_scan(L, 0, s, sc);  // warm scratch allocation
  double tT = 1e9, tBin = 1e9;
  for (int r = 0; r < reps; ++r) {
    auto t0 = Clock::now();
    gg_transform_batch(T, s.points.data(), count, sc.mx.data(), sc.my.data(),
                       sc.mz.data());
    tT = std::min(tT, ms_since(t0));
    t0 = Clock::now();
    gg_bin_axis_batch(a0, bc, sc.mx.data(), count, sc.g0.data());
    gg_bin_axis_batch(a1, bc, sc.my.data(), count, sc.g1.data());
    gg_cells_batch(sc.g0.data(), sc.g1.data(), count, n, sc.cells.data());
    tBin = std::min(tBin, ms_since(t0));
  }
  std::printf("T transform batch    %8.3f ms\n", tT);
  std::printf("D bin+cells batch    %8.3f ms\n", tBin);

  // ---- full prep_scan ----
  double tF = 1e9;
  for (int r = 0; r < reps; ++r) {
    auto t0 = Clock::now();
    prep_scan(L, 0, s, sc);
    tF = std::min(tF, ms_since(t0));
  }
  std::printf("F prep_scan (f32)    %8.3f ms\n", tF);

  double tW = 1e9;
  for (int r = 0; r < reps; ++r) {
    auto t0 = Clock::now();
    prep_scan_wire(L, 0, s, sc);
    tW = std::min(tW, ms_since(t0));
  }
  std::printf("W prep_scan_wire     %8.3f ms\n", tW);
  return 0;
}
