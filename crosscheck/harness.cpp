// Crosscheck harness: drives the ACTUAL reference sources
// (/root/reference/src/GroundGrid.cpp + GroundSegmentation.cpp, compiled in
// place against crosscheck/shim headers + real Eigen) through the same
// per-scan interface the golden oracle and the TPU pipeline consume, via a
// C ABI for ctypes (scripts/crosscheck.py).
//
// Input-order label recovery: filter_cloud returns a REORDERED cloud
// (point_index order, ignored re-added, border-dropped points omitted,
// outliers appended; GroundSegmentation.cpp:146-189) with no index channel
// (intensity is overwritten with the class, ring is the eval label). The
// harness matches output points back to input indices by exact
// (x, y, z, ring) bytes in first-in-first-out order -- identical duplicate
// points are interchangeable (same cell, same tolerance, same verdict), so
// FIFO matching is exact. Unmatched inputs (out-of-map or border-dropped)
// keep label 0, the same convention golden.filter_cloud uses.
//
// The reference's insert stage races its accumulators across
// config.thread_count threads; the harness runs thread_count=1 by default so
// the lockstep diff is deterministic (the 4 detect threads write disjoint
// sections and their shared variance writes are value-identical).

#include <groundgrid/GroundGrid.h>
#include <groundgrid/GroundSegmentation.h>

#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Handle {
  groundgrid::GroundGrid grid;
  groundgrid::GroundSegmentation seg;
  groundgrid::GroundGridConfig config;
  std::shared_ptr<grid_map::GridMap> map;
  bool initialized = false;
};

struct PointKey {
  float x, y, z;
  uint32_t ring;  // widened from u16 so the struct is padding-free (16 B);
                  // memcmp/hash over padding bytes would be garbage
  bool operator==(const PointKey& o) const {
    return std::memcmp(this, &o, sizeof(PointKey)) == 0;
  }
};
static_assert(sizeof(PointKey) == 16, "PointKey must be padding-free");

struct PointKeyHash {
  size_t operator()(const PointKey& k) const {
    uint64_t a, b;
    std::memcpy(&a, &k.x, 8);
    std::memcpy(&b, &k.z, 8);
    uint64_t h = a * 0x9E3779B97F4A7C15ull ^ (b + 0x165667B19E3779F9ull);
    h ^= h >> 29;
    h *= 0xBF58476D1CE4E5B9ull;
    h ^= h >> 32;
    return (size_t)h;
  }
};

geometry_msgs::TransformStamped make_transform(const double* quat_xyzw,
                                               const double* trans_xyz,
                                               const char* frame,
                                               const char* child) {
  geometry_msgs::TransformStamped ts;
  ts.header.frame_id = frame;
  ts.child_frame_id = child;
  ts.transform.rotation.x = quat_xyzw[0];
  ts.transform.rotation.y = quat_xyzw[1];
  ts.transform.rotation.z = quat_xyzw[2];
  ts.transform.rotation.w = quat_xyzw[3];
  ts.transform.translation.x = trans_xyz[0];
  ts.transform.translation.y = trans_xyz[1];
  ts.transform.translation.z = trans_xyz[2];
  return ts;
}

}  // namespace

extern "C" {

// cfg: 13 doubles in cfg/GroundGrid.cfg order (ints passed as doubles):
//   [0] point_count_cell_variance_threshold  [1] max_ring
//   [2] groundpatch_detection_minimum_threshold [3] distance_factor
//   [4] minimum_distance_factor [5] miminum_point_height_threshold
//   [6] minimum_point_height_obstacle_threshold [7] outlier_tolerance
//   [8] ground_patch_detection_minimum_point_count_threshold
//   [9] patch_size_change_distance [10] occupied_cells_decrease_factor
//   [11] occupied_cells_point_count_factor
//   [12] min_outlier_detection_ground_confidence
// thread_count separate (harness default 1 for determinism).
void* ggref_create(const double* cfg, int thread_count) {
  auto* h = new Handle();
  h->config.point_count_cell_variance_threshold = (int)cfg[0];
  h->config.max_ring = (int)cfg[1];
  h->config.groundpatch_detection_minimum_threshold = cfg[2];
  h->config.distance_factor = cfg[3];
  h->config.minimum_distance_factor = cfg[4];
  h->config.miminum_point_height_threshold = cfg[5];
  h->config.minimum_point_height_obstacle_threshold = cfg[6];
  h->config.outlier_tolerance = cfg[7];
  h->config.ground_patch_detection_minimum_point_count_threshold = cfg[8];
  h->config.patch_size_change_distance = cfg[9];
  h->config.occupied_cells_decrease_factor = cfg[10];
  h->config.occupied_cells_point_count_factor = cfg[11];
  h->config.min_outlier_detection_ground_confidence = cfg[12];
  h->config.thread_count = thread_count > 0 ? thread_count : 1;
  h->grid.setConfig(h->config);
  h->seg.setConfig(h->config);
  // GroundGridNodelet.cpp:95: init(nh, 120, 0.33f) -- the geometry is the
  // reference's hardcoded constants (GroundGrid.h:70-71)
  ros::NodeHandle nh;
  h->seg.init(nh, 120, 0.33f);
  return h;
}

void ggref_destroy(void* handle) { delete static_cast<Handle*>(handle); }

// Install a TF into the shim registry (looked up by GroundGrid::update and
// used by the harness for filter_cloud's mapToBase argument).
void ggref_set_transform(const char* target, const char* source,
                         const double* quat_xyzw, const double* trans_xyz) {
  tf2_ros::transform_registry()[std::make_pair(std::string(target),
                                               std::string(source))] =
      make_transform(quat_xyzw, trans_xyz, target, source);
}

// One scan: odom update + filter_cloud, exactly the nodelet's callback pair
// (GroundGridNodelet.cpp:107-112, 114-200). Points arrive already in the
// map frame (the harness does the nodelet's cloud transform on the Python
// side, with the same arrays golden/pipeline consume).
//   odom_pos:   3 f64 (map-frame vehicle position; z seeds ground at init)
//   px/py/pz:   n f32 map-frame coordinates
//   rings:      n u16 (SemanticKITTI label in the ring field)
//   origin:     3 f32 cloud origin (velodyne origin in map)
//   out_labels: n i32 -> 49 ground / 99 non-ground / 0 dropped
// Returns number of points labeled (matched in the output cloud), or -1.
int64_t ggref_step(void* handle, const double* odom_pos, const float* px,
                   const float* py, const float* pz, const uint16_t* rings,
                   int64_t n, const float* origin, int32_t* out_labels) {
  auto* h = static_cast<Handle*>(handle);
  using PCLPoint = groundgrid::GroundSegmentation::PCLPoint;

  auto odom = std::make_shared<nav_msgs::Odometry>();
  odom->header.frame_id = "map";
  odom->pose.pose.position.x = odom_pos[0];
  odom->pose.pose.position.y = odom_pos[1];
  odom->pose.pose.position.z = odom_pos[2];
  h->map = h->grid.update(nav_msgs::OdometryConstPtr(odom));
  if (!h->map) return -1;

  pcl::PointCloud<PCLPoint>::Ptr cloud(new pcl::PointCloud<PCLPoint>);
  cloud->points.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    PCLPoint& p = cloud->points[(size_t)i];
    p.x = px[i];
    p.y = py[i];
    p.z = pz[i];
    p.intensity = 0.0f;
    p.ring = rings[i];
  }

  PCLPoint originPoint;
  originPoint.x = origin[0];
  originPoint.y = origin[1];
  originPoint.z = origin[2];
  originPoint.intensity = 0.0f;
  originPoint.ring = 0;

  geometry_msgs::TransformStamped mapToBase;
  try {
    tf2_ros::Buffer buf;
    mapToBase = buf.lookupTransform("map", "base_link", ros::Time());
  } catch (const tf2::TransformException&) {
    return -2;
  }

  auto filtered = h->seg.filter_cloud(cloud, originPoint, mapToBase, *h->map);

  // FIFO exact-byte matching back to input order (see file comment)
  std::unordered_map<PointKey, std::vector<int64_t>, PointKeyHash> where;
  where.reserve((size_t)n * 2);
  for (int64_t i = n - 1; i >= 0; --i) {
    PointKey k{px[i], py[i], pz[i], (uint32_t)rings[i]};
    where[k].push_back(i);  // reversed fill -> pop_back is FIFO
  }
  std::memset(out_labels, 0, (size_t)n * sizeof(int32_t));
  int64_t matched = 0;
  for (const PCLPoint& p : filtered->points) {
    PointKey k{p.x, p.y, p.z, (uint32_t)p.ring};
    auto it = where.find(k);
    if (it == where.end() || it->second.empty()) continue;  // unexpected
    const int64_t idx = it->second.back();
    it->second.pop_back();
    out_labels[idx] = (int32_t)p.intensity;
    ++matched;
  }
  return matched;
}

int32_t ggref_grid_size(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  return h->map ? h->map->getSize()(0) : 0;
}

// Dump a layer (row-major, N*N f32). Returns 0 ok, -1 no map/layer.
int32_t ggref_get_layer(void* handle, const char* name, float* out) {
  auto* h = static_cast<Handle*>(handle);
  if (!h->map || !h->map->exists(name)) return -1;
  const grid_map::Matrix& m = (*h->map)[name];
  const int n0 = (int)m.rows(), n1 = (int)m.cols();
  for (int i = 0; i < n0; ++i)
    for (int j = 0; j < n1; ++j) out[(size_t)i * n1 + j] = m(i, j);
  return 0;
}

// Map metadata for alignment checks: center position (f64 x,y) + start index
void ggref_get_center(void* handle, double* out_xy) {
  auto* h = static_cast<Handle*>(handle);
  out_xy[0] = h->map ? h->map->getPosition().x() : 0.0;
  out_xy[1] = h->map ? h->map->getPosition().y() : 0.0;
}

}  // extern "C"
