// pcl_ros/point_cloud.h shim (crosscheck harness): the pcl::PointCloud<T>
// container slice the reference uses (points vector + Ptr + header).
#pragma once
#include <Eigen/Core>
#include <Eigen/StdVector>
#include <std_msgs/Header.h>

#include <memory>
#include <vector>

namespace pcl {

struct PCLHeader {
  std::uint32_t seq = 0;
  std::uint64_t stamp = 0;
  std::string frame_id;
};

template <typename PointT>
class PointCloud {
 public:
  using Ptr = std::shared_ptr<PointCloud<PointT>>;
  using ConstPtr = std::shared_ptr<const PointCloud<PointT>>;

  PCLHeader header;
  std::vector<PointT, Eigen::aligned_allocator<PointT>> points;
  std::uint32_t width = 0;
  std::uint32_t height = 1;
  bool is_dense = true;

  inline std::size_t size() const { return points.size(); }
  inline void reserve(std::size_t n) { points.reserve(n); }
  inline void clear() { points.clear(); }
  inline void push_back(const PointT& p) { points.push_back(p); }
};

}  // namespace pcl
