// sensor_msgs/PointCloud2 shim (crosscheck harness): included by the
// reference header, never used by the compiled sources.
#pragma once
#include <std_msgs/Header.h>

#include <cstdint>
#include <memory>
#include <vector>

namespace sensor_msgs {
struct PointCloud2 {
  std_msgs::Header header;
  std::vector<uint8_t> data;
};
using PointCloud2ConstPtr = std::shared_ptr<const PointCloud2>;
}  // namespace sensor_msgs
