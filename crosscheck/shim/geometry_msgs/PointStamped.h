// geometry_msgs/PointStamped shim (crosscheck harness).
#pragma once
#include <geometry_msgs/TransformStamped.h>

namespace geometry_msgs {
struct PointStamped {
  std_msgs::Header header;
  Point point;
};
}  // namespace geometry_msgs
