// geometry_msgs/PoseWithCovarianceStamped shim (crosscheck harness).
#pragma once
#include <geometry_msgs/TransformStamped.h>

namespace geometry_msgs {
struct PoseWithCovarianceStamped {
  std_msgs::Header header;
  PoseWithCovariance pose;
};
}  // namespace geometry_msgs
