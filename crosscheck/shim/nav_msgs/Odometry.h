// nav_msgs/Odometry shim (crosscheck harness). ConstPtr follows the ROS1
// boost::shared_ptr convention via std::shared_ptr.
#pragma once
#include <geometry_msgs/TransformStamped.h>
#include <std_msgs/Header.h>

#include <memory>
#include <string>

namespace geometry_msgs {
struct Twist {
  Vector3 linear;
  Vector3 angular;
};
struct TwistWithCovariance {
  Twist twist;
  double covariance[36] = {0};
};
}  // namespace geometry_msgs

namespace nav_msgs {
struct Odometry {
  std_msgs::Header header;
  std::string child_frame_id;
  geometry_msgs::PoseWithCovariance pose;
  geometry_msgs::TwistWithCovariance twist;
};
using OdometryPtr = std::shared_ptr<Odometry>;
using OdometryConstPtr = std::shared_ptr<const Odometry>;
}  // namespace nav_msgs
