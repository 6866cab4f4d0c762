// geometry_msgs shims (crosscheck harness): plain-double message structs
// with ROS1 field layout.
#pragma once
#include <std_msgs/Header.h>

#include <string>

namespace geometry_msgs {

struct Vector3 {
  double x = 0.0, y = 0.0, z = 0.0;
};

struct Point {
  double x = 0.0, y = 0.0, z = 0.0;
};

struct Quaternion {
  double x = 0.0, y = 0.0, z = 0.0, w = 1.0;
};

struct Transform {
  Vector3 translation;
  Quaternion rotation;
};

struct TransformStamped {
  std_msgs::Header header;
  std::string child_frame_id;
  Transform transform;
};

struct Pose {
  Point position;
  Quaternion orientation;
};

struct PoseWithCovariance {
  Pose pose;
  double covariance[36] = {0};
};

}  // namespace geometry_msgs
