// ros/ros.h shim: NodeHandle + logging macros only (crosscheck harness).
// Logging is compiled out; the reference's per-stage chrono timing strings
// are not needed for the lockstep diff.
#pragma once
#include <std_msgs/Header.h>

#include <cstdio>
#include <string>

namespace ros {
class NodeHandle {
 public:
  NodeHandle() = default;
  explicit NodeHandle(const std::string&) {}
};
}  // namespace ros

#define ROS_INFO(...) \
  do {                \
  } while (0)
#define ROS_WARN(...) \
  do {                \
  } while (0)
#define ROS_ERROR(...) \
  do {                 \
  } while (0)
#define ROS_DEBUG(...) \
  do {                 \
  } while (0)
#define ROS_INFO_STREAM(x) \
  do {                     \
  } while (0)
#define ROS_WARN_STREAM(x) \
  do {                     \
  } while (0)
#define ROS_DEBUG_STREAM(x) \
  do {                      \
  } while (0)
