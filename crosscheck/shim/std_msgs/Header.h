// std_msgs/Header shim (crosscheck harness; see shim/grid_map_core).
#pragma once
#include <cstdint>
#include <string>

namespace ros {
struct Time {
  uint32_t sec = 0;
  uint32_t nsec = 0;
  Time() = default;
  Time(uint32_t s, uint32_t n) : sec(s), nsec(n) {}
  bool operator==(const Time& o) const { return sec == o.sec && nsec == o.nsec; }
};
struct Duration {
  double d = 0.0;
  Duration() = default;
  explicit Duration(double v) : d(v) {}
};
}  // namespace ros

namespace std_msgs {
struct Header {
  uint32_t seq = 0;
  ros::Time stamp;
  std::string frame_id;
};
}  // namespace std_msgs
