// grid_map_msgs shim (crosscheck harness): message type unused by the
// compiled sources.
#pragma once
#include <std_msgs/Header.h>

namespace grid_map_msgs {
struct GridMap {
  std_msgs::Header header;
};
}  // namespace grid_map_msgs
