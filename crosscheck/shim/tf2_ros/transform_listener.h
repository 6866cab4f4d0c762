// tf2_ros shim (crosscheck harness): Buffer backed by a process-global
// transform registry the harness populates before each reference call
// (ggref_set_transform). lookupTransform ignores the stamp -- the harness
// always installs the current scan's transforms first, which reproduces the
// lock-step player's TF behavior (every lookup finds the exact stamp).
#pragma once
#include <geometry_msgs/TransformStamped.h>
#include <std_msgs/Header.h>

#include <map>
#include <stdexcept>
#include <string>
#include <utility>

namespace tf2 {
class TransformException : public std::runtime_error {
 public:
  explicit TransformException(const std::string& m) : std::runtime_error(m) {}
};
class LookupException : public TransformException {
 public:
  explicit LookupException(const std::string& m) : TransformException(m) {}
};
class ExtrapolationException : public TransformException {
 public:
  explicit ExtrapolationException(const std::string& m) : TransformException(m) {}
};
}  // namespace tf2

namespace tf2_ros {

inline std::map<std::pair<std::string, std::string>,
                geometry_msgs::TransformStamped>&
transform_registry() {
  static std::map<std::pair<std::string, std::string>,
                  geometry_msgs::TransformStamped>
      reg;
  return reg;
}

class Buffer {
 public:
  geometry_msgs::TransformStamped lookupTransform(
      const std::string& target, const std::string& source, const ros::Time&,
      const ros::Duration& = ros::Duration()) const {
    const auto& reg = transform_registry();
    auto it = reg.find(std::make_pair(target, source));
    if (it == reg.end())
      throw tf2::LookupException("no transform " + target + " <- " + source);
    return it->second;
  }
  bool canTransform(const std::string& target, const std::string& source,
                    const ros::Time&, const ros::Duration& = ros::Duration()) const {
    return transform_registry().count(std::make_pair(target, source)) != 0;
  }
};

class TransformListener {
 public:
  explicit TransformListener(Buffer&) {}
};

}  // namespace tf2_ros
