// ros/package.h shim (crosscheck harness): path resolution unused by the
// compiled reference sources.
#pragma once
#include <string>

namespace ros {
namespace package {
inline std::string getPath(const std::string&) { return std::string(); }
}  // namespace package
}  // namespace ros
