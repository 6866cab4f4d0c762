// pcl/point_types.h shim (crosscheck harness): just the macros the
// reference's velodyne point struct needs; registration is a no-op.
#pragma once
#include <Eigen/Core>

#include <cstdint>

#define PCL_ADD_POINT4D     \
  union EIGEN_ALIGN16 {     \
    float data[4];          \
    struct {                \
      float x;              \
      float y;              \
      float z;              \
    };                      \
  }

#define POINT_CLOUD_REGISTER_POINT_STRUCT(...)

namespace pcl {
struct PointXYZ {
  PCL_ADD_POINT4D;
};
}  // namespace pcl
