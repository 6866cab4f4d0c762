// tf2 LinearMath shim (crosscheck harness): double-precision quaternion +
// 3x3 basis following the real tf2 (bullet-derived) op structure, so the
// reference's doTransform calls round identically to upstream:
//   Matrix3x3::setRotation: s = 2/|q|^2; entries 1-(yy+zz), xy-wz, ...
//   Transform(v) = (row.dot(v) + origin) per axis with left-to-right dots.
#pragma once
#include <cmath>

namespace tf2 {

using tf2Scalar = double;

class Quaternion {
 public:
  tf2Scalar m_floats[4];  // x, y, z, w
  Quaternion() : m_floats{0, 0, 0, 1} {}
  Quaternion(tf2Scalar x, tf2Scalar y, tf2Scalar z, tf2Scalar w)
      : m_floats{x, y, z, w} {}
  tf2Scalar x() const { return m_floats[0]; }
  tf2Scalar y() const { return m_floats[1]; }
  tf2Scalar z() const { return m_floats[2]; }
  tf2Scalar w() const { return m_floats[3]; }
  tf2Scalar length2() const {
    return m_floats[0] * m_floats[0] + m_floats[1] * m_floats[1] +
           m_floats[2] * m_floats[2] + m_floats[3] * m_floats[3];
  }
};

class Vector3 {
 public:
  tf2Scalar m_floats[3];
  Vector3() : m_floats{0, 0, 0} {}
  Vector3(tf2Scalar x, tf2Scalar y, tf2Scalar z) : m_floats{x, y, z} {}
  tf2Scalar x() const { return m_floats[0]; }
  tf2Scalar y() const { return m_floats[1]; }
  tf2Scalar z() const { return m_floats[2]; }
  // real tf2 Vector3::dot: left-to-right x*x + y*y + z*z
  tf2Scalar dot(const Vector3& v) const {
    return m_floats[0] * v.m_floats[0] + m_floats[1] * v.m_floats[1] +
           m_floats[2] * v.m_floats[2];
  }
};

}  // namespace tf2
