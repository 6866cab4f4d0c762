// tf2 Matrix3x3 shim (crosscheck harness): setRotation exactly as upstream
// tf2 (bullet LinearMath), including the s = 2/d normalization.
#pragma once
#include <tf2/LinearMath/Quaternion.h>

namespace tf2 {

class Matrix3x3 {
 public:
  Vector3 m_el[3];

  Matrix3x3() = default;
  explicit Matrix3x3(const Quaternion& q) { setRotation(q); }

  void setValue(tf2Scalar xx, tf2Scalar xy, tf2Scalar xz, tf2Scalar yx,
                tf2Scalar yy, tf2Scalar yz, tf2Scalar zx, tf2Scalar zy,
                tf2Scalar zz) {
    m_el[0] = Vector3(xx, xy, xz);
    m_el[1] = Vector3(yx, yy, yz);
    m_el[2] = Vector3(zx, zy, zz);
  }

  void setRotation(const Quaternion& q) {
    const tf2Scalar d = q.length2();
    const tf2Scalar s = tf2Scalar(2.0) / d;
    const tf2Scalar xs = q.x() * s, ys = q.y() * s, zs = q.z() * s;
    const tf2Scalar wx = q.w() * xs, wy = q.w() * ys, wz = q.w() * zs;
    const tf2Scalar xx = q.x() * xs, xy = q.x() * ys, xz = q.x() * zs;
    const tf2Scalar yy = q.y() * ys, yz = q.y() * zs, zz = q.z() * zs;
    setValue(tf2Scalar(1.0) - (yy + zz), xy - wz, xz + wy, xy + wz,
             tf2Scalar(1.0) - (xx + zz), yz - wx, xz - wy, yz + wx,
             tf2Scalar(1.0) - (xx + yy));
  }

  const Vector3& operator[](int i) const { return m_el[i]; }
};

// tf2::Transform slice: basis * v + origin, per-axis row dot + add (the
// upstream Transform::operator() structure).
class Transform {
 public:
  Matrix3x3 m_basis;
  Vector3 m_origin;

  Vector3 operator()(const Vector3& x) const {
    return Vector3(m_basis[0].dot(x) + m_origin.x(),
                   m_basis[1].dot(x) + m_origin.y(),
                   m_basis[2].dot(x) + m_origin.z());
  }
  Vector3 operator*(const Vector3& x) const { return (*this)(x); }
};

}  // namespace tf2
