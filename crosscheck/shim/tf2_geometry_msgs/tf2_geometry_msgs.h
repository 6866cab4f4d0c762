// tf2_geometry_msgs shim (crosscheck harness): doTransform(PointStamped)
// exactly as upstream -- quaternion -> Matrix3x3 basis (setRotation) applied
// in double precision, plus translation.
#pragma once
#include <geometry_msgs/PointStamped.h>
#include <geometry_msgs/TransformStamped.h>
#include <tf2/LinearMath/Matrix3x3.h>
#include <tf2/LinearMath/Quaternion.h>

namespace tf2 {

inline void fromMsg(const geometry_msgs::Transform& in, Transform& out) {
  out.m_basis.setRotation(Quaternion(in.rotation.x, in.rotation.y,
                                     in.rotation.z, in.rotation.w));
  out.m_origin = Vector3(in.translation.x, in.translation.y, in.translation.z);
}

inline void doTransform(const geometry_msgs::PointStamped& t_in,
                        geometry_msgs::PointStamped& t_out,
                        const geometry_msgs::TransformStamped& transform) {
  Transform t;
  fromMsg(transform.transform, t);
  const Vector3 v_in(t_in.point.x, t_in.point.y, t_in.point.z);
  const Vector3 v_out = t * v_in;
  t_out.point.x = v_out.x();
  t_out.point.y = v_out.y();
  t_out.point.z = v_out.z();
  t_out.header.stamp = t_in.header.stamp;
  t_out.header.frame_id = transform.header.frame_id;
}

}  // namespace tf2
