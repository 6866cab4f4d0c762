// pcl_conversions shim (crosscheck harness): included by the reference
// header, never used by the compiled sources (the harness feeds
// pcl::PointCloud directly; there is no ROS message boundary).
#pragma once
