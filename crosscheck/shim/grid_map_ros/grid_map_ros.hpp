// grid_map_ros shim (crosscheck harness): the reference only needs the core
// types; ROS conversions are never called by the compiled sources.
#pragma once
#include <grid_map_core/grid_map_core.hpp>
// the real grid_map_ros pulls in roscpp; the reference headers rely on that
#include <ros/ros.h>
