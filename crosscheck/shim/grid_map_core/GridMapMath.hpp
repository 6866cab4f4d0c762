// GridMapMath shim (crosscheck harness): math lives in grid_map_core.hpp.
#pragma once
#include <grid_map_core/grid_map_core.hpp>
