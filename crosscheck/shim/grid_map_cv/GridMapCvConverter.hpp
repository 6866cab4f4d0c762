// grid_map_cv shim (crosscheck harness): included by the reference sources,
// never used by them (image publishing lives in the nodelet, not compiled).
#pragma once
