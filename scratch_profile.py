"""Per-stage TPU timing of the pipeline."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import rasterize as rasterlib, outliers as outlierlib
from groundgrid_tpu.core import detect as detectlib, interpolate as interplib, classify as classifylib
from groundgrid_tpu.core import grid as gridlib, transforms as tf
from groundgrid_tpu.pipeline import init_state, pad_scan
from groundgrid_tpu.data.synthetic import make_scene, render_scan, vehicle_pose

cfg = GroundGridConfig()
scene = make_scene(0)
pose = vehicle_pose(scene, 1)
pts, lbl = render_scan(scene, pose, n_beams=64, n_azimuth=2048, seed=1)
scan = pad_scan(cfg, pts, lbl, pose)
state = init_state(cfg, vehicle_pose(scene, 0).astype(np.float32))
tables = detectlib.make_tables(cfg)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:22s} {dt:8.3f} ms")
    return out

points_map = jax.jit(lambda s: tf.transform_points(s.t_map_velo, s.points))(scan)
origin = scan.t_map_velo[:3, 3]

f_move = jax.jit(lambda st, s: gridlib.move(cfg, st, s.t_map_velo[:2, 3], s.t_base_map))
state2 = timeit("move", f_move, state, scan)

f_bin = jax.jit(lambda c, p, r, v, o: rasterlib.bin_points(cfg, c, p, r, v, o))
binning = timeit("bin_points", f_bin, state2.center, points_map, scan.rings, scan.valid, origin)

f_out = jax.jit(lambda c, g, gp, b, p, o: outlierlib.detect_outliers(cfg, c, g, gp, b, p, o))
outlier = timeit("outliers", f_out, state2.center, state2.ground, state2.groundpatch, binning, points_map, origin)

accept = binning.inmap & ~binning.ignored & ~outlier
f_rast = jax.jit(lambda b, p, o, a: rasterlib.rasterize(cfg, b, p, o, a))
raster = timeit("rasterize", f_rast, binning, points_map, origin, accept)

f_det = jax.jit(lambda pts_, var, mn, g, gp: detectlib.detect_ground_patches(cfg, tables, pts_, var, mn, g, gp))
g2, c2 = timeit("detect", f_det, raster.points, raster.variance, raster.min_ground_height, state2.ground, state2.groundpatch)

f_interp = jax.jit(lambda g, c, z: interplib.spiral_interpolation(cfg, g, c, z))
g3, c3 = timeit("interpolate", f_interp, g2, c2, scan.t_map_base[2, 3])

f_cls = jax.jit(lambda b, p, g, v, o: classifylib.classify(cfg, b, p, g, v, o))
timeit("classify", f_cls, binning, points_map, g3, raster.variance, outlier)

f_tx = jax.jit(lambda s: tf.transform_points(s.t_map_velo, s.points))
timeit("transform", f_tx, scan)
