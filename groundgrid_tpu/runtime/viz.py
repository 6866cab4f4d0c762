"""Grid-layer visualization: PNG export, colormaps, terrain artifact.

ROS-free replacement for the reference's image publishers
(``GroundGridNodelet.cpp:219-291``): per-layer colormapped images (the
reference uses OpenCV's TWILIGHT colormap on min/max-normalized layers,
:240-245) and the special 3-channel float "terrain" artifact (height,
3x3-coverage flag, point count) whose filename encodes ``seq_x_y`` just as the
reference encoded them in the image frame_id (:286-288).

PNG writing is dependency-free (stdlib zlib); no OpenCV/PIL needed.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    chunk = tag + data
    return struct.pack(">I", len(data)) + chunk + struct.pack(">I", zlib.crc32(chunk))


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG (no external deps)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += _png_chunk(b"IDAT", zlib.compress(raw, 6))
    out += _png_chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


def _twilight_colormap() -> np.ndarray:
    """A 256x3 cyclic colormap approximating OpenCV's COLORMAP_TWILIGHT.

    Piecewise-smooth cyclic ramp (white -> blue -> black -> red -> white);
    visual purpose only (the reference uses it for layer debugging images).
    """
    t = np.linspace(0.0, 2.0 * np.pi, 256)
    r = 0.55 + 0.45 * np.cos(t)
    b = 0.55 + 0.45 * np.cos(t - np.pi / 2)
    g = 0.45 + 0.40 * np.cos(t - np.pi / 4)
    lut = np.stack([r, g, b], axis=-1)
    return np.clip(lut * 255.0, 0, 255).astype(np.uint8)


_TWILIGHT = _twilight_colormap()


def layer_to_rgb(layer: np.ndarray) -> np.ndarray:
    """Min/max normalize a float layer and apply the colormap.

    Mirrors grid_map's toImage<uchar,1> + applyColorMap
    (GroundGridNodelet.cpp:240-241). Non-finite cells render black.
    """
    a = np.asarray(layer, np.float64)
    finite = np.isfinite(a)
    if finite.any():
        lo = a[finite].min()
        hi = a[finite].max()
        scale = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
    else:
        scale = np.zeros_like(a)
    idx = np.clip((scale * 255.0), 0, 255).astype(np.uint8)
    rgb = _TWILIGHT[idx]
    rgb[~finite] = 0
    return rgb


def export_layers(layers: dict, out_dir: str, prefix: str = "") -> list[str]:
    """Dump every grid layer as a colormapped PNG (one per layer)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, layer in layers.items():
        p = os.path.join(out_dir, f"{prefix}{name}.png")
        write_png(p, layer_to_rgb(np.asarray(layer)))
        paths.append(p)
    return paths


def render_segmented_cloud(
    x: np.ndarray,
    y: np.ndarray,
    labels: np.ndarray,
    center_xy,
    extent: float = 60.0,
    size: int = 720,
) -> np.ndarray:
    """Top-down image of a segmented cloud (the RViz display substitute).

    The reference visualizes the segmented cloud in RViz colored by the
    intensity channel (rviz/groundgrid.rviz); this renders the same view as
    an (size, size, 3) uint8 image: ground points green, non-ground red,
    outliers/dropped dim gray, ego-centered.
    """
    img = np.zeros((size, size, 3), np.uint8)
    scale = size / (2.0 * extent)
    u = ((center_xy[0] + extent - np.asarray(x)) * scale).astype(np.int64)
    v = ((center_xy[1] + extent - np.asarray(y)) * scale).astype(np.int64)
    ok = (u >= 0) & (u < size) & (v >= 0) & (v < size)
    lab = np.asarray(labels)
    colors = {49: (40, 220, 60), 99: (230, 50, 50), 0: (80, 80, 80)}
    for value, color in colors.items():
        m = ok & (lab == value)
        img[u[m], v[m]] = color
    return img


def terrain_artifact(ground: np.ndarray, points_raw: np.ndarray) -> np.ndarray:
    """The reference's 32FC3 terrain image (GroundGridNodelet.cpp:247-270).

    Channels: [terrain height, 3x3-coverage flag (block sum of pointsRaw
    >= 27), per-cell raw point count].
    """
    g = np.asarray(ground, np.float32)
    pr = np.asarray(points_raw, np.float32)
    n = pr.shape[0]
    padded = np.zeros((n + 2, n + 2), np.float32)
    padded[1:-1, 1:-1] = pr
    block = sum(
        padded[1 + di : n + 1 + di, 1 + dj : n + 1 + dj]
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    )
    coverage = (block >= 27.0).astype(np.float32)
    return np.stack([g, coverage, pr], axis=-1)


def save_terrain_artifact(
    path_dir: str, ground, points_raw, seq: int, utm_x: float, utm_y: float
) -> str:
    """Persist the terrain artifact with the seq+position encoding (:287)."""
    os.makedirs(path_dir, exist_ok=True)
    arr = terrain_artifact(ground, points_raw)
    path = os.path.join(path_dir, f"{seq}_{utm_x:.6f}_{utm_y:.6f}.npy")
    np.save(path, arr)
    return path
