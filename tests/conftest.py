"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md section 4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Hard override: the surrounding environment may preset JAX_PLATFORMS to a
# real accelerator AND import jax at interpreter startup (sitecustomize), so
# env vars alone are too late -- use jax.config before any backend is used.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"tests need the 8-device virtual CPU mesh, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from groundgrid_tpu.config import GroundGridConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_config() -> GroundGridConfig:
    """Fast grid for golden-vs-JAX comparisons: 80x80 cells, 40m."""
    return GroundGridConfig(
        dimension=40.0, resolution=0.5, max_points=16384, ray_steps=40,
        max_outlier_candidates=1024,
    )


@pytest.fixture(scope="session")
def default_config() -> GroundGridConfig:
    return GroundGridConfig()


@pytest.fixture(scope="session")
def small_scans(small_config):
    """Three consecutive synthetic scans sized for the small grid."""
    from groundgrid_tpu.data.synthetic import synthetic_sequence

    out = list(
        synthetic_sequence(3, seed=7, n_beams=24, n_azimuth=720, step_m=1.5)
    )
    for pts, lbl, T in out:
        assert pts.shape[0] <= small_config.max_points, pts.shape
    return out


def assert_layers_close(a: np.ndarray, b: np.ndarray, name: str, atol=1e-4, rtol=1e-4):
    a = np.asarray(a)
    b = np.asarray(b)
    if not np.allclose(a, b, atol=atol, rtol=rtol, equal_nan=True):
        bad = ~np.isclose(a, b, atol=atol, rtol=rtol, equal_nan=True)
        idx = np.argwhere(bad)[:10]
        raise AssertionError(
            f"layer {name}: {bad.sum()}/{bad.size} cells differ; first at "
            f"{idx.tolist()}: {a[bad][:5]} vs {b[bad][:5]}"
        )
