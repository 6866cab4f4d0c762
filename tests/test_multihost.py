"""Multi-host fleet layer, exercised single-process on the virtual CPU mesh.

``jax.make_array_from_process_local_data`` / ``process_allgather`` at
``process_count() == 1`` run the same code paths a real multi-host job runs
per process; cross-host correctness is then XLA's DCN collectives, which we
cannot exercise here (SURVEY.md section 5.8).
"""

import numpy as np
import pytest
import jax

from groundgrid_tpu.parallel.multihost import (
    MultiHostFleet,
    aggregate_host_counts,
    all_hosts_agree,
    init_multihost,
)


@pytest.fixture(scope="module")
def fleet_setup(small_config):
    import dataclasses

    from groundgrid_tpu.data.synthetic import make_scene, render_scan, vehicle_pose
    from groundgrid_tpu.pipeline import init_state, pad_scan

    cfg = dataclasses.replace(small_config, use_pallas=False)
    scene = make_scene(0, extent=60.0)
    n_dev = len(jax.devices())
    scans, states = [], []
    for k in range(n_dev):
        T = vehicle_pose(scene, k, step_m=1.0)
        pts, lbl = render_scan(scene, T, n_beams=12, n_azimuth=256, seed=k)
        scans.append(pad_scan(cfg, pts, lbl, T))
        states.append(init_state(cfg, T.astype(np.float32)))
    batched = jax.tree.map(lambda *xs: np.stack(xs), *scans)
    bstates = jax.tree.map(lambda *xs: np.stack(xs), *states)
    return cfg, bstates, batched


def test_init_multihost_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False
    assert jax.process_count() == 1


def test_fleet_shard_info(fleet_setup):
    cfg, _, _ = fleet_setup
    fleet = MultiHostFleet(cfg, vehicles_per_device=1)
    n = len(jax.devices())
    assert fleet.info.global_batch == n
    assert fleet.info.local_batch == n  # single process owns all devices
    assert fleet.info.process_count == 1


def test_multihost_fleet_matches_single_host(fleet_setup):
    """Global-mesh step == single-host fleet step on identical inputs."""
    from groundgrid_tpu.parallel.sharding import (
        make_fleet_step, make_mesh, shard_fleet_pytree,
    )

    cfg, bstates, batched = fleet_setup

    fleet = MultiHostFleet(cfg, vehicles_per_device=1)
    gs = fleet.from_local(bstates)
    gsc = fleet.from_local(batched)
    s1, out1, sum1 = fleet.step(gs, gsc)

    mesh = make_mesh()
    ref_step = make_fleet_step(cfg, mesh)
    s2, out2, sum2 = ref_step(
        shard_fleet_pytree(bstates, mesh), shard_fleet_pytree(batched, mesh)
    )

    np.testing.assert_array_equal(np.asarray(out1.labels), np.asarray(out2.labels))
    np.testing.assert_array_equal(
        np.asarray(sum1.ground_points), np.asarray(sum2.ground_points)
    )
    local = fleet.to_local(out1)
    assert local.labels.shape[0] == fleet.info.global_batch
    np.testing.assert_array_equal(local.labels, np.asarray(out2.labels))


def test_from_local_shape_guard(fleet_setup):
    cfg, bstates, _ = fleet_setup
    fleet = MultiHostFleet(cfg, vehicles_per_device=1)
    bad = jax.tree.map(lambda x: np.asarray(x)[:1], bstates)
    with pytest.raises(ValueError, match="local_batch"):
        fleet.from_local(bad)


def test_host_count_aggregation():
    counts = np.arange(12).reshape(3, 4)
    np.testing.assert_array_equal(aggregate_host_counts(counts), counts)
    assert all_hosts_agree(7)
