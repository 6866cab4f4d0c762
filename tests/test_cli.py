"""CLI surface: evaluate / playback on a fabricated dataset."""

import json

import numpy as np
import pytest

from groundgrid_tpu.data.semantickitti import write_sequence
from groundgrid_tpu.data.synthetic import synthetic_sequence
from groundgrid_tpu.runtime.cli import _parse_sequences, main


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cli")
    for seq in (0, 1):
        scans = [
            (p, l, T)
            for p, l, T in synthetic_sequence(2, seed=seq, n_beams=10, n_azimuth=180)
        ]
        write_sequence(root, seq, scans)
    return str(root)


COMMON = [
    "--dimension", "24", "--resolution", "0.5", "--max-points", "4096",
]


def test_parse_sequences():
    assert _parse_sequences("00") == ["00"]
    assert _parse_sequences("3") == ["03"]
    assert _parse_sequences("00-03") == ["00", "01", "02", "03"]
    assert _parse_sequences("0,5, 10") == ["00", "05", "10"]


def test_evaluate_single_sequence(dataset_root, capsys):
    rc = main(["evaluate", "--directory", dataset_root, "--sequence", "00"] + COMMON)
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["scans"] == 2
    assert payload["recall"] > 0.8
    assert "IoUg" in out  # reference-format statistics block


def test_evaluate_multi_sequence(dataset_root, capsys):
    rc = main(["evaluate", "--directory", dataset_root, "--sequence", "00-01"] + COMMON)
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["scans"] == 4
    assert set(payload["per_sequence"]) == {"00", "01"}


def test_playback_with_exports(dataset_root, capsys, tmp_path):
    rc = main([
        "playback", "--directory", dataset_root, "--sequence", "00",
        "--export-layers", str(tmp_path / "layers"),
        "--export-terrain", str(tmp_path / "terrain"),
        "--export-every", "1",
    ] + COMMON)
    assert rc == 0
    assert "scans/s" in capsys.readouterr().out
    assert len(list((tmp_path / "layers").glob("*.png"))) > 0
    assert len(list((tmp_path / "terrain").glob("*.npy"))) > 0


def test_render_segmented_cloud():
    from groundgrid_tpu.runtime.viz import render_segmented_cloud

    rng = np.random.default_rng(0)
    x = rng.uniform(-50, 50, 5000)
    y = rng.uniform(-50, 50, 5000)
    labels = rng.choice([49, 99, 0], 5000)
    img = render_segmented_cloud(x, y, labels, (0.0, 0.0))
    assert img.shape == (720, 720, 3)
    assert (img > 0).any()
