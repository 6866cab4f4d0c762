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


def test_evaluate_wire_flag(dataset_root, capsys):
    """--wire (s16 quantized ingest) stays within quantization noise of f32."""
    rc = main(["evaluate", "--directory", dataset_root, "--sequence", "00"]
              + COMMON)
    assert rc == 0
    base = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc = main(["evaluate", "--directory", dataset_root, "--sequence", "00",
               "--wire"] + COMMON)
    assert rc == 0
    wire = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert wire["scans"] == base["scans"]
    for k in ("precision", "recall", "f1", "ioug"):
        assert abs(wire[k] - base[k]) < 0.01, (k, wire[k], base[k])


def test_playback_wire_flag(dataset_root, capsys):
    rc = main(["playback", "--directory", dataset_root, "--sequence", "00",
               "--wire"] + COMMON)
    assert rc == 0
    assert "scan 0:" in capsys.readouterr().out


@pytest.fixture(scope="module")
def eleven_seq_root(tmp_path_factory):
    """An 11-'sequence' dataset: the BASELINE config-3 aggregate in miniature."""
    root = tmp_path_factory.mktemp("kitti_00_10")
    for seq in range(11):
        scans = [
            (p, l, T)
            for p, l, T in synthetic_sequence(2, seed=100 + seq, n_beams=10,
                                              n_azimuth=180)
        ]
        write_sequence(root, seq, scans)
    return str(root)


def test_evaluate_00_10_aggregate_host_vs_device(eleven_seq_root, capsys):
    """BASELINE config 3 path: 'evaluate --sequence 00-10' host vs on-device.

    The two scoring backends (per-scan host fetch vs int32 device table with
    int64 host drains) must agree on the aggregate confusion exactly; the
    >2^31 half of the story is covered by
    test_eval.py::test_device_evaluator_beyond_int32 (count injection).
    """
    rc = main(["evaluate", "--directory", eleven_seq_root,
               "--sequence", "00-10"] + COMMON)
    assert rc == 0
    host = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert host["scans"] == 22
    assert set(host["per_sequence"]) == {f"{s:02d}" for s in range(11)}

    rc = main(["evaluate", "--directory", eleven_seq_root,
               "--sequence", "00-10", "--on-device-eval"] + COMMON)
    assert rc == 0
    dev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("true_positive", "true_negative", "false_positive",
              "false_negative", "gt_ground_total", "scans"):
        assert dev[k] == host[k], (k, dev[k], host[k])


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


def test_evaluate_pipelined_matches_sync(long_dataset_root, capsys):
    """--pipeline-depth changes no counts (bitwise-equal labels, same GT)."""
    rc = main(["evaluate", "--directory", long_dataset_root, "--sequence", "00"]
              + COMMON)
    assert rc == 0
    want = _eval_payload(capsys)
    rc = main(["evaluate", "--directory", long_dataset_root, "--sequence", "00",
               "--pipeline-depth", "2"] + COMMON)
    assert rc == 0
    got = _eval_payload(capsys)
    for key in ("scans", "true_positive", "false_positive", "true_negative",
                "false_negative", "gt_ground_total"):
        assert got[key] == want[key], key


def test_pipeline_depth_checkpoint_exclusive(long_dataset_root, capsys, tmp_path):
    for cmd in ("evaluate", "playback"):
        rc = main([cmd, "--directory", long_dataset_root, "--sequence", "00",
                   "--pipeline-depth", "2",
                   "--checkpoint", str(tmp_path / "x.npz")] + COMMON)
        assert rc == 2
        assert "mutually exclusive" in capsys.readouterr().err


def test_playback_export_html(dataset_root, capsys, tmp_path):
    out_html = tmp_path / "seq.html"
    rc = main([
        "playback", "--directory", dataset_root, "--sequence", "00",
        "--export-html", str(out_html), "--html-every", "1",
    ] + COMMON)
    assert rc == 0
    assert "2-frame player" in capsys.readouterr().out
    html = out_html.read_text()
    assert html.count("data:image/png;base64,") == 2
    assert "groundgrid-tpu seq 00" in html


def test_live_server_follow_protocol():
    """LiveServer append/follow protocol: late join, incremental fetch, done."""
    import json as _json
    import urllib.request

    from groundgrid_tpu.runtime.live import LiveServer

    live = LiveServer(port=0, keep=3, size=64).start()  # port 0: ephemeral
    try:
        base = live.url

        def get(path):
            with urllib.request.urlopen(base.rstrip("/") + path, timeout=5) as r:
                return _json.loads(r.read())

        assert get("/status") == {"total": 0, "done": False}
        rng = np.random.default_rng(0)
        for k in range(5):
            live.add(rng.uniform(-10, 10, 50), rng.uniform(-10, 10, 50),
                     np.full(50, 49, np.int32), np.zeros(2), caption=f"s{k}")
        # late joiner: ring kept only the last 3 frames
        d = get("/frames?since=0")
        assert d["next"] == 5 and d["start"] == 2
        assert len(d["frames"]) == 3 and d["captions"] == ["s2", "s3", "s4"]
        assert d["frames"][0].startswith("data:image/png;base64,")
        # incremental fetch: nothing new
        d = get("/frames?since=5")
        assert d["frames"] == [] and d["next"] == 5
        live.finish()
        assert get("/status")["done"] is True
        # the player page is served
        with urllib.request.urlopen(base, timeout=5) as r:
            assert b"groundgrid-tpu live" in r.read()
    finally:
        live.stop()


def test_sequence_recorder_embed_3d(tmp_path):
    """Offline player: sparse packed-cloud embedding + 3-D toggle assets."""
    from groundgrid_tpu.runtime.viz import SequenceRecorder

    rng = np.random.default_rng(2)
    rec = SequenceRecorder(size=64, embed_3d_every=2, max_3d=3)
    n = 200
    for k in range(8):
        rec.add(rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                np.full(n, 49, np.int32), np.zeros(2),
                z=rng.uniform(-1, 1, n).astype(np.float32), z0=0.0,
                layer=rng.uniform(-1, 1, (8, 8)).astype(np.float32),
                resolution=0.5)
    # every 2nd recorded frame, capped at max_3d=3
    assert sorted(rec.clouds) == [0, 2, 4]
    out = tmp_path / "p.html"
    rec.write_html(str(out))
    html = out.read_text()
    assert "gg3dView" in html and '"terrain"' in html
    # without z, no clouds and the (hidden) button stays hidden client-side
    rec2 = SequenceRecorder(size=64)
    rec2.add(np.zeros(4), np.zeros(4), np.full(4, 49, np.int32), np.zeros(2))
    rec2.write_html(str(tmp_path / "p2.html"))
    assert "__CLOUDS__" not in (tmp_path / "p2.html").read_text()


def test_live_server_cloud3d_endpoint():
    """3-D toggle data path: pack round-trip + /cloud nearest-retained ring."""
    import base64
    import json as _json
    import urllib.request

    from groundgrid_tpu.runtime.live import LiveServer
    from groundgrid_tpu.runtime.viz import pack_cloud_3d

    rng = np.random.default_rng(1)
    n = 500
    x = rng.uniform(-50, 50, n).astype(np.float32) + 100.0
    y = rng.uniform(-50, 50, n).astype(np.float32) - 40.0
    z = rng.uniform(-2, 3, n).astype(np.float32) + 7.0
    lab = rng.choice([0, 49, 99], n).astype(np.int32)
    ground = rng.uniform(6.5, 7.5, (12, 12)).astype(np.float32)
    center = np.array([100.0, -40.0])

    # packer round-trip: int16 centimetres of the ego-relative coords
    d = pack_cloud_3d(x, y, z, lab, center, z0=7.0, ground=ground,
                      resolution=0.5, max_points=1000)
    assert d["n"] == n and d["stride"] == 1
    dx = np.frombuffer(base64.b64decode(d["x"]), np.int16)
    dz = np.frombuffer(base64.b64decode(d["z"]), np.int16)
    np.testing.assert_allclose(dx / 100.0, x - 100.0, atol=0.006)
    np.testing.assert_allclose(dz / 100.0, z - 7.0, atol=0.006)
    dl = np.frombuffer(base64.b64decode(d["lab"]), np.uint8)
    np.testing.assert_array_equal(dl, lab.astype(np.uint8))
    t = d["terrain"]
    # grid_map convention: index 0 = max-position corner -> negative step
    assert t["n"] == 12 and t["step_cm"] == -50.0
    th = np.frombuffer(base64.b64decode(t["h"]), np.int16)
    np.testing.assert_allclose(th.reshape(12, 12) / 100.0, ground - 7.0,
                               atol=0.006)
    # subsampling cap
    d2 = pack_cloud_3d(x, y, z, lab, center, z0=7.0, max_points=100)
    assert d2["stride"] == 5 and d2["n"] == 100

    # endpoint: keep3d eviction + nearest-retained-at-or-before semantics
    live = LiveServer(port=0, keep=8, keep3d=2, size=64).start()
    try:
        def get(path):
            url = live.url.rstrip("/") + path
            with urllib.request.urlopen(url, timeout=5) as r:
                return _json.loads(r.read())

        for k in range(4):
            live.add(x, y, lab, center, z=z, z0=7.0, layer=ground,
                     resolution=0.5)
        assert get("/cloud?i=3")["frame"] == 3
        assert get("/cloud?i=99")["frame"] == 3  # nearest at-or-before
        assert get("/cloud?i=2")["frame"] == 2
        assert get("/cloud?i=1") is None  # evicted (keep3d=2)
        got = get("/cloud?i=3")
        assert got["n"] == n and "terrain" in got
    finally:
        live.stop()


def test_playback_serve_live(dataset_root, capsys):
    """--serve drives the live viewer during a real playback run."""
    import threading
    import urllib.request

    from groundgrid_tpu.runtime import live as livemod

    seen = {}
    orig_start = livemod.LiveServer.start

    def spy_start(self):
        seen["server"] = self
        return orig_start(self)

    livemod.LiveServer.start = spy_start
    try:
        rc = main(["playback", "--directory", dataset_root, "--sequence", "00",
                   "--serve", "0", "--serve-linger", "0", "--html-every", "1"]
                  + COMMON)
    finally:
        livemod.LiveServer.start = orig_start
    assert rc == 0
    assert seen["server"]._total == 2  # both scans published
    assert seen["server"]._done


def test_sequence_recorder_capacity():
    from groundgrid_tpu.runtime.viz import SequenceRecorder

    rec = SequenceRecorder(size=64, max_frames=2)
    x = np.zeros(10)
    labels = np.full(10, 49)
    assert rec.add(x, x, labels, (0.0, 0.0), caption="a")
    assert rec.add(x, x, labels, (0.0, 0.0))
    assert not rec.add(x, x, labels, (0.0, 0.0))
    assert rec.dropped == 1 and len(rec.frames) == 2


def test_render_segmented_cloud():
    from groundgrid_tpu.runtime.viz import render_segmented_cloud

    rng = np.random.default_rng(0)
    x = rng.uniform(-50, 50, 5000)
    y = rng.uniform(-50, 50, 5000)
    labels = rng.choice([49, 99, 0], 5000)
    img = render_segmented_cloud(x, y, labels, (0.0, 0.0))
    assert img.shape == (720, 720, 3)
    assert (img > 0).any()


@pytest.fixture(scope="module")
def long_dataset_root(tmp_path_factory):
    """Six-scan single sequence for window/resume tests (dt = 0.1 s)."""
    root = tmp_path_factory.mktemp("kitti_cli_long")
    scans = [
        (p, l, T)
        for p, l, T in synthetic_sequence(6, seed=5, n_beams=10, n_azimuth=180)
    ]
    write_sequence(root, 0, scans)
    return str(root)


def _eval_payload(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.mark.parametrize("native", [False, True])
def test_evaluate_start_end_window(long_dataset_root, capsys, native):
    """--start/--end select the same scan window on every loader path."""
    extra = ["--native-loader"] if native else []
    rc = main([
        "evaluate", "--directory", long_dataset_root, "--sequence", "00",
        "--start", "0.15", "--end", "0.45",
    ] + COMMON + extra)
    assert rc == 0
    payload = _eval_payload(capsys)
    assert payload["scans"] == 3  # t = 0.2, 0.3, 0.4


def test_evaluate_resume_bitwise(long_dataset_root, capsys, tmp_path):
    """checkpoint at scan 3 + resume == uninterrupted run, count-exact."""
    full = main([
        "evaluate", "--directory", long_dataset_root, "--sequence", "00",
    ] + COMMON)
    assert full == 0
    want = _eval_payload(capsys)

    ckpt = str(tmp_path / "state.npz")
    rc = main([
        "evaluate", "--directory", long_dataset_root, "--sequence", "00",
        "--end", "0.25",  # stop after scan index 2 (t=0.2)
        "--checkpoint", ckpt, "--checkpoint-every", "3",
    ] + COMMON)
    assert rc == 0
    _ = capsys.readouterr()

    rc = main([
        "evaluate", "--directory", long_dataset_root, "--sequence", "00",
        "--checkpoint", ckpt, "--resume",
    ] + COMMON)
    assert rc == 0
    got = _eval_payload(capsys)
    for key in ("scans", "true_positive", "false_positive", "true_negative",
                "false_negative", "gt_ground_total"):
        assert got[key] == want[key], key


def test_playback_resume(long_dataset_root, capsys, tmp_path):
    ckpt = str(tmp_path / "play.npz")
    rc = main([
        "playback", "--directory", long_dataset_root, "--sequence", "00",
        "--end", "0.35", "--checkpoint", ckpt, "--checkpoint-every", "2",
    ] + COMMON)
    assert rc == 0
    first = capsys.readouterr().out.count("scan ")
    rc = main([
        "playback", "--directory", long_dataset_root, "--sequence", "00",
        "--checkpoint", ckpt, "--resume",
    ] + COMMON)
    assert rc == 0
    out = capsys.readouterr().out
    assert first == 4 and out.count("scan ") == 2  # resumes at scan 4
