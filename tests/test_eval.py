"""Evaluator: byte-equivalent metrics vs hand-computed confusion counts."""

import numpy as np

from groundgrid_tpu.eval.metrics import Evaluator, PRED_GROUND, PRED_NONGROUND


def test_metrics_hand_computed():
    ev = Evaluator("00")
    # 10 road points: 8 predicted ground (TP), 2 non-ground (FN)
    # 5 car points: 3 predicted non-ground (TN), 2 ground (FP)
    # 4 vegetation: 2 ground, 2 non-ground -> excluded from all ratios
    # 3 terrain: 3 ground (TP, additional ground list)
    pred = np.array(
        [49] * 8 + [99] * 2 + [99] * 3 + [49] * 2 + [49, 49, 99, 99] + [49] * 3
    )
    gt = np.array([40] * 10 + [10] * 5 + [70] * 4 + [72] * 3)
    ev.add_cloud(pred, gt)

    m = ev.compute()
    tp, fn, fp, tn = 11, 2, 2, 3
    assert m.true_positive == tp
    assert m.false_negative == fn
    assert m.false_positive == fp
    assert m.true_negative == tn
    assert np.isclose(m.precision, tp / (tp + fp))
    assert np.isclose(m.recall, tp / (tp + fn))
    assert np.isclose(m.f1, 2 * tp / (2 * tp + fp + fn))
    assert np.isclose(m.accuracy, (tp + tn) / (tp + tn + fp + fn))
    # IoUg denominator is FP + *total GT ground points* (13), not TP+FP+FN
    assert np.isclose(m.ioug, tp / (fp + 13))


def test_dropped_points_skipped():
    ev = Evaluator()
    pred = np.array([0, 0, 49, 99])
    gt = np.array([40, 10, 40, 10])
    ev.add_cloud(pred, gt)
    m = ev.compute()
    assert m.true_positive == 1 and m.true_negative == 1
    assert m.gt_ground_total == 1  # dropped road point not counted


def test_vegetation_excluded_from_ratios_but_in_table():
    ev = Evaluator()
    ev.add_cloud(np.array([49, 99]), np.array([70, 70]))
    m = ev.compute()
    assert np.isnan(m.precision) and np.isnan(m.recall)
    rows = {r[0]: r for r in ev.per_label_table()}
    assert rows["vegetation"][4] == 2  # still reported per-label


def test_statistics_format_smoke():
    ev = Evaluator("07")
    rng = np.random.default_rng(0)
    gt = rng.choice([40, 44, 48, 10, 50, 70, 72], size=1000)
    pred = np.where(rng.random(1000) < 0.9, 49, 99)
    ev.add_cloud(pred, gt)
    text = ev.format_statistics()
    assert "Received 1 point clouds. KITTI sequence 07." in text
    assert "Precision" in text and "IoUg" in text
    assert "road" in text


def test_statistics_format_golden_transcript():
    """Byte-for-byte capture test of format_statistics (VERDICT r2 item 9).

    Expected block hand-derived by executing the reference's print logic
    (eval_groundpoint_classifier.py:135-195) on paper for a 3-label cloud:
    gt = 10x road(40), 5x car(10), 4x vegetation(70);
    pred(road) = 9 ground + 1 nonground, pred(car) = 1 ground + 4 nonground,
    pred(vegetation) = 2 ground + 2 nonground.
    => TP=9 FN=1 FP=1 TN=4 (vegetation excluded), gt_ground=10;
    precision=recall=f1=90.00%, accuracy=13/15=86.67%, IoUg=9/11=81.82%.
    Tab-padding quirk: the reference appends the second tab based on the
    *already padded* length, which is equivalent to checking the original
    length (first pad only fires when len < 8 < 15).
    """
    ev = Evaluator("07")
    gt = np.array([40] * 10 + [10] * 5 + [70] * 4, np.int64)
    pred = np.array(
        [49] * 9 + [99] + [49] + [99] * 4 + [49] * 2 + [99] * 2, np.int32
    )
    ev.add_cloud(pred, gt)
    expected = "\n".join([
        "Stats",
        "Received 1 point clouds. KITTI sequence 07.",
        "label\t\t\tnonground %\tground %\tnonground\ttotal",
        "car\t\t\t80.00%\t\t20.00%\t\t4\t\t5",
        "road\t\t\t10.00%\t\t90.00%\t\t1\t\t10",
        "vegetation\t\t50.00%\t\t50.00%\t\t2\t\t4",
        "Precision\t\t90.00%\t\t9\t1",
        "Recall\t\t\t90.00%\t\t9\t1",
        "F1\t\t\t90.00%\t\t1\t\t1",
        "Accuracy\t\t86.67%\t\t13\t15",
        "IoUg\t\t\t81.82%",
    ])
    assert ev.format_statistics() == expected


def test_device_evaluator_matches_host(small_config, small_scans):
    """On-device accumulation == host evaluator, count for count."""
    import jax.numpy as jnp

    from groundgrid_tpu.eval.device import DeviceEvaluator

    rng = np.random.default_rng(4)
    host = Evaluator("09")
    dev = DeviceEvaluator("09")
    for _ in range(3):
        gt = rng.choice([0, 10, 40, 44, 48, 50, 70, 72, 252], size=4000).astype(np.int32)
        pred = rng.choice([0, 49, 99], size=4000, p=[0.05, 0.8, 0.15]).astype(np.int32)
        host.add_cloud(pred, gt)
        dev.add_cloud_device(jnp.asarray(pred), jnp.asarray(gt))
    got = dev.to_host()
    np.testing.assert_array_equal(got.nonground_count, host.nonground_count)
    np.testing.assert_array_equal(got.true_positive, host.true_positive)
    np.testing.assert_array_equal(got.false_positive, host.false_positive)
    np.testing.assert_array_equal(got.total, host.total)
    assert got.compute() == host.compute()


def test_device_evaluator_drain_preserves_counts(small_config):
    """Mid-run drains (int32 device -> int64 host) change nothing observable."""
    import jax.numpy as jnp

    from groundgrid_tpu.eval.device import DeviceEvaluator

    rng = np.random.default_rng(11)
    host = Evaluator("05")
    dev = DeviceEvaluator("05", drain_every=2)  # drain every 2 clouds
    for _ in range(7):  # odd count: final state is mid-interval
        gt = rng.choice([0, 10, 40, 48, 50, 70, 72], size=3000).astype(np.int32)
        pred = rng.choice([0, 49, 99], size=3000, p=[0.05, 0.7, 0.25]).astype(np.int32)
        host.add_cloud(pred, gt)
        dev.add_cloud_device(jnp.asarray(pred), jnp.asarray(gt))
    got = dev.to_host()
    np.testing.assert_array_equal(got.total, host.total)
    np.testing.assert_array_equal(got.true_positive, host.true_positive)
    np.testing.assert_array_equal(got.false_positive, host.false_positive)
    np.testing.assert_array_equal(got.nonground_count, host.nonground_count)
    # to_host is a non-destructive snapshot: counting on works
    gt = np.full(100, 40, np.int32)
    dev.add_cloud_device(jnp.asarray(np.full(100, 49, np.int32)), jnp.asarray(gt))
    host.add_cloud(np.full(100, 49, np.int32), gt)
    np.testing.assert_array_equal(dev.to_host().total, host.total)


def test_device_evaluator_beyond_int32(small_config):
    """Aggregate counts past 2^31 stay exact (VERDICT r2 'weak' #3).

    A real >2^31 run needs ~3e9 points (sequences 00-10); here the host
    table is pre-loaded near the cliff and the device path must carry it
    over exactly -- the int32 device table only ever holds one drain
    interval's worth of counts.
    """
    import jax.numpy as jnp

    from groundgrid_tpu.eval.device import DeviceEvaluator, safe_drain_interval

    dev = DeviceEvaluator("00-10", drain_every=1)
    near = 2**31 - 1000  # within int32 range but about to overflow
    dev.host_counts[40, 3] = near  # total[road]
    dev.host_counts[40, 1] = near  # tp[road]
    for _ in range(3):
        gt = np.full(2000, 40, np.int32)
        pred = np.full(2000, 49, np.int32)
        dev.add_cloud_device(jnp.asarray(pred), jnp.asarray(gt))
    got = dev.to_host()
    assert int(got.total[40]) == near + 6000 > 2**31  # crossed the cliff
    assert int(got.true_positive[40]) == near + 6000
    assert got.total.dtype == np.int64

    # the interval picker leaves >= 8x headroom at any max_points
    for mp in (4096, 131072, 10**6):
        assert safe_drain_interval(mp) * mp * 8 <= 2**31 - 1
        assert safe_drain_interval(mp) >= 1


def test_evaluate_records_end_to_end(small_config, small_scans):
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.runtime.evaluate import evaluate_records

    records = []
    for k, (pts, lbl, T) in enumerate(small_scans):
        records.append(ScanRecord(
            index=k, timestamp=0.1 * k,
            points=np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1),
            labels=lbl, t_map_velo=T,
        ))
    ev, stats = evaluate_records(small_config, records, "00", progress_every=0)
    m = ev.compute()
    assert ev.clouds == len(records)
    assert m.recall > 0.9


def test_baseline_comparison_table():
    from groundgrid_tpu.eval.baseline import (
        REFERENCE_SEQ00, format_baseline_comparison,
    )

    # exact parity -> PASS
    out = format_baseline_comparison(dict(REFERENCE_SEQ00), scans=4540)
    assert "PASS" in out and "NO" not in out
    # beating the reference -> PASS even beyond the 0.5pt band
    better = {k: min(1.0, v + 0.02) for k, v in REFERENCE_SEQ00.items()}
    assert "PASS" in format_baseline_comparison(better, scans=4540)
    # a metric >0.5pt below -> FAIL
    worse = dict(REFERENCE_SEQ00)
    worse["ioug"] -= 0.006
    out = format_baseline_comparison(worse, scans=4540)
    assert "FAIL" in out and "NO" in out
    # partial-run note
    assert "not directly comparable" in format_baseline_comparison(
        dict(REFERENCE_SEQ00), scans=100
    )
