"""Confusion-matrix / mIoU accounting parity: device path vs numpy reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from maxsquareloss_tpu.metrics import (
    SYNTHIA_SET_13,
    SYNTHIA_SET_16,
    Eval,
    confusion_matrix_update,
)

C = 19


def _reference_cm(gt, pred, c):
    mask = (gt >= 0) & (gt < c)
    label = c * gt[mask].astype(np.int64) + pred[mask]
    return np.bincount(label, minlength=c * c).reshape(c, c)


def test_device_cm_matches_bincount(rng):
    gt = rng.integers(-1, C, size=(2, 33, 65)).astype(np.int32)
    pred = rng.integers(0, C, size=(2, 33, 65)).astype(np.int32)
    got = np.asarray(confusion_matrix_update(jnp.asarray(gt), jnp.asarray(pred), C))
    np.testing.assert_array_equal(got, _reference_cm(gt, pred, C))


def test_eval_numpy_path_and_device_path_agree(rng):
    ev_np, ev_dev = Eval(C), Eval(C)
    for _ in range(3):
        gt = rng.integers(-1, C, size=(1, 17, 23)).astype(np.int32)
        pred = rng.integers(0, C, size=(1, 17, 23)).astype(np.int32)
        ev_np.add_batch(gt, pred)
        ev_dev.add_confusion_matrix(
            np.asarray(confusion_matrix_update(jnp.asarray(gt), jnp.asarray(pred), C))
        )
    np.testing.assert_array_equal(ev_np.confusion_matrix, ev_dev.confusion_matrix)


def test_metric_formulas(rng):
    ev = Eval(C)
    gt = rng.integers(-1, C, size=(4, 31, 37)).astype(np.int32)
    pred = rng.integers(0, C, size=(4, 31, 37)).astype(np.int32)
    ev.add_batch(gt, pred)
    cm = ev.confusion_matrix
    assert ev.Pixel_Accuracy() == pytest.approx(np.diag(cm).sum() / cm.sum())
    iu = np.diag(cm) / (cm.sum(1) + cm.sum(0) - np.diag(cm))
    assert ev.Mean_Intersection_over_Union() == pytest.approx(np.nanmean(iu))
    assert ev.Mean_Intersection_over_Union_16() == pytest.approx(
        np.nanmean(iu[SYNTHIA_SET_16])
    )
    assert ev.Mean_Intersection_over_Union_13() == pytest.approx(
        np.nanmean(iu[SYNTHIA_SET_13])
    )
    freq = cm.sum(1) / cm.sum()
    assert ev.Frequency_Weighted_Intersection_over_Union() == pytest.approx(
        (freq[freq > 0] * iu[freq > 0]).sum()
    )
    acc = np.diag(cm) / cm.sum(1)
    assert ev.Mean_Pixel_Accuracy() == pytest.approx(np.nanmean(acc))


def test_perfect_prediction_gives_miou_1(rng):
    ev = Eval(C)
    gt = rng.integers(0, C, size=(1, 64, 64)).astype(np.int32)
    ev.add_batch(gt, gt.copy())
    assert ev.Mean_Intersection_over_Union() == pytest.approx(1.0)
    assert ev.Pixel_Accuracy() == pytest.approx(1.0)


def test_absent_class_is_nan_not_zero():
    ev = Eval(C)
    gt = np.zeros((1, 8, 8), dtype=np.int32)   # only class 0 present
    ev.add_batch(gt, gt.copy())
    iu = ev._iou_per_class()
    assert iu[0] == 1.0 and np.isnan(iu[5])
    assert ev.Mean_Intersection_over_Union() == pytest.approx(1.0)  # nanmean


def test_synthia_sets():
    assert len(SYNTHIA_SET_16) == 16
    assert len(SYNTHIA_SET_13) == 13
    assert set(SYNTHIA_SET_16) - set(SYNTHIA_SET_13) == {3, 4, 5}


def test_per_class_table():
    ev = Eval(C)
    gt = np.zeros((1, 8, 8), dtype=np.int32)
    ev.add_batch(gt, gt.copy())
    table = ev.Print_Every_class_Eval()
    assert "road" in table and "bicycle" in table
