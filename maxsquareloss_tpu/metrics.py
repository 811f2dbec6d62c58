"""mIoU / pixel-accuracy accounting, device-side confusion matrix.

Rebuild of the reference's ``utils/eval.py`` ``Eval`` class (SURVEY.md C13):
CxC confusion matrix accumulated over batches with
``bincount(C*gt + pred)``-style counting over pixels where ``gt in [0, C)``,
then PA / MPA / MIoU / FWIoU / mean-precision and the SYNTHIA 16/13-class
protocol masks. The batch update runs on device as a one-hot matmul (MXU;
no scatter, no host sync per batch) — under a data-sharded jit the partial
matrices are combined by an XLA all-reduce; the reference instead pulls
predictions to host numpy every batch (§3.3 DEVICE→HOST boundary).

Metric math on the accumulated matrix is host-side numpy, bit-identical to
the reference (nanmean over undefined classes, same 16/13 class index sets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# SYNTHIA protocol class index sets (reference: utils/eval.py, SURVEY.md C13)
SYNTHIA_SET_16 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 15, 17, 18]
SYNTHIA_SET_13 = [0, 1, 2, 6, 7, 8, 10, 11, 12, 13, 15, 17, 18]  # 16 minus {3,4,5}

NAME_CLASSES_19 = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic_light", "traffic_sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]
NAME_CLASSES_13 = [
    "road", "sidewalk", "building", "traffic_light", "traffic_sign",
    "vegetation", "sky", "person", "rider", "car", "bus", "motorcycle",
    "bicycle",
]


def confusion_matrix_update(
    gt: jax.Array, pred: jax.Array, num_classes: int
) -> jax.Array:
    """(C, C) confusion-matrix contribution of one batch, on device.

    rows = ground truth, cols = prediction; pixels with gt outside [0, C)
    (the -1 ignore label) are dropped — identical masking to the reference's
    ``add_batch``.

    Computed as onehot(gt)^T @ onehot(pred) so it lowers to an MXU matmul
    instead of a scatter.
    """
    gt = gt.reshape(-1)
    pred = pred.reshape(-1)
    valid = (gt >= 0) & (gt < num_classes)
    gt_oh = jax.nn.one_hot(jnp.where(valid, gt, 0), num_classes, dtype=jnp.float32)
    gt_oh = gt_oh * valid[:, None].astype(jnp.float32)
    pred_oh = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    cm = jnp.dot(gt_oh.T, pred_oh, preferred_element_type=jnp.float32)
    return cm


class Eval:
    """Host-side metric accounting over an accumulated confusion matrix.

    API mirrors the reference ``Eval`` (reset/add_batch + the metric
    methods); ``add_batch`` additionally accepts precomputed device partial
    matrices via ``add_confusion_matrix`` for the jitted eval path.
    """

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)
        self.ignore_index = None

    def reset(self):
        self.confusion_matrix[:] = 0

    def add_batch(self, gt_image: np.ndarray, pre_image: np.ndarray):
        """numpy path, identical math to the reference's add_batch."""
        assert gt_image.shape == pre_image.shape
        mask = (gt_image >= 0) & (gt_image < self.num_class)
        label = self.num_class * gt_image[mask].astype(np.int64) + pre_image[mask]
        count = np.bincount(label, minlength=self.num_class**2)
        self.confusion_matrix += count.reshape(self.num_class, self.num_class)

    def add_confusion_matrix(self, cm: np.ndarray):
        self.confusion_matrix += np.asarray(cm, dtype=np.float64)

    # ---- metrics (names follow the reference) ----

    def Pixel_Accuracy(self) -> float:
        cm = self.confusion_matrix
        return float(np.diag(cm).sum() / max(cm.sum(), 1))

    def Mean_Pixel_Accuracy(self) -> float:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(cm) / cm.sum(axis=1)
        return float(np.nanmean(acc))

    def _iou_per_class(self) -> np.ndarray:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return iu

    def Mean_Intersection_over_Union(self, class_set: list[int] | None = None) -> float:
        iu = self._iou_per_class()
        if class_set is not None:
            iu = iu[class_set]
        return float(np.nanmean(iu))

    def Mean_Intersection_over_Union_16(self) -> float:
        return self.Mean_Intersection_over_Union(SYNTHIA_SET_16)

    def Mean_Intersection_over_Union_13(self) -> float:
        return self.Mean_Intersection_over_Union(SYNTHIA_SET_13)

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        cm = self.confusion_matrix
        freq = cm.sum(axis=1) / max(cm.sum(), 1)
        iu = self._iou_per_class()
        valid = freq > 0
        return float((freq[valid] * iu[valid]).sum())

    def Mean_Precision(self) -> float:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.diag(cm) / cm.sum(axis=0)
        return float(np.nanmean(prec))

    def Print_Every_class_Eval(self, logger=None, name_classes: list[str] | None = None) -> str:
        """Per-class IoU/precision table (reference's per-class report)."""
        if name_classes is None:
            name_classes = (
                NAME_CLASSES_19 if self.num_class == 19
                else NAME_CLASSES_13 if self.num_class == 13
                else [f"class_{i}" for i in range(self.num_class)]
            )
        iu = self._iou_per_class()
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.diag(cm) / cm.sum(axis=0)
        lines = [f"{'class':>16s} {'IoU':>8s} {'Precision':>10s}"]
        for i, name in enumerate(name_classes[: self.num_class]):
            iou_s = f"{iu[i]:8.4f}" if not np.isnan(iu[i]) else "     nan"
            pr_s = f"{prec[i]:10.4f}" if not np.isnan(prec[i]) else "       nan"
            lines.append(f"{name:>16s} {iou_s} {pr_s}")
        table = "\n".join(lines)
        if logger is not None:
            logger.info("\n" + table)
        return table
