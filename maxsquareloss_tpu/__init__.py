"""maxsquareloss_tpu — TPU-native rebuild of MaxSquareLoss (ICCV'19 UDA segmentation).

A from-scratch JAX/XLA/Pallas framework with the full capability surface of the
reference PyTorch codebase ``shiyutang/MaxSquareLoss`` (see ``SURVEY.md``):

- DeepLabV2 ResNet-101 (output stride 8, frozen BN) with V2-style summed ASPP
  heads (``graphs/models/deeplab101.py`` in the reference).
- The max-squares / image-wise-weighted / entropy target-loss family
  (``utils/loss.py`` in the reference).
- Cityscapes / GTA5 / SYNTHIA / NTHU Cross-City host data pipelines
  (``datasets/*.py`` in the reference).
- Supervised + UDA trainers with poly LR, 1x/10x param groups, torch-SGD
  semantics, checkpoint/resume, mIoU evaluation (``tools/*.py`` +
  ``utils/eval.py`` in the reference).

Design: the compute path is functional JAX (NHWC, fp32/bf16) jitted over a
``jax.sharding.Mesh`` for pure data-parallel scaling over ICI; hot fused ops
(align-corners bilinear upsample, max-square loss family) have Pallas TPU
kernels; the host data path is numpy/PIL/OpenCV with threaded device prefetch.
"""

__version__ = "0.1.0"
