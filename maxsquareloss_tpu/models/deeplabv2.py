"""DeepLabV2 ResNet-101 multi-level model, functional JAX, NHWC.

Rebuild of the reference's ``graphs/models/deeplab101.py`` (Bottleneck,
ClassifierModule = V2-style summed ASPP, ResNetMulti — SURVEY.md C6/C7):

- caffe-style ResNet-101: 7x7/2 stem, ceil-mode 3x3/2 maxpool,
  layers [3, 4, 23, 3]; layer3 dilation 2 stride 1, layer4 dilation 4
  stride 1 → output stride 8.
- Bottleneck places the stride on its first 1x1 conv (caffe variant); conv2
  is 3x3 with padding=dilation.
- All BatchNorms are frozen (affine params requires_grad=False + running
  stats in eval mode in the reference) → folded constant scale/shift here.
- ClassifierModule: four parallel 3x3 convs with dilation/padding
  6/12/18/24, outputs SUMMED (not concatenated). Main head ``layer6`` on the
  2048-ch layer4 output; optional aux head ``layer5`` on the 1024-ch layer3
  output when multi_level (self-produced-guidance variant).

The model is a pure function of two pytrees:
  params  — trainable conv kernels / classifier biases (what the optimizer
            sees; split into 1x backbone and 10x head groups, C8),
  frozen  — folded BN scale/shift constants (never updated).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.models.layers import (
    aspp_sum,
    classifier_normal,
    conv2d,
    conv_site,
    frozen_bn,
    kaiming_normal,
    max_pool_ceil,
)

Params = dict[str, Any]

RESNET101_BLOCKS = (3, 4, 23, 3)
LAYER_PLANES = (64, 128, 256, 512)
LAYER_STRIDES = (1, 2, 1, 1)
LAYER_DILATIONS = (1, 1, 2, 4)
ASPP_DILATIONS = (6, 12, 18, 24)
EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class DeepLabV2Config:
    num_classes: int = 19
    multi_level: bool = True
    blocks: tuple[int, ...] = RESNET101_BLOCKS
    compute_dtype: Any = jnp.float32
    # remat ('') | 'stages': checkpoint each ResNet stage to trade FLOPs for
    # HBM at 1024x512 / OS=8 activation sizes (SURVEY.md §5.7).
    remat: str = ""
    # ASPP forward as one fat matmul + shifted accumulation (exact; see
    # layers.aspp_sum). A clear win for forward-only graphs (+22% measured
    # inference) but ~1.3 ms/step slower inside the fused train step, so
    # eval/predict paths enable it and train steps keep the conv form.
    aspp_matmul: bool = False
    # Retired transformations (space_to_batch dilated convs, Pallas fused
    # bottleneck blocks / fused losses) live under experiments/retired_pallas
    # with their measurements — all exact, all slower than XLA's lowering on
    # v5e (BASELINE.md ablations).


# ---------------------------------------------------------------- init ----


def _init_bn(ch: int, scale: float = 1.0) -> Params:
    # Random-init equivalent of folded frozen BN: gamma=scale, beta=0,
    # mean=0, var=1. Real runs overwrite via checkpoint conversion.
    return {
        "scale": jnp.full((ch,), scale, jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
    }


def _init_bottleneck(key, in_ch: int, planes: int, downsample: bool) -> tuple[Params, Params]:
    ks = jax.random.split(key, 4)
    out_ch = planes * EXPANSION
    p = {
        "conv1": {"w": kaiming_normal(ks[0], (1, 1, in_ch, planes))},
        "conv2": {"w": kaiming_normal(ks[1], (3, 3, planes, planes))},
        "conv3": {"w": kaiming_normal(ks[2], (1, 1, planes, out_ch))},
    }
    # bn3 scale 0.1 at random init: with identity frozen BN the residual
    # variance would double per block (2^33 blowup in ResNet-101); real runs
    # replace these with converted running stats anyway.
    f = {"bn1": _init_bn(planes), "bn2": _init_bn(planes), "bn3": _init_bn(out_ch, 0.1)}
    if downsample:
        p["downsample"] = {"w": kaiming_normal(ks[3], (1, 1, in_ch, out_ch))}
        f["bn_down"] = _init_bn(out_ch)
    return p, f


def _init_classifier(key, in_ch: int, num_classes: int) -> Params:
    ks = jax.random.split(key, len(ASPP_DILATIONS))
    return {
        "convs": [
            {
                "w": classifier_normal(k, (3, 3, in_ch, num_classes)),
                "b": jnp.zeros((num_classes,), jnp.float32),
            }
            for k in ks
        ]
    }


def init_deeplabv2(key: jax.Array, cfg: DeepLabV2Config) -> tuple[Params, Params]:
    """Random-init (params, frozen) pytrees for DeepLabV2-ResNet101."""
    keys = iter(jax.random.split(key, 256))
    params: Params = {"conv1": {"w": kaiming_normal(next(keys), (7, 7, 3, 64))}}
    frozen: Params = {"bn1": _init_bn(64)}
    in_ch = 64
    for li, (n_blocks, planes, stride, dilation) in enumerate(
        zip(cfg.blocks, LAYER_PLANES, LAYER_STRIDES, LAYER_DILATIONS)
    ):
        blocks_p, blocks_f = [], []
        for bi in range(n_blocks):
            # Reference _make_layer: downsample on the first block when the
            # stride/width changes or the layer is dilated (layers 3 and 4).
            need_ds = bi == 0 and (
                stride != 1 or in_ch != planes * EXPANSION or dilation in (2, 4)
            )
            bp, bf = _init_bottleneck(next(keys), in_ch, planes, need_ds)
            blocks_p.append(bp)
            blocks_f.append(bf)
            in_ch = planes * EXPANSION
        params[f"layer{li + 1}"] = blocks_p
        frozen[f"layer{li + 1}"] = blocks_f
    if cfg.multi_level:
        params["layer5"] = _init_classifier(next(keys), 1024, cfg.num_classes)
    params["layer6"] = _init_classifier(next(keys), 2048, cfg.num_classes)
    return params, frozen


# --------------------------------------------------------------- apply ----


def _bottleneck(
    p: Params,
    f: Params,
    x: jax.Array,
    stride: int,
    dilation: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    residual = x
    y = conv_site(x, p["conv1"], stride=stride)
    y = jax.nn.relu(frozen_bn(y, **f["bn1"]))
    if mask is not None:
        # canvas mode: frozen-BN shifts repopulate the pad region after every
        # 1x1 conv; re-zero it before the spatial conv so border reads stay
        # exactly the zero padding the unpadded forward would see
        y = y * mask.astype(y.dtype)
    y = conv_site(y, p["conv2"], padding=dilation, dilation=dilation)
    y = jax.nn.relu(frozen_bn(y, **f["bn2"]))
    y = conv_site(y, p["conv3"])
    y = frozen_bn(y, **f["bn3"])
    if "downsample" in p:
        residual = frozen_bn(conv_site(x, p["downsample"], stride=stride), **f["bn_down"])
    return jax.nn.relu(y + residual)


def _stage(
    ps: list,
    fs: list,
    x: jax.Array,
    stride: int,
    dilation: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """One ResNet stage (first block carries the stride/downsample)."""
    for bi, (p, f) in enumerate(zip(ps, fs)):
        x = _bottleneck(p, f, x, stride if bi == 0 else 1, dilation, mask)
    return x


def _classifier(
    p: Params,
    x: jax.Array,
    mask: jax.Array | None = None,
    matmul: bool = False,
) -> jax.Array:
    # V2-style ASPP: 4 parallel dilated 3x3 convs, summed. ``matmul``
    # selects the MXU-optimized exact rewrite (layers.aspp_sum: one fat
    # matmul + shifted accumulation fwd, conv adjoints bwd) — used by
    # forward-only graphs (eval/predict, +22% measured).
    if mask is not None:
        x = x * mask.astype(x.dtype)
    if matmul:
        return aspp_sum(
            x,
            [conv["w"] for conv in p["convs"]],
            [conv["b"] for conv in p["convs"]],
            ASPP_DILATIONS,
        )
    out = None
    for conv, d in zip(p["convs"], ASPP_DILATIONS):
        y = conv2d(x, conv["w"], padding=d, dilation=d, bias=conv["b"])
        out = y if out is None else out + y
    return out


# ------------------------------------------------- masked-canvas helpers ----
#
# Exact unequal-shape batching (UDA concat at the real protocol crops,
# SURVEY.md §3.2): pad every image onto a shared canvas and zero the pad
# region before each spatial-reading op (3x3 convs, the stem maxpool, ASPP).
# 1x1 convs and frozen BN act per pixel, so garbage they write into the pad
# region never reaches a valid pixel once masked; at valid borders the convs
# then read zeros — bit-identical to the zero padding of the unpadded
# forward. The maxpool is exact too: inputs are post-ReLU (>= 0), so a
# masked zero can tie but never beat a valid max.


def _valid_sizes(hw: tuple[int, int]) -> dict[str, tuple[int, int]]:
    """Feature-map extents of an (H, W) input at the three mask points.

    Mirrors the stem arithmetic: conv7x7/2 p3 → ceil-mode maxpool3x3/2 p1 →
    (later) the 1x1 stride-2 entering layer2. Everything after layer2 is
    stride 1 (dilated), so 'os8' covers layers 2-4 and both ASPP heads.
    """
    import math as _math

    h, w = hw

    def conv1(v):  # k7 s2 p3
        return (v + 2 * 3 - 7) // 2 + 1

    def pool(v):  # k3 s2 p1, ceil_mode
        return _math.ceil((v + 2 * 1 - 3) / 2) + 1

    def stride2(v):  # k1 s2 p0 (layer2 first bottleneck conv1/downsample)
        return (v - 1) // 2 + 1

    h1, w1 = conv1(h), conv1(w)
    h2, w2 = pool(h1), pool(w1)
    h3, w3 = stride2(h2), stride2(w2)
    return {"pool_in": (h1, w1), "os4": (h2, w2), "os8": (h3, w3)}


def valid_logits_hw(hw: tuple[int, int]) -> tuple[int, int]:
    """(H, W) of the logits a plain forward of an (H, W) input produces."""
    return _valid_sizes(hw)["os8"]


def make_canvas_masks(
    canvas_hw: tuple[int, int],
    groups: list[tuple[int, tuple[int, int]]],
) -> dict[str, jax.Array] | None:
    """Per-resolution 0/1 masks for a batch of padded groups.

    Args:
      canvas_hw: shared (H, W) canvas every image was top-left padded onto.
      groups: [(n_images, valid_hw), ...] in batch order.

    Returns None when every group fills the canvas (no masking needed).
    """
    if all(hw == tuple(canvas_hw) for _, hw in groups):
        return None
    canvas = _valid_sizes(tuple(canvas_hw))
    masks: dict[str, jax.Array] = {}
    for key in ("pool_in", "os4", "os8"):
        ch, cw = canvas[key]
        rows = []
        for n, hw in groups:
            vh, vw = _valid_sizes(tuple(hw))[key]
            m = jnp.zeros((ch, cw), jnp.float32).at[:vh, :vw].set(1.0)
            rows.append(jnp.broadcast_to(m, (n, ch, cw)))
        masks[key] = jnp.concatenate(rows, axis=0)[..., None]  # (N, H, W, 1)
    return masks


def apply_deeplabv2(
    params: Params,
    frozen: Params,
    x: jax.Array,
    cfg: DeepLabV2Config,
    masks: dict[str, jax.Array] | None = None,
) -> tuple[jax.Array | None, jax.Array]:
    """Forward pass.

    Args:
      x: (N, H, W, 3) images (already normalized by the data pipeline).
      masks: optional masked-canvas masks from make_canvas_masks — exact
        unequal-shape batching (pad region re-zeroed before spatial ops).
    Returns:
      (aux_logits_or_None, main_logits), both (N, H/8, W/8, num_classes) —
      callers upsample to label resolution with ops.resize.upsample_logits
      (matching the reference's trainer-side F.interpolate).
    """
    x = x.astype(cfg.compute_dtype)
    y = conv_site(x, params["conv1"], stride=2, padding=3)
    y = jax.nn.relu(frozen_bn(y, **frozen["bn1"]))
    if masks is not None:
        y = y * masks["pool_in"].astype(y.dtype)
    y = max_pool_ceil(y, window=3, stride=2, padding=1)

    # mask resolution per stage: layer1 runs at OS4; layer2's first
    # bottleneck strides to OS8 before its own 3x3, so layers 2-4 and the
    # ASPP heads all mask at OS8
    stage_masks = (None,) * 4 if masks is None else (
        masks["os4"], masks["os8"], masks["os8"], masks["os8"]
    )

    def stage_fn(li):
        def run(y):
            return _stage(
                params[f"layer{li + 1}"],
                frozen[f"layer{li + 1}"],
                y,
                LAYER_STRIDES[li],
                LAYER_DILATIONS[li],
                stage_masks[li],
            )

        return jax.checkpoint(run) if cfg.remat == "stages" else run

    y = stage_fn(0)(y)
    y = stage_fn(1)(y)
    y3 = stage_fn(2)(y)
    head_mask = None if masks is None else masks["os8"]
    aux = (
        _classifier(params["layer5"], y3, head_mask, cfg.aspp_matmul)
        if cfg.multi_level
        else None
    )
    y4 = stage_fn(3)(y3)
    main = _classifier(params["layer6"], y4, head_mask, cfg.aspp_matmul)
    if aux is not None:
        aux = aux.astype(jnp.float32)
    return aux, main.astype(jnp.float32)


# -------------------------------------------------------- param groups ----


def lr_mult_tree(params: Params, head_mult: float = 10.0) -> Params:
    """Per-leaf LR multiplier pytree: backbone 1x, classifier heads 10x.

    Mirrors ``optim_parameters(args)`` → ``[{lr}, {lr*10}]`` (reference:
    graphs/models/deeplab101.py get_1x_lr_params_no_scale /
    get_10x_lr_params, SURVEY.md C8).
    """
    def mult_for(path_key: str) -> float:
        return head_mult if path_key in ("layer5", "layer6") else 1.0

    return {
        k: jax.tree.map(lambda _: mult_for(k), v) for k, v in params.items()
    }
