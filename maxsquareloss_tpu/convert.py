"""torch DeepLabV2 state_dict → (params, frozen) pytree conversion.

The reference ships/loads torch ``.pth`` checkpoints — the caffe-converted
ImageNet/COCO init (``DeepLab_resnet_pretrained_init-f81d91e8.pth``) and the
released source-only / adapted models (reference: utils/train_helper.py
get_model + tools/train_source.py load_checkpoint, SURVEY.md C8/§3.5/§5.4).
This module makes that zoo loadable: strips ``module.`` DataParallel
prefixes, transposes conv kernels OIHW→HWIO, and folds BatchNorm
(gamma, beta, running_mean, running_var) into frozen (scale, bias) pairs.

Pure numpy — torch is only needed by tools/convert_torch_ckpt.py to unpickle
the .pth file.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from maxsquareloss_tpu.models.layers import fold_bn

Array = np.ndarray


def _oihw_to_hwio(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def strip_module_prefix(sd: Mapping[str, Array]) -> dict[str, Array]:
    """Drop the 'module.' prefix nn.DataParallel bakes into checkpoint keys."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _fold_bn_from(sd: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    scale, bias = fold_bn(
        np.asarray(sd[f"{prefix}.weight"], np.float32),
        np.asarray(sd[f"{prefix}.bias"], np.float32),
        np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        np.asarray(sd[f"{prefix}.running_var"], np.float32),
    )
    return {"scale": scale, "bias": bias}


def _classifier_from(sd: Mapping[str, Array], layer: str) -> dict[str, Any] | None:
    convs = []
    for i in range(4):
        for stem in (f"{layer}.conv2d_list.{i}", f"{layer}.{i}"):
            if f"{stem}.weight" in sd:
                convs.append(
                    {
                        "w": _oihw_to_hwio(np.asarray(sd[f"{stem}.weight"], np.float32)),
                        "b": np.asarray(sd[f"{stem}.bias"], np.float32),
                    }
                )
                break
    if not convs:
        return None
    assert len(convs) == 4, f"expected 4 ASPP convs for {layer}, got {len(convs)}"
    return {"convs": convs}


def infer_blocks(sd: Mapping[str, Any]) -> tuple[int, ...]:
    """Infer per-stage block counts from state_dict keys (layerL.B.conv1...)."""
    counts = []
    for li in range(1, 5):
        n = 0
        while f"layer{li}.{n}.conv1.weight" in sd:
            n += 1
        counts.append(n)
    return tuple(counts)


def torch_state_dict_to_pytrees(
    sd: Mapping[str, Any],
    blocks: tuple[int, ...] | None = None,
    num_classes: int | None = None,
) -> tuple[dict, dict]:
    """Convert a (numpy-valued) torch DeepLabV2 state_dict to (params, frozen).

    Classifier heads whose class count differs from ``num_classes`` are
    skipped (the reference re-inits heads when fine-tuning to a different
    class count, e.g. the 13-class cross-city protocol — SURVEY.md §3.1).
    """
    sd = strip_module_prefix({k: np.asarray(v) for k, v in sd.items()})
    if blocks is None:
        blocks = infer_blocks(sd)
        assert all(n > 0 for n in blocks), f"could not infer blocks: {blocks}"
    params: dict[str, Any] = {
        "conv1": {"w": _oihw_to_hwio(np.asarray(sd["conv1.weight"], np.float32))}
    }
    frozen: dict[str, Any] = {"bn1": _fold_bn_from(sd, "bn1")}
    for li, n_blocks in enumerate(blocks):
        layer = f"layer{li + 1}"
        bps, bfs = [], []
        for bi in range(n_blocks):
            stem = f"{layer}.{bi}"
            bp = {
                "conv1": {"w": _oihw_to_hwio(np.asarray(sd[f"{stem}.conv1.weight"], np.float32))},
                "conv2": {"w": _oihw_to_hwio(np.asarray(sd[f"{stem}.conv2.weight"], np.float32))},
                "conv3": {"w": _oihw_to_hwio(np.asarray(sd[f"{stem}.conv3.weight"], np.float32))},
            }
            bf = {
                "bn1": _fold_bn_from(sd, f"{stem}.bn1"),
                "bn2": _fold_bn_from(sd, f"{stem}.bn2"),
                "bn3": _fold_bn_from(sd, f"{stem}.bn3"),
            }
            if f"{stem}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "w": _oihw_to_hwio(np.asarray(sd[f"{stem}.downsample.0.weight"], np.float32))
                }
                bf["bn_down"] = _fold_bn_from(sd, f"{stem}.downsample.1")
            bps.append(bp)
            bfs.append(bf)
        params[layer] = bps
        frozen[layer] = bfs
    for head in ("layer5", "layer6"):
        cp = _classifier_from(sd, head)
        if cp is not None:
            head_classes = cp["convs"][0]["w"].shape[-1]
            if num_classes is None or head_classes == num_classes:
                params[head] = cp
    return params, frozen


# ------------------------------------------------- reverse: jax → torch ----


def _hwio_to_oihw(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _unfold_bn(
    scale: Array, bias: Array, eps: float | None = None
) -> dict[str, Array]:
    """Emit torch BN params that reproduce the folded affine exactly.

    The fold is lossy (4 tensors → 2), but any (gamma, beta, mean, var)
    with  gamma / sqrt(var + eps) == scale  and  beta - mean * that == bias
    is functionally identical. Choose mean=0, var=1:
    gamma = scale * sqrt(1 + eps), beta = bias.
    """
    if eps is None:
        from maxsquareloss_tpu.models.layers import BN_EPS

        eps = BN_EPS  # must match the fold side or the round-trip drifts
    scale = np.asarray(scale, np.float32)
    bias = np.asarray(bias, np.float32)
    return {
        "weight": (scale * np.sqrt(np.float32(1.0 + eps))).astype(np.float32),
        "bias": bias,
        "running_mean": np.zeros_like(scale),
        "running_var": np.ones_like(scale),
        "num_batches_tracked": np.asarray(0, np.int64),
    }


def pytrees_to_torch_state_dict(
    params: Mapping[str, Any],
    frozen: Mapping[str, Any],
    module_prefix: bool = False,
) -> dict[str, Array]:
    """(params, frozen) pytrees → reference-layout torch state_dict.

    Inverse of torch_state_dict_to_pytrees up to the lossy BN fold (the
    emitted BN params are functionally identical — see _unfold_bn); keys
    match the reference graphs/models/deeplab101.py module names
    (conv1/bn1/layerL.B.convK/bnK/downsample.{0,1}/layer{5,6}.conv2d_list.i)
    so the reference codebase (and tests/torch_oracle.py) can
    load_state_dict(strict=True) the result. ``module_prefix`` prepends
    the nn.DataParallel 'module.' the reference's full checkpoints carry.
    """
    sd: dict[str, Array] = {}

    def put_bn(prefix: str, bn: Mapping[str, Array]):
        for k, v in _unfold_bn(bn["scale"], bn["bias"]).items():
            sd[f"{prefix}.{k}"] = v

    sd["conv1.weight"] = _hwio_to_oihw(params["conv1"]["w"])
    put_bn("bn1", frozen["bn1"])
    for li in range(1, 5):
        layer = f"layer{li}"
        if layer not in params:
            continue
        for bi, (bp, bf) in enumerate(zip(params[layer], frozen[layer])):
            stem = f"{layer}.{bi}"
            for ck in ("conv1", "conv2", "conv3"):
                sd[f"{stem}.{ck}.weight"] = _hwio_to_oihw(bp[ck]["w"])
                put_bn(f"{stem}.bn{ck[-1]}", bf[f"bn{ck[-1]}"])
            if "downsample" in bp:
                sd[f"{stem}.downsample.0.weight"] = _hwio_to_oihw(
                    bp["downsample"]["w"]
                )
                put_bn(f"{stem}.downsample.1", bf["bn_down"])
    for head in ("layer5", "layer6"):
        if head not in params:
            continue
        for i, conv in enumerate(params[head]["convs"]):
            stem = f"{head}.conv2d_list.{i}"
            sd[f"{stem}.weight"] = _hwio_to_oihw(conv["w"])
            sd[f"{stem}.bias"] = np.asarray(conv["b"], np.float32)
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd
