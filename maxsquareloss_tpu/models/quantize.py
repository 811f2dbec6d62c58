"""Post-training int8 quantization of the backbone convs (eval/serving).

A beyond-parity serving optimization the reference (pure-fp32 torch) does
not have: v5e's MXU executes int8 convs at **1.6-2.2x** bf16 throughput
(394 TOPS vs 197 TFLOPs peak; measured per-shape in
``experiments/bench_int8.py`` via the chain-marginal protocol), so
quantizing the FLOP-dominant ResNet-101 backbone raises the inference
ceiling past bf16's.

Scheme (standard PTQ, chosen for exactness of everything around the int8
dot):

- **Weights**: symmetric per-output-channel int8 —
  ``q = round(w / s_w)``, ``s_w[o] = max|w[..., o]| / 127``.
- **Activations**: symmetric per-tensor int8 with amax calibration —
  one eager forward pass over a few batches records each conv site's
  input ``max|x|`` (the ``layers._calib_recorder`` hook observes the
  exact tensors the real graph computes; no shadow model to drift).
- **Compute**: int8 x int8 -> int32 conv on the MXU (exact integer
  arithmetic), dequantized per output channel in f32, back to the
  compute dtype. Frozen BN, ReLU, residual adds, the stem maxpool and
  both ASPP classifier heads stay in the fp compute dtype: the heads'
  19-channel output pads MXU lanes anyway (their matmul rewrite already
  covers them) and final-logit precision is where segmentation quality
  lives.

The quantized tree is a drop-in ``params`` replacement: the model's conv
sites dispatch on the weight dtype (``layers.conv_site``), so the
evaluator, predict tool, and serving exporter run quantized with ZERO
changes to their graphs. Training never quantizes (the optimizer owns the
fp32 master weights).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

QUANT_SITE_KEYS = frozenset({"w", "oscale", "ascale_inv"})


def iter_conv_sites(params: Params) -> Iterator[tuple[str, dict]]:
    """(path, site) for every backbone conv site, in forward order.

    Classifier heads (layer5/layer6) are intentionally excluded — see the
    module docstring.
    """
    yield "conv1", params["conv1"]
    for li in range(1, 5):
        key = f"layer{li}"
        if key not in params:
            continue
        for bi, block in enumerate(params[key]):
            for name in ("conv1", "conv2", "conv3", "downsample"):
                if name in block:
                    yield f"{key}.{bi}.{name}", block[name]


def parse_calib_mode(mode: str) -> float | None:
    """'amax' → None; 'p<percentile>' → the percentile as a float.

    Accepts explicit percentiles ('p99.9') and the common digit shorthand
    ('p999' → 99.9, 'p9999' → 99.99): a value > 100 is read as the digits
    of a percentile starting '99.…'.
    """
    if mode == "amax":
        return None
    if not mode.startswith("p"):
        raise ValueError(
            f"calib_mode must be 'amax' or 'p<percentile>', got {mode!r}"
        )
    q = float(mode[1:])
    while q > 100.0:
        q /= 10.0
    if not 0.0 < q <= 100.0:
        raise ValueError(f"calib_mode percentile out of (0, 100]: {mode!r}")
    return q


def calibrate(
    params: Params,
    frozen: Params,
    cfg,
    batches: Iterable[np.ndarray],
    mcfg=None,
    mode: str | None = None,
) -> dict[str, float]:
    """Per-site input-range calibration: {site path: range stat over batches}.

    The statistic is ``mode`` (default ``cfg.calib_mode``): exact amax, or a
    per-batch |x| percentile max-reduced over batches (an upper bound on the
    global percentile; values above it saturate at the ±127 clip in
    layers.qconv2d rather than stretching the quantization grid).

    Runs EAGER (unjitted) forwards so the recorder hook can read concrete
    values — a one-time cost of seconds. ``batches`` yields image batches
    as the eval pipeline ships them (uint8 NHWC under device_normalize, or
    pre-normalized f32); the exact in-graph normalization
    (``steps._prepare_inputs``) is applied here too, so the recorded
    ranges are the ranges the serving graph will see.
    """
    from maxsquareloss_tpu.models import layers
    from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2
    from maxsquareloss_tpu.train.steps import _prepare_inputs, model_config

    if mcfg is None:
        mcfg = model_config(cfg, eval_mode=True)
    q = parse_calib_mode(mode if mode is not None
                         else getattr(cfg, "calib_mode", "amax"))
    by_id = {id(site): path for path, site in iter_conv_sites(params)}
    amax: dict[str, jax.Array] = {}

    def record(site, x):
        path = by_id.get(id(site))
        if path is None:  # a site not selected for quantization
            return
        a = jnp.abs(x.astype(jnp.float32))
        m = jnp.max(a) if q is None else jnp.percentile(a, q)
        amax[path] = m if path not in amax else jnp.maximum(amax[path], m)

    if layers._calib_recorder is not None:
        raise RuntimeError("nested calibration")
    layers._calib_recorder = record
    try:
        n = 0
        for xs in batches:
            x, _ = _prepare_inputs(jnp.asarray(xs), None, cfg)
            apply_deeplabv2(params, frozen, x, mcfg)
            n += 1
        if n == 0:
            raise ValueError("calibrate() needs at least one batch")
    finally:
        layers._calib_recorder = None
    return {p: float(v) for p, v in amax.items()}


def _quantize_site(site: dict, act_amax: float) -> dict:
    w = np.asarray(site["w"], np.float32)  # HWIO
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0  # (O,)
    s_w = np.maximum(s_w, 1e-12)
    q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    s_a = max(float(act_amax), 1e-12) / 127.0
    return {
        "w": jnp.asarray(q),
        # dequant multiplier folded once: y_f = y_int32 * (s_w[o] * s_a)
        "oscale": jnp.asarray(s_w * s_a, jnp.float32),
        "ascale_inv": jnp.asarray(1.0 / s_a, jnp.float32),
    }


def quantize_params(params: Params, amax_by_path: dict[str, float]) -> Params:
    """fp params tree → drop-in tree with int8 backbone conv sites.

    Sites missing from ``amax_by_path`` raise: silently leaving a site in
    fp would misreport what "int8" means in a benchmark artifact.
    """
    sites = dict(iter_conv_sites(params))
    missing = [p for p in sites if p not in amax_by_path]
    if missing:
        raise ValueError(f"no calibration amax for sites: {missing[:4]}...")

    out: Params = {"conv1": _quantize_site(params["conv1"], amax_by_path["conv1"])}
    for li in range(1, 5):
        key = f"layer{li}"
        if key not in params:
            continue
        blocks = []
        for bi, block in enumerate(params[key]):
            nb = {}
            for name, sub in block.items():
                path = f"{key}.{bi}.{name}"
                nb[name] = (
                    _quantize_site(sub, amax_by_path[path])
                    if path in sites
                    else sub
                )
            blocks.append(nb)
        out[key] = blocks
    for head in ("layer5", "layer6"):
        if head in params:
            out[head] = params[head]  # classifier heads stay fp
    return out


def quantize_from_loader(cfg, params: Params, frozen: Params, loader,
                         logger=None) -> Params:
    """CLI glue: calibrate on the first ``cfg.calib_batches`` image batches
    of ``loader`` and return the quantized drop-in params tree."""
    def batches():
        it = iter(loader)
        for _ in range(max(1, cfg.calib_batches)):
            try:
                xs, _, _ = next(it)
            except StopIteration:
                return
            yield np.asarray(xs)

    try:
        amax = calibrate(params, frozen, cfg, batches())
    except ValueError:
        if jax.process_count() == 1:
            raise  # single process: fail loudly, nothing to sync
        # multi-host: a shard can legitimately be empty (val list smaller
        # than the process count). Do NOT raise here — every process must
        # still reach the allgather below or the siblings hang in the
        # collective; contribute a zero vector instead and let the synced
        # result decide.
        amax = {}
    amax = sync_amax_across_processes(amax, params)
    if logger is not None:
        logger.info(
            f"int8 PTQ: calibrated {len(amax)} conv sites over "
            f"{max(1, cfg.calib_batches)} batches; backbone convs now "
            "int8 (heads stay fp)"
        )
    return quantize_params(params, amax)


def sync_amax_across_processes(
    amax: dict[str, float], params: Params | None = None
) -> dict[str, float]:
    """Elementwise max of per-site calibration amax across all processes.

    Multi-host loaders are sharded, so each process calibrates on
    DIFFERENT batches; without this sync every process would build a
    different int8 tree — and "replicated" params that silently disagree
    across hosts. The site order comes from the model structure
    (``params``; identical on every process — falls back to the local
    amax keys when params is not given), so a vector allgather + max
    keeps the quantized tree byte-identical everywhere.

    Hang-safety: EVERY process must call this exactly once, even one whose
    loader shard yielded no batches (pass its ``amax`` as ``{}``) — the
    collective is unconditional, and a leading had-batches flag lets all
    processes raise the SAME error together when no process calibrated.
    """
    if jax.process_count() == 1:
        if not amax:
            raise ValueError("no calibration batches on any process")
        return amax
    from jax.experimental import multihost_utils

    keys = (sorted(amax) if params is None
            else [path for path, _ in iter_conv_sites(params)])
    # leading flag = this process calibrated; empty shards contribute 0s
    # (neutral under max since amax >= 0)
    vec = np.asarray(
        [float(bool(amax))] + [amax.get(k, 0.0) for k in keys], np.float32
    )
    gathered = multihost_utils.process_allgather(vec)  # (procs, 1+sites)
    g = np.asarray(gathered).reshape(-1, 1 + len(keys))
    if not g[:, 0].any():
        raise ValueError("no calibration batches on any process")
    synced = np.max(g[:, 1:], axis=0)
    return {k: float(v) for k, v in zip(keys, synced)}
