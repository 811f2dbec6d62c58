"""tools/predict.py core: multi-scale/flip argmax, chunked tail parity."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2, init_deeplabv2
from maxsquareloss_tpu.ops.resize import resize_bilinear_align_corners
from maxsquareloss_tpu.train.steps import model_config

SMALL = (1, 1, 2, 1)


def _setup(**kw):
    kw.setdefault("blocks", SMALL)
    kw.setdefault("data_parallel", False)
    cfg = TrainConfig(**kw)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    return cfg, params, frozen


def _oracle_argmax(cfg, params, frozen, x, scales, flip, out_hw):
    """The straightforward (unchunked, two-forward-flip, always-softmax)
    formulation — the original predict semantics the streamed core must
    reproduce exactly."""
    mcfg = model_config(cfg, eval_mode=True)
    h, w = x.shape[1], x.shape[2]

    def prob_for(img):
        _, main = apply_deeplabv2(params, frozen, img, mcfg)
        return jax.nn.softmax(
            resize_bilinear_align_corners(main, out_hw), axis=-1
        )

    prob = None
    for s in scales:
        sh, sw = max(1, round(h * s)), max(1, round(w * s))
        img = x if (sh, sw) == (h, w) else resize_bilinear_align_corners(
            x, (sh, sw)
        )
        p = prob_for(img)
        if flip:
            p = p + prob_for(img[:, :, ::-1, :])[:, :, ::-1, :]
        prob = p if prob is None else prob + p
    return np.asarray(jnp.argmax(prob, axis=-1).astype(jnp.int32))


def test_predict_fn_matches_oracle_and_chunks(rng):
    from tools.predict import make_predict_fn

    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3), dtype=np.float32))
    out_hw = (64, 128)  # 2x upsample, checks the streamed tail at out-res
    for scales, flip in [((1.0,), False), ((0.75, 1.0), True)]:
        cfg, params, frozen = _setup()
        want = _oracle_argmax(cfg, params, frozen, x, scales, flip, out_hw)
        for chunk in (-1, 0, 24):  # auto (off at 64 rows), off, explicit
            cfg_c, _, _ = _setup(eval_h_chunk=chunk)
            got = np.asarray(
                jax.jit(make_predict_fn(cfg_c, frozen, scales, flip, out_hw))(
                    params, x
                )
            )
            np.testing.assert_array_equal(got, want)


def test_predict_fn_spatial_partitioned_matches(rng):
    """Batch-1 prediction with image-H sharded over the 'space' axis
    (predict --sp): bit-identical argmax vs the single-device run — the
    full-res serving scale-out path (parallel/mesh.py)."""
    from maxsquareloss_tpu.parallel.mesh import (
        batch_sharding,
        data_parallel_mesh,
        replicate_tree,
    )
    from tools.predict import make_predict_fn

    cfg, params, frozen = _setup()
    x = rng.standard_normal((1, 32, 64, 3), dtype=np.float32)
    out_hw = (64, 128)
    scales, flip = (0.75, 1.0), True
    want = np.asarray(
        jax.jit(make_predict_fn(cfg, frozen, scales, flip, out_hw))(
            params, jnp.asarray(x)
        )
    )
    mesh = data_parallel_mesh(jax.devices()[:4], sp=4)  # (1, 4): pure SP
    params_r = replicate_tree(mesh, params)
    frozen_r = replicate_tree(mesh, frozen)
    got = np.asarray(
        jax.jit(make_predict_fn(cfg, frozen_r, scales, flip, out_hw))(
            params_r, jax.device_put(x, batch_sharding(mesh))
        )
    )
    np.testing.assert_array_equal(got, want)


def test_predict_fn_full_res_auto_chunks(rng):
    """out_hw above the 512-row auto threshold streams (and stays exact)."""
    from tools.predict import make_predict_fn

    cfg, params, frozen = _setup()  # eval_h_chunk default -1 = auto
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    out_hw = (520, 16)
    auto = np.asarray(
        jax.jit(make_predict_fn(cfg, frozen, (1.0,), False, out_hw))(params, x)
    )
    cfg_off, _, _ = _setup(eval_h_chunk=0)
    off = np.asarray(
        jax.jit(make_predict_fn(cfg_off, frozen, (1.0,), False, out_hw))(
            params, x
        )
    )
    assert auto.shape == (1, 520, 16)
    np.testing.assert_array_equal(auto, off)
