"""Integration tests: jitted train steps vs the torch training oracle.

SURVEY.md §4 "integration" row: multi-step train-loss trajectories on fixed
synthetic batches must match the reference-semantics torch loop (model fwd +
align-corners upsample + CE(ignore -1) + two-group poly-LR SGD) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.convert import torch_state_dict_to_pytrees
from maxsquareloss_tpu.metrics import Eval
from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
from maxsquareloss_tpu.train.steps import (
    make_eval_step,
    make_supervised_train_step,
    make_train_state,
    make_uda_train_step,
    model_config,
)
from tests.torch_oracle import make_oracle, train_oracle_supervised

SMALL = (1, 1, 2, 1)


def _small_cfg(**kw):
    kw.setdefault("blocks", SMALL)
    kw.setdefault("multi", True)
    kw.setdefault("num_classes", 19)
    kw.setdefault("iter_max", 100)
    kw.setdefault("data_parallel", False)
    return TrainConfig(**kw)


@pytest.fixture
def batches(rng):
    return [
        (
            rng.normal(0, 1, size=(2, 32, 64, 3)).astype(np.float32),
            rng.integers(-1, 19, size=(2, 32, 64)).astype(np.int32),
        )
        for _ in range(10)
    ]


def test_supervised_trajectory_matches_torch(batches):
    """10-step loss trajectory parity (SURVEY.md §7 step 3 gate)."""
    model = make_oracle(layers=SMALL)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, frozen = torch_state_dict_to_pytrees(sd, blocks=SMALL)
    cfg = _small_cfg()
    step = make_supervised_train_step(cfg, frozen)
    state = make_train_state(jax.tree.map(jnp.asarray, params))
    jax_losses = []
    for x, y in batches:
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(y))
        jax_losses.append(float(np.asarray(metrics["loss"])))

    torch_losses = train_oracle_supervised(
        model, batches, base_lr=cfg.lr, max_iter=cfg.iter_max,
        power=cfg.poly_power, momentum=cfg.momentum, wd=cfg.weight_decay,
        lambda_seg=cfg.lambda_seg,
    )
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
    # losses should actually move (training is happening)
    assert abs(jax_losses[0] - jax_losses[-1]) > 1e-4


@pytest.mark.parametrize(
    "mode", ["maxsquare", "IW_maxsquare", "entropy", "IW_entropy", "hard"]
)
def test_uda_step_all_target_modes(rng, mode):
    cfg = _small_cfg(target_mode=mode, threshold=0.5)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    step = make_uda_train_step(cfg, frozen)
    state = make_train_state(params)
    xs = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    ys = jnp.asarray(rng.integers(-1, 19, (2, 32, 64)).astype(np.int32))
    xt = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    p_before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = step(state, xs, ys, xt)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    assert np.isfinite(float(np.asarray(metrics["loss_target_raw"])))
    assert "loss_target_aux" in metrics  # multi-level guidance path taken
    p_after = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.array_equal(p_before, p_after)
    assert int(np.asarray(state.iteration)) == 1


def test_uda_single_level_no_aux(rng):
    cfg = _small_cfg(multi=False, target_mode="maxsquare")
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    step = make_uda_train_step(cfg, frozen)
    state = make_train_state(params)
    xs = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32))
    ys = jnp.asarray(rng.integers(-1, 19, (1, 32, 32)).astype(np.int32))
    xt = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32))
    state, metrics = step(state, xs, ys, xt)
    assert "loss_target_aux" not in metrics
    assert np.isfinite(float(np.asarray(metrics["loss"])))


def test_eval_step_confusion_matrix(rng):
    cfg = _small_cfg()
    params, frozen = init_deeplabv2(jax.random.key(1), model_config(cfg))
    step = make_eval_step(cfg, frozen)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 19, (2, 32, 64)).astype(np.int32))
    cm, argpred = step(params, x, y)
    assert argpred.shape == (2, 32, 64)
    ev = Eval(19)
    ev.add_batch(np.asarray(y), np.asarray(argpred))
    np.testing.assert_array_equal(np.asarray(cm), ev.confusion_matrix)


def test_bfloat16_step_runs(rng):
    cfg = _small_cfg(compute_dtype="bfloat16")
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    step = make_supervised_train_step(cfg, frozen)
    state = make_train_state(params)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 19, (1, 32, 32)).astype(np.int32))
    state, metrics = step(state, x, y)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    # params/update stay fp32 even with bf16 compute
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


@pytest.mark.slow
def test_bfloat16_trajectory_tracks_fp32(rng):
    """50-step UDA trajectory divergence bound bf16 vs fp32 (VERDICT r1 #3):
    the bf16 champion throughput number is only a legitimate headline if
    bf16 training follows the fp32 (parity-dtype) trajectory. Bound is
    asserted here and documented in BASELINE.md."""
    params, frozen = init_deeplabv2(
        jax.random.key(0), model_config(_small_cfg())
    )
    batches = [
        (
            rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32),
            rng.integers(-1, 19, (2, 32, 64)).astype(np.int32),
            rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32),
        )
        for _ in range(50)
    ]

    def run(dtype):
        cfg = _small_cfg(
            target_mode="IW_maxsquare", threshold=0.5, compute_dtype=dtype
        )
        step = make_uda_train_step(cfg, frozen)
        state = make_train_state(jax.tree.map(jnp.array, params))
        losses = []
        for xs, ys, xt in batches:
            state, m = step(
                state, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt)
            )
            losses.append(float(np.asarray(m["loss"])))
            # mixed-precision audit: losses must be computed in fp32 even
            # under bf16 compute (the model returns fp32 logits)
            assert m["loss"].dtype == jnp.float32
        return np.asarray(losses), state

    fp32, state32 = run("float32")
    bf16, state16 = run("bfloat16")
    rel = np.abs(bf16 - fp32) / np.maximum(np.abs(fp32), 1e-3)
    # documented bound: per-step relative loss deviation < 2%, mean < 1%
    assert rel.max() < 0.02, f"max rel divergence {rel.max():.4f}"
    assert rel.mean() < 0.01, f"mean rel divergence {rel.mean():.4f}"
    # parameters stay fp32 and close after 50 steps
    for a, b in zip(jax.tree.leaves(state32.params), jax.tree.leaves(state16.params)):
        assert a.dtype == b.dtype == jnp.float32
    flat32 = np.concatenate([np.asarray(a).ravel() for a in jax.tree.leaves(state32.params)])
    flat16 = np.concatenate([np.asarray(b).ravel() for b in jax.tree.leaves(state16.params)])
    denom = float(np.linalg.norm(flat32))
    assert float(np.linalg.norm(flat16 - flat32)) / denom < 5e-3


@pytest.mark.parametrize(
    "mode", ["IW_maxsquare", "maxsquare", "entropy", "IW_entropy", "hard"]
)
def test_uda_trajectory_matches_torch(rng, mode):
    """6-step UDA loss trajectory parity vs the torch reference loop for
    EVERY --target_mode: source CE + lambda_target * target loss with
    ensemble guidance + aux guidance CE, two param groups, poly LR (the
    paper's full training semantics; round 4 extended from IW-only to all
    five modes)."""
    from maxsquareloss_tpu.convert import torch_state_dict_to_pytrees
    from tests.torch_oracle import make_oracle, train_oracle_uda

    model = make_oracle(layers=SMALL)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, frozen = torch_state_dict_to_pytrees(sd, blocks=SMALL)
    cfg = _small_cfg(target_mode=mode, threshold=0.5)
    batches = [
        (
            rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32),
            rng.integers(-1, 19, (2, 32, 64)).astype(np.int32),
            rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32),
        )
        for _ in range(6)
    ]
    step = make_uda_train_step(cfg, frozen)
    state = make_train_state(jax.tree.map(jnp.asarray, params))
    jax_losses = []
    for xs, ys, xt in batches:
        state, metrics = step(
            state, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt)
        )
        jax_losses.append(float(np.asarray(metrics["loss"])))
    torch_losses = train_oracle_uda(
        model, batches, base_lr=cfg.lr, max_iter=cfg.iter_max,
        power=cfg.poly_power, momentum=cfg.momentum, wd=cfg.weight_decay,
        lambda_seg=cfg.lambda_seg, lambda_target=cfg.lambda_target,
        ratio=cfg.ratio, threshold=cfg.threshold, target_mode=mode,
    )
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)


def test_concat_batches_step_equivalent(rng):
    """Frozen BN → concatenated src+tgt forward == two forwards, same update."""
    cfg_a = _small_cfg(target_mode="IW_maxsquare", threshold=0.5)
    cfg_b = _small_cfg(target_mode="IW_maxsquare", threshold=0.5, concat_batches=True)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg_a))
    xs = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    ys = jnp.asarray(rng.integers(-1, 19, (2, 32, 64)).astype(np.int32))
    xt = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    sa = make_train_state(jax.tree.map(jnp.array, params))
    sb = make_train_state(jax.tree.map(jnp.array, params))
    sa, ma = make_uda_train_step(cfg_a, frozen)(sa, xs, ys, xt)
    sb, mb = make_uda_train_step(cfg_b, frozen)(sb, xs, ys, xt)
    assert float(np.asarray(ma["loss"])) == pytest.approx(
        float(np.asarray(mb["loss"])), rel=1e-5
    )
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_masked_canvas_forward_exact(rng):
    """Masked-canvas forward of a padded image == plain forward of the
    unpadded image (exact unequal-shape batching, VERDICT r1 #4)."""
    from maxsquareloss_tpu.models.deeplabv2 import (
        apply_deeplabv2,
        make_canvas_masks,
        valid_logits_hw,
    )

    cfg = _small_cfg()
    mcfg = model_config(cfg)
    params, frozen = init_deeplabv2(jax.random.key(1), mcfg)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    aux_ref, main_ref = apply_deeplabv2(params, frozen, x, mcfg)
    vh, vw = valid_logits_hw((32, 64))
    assert main_ref.shape[1:3] == (vh, vw)  # arithmetic matches the model

    canvas = (40, 80)
    x_pad = jnp.pad(x, ((0, 0), (0, 8), (0, 16), (0, 0)))
    masks = make_canvas_masks(canvas, [(2, (32, 64))])
    aux_c, main_c = apply_deeplabv2(params, frozen, x_pad, mcfg, masks)
    np.testing.assert_allclose(
        np.asarray(main_c[:, :vh, :vw]), np.asarray(main_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_c[:, :vh, :vw]), np.asarray(aux_ref), atol=1e-5
    )


def test_concat_batches_unequal_crops_equivalent(rng):
    """concat_batches at the real protocol's UNEQUAL crops (source larger
    than target) must produce the identical update as separate forwards —
    the r1 implementation silently fell back (VERDICT r1 weak #4)."""
    cfg_a = _small_cfg(target_mode="IW_maxsquare", threshold=0.5)
    cfg_b = _small_cfg(
        target_mode="IW_maxsquare", threshold=0.5, concat_batches=True
    )
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg_a))
    # proportions of the GTA5 protocol: src 1280x640 vs tgt 1024x512
    xs = jnp.asarray(rng.normal(0, 1, (2, 40, 80, 3)).astype(np.float32))
    ys = jnp.asarray(rng.integers(-1, 19, (2, 40, 80)).astype(np.int32))
    xt = jnp.asarray(rng.normal(0, 1, (2, 32, 64, 3)).astype(np.float32))
    sa = make_train_state(jax.tree.map(jnp.array, params))
    sb = make_train_state(jax.tree.map(jnp.array, params))
    sa, ma = make_uda_train_step(cfg_a, frozen)(sa, xs, ys, xt)
    sb, mb = make_uda_train_step(cfg_b, frozen)(sb, xs, ys, xt)
    for k in ("loss", "loss_source", "loss_target_raw"):
        assert float(np.asarray(ma[k])) == pytest.approx(
            float(np.asarray(mb[k])), rel=1e-4, abs=1e-6
        ), k
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_iw_hist_argmax_disarms_degenerate_branch():
    """--iw_hist argmax makes the w_c=1.0 branch unreachable under --multi.

    Crafted probs: 6 pixels confident (0.99) in class 0, 2 pixels argmax
    class 3 at only 0.5 — below the 0.95 threshold, so the guidance
    histogram has hist[3] == 0 while argmax still assigns those pixels to
    class 3. Reference-parity mode ('guidance') must hit the degenerate
    weight-1.0 branch (BASELINE.md "Multi-arm collapse"); 'argmax' must not,
    and must reproduce the single-head histogram behavior exactly.
    """
    from maxsquareloss_tpu.ops.losses import iw_max_square_loss
    from maxsquareloss_tpu.train.steps import target_loss_fn

    c = 19
    prob = np.full((1, 2, 4, c), 0.01 / (c - 1), np.float32)
    prob = prob.reshape(1, 8, c)
    prob[0, :6, 0] = 0.99
    prob[0, 6:, :] = (1.0 - 0.5) / (c - 1)
    prob[0, 6:, 3] = 0.5
    prob = jnp.asarray(prob.reshape(1, 2, 4, c))
    prob = prob / jnp.sum(prob, axis=-1, keepdims=True)

    loss_by_mode = {}
    for hist_mode in ("guidance", "argmax"):
        cfg = _small_cfg(
            target_mode="IW_maxsquare", threshold=0.95, iw_hist=hist_mode
        )
        loss, label, metrics = target_loss_fn(prob, prob, cfg)
        assert label is not None  # multi-level guidance path taken
        w_max = float(np.asarray(metrics["iw_pixel_w_max"]))
        if hist_mode == "guidance":
            assert w_max == pytest.approx(1.0)  # degenerate branch fires
        else:
            assert w_max < 0.5  # healthy ~1/total scale
            np.testing.assert_allclose(
                np.asarray(loss),
                np.asarray(iw_max_square_loss(prob, None, num_classes=c)),
                rtol=1e-6,
            )
        loss_by_mode[hist_mode] = float(np.asarray(loss))
    # the degenerate branch inflates |loss| (by ~total x per affected pixel;
    # modest here because total is only 6 in this tiny fixture)
    assert abs(loss_by_mode["guidance"]) > 1.5 * abs(loss_by_mode["argmax"])
