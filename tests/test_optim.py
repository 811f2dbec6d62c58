"""torch-SGD semantics + poly LR parity vs torch.optim.SGD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from maxsquareloss_tpu.optim import init_sgd, poly_lr, sgd_update


def test_sgd_matches_torch_multistep(rng):
    """20 steps, wd+momentum, two LR groups, per-iter poly LR — exact parity."""
    w0 = rng.standard_normal((4, 3), dtype=np.float32)
    w1 = rng.standard_normal((5,), dtype=np.float32)
    base_lr, max_iter, power = 2.5e-4, 50, 0.9
    wd, mom = 5e-4, 0.9

    # torch side: two param groups at lr and 10*lr, poly-rescaled per iter
    tp0 = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tp1 = torch.nn.Parameter(torch.from_numpy(w1.copy()))
    opt = torch.optim.SGD(
        [{"params": [tp0], "lr": base_lr}, {"params": [tp1], "lr": base_lr * 10}],
        lr=base_lr, momentum=mom, weight_decay=wd,
    )

    # jax side
    params = {"a": jnp.asarray(w0), "b": jnp.asarray(w1)}
    mults = {"a": 1.0, "b": 10.0}
    state = init_sgd(params)

    gs = [
        (
            rng.standard_normal(w0.shape, dtype=np.float32),
            rng.standard_normal(w1.shape, dtype=np.float32),
        )
        for _ in range(20)
    ]
    for it, (g0, g1) in enumerate(gs):
        lr_t = base_lr * (1 - it / max_iter) ** power
        opt.param_groups[0]["lr"] = lr_t
        opt.param_groups[1]["lr"] = lr_t * 10
        opt.zero_grad()
        tp0.grad = torch.from_numpy(g0.copy())
        tp1.grad = torch.from_numpy(g1.copy())
        opt.step()

        lr_j = poly_lr(base_lr, jnp.asarray(it), max_iter, power)
        # device fp32 pow vs host float64 pow: ~1e-6 relative
        assert float(lr_j) == pytest.approx(lr_t, rel=1e-5)
        params, state = sgd_update(
            params, {"a": jnp.asarray(g0), "b": jnp.asarray(g1)}, state,
            lr_j, mults, momentum=mom, weight_decay=wd,
        )

    np.testing.assert_allclose(np.asarray(params["a"]), tp0.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tp1.detach().numpy(), atol=1e-5)


def test_first_step_momentum_buffer(rng):
    """First step: buf = d (no momentum scaling) — torch's buffer init."""
    w = rng.standard_normal((3,), dtype=np.float32)
    g = rng.standard_normal((3,), dtype=np.float32)
    params = {"w": jnp.asarray(w)}
    state = init_sgd(params)
    lr = jnp.asarray(0.1, jnp.float32)
    new, state = sgd_update(
        params, {"w": jnp.asarray(g)}, state, lr, {"w": 1.0},
        momentum=0.9, weight_decay=5e-4,
    )
    d = g + 5e-4 * w
    np.testing.assert_allclose(np.asarray(new["w"]), w - 0.1 * d, atol=1e-7)
    assert bool(state.initialized)


def test_poly_lr_clamps_past_max_iter():
    assert float(poly_lr(0.1, jnp.asarray(1000), 100, 0.9)) == 0.0
