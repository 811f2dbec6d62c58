"""Pallas fused-loss kernels vs the jnp reference implementations.

Runs in Pallas interpret mode on CPU (tests never touch the TPU); the same
kernels compile natively on TPU where bench.py exercises them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from maxsquareloss_tpu.ops.histogram import class_histogram, iw_class_weights
from maxsquareloss_tpu.ops.losses import iw_max_square_loss, max_square_loss
from experiments.retired_pallas.fused_loss import (
    fused_iw_max_square_loss,
    fused_max_square_loss,
)

C = 19


@pytest.fixture
def logits(rng):
    return jnp.asarray(rng.normal(0, 3, (2, 16, 32, C)).astype(np.float32))


def test_fused_max_square_forward(logits):
    with pltpu.force_tpu_interpret_mode():
        got = float(fused_max_square_loss(logits))
    want = float(max_square_loss(jax.nn.softmax(logits, axis=-1)))
    # per-tile partial sums reorder the fp32 reduction (~1e-5 rel)
    assert got == pytest.approx(want, rel=1e-4)


def test_fused_max_square_grad(logits):
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lambda x: fused_max_square_loss(x))(logits)
    g_ref = jax.grad(lambda x: max_square_loss(jax.nn.softmax(x, axis=-1)))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-6)


def _weights_for(logits, label=None):
    argpred = jnp.argmax(jax.nn.softmax(logits, axis=-1), axis=-1).astype(jnp.int32)
    count = argpred if label is None else label
    return iw_class_weights(class_histogram(count, C), 0.2)


def test_fused_iw_forward(logits):
    w = _weights_for(logits)
    with pltpu.force_tpu_interpret_mode():
        got = float(fused_iw_max_square_loss(logits, w))
    want = float(iw_max_square_loss(jax.nn.softmax(logits, axis=-1), num_classes=C))
    # per-tile partial sums reorder the fp32 reduction (~1e-5 rel)
    assert got == pytest.approx(want, rel=1e-4)


def test_fused_iw_forward_with_guidance_label(rng, logits):
    label = jnp.asarray(rng.integers(-1, C, (2, 16, 32)).astype(np.int32))
    w = _weights_for(logits, label)
    with pltpu.force_tpu_interpret_mode():
        got = float(fused_iw_max_square_loss(logits, w))
    want = float(
        iw_max_square_loss(jax.nn.softmax(logits, axis=-1), label, num_classes=C)
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_fused_iw_grad(logits):
    w = _weights_for(logits)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lambda x: fused_iw_max_square_loss(x, w))(logits)
    g_ref = jax.grad(
        lambda x: iw_max_square_loss(jax.nn.softmax(x, axis=-1), num_classes=C)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_fused_iw_weights_get_zero_grad(logits):
    w = _weights_for(logits)
    with pltpu.force_tpu_interpret_mode():
        gw = jax.grad(lambda ww: fused_iw_max_square_loss(logits, ww))(w)
    np.testing.assert_array_equal(np.asarray(gw), 0.0)


def test_odd_height_tiling(rng):
    # H not divisible by large tiles exercises the tile-size fallback
    x = jnp.asarray(rng.normal(0, 2, (1, 6, 16, C)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = float(fused_max_square_loss(x))
    want = float(max_square_loss(jax.nn.softmax(x, axis=-1)))
    assert got == pytest.approx(want, rel=1e-5)
