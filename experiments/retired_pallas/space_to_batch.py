"""RETIRED: dilated conv via space-to-batch parity subgrids (exact rewrite).

conv(x, w, dilation=d)[h, w] only mixes pixels of the same (h%d, w%d)
parity, so it equals a DENSE 3x3 conv run independently on each of the d*d
subsampled grids with padding 1. The hypothesis was that dense 3x3 convs
tile onto the MXU better than rhs-dilated ones.

Verdict (round 2, BASELINE.md "Retired transformations"): measured SLOWER
on v5e — XLA:TPU lowers rhs-dilated convs at 93-103% of nominal conv peak
on long chains (chain-marginal methodology), so the rewrite only adds
reshape/transpose traffic. Kept here with its parity test for the record;
the live conv path is maxsquareloss_tpu/models/layers.py conv2d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.models.layers import CONV_DIMS


def conv2d_dilated_s2b(
    x: jax.Array, w: jax.Array, d: int, bias: jax.Array | None = None
) -> jax.Array:
    """Dilated (stride 1, padding=d) conv via space-to-batch parity subgrids."""
    n, h, ww_, c = x.shape
    ph = (-h) % d
    pw = (-ww_) % d
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    # (N, H/d, d, W/d, d, C) → (d*d*N, H/d, W/d, C)
    xs = x.reshape(n, hp // d, d, wp // d, d, c)
    xs = xs.transpose(2, 4, 0, 1, 3, 5).reshape(d * d * n, hp // d, wp // d, c)
    ys = jax.lax.conv_general_dilated(
        xs,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=CONV_DIMS,
    )
    co = ys.shape[-1]
    ys = ys.reshape(d, d, n, hp // d, wp // d, co)
    y = ys.transpose(2, 3, 0, 4, 1, 5).reshape(n, hp, wp, co)
    y = y[:, :h, :ww_]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def test_s2b_conv_parity():
    import numpy as np

    from maxsquareloss_tpu.models.layers import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 13, 17, 8)).astype(np.float32))
    for d in (2, 4, 6):
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 5)).astype(np.float32))
        ref = conv2d(x, k, padding=d, dilation=d)
        got = conv2d_dilated_s2b(x, k, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
