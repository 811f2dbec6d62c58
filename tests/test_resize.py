"""align_corners=True bilinear resize parity vs torch F.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from maxsquareloss_tpu.ops.resize import resize_bilinear_align_corners


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((65, 129), (512, 1024)),   # logit upsample shape at output stride 8
        ((16, 16), (33, 57)),
        ((33, 57), (16, 16)),       # downsample
        ((8, 8), (8, 8)),           # identity
        ((1, 7), (5, 13)),          # degenerate 1-row input
        ((7, 5), (1, 1)),           # degenerate 1-pixel output
    ],
)
def test_matches_torch_align_corners(rng, in_hw, out_hw):
    n, c = 2, 19
    x = rng.standard_normal((n, *in_hw, c), dtype=np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    want = (
        F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # matmul-formulated interpolation differs from torch's gather-lerp by
    # fp32 rounding only (~3e-5 max on 2e7 elements).
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_gradient_flows(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((1, 9, 9, 3), dtype=np.float32))

    def f(x):
        return jnp.sum(resize_bilinear_align_corners(x, (33, 33)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))

    # VJP parity vs torch autograd through the same resize.
    xt = torch.from_numpy(np.array(x)).permute(0, 3, 1, 2).requires_grad_(True)
    y = F.interpolate(xt, size=(33, 33), mode="bilinear", align_corners=True)
    (y**2).sum().backward()
    want = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-4)


def test_h_rows_chunking_is_exact(rng):
    """Row-block slices of the H interp matmul reassemble the full resize
    (the full-res eval streaming path, VERDICT r2 #3). Tolerance: XLA may
    fuse the two einsums differently per output shape — 1-ulp reassociation
    differences are expected; the math is the same sliced matmul."""
    x = jnp.asarray(rng.standard_normal((2, 17, 33, 5), dtype=np.float32))
    out_hw = (64, 96)
    full = np.asarray(resize_bilinear_align_corners(x, out_hw))
    for chunk in (7, 16, 64, 100):
        parts = [
            np.asarray(
                resize_bilinear_align_corners(
                    x, out_hw, h_rows=(r0, min(r0 + chunk, out_hw[0]))
                )
            )
            for r0 in range(0, out_hw[0], chunk)
        ]
        np.testing.assert_allclose(
            np.concatenate(parts, axis=1), full, atol=1e-6, rtol=0
        )
