"""DeepLabV2 forward parity: JAX NHWC model vs torch-CPU oracle.

Gate from SURVEY.md §7 step 1: CPU logits vs torch <= 1e-4. A reduced-depth
ResNet (blocks 1,1,2,1) exercises every architectural feature — stem,
ceil-mode maxpool, strided stage, both dilated stages, downsample branches,
frozen BN folding, both ASPP heads — while keeping test time sane; the
full-depth (3,4,23,3) parity runs once at lower spatial size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from maxsquareloss_tpu.convert import torch_state_dict_to_pytrees
from maxsquareloss_tpu.models.deeplabv2 import (
    DeepLabV2Config,
    apply_deeplabv2,
    init_deeplabv2,
    lr_mult_tree,
)
from maxsquareloss_tpu.models.layers import max_pool_ceil
from tests.torch_oracle import make_oracle

SMALL = (1, 1, 2, 1)


def _to_pytrees(model, blocks, num_classes=19):
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return torch_state_dict_to_pytrees(sd, blocks=blocks, num_classes=num_classes)


def _forward_pair(model, blocks, x_nchw, multi_level=True, remat=""):
    params, frozen = _to_pytrees(model, blocks)
    cfg = DeepLabV2Config(blocks=blocks, multi_level=multi_level, remat=remat)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    aux_j, main_j = jax.jit(
        lambda p, f, x: apply_deeplabv2(p, f, x, cfg)
    )(params, frozen, x)
    with torch.no_grad():
        aux_t, main_t = model(torch.from_numpy(x_nchw))
    return aux_j, main_j, aux_t, main_t


def _nchw(t):
    return np.transpose(np.asarray(t), (0, 3, 1, 2))


def test_maxpool_ceil_mode(rng):
    # stem pooling: torch MaxPool2d(3,2,1,ceil_mode=True) parity incl. odd sizes
    for h, w in [(256, 512), (33, 65), (17, 31)]:
        x = rng.standard_normal((1, h, w, 4), dtype=np.float32)
        got = np.asarray(max_pool_ceil(jnp.asarray(x)))
        want = (
            torch.nn.functional.max_pool2d(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                3, stride=2, padding=1, ceil_mode=True,
            ).permute(0, 2, 3, 1).numpy()
        )
        np.testing.assert_array_equal(got, want)


def test_small_model_parity(rng):
    model = make_oracle(layers=SMALL)
    x = rng.standard_normal((2, 3, 65, 97), dtype=np.float32)
    aux_j, main_j, aux_t, main_t = _forward_pair(model, SMALL, x)
    assert main_j.shape[-1] == 19
    np.testing.assert_allclose(_nchw(main_j), main_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(_nchw(aux_j), aux_t.numpy(), atol=1e-4)
    # output stride 8 (ceil-mode stem)
    assert main_j.shape[1:3] == (9, 13)


def test_small_model_parity_single_level(rng):
    model = make_oracle(layers=SMALL, multi_level=False)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    aux_j, main_j, aux_t, main_t = _forward_pair(model, SMALL, x, multi_level=False)
    assert aux_j is None and aux_t is None
    np.testing.assert_allclose(_nchw(main_j), main_t.numpy(), atol=1e-4)


def test_remat_stages_same_output(rng):
    model = make_oracle(layers=SMALL)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    _, main_plain, _, _ = _forward_pair(model, SMALL, x)
    _, main_remat, _, _ = _forward_pair(model, SMALL, x, remat="stages")
    np.testing.assert_allclose(
        np.asarray(main_plain), np.asarray(main_remat), atol=1e-6
    )


@pytest.mark.slow
def test_full_resnet101_parity(rng):
    model = make_oracle()  # full (3,4,23,3)
    x = rng.standard_normal((1, 3, 129, 129), dtype=np.float32)
    _, main_j, _, main_t = _forward_pair(model, (3, 4, 23, 3), x)
    np.testing.assert_allclose(_nchw(main_j), main_t.numpy(), atol=2e-4)


def test_init_structure_matches_converted(rng):
    # random init produces the same pytree structure the converter emits
    model = make_oracle(layers=SMALL)
    params_c, frozen_c = _to_pytrees(model, SMALL)
    params_i, frozen_i = init_deeplabv2(
        jax.random.key(0), DeepLabV2Config(blocks=SMALL)
    )
    assert jax.tree.structure(params_c) == jax.tree.structure(params_i)
    assert jax.tree.structure(frozen_c) == jax.tree.structure(frozen_i)
    for (pc, li), (pi, _) in zip(
        jax.tree.leaves_with_path(params_c), jax.tree.leaves_with_path(params_i)
    ):
        del li
    for a, b in zip(jax.tree.leaves(params_c), jax.tree.leaves(params_i)):
        assert a.shape == b.shape


def test_aspp_sum_matches_conv_formulation(rng):
    """MXU-optimized ASPP (matmul fwd + conv adjoints) == naive summed
    dilated convs, values AND gradients (exact linear rearrangement)."""
    import jax
    import jax.numpy as jnp

    from maxsquareloss_tpu.models.deeplabv2 import ASPP_DILATIONS
    from maxsquareloss_tpu.models.layers import (
        _aspp_conv_reference,
        aspp_sum,
    )

    x = jnp.asarray(rng.normal(0, 1, (2, 17, 33, 64)).astype(np.float32))
    ws = tuple(
        jnp.asarray(rng.normal(0, 0.01, (3, 3, 64, 19)).astype(np.float32))
        for _ in ASPP_DILATIONS
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.01, (19,)).astype(np.float32))
        for _ in ASPP_DILATIONS
    )
    ref = _aspp_conv_reference(x, ws, bs, ASPP_DILATIONS)
    got = aspp_sum(x, list(ws), list(bs), ASPP_DILATIONS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def loss_fast(x, ws, bs):
        return jnp.sum(jnp.square(aspp_sum(x, list(ws), list(bs), ASPP_DILATIONS)))

    def loss_ref(x, ws, bs):
        return jnp.sum(jnp.square(_aspp_conv_reference(x, ws, bs, ASPP_DILATIONS)))

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, ws, bs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5)


def test_lr_mult_tree():
    params, _ = init_deeplabv2(jax.random.key(0), DeepLabV2Config(blocks=SMALL))
    mults = lr_mult_tree(params)
    assert jax.tree.structure(mults) == jax.tree.structure(
        jax.tree.map(lambda _: 0.0, params)
    )
    assert all(m == 10.0 for m in jax.tree.leaves(mults["layer6"]))
    assert all(m == 10.0 for m in jax.tree.leaves(mults["layer5"]))
    assert all(m == 1.0 for m in jax.tree.leaves(mults["layer1"]))
    assert all(m == 1.0 for m in jax.tree.leaves(mults["conv1"]))


# space_to_batch / fused-block parity tests moved with their retired
# implementations to experiments/retired_pallas (see BASELINE.md ablations).
