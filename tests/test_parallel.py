"""Distributed-without-cluster: data-parallel equivalence on a virtual mesh.

SURVEY.md §4: n-device DP (batch sharded, params replicated, XLA-inserted
gradient all-reduce) must equal the 1-device big-batch step at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
from maxsquareloss_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    replicate_tree,
)
from maxsquareloss_tpu.train.steps import (
    make_supervised_train_step,
    make_train_state,
    make_uda_train_step,
    model_config,
)

SMALL = (1, 1, 2, 1)


def _cfg(**kw):
    kw.setdefault("blocks", SMALL)
    kw.setdefault("data_parallel", False)
    return TrainConfig(**kw)


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8


def test_dp_step_equals_single_device_step(rng):
    cfg = _cfg()
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(-1, 19, (8, 32, 32)).astype(np.int32)

    # 8-device state built FIRST: the train step donates its state arg, so
    # params buffers must be copied before the single-device run consumes them
    mesh = data_parallel_mesh()
    frozen_r = replicate_tree(mesh, frozen)
    params_r = replicate_tree(mesh, params)

    # single-device big batch — deep-copy params: replication above aliases
    # the originals as device-0 shards and step1 donates its state
    step1 = make_supervised_train_step(cfg, frozen)
    s1 = make_train_state(jax.tree.map(jnp.array, params))
    s1, m1 = step1(s1, jnp.asarray(x), jnp.asarray(y))
    step8 = make_supervised_train_step(cfg, frozen_r)
    s8 = replicate_tree(mesh, make_train_state(params_r))
    bs = batch_sharding(mesh)
    s8, m8 = step8(s8, jax.device_put(x, bs), jax.device_put(y, bs))

    assert float(np.asarray(m1["loss"])) == pytest.approx(
        float(np.asarray(m8["loss"])), rel=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_sharded_eval_step_cm_equals_single_device(rng):
    """trainer.validate's production path runs the eval step on batch-sharded
    inputs; the 8-device confusion-matrix partial must equal the 1-device one
    EXACTLY — CM entries are integer-valued sums of per-pixel one-hots, and
    splitting the batch only regroups whole-number addends (VERDICT r3 #3)."""
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg = _cfg()
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    mesh = data_parallel_mesh()
    params_r = replicate_tree(mesh, params)
    frozen_r = replicate_tree(mesh, frozen)
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(-1, 19, (8, 64, 64)).astype(np.int32)  # upsampled labels

    cm1, arg1 = make_eval_step(cfg, frozen)(params, jnp.asarray(x), jnp.asarray(y))
    bs = batch_sharding(mesh)
    cm8, arg8 = make_eval_step(cfg, frozen_r)(
        params_r, jax.device_put(x, bs), jax.device_put(y, bs)
    )
    np.testing.assert_array_equal(np.asarray(cm8), np.asarray(cm1))
    np.testing.assert_array_equal(np.asarray(arg8), np.asarray(arg1))


def test_spatial_partitioned_eval_cm_equals_single_device(rng):
    """SP (image-H sharded over the 'space' axis, GSPMD halo exchanges) must
    leave the eval confusion matrix bit-exact: argmax'd predictions are
    integers and H-splitting only regroups whole-number CM addends. This is
    the batch-1/full-res scale-out path DP cannot cover (parallel/mesh.py)."""
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg = _cfg()
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    x = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)
    y = rng.integers(-1, 19, (4, 128, 128)).astype(np.int32)

    cm1, arg1 = make_eval_step(cfg, frozen)(params, jnp.asarray(x), jnp.asarray(y))

    for sp in (4, 8):  # dp2 x sp4, and pure-spatial sp8 (batch-1-style)
        mesh = data_parallel_mesh(sp=sp)
        params_r = replicate_tree(mesh, params)
        frozen_r = replicate_tree(mesh, frozen)
        bs = batch_sharding(mesh)
        cm_s, arg_s = make_eval_step(cfg, frozen_r)(
            params_r, jax.device_put(x, bs), jax.device_put(y, bs)
        )
        np.testing.assert_array_equal(np.asarray(cm_s), np.asarray(cm1))
        np.testing.assert_array_equal(np.asarray(arg_s), np.asarray(arg1))


def test_spatial_partitioned_chunked_eval_matches(rng):
    """The row-chunked eval tail (eval_h_chunk, full-res protocol default)
    composed with SP: slicing output rows of an H-sharded computation must
    still give the exact single-device CM — the chunk boundaries and the
    shard boundaries need not align (chunk 24 rows x 4-way-sharded 128)."""
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg1 = _cfg(eval_h_chunk=0)
    cfg = _cfg(eval_h_chunk=24)  # deliberately not a divisor of H=128
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    x = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)
    y = rng.integers(-1, 19, (4, 128, 128)).astype(np.int32)

    cm1, arg1 = make_eval_step(cfg1, frozen)(params, jnp.asarray(x), jnp.asarray(y))

    mesh = data_parallel_mesh(sp=4)
    params_r = replicate_tree(mesh, params)
    frozen_r = replicate_tree(mesh, frozen)
    bs = batch_sharding(mesh)
    cm_s, arg_s = make_eval_step(cfg, frozen_r)(
        params_r, jax.device_put(x, bs), jax.device_put(y, bs)
    )
    np.testing.assert_array_equal(np.asarray(cm_s), np.asarray(cm1))
    np.testing.assert_array_equal(np.asarray(arg_s), np.asarray(arg1))


def test_spatial_partitioned_uda_step_equals_single_device(rng):
    """dp2 x sp4 UDA train step == 1-device step: GSPMD's conv halo
    exchanges + the spatially-reduced loss/grad psum reproduce the
    single-device trajectory (measured max param delta ~7e-9)."""
    cfg = _cfg(target_mode="IW_maxsquare")
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    xs = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)
    ys = rng.integers(-1, 19, (4, 64, 64)).astype(np.int32)
    xt = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)

    mesh = data_parallel_mesh(sp=4)
    frozen_r = replicate_tree(mesh, frozen)
    params_r = replicate_tree(mesh, params)

    step1 = make_uda_train_step(cfg, frozen)
    s1 = make_train_state(jax.tree.map(jnp.array, params))
    s1, m1 = step1(s1, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt))

    step_s = make_uda_train_step(cfg, frozen_r)
    s_s = replicate_tree(mesh, make_train_state(params_r))
    bs = batch_sharding(mesh)
    s_s, m_s = step_s(
        s_s, jax.device_put(xs, bs), jax.device_put(ys, bs),
        jax.device_put(xt, bs),
    )
    assert float(np.asarray(m1["loss"])) == pytest.approx(
        float(np.asarray(m_s["loss"])), rel=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_sp_mesh_validation():
    from maxsquareloss_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="does not divide"):
        data_parallel_mesh(sp=3)  # 8 devices
    mesh = data_parallel_mesh(sp=4)
    assert mesh.axis_names == ("data", "space")
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    spec = batch_sharding(mesh).spec
    assert spec == jax.sharding.PartitionSpec(("data",), "space")
    # make_mesh: the CLI-flag resolution (trainer / evaluate / predict)
    assert make_mesh(True, 1).axis_names == ("data",)
    assert dict(make_mesh(True, 2).shape) == {"data": 4, "space": 2}
    assert dict(make_mesh(False, 4).shape) == {"data": 1, "space": 4}
    assert make_mesh(False, 1) is None


def test_uda_dp_step_runs_sharded(rng):
    cfg = _cfg(target_mode="IW_maxsquare")
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    mesh = data_parallel_mesh()
    frozen = replicate_tree(mesh, frozen)
    params = replicate_tree(mesh, params)
    step = make_uda_train_step(cfg, frozen)
    state = replicate_tree(mesh, make_train_state(params))
    bs = batch_sharding(mesh)
    xs = jax.device_put(rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32), bs)
    ys = jax.device_put(rng.integers(-1, 19, (8, 32, 32)).astype(np.int32), bs)
    xt = jax.device_put(rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32), bs)
    state, metrics = step(state, xs, ys, xt)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    # updated params remain replicated (fully addressable on every device)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated



def test_quantized_eval_cm_equals_single_device_under_dp(rng):
    """int8 x DP (the supported int8 composition — SP is gated): the
    8-device batch-sharded eval CM on a QUANTIZED params tree must equal
    the 1-device quantized CM exactly. The int8 conv core is integer math
    and the dequant scales are replicated constants, so batch sharding
    regroups the same per-pixel one-hot addends."""
    from maxsquareloss_tpu.models.quantize import calibrate, quantize_params
    from maxsquareloss_tpu.train.steps import make_eval_step

    cfg = _cfg()
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(-1, 19, (8, 64, 64)).astype(np.int32)

    amax = calibrate(params, frozen, cfg, [x[:2]])
    qp = quantize_params(params, amax)

    cm1, arg1 = make_eval_step(cfg, frozen)(qp, jnp.asarray(x), jnp.asarray(y))

    mesh = data_parallel_mesh()
    qp_r = replicate_tree(mesh, qp)
    frozen_r = replicate_tree(mesh, frozen)
    bs = batch_sharding(mesh)
    cm8, arg8 = make_eval_step(cfg, frozen_r)(
        qp_r, jax.device_put(x, bs), jax.device_put(y, bs)
    )
    np.testing.assert_array_equal(np.asarray(cm8), np.asarray(cm1))
    np.testing.assert_array_equal(np.asarray(arg8), np.asarray(arg1))
