"""Hierarchical (dcn, ici) mesh tests on the virtual 8-device CPU rig."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
from maxsquareloss_tpu.parallel.multihost import (
    hierarchical_batch_sharding,
    hierarchical_dp_mesh,
    hierarchical_replicate,
    process_local_batch_slice,
)
from maxsquareloss_tpu.train.steps import (
    make_supervised_train_step,
    make_train_state,
    model_config,
)

SMALL = (1, 1, 2, 1)


def test_mesh_shape():
    mesh = hierarchical_dp_mesh(ici_size=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "ici")


def test_step_on_2d_mesh(rng):
    cfg = TrainConfig(blocks=SMALL, data_parallel=False)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    mesh = hierarchical_dp_mesh(ici_size=4)
    repl = hierarchical_replicate(mesh)
    bs = hierarchical_batch_sharding(mesh)
    frozen = jax.device_put(frozen, repl)
    params = jax.device_put(params, repl)
    step = make_supervised_train_step(cfg, frozen)
    state = jax.device_put(make_train_state(params), repl)
    x = jax.device_put(rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32), bs)
    y = jax.device_put(rng.integers(-1, 19, (8, 32, 32)).astype(np.int32), bs)
    state, metrics = step(state, x, y)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated


def test_process_local_batch_slice():
    start, size = process_local_batch_slice(32)
    assert (start, size) == (0, 32)  # single process owns the whole batch
