"""Checkpoint save/restore roundtrip + torch .pth import path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import (
    DeepLabV2Config,
    apply_deeplabv2,
    init_deeplabv2,
)
from maxsquareloss_tpu.train import checkpoint as ckpt_lib
from maxsquareloss_tpu.train.steps import make_train_state, model_config
from tests.torch_oracle import make_oracle

SMALL = (1, 1, 2, 1)


def test_orbax_roundtrip(tmp_path, rng):
    cfg = TrainConfig(blocks=SMALL, data_parallel=False)
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    state = make_train_state(params)
    # perturb opt state so roundtrip is non-trivial
    state = state._replace(
        iteration=jnp.asarray(42, jnp.int32),
        opt=state.opt._replace(initialized=jnp.asarray(True)),
    )
    # saves are async by default; wait=True blocks until durable
    ckpt_lib.save_checkpoint(
        str(tmp_path), state, frozen, epoch=7, best_miou=0.123, is_best=True,
        wait=True,
    )
    assert os.path.isdir(tmp_path / ckpt_lib.LATEST)
    assert os.path.isdir(tmp_path / ckpt_lib.BEST)

    payload = ckpt_lib.load_checkpoint(str(tmp_path / ckpt_lib.LATEST))
    state2, frozen2, epoch, best = ckpt_lib.restore_train_state(payload)
    assert epoch == 7 and best == 0.123
    assert int(np.asarray(state2.iteration)) == 42
    assert bool(np.asarray(state2.opt.initialized))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(frozen2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_pth_import_with_module_prefix(tmp_path, rng):
    """Reference checkpoints carry DataParallel 'module.' prefixes and a
    'state_dict' wrapper (SURVEY.md §3.5) — both must load, and the loaded
    model must match the torch oracle's forward."""
    model = make_oracle(layers=SMALL)
    sd = {"module." + k: v for k, v in model.state_dict().items()}
    blob = {"state_dict": sd, "epoch": 3, "iteration": 99}
    path = str(tmp_path / "ref.pth")
    torch.save(blob, path)

    params, frozen = ckpt_lib.load_torch_pth(path, num_classes=19)
    cfg = DeepLabV2Config(blocks=SMALL, multi_level=True)
    x = rng.normal(0, 1, (1, 32, 64, 3)).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)
    frozen = jax.tree.map(jnp.asarray, frozen)
    _, main = apply_deeplabv2(params, frozen, jnp.asarray(x), cfg)
    with torch.no_grad():
        _, want = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(main), (0, 3, 1, 2)), want.numpy(), atol=1e-4
    )


def test_torch_pth_import_skips_mismatched_heads(tmp_path):
    """13-class fine-tune: 19-class heads in the .pth are skipped so fresh
    heads can be used (reference re-inits classifiers on class change)."""
    model = make_oracle(layers=SMALL, num_classes=19)
    path = str(tmp_path / "ref19.pth")
    torch.save(model.state_dict(), path)
    params, _ = ckpt_lib.load_torch_pth(path, num_classes=13)
    assert "layer6" not in params and "layer5" not in params
    assert "layer1" in params


def test_export_torch_state_dict_roundtrip_and_oracle_parity(rng):
    """jax → torch export: the reference architecture loads it strict=True,
    re-import reproduces the pytrees, and the torch forward matches."""
    import torch

    from maxsquareloss_tpu.convert import (
        pytrees_to_torch_state_dict,
        torch_state_dict_to_pytrees,
    )
    from maxsquareloss_tpu.models.deeplabv2 import (
        DeepLabV2Config,
        apply_deeplabv2,
        init_deeplabv2,
    )
    from tests.torch_oracle import ResNetMulti

    blocks = (1, 1, 2, 1)
    cfg = DeepLabV2Config(num_classes=19, blocks=blocks)
    params, frozen = init_deeplabv2(jax.random.key(3), cfg)
    sd = pytrees_to_torch_state_dict(params, frozen)

    # 1) strict load into the reference architecture
    model = ResNetMulti(layers=blocks, num_classes=19, multi_level=True)
    model.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    model.eval()

    # 2) re-import reproduces the pytrees (BN unfold→fold is ~exact)
    p2, f2 = torch_state_dict_to_pytrees(sd, blocks=blocks, num_classes=19)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(f2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    # 3) torch forward on the exported weights matches the jax forward
    x = rng.standard_normal((1, 33, 65, 3), dtype=np.float32)
    aux_j, main_j = jax.jit(
        lambda p, f, xx: apply_deeplabv2(p, f, xx, cfg)
    )(params, frozen, jnp.asarray(x))
    with torch.no_grad():
        aux_t, main_t = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(main_j), main_t.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(aux_j), aux_t.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4,
    )
