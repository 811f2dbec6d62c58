"""Checkpoint save / load / resume (orbax) + torch .pth import.

Rebuild of the reference's ``save_checkpoint`` / ``load_checkpoint``
(reference: tools/train_source.py, SURVEY.md §3.5/§5.4): full training
checkpoints carry {epoch, iteration, params, optimizer state, best mIoU};
"best" is kept separately by val mIoU; ``--continue_training`` resumes
epoch/iteration/optimizer. torch ``.pth`` files (the caffe-converted init
and the released model zoo, with their ``module.`` DataParallel prefixes)
load through maxsquareloss_tpu.convert.

Uses orbax-checkpoint's PyTreeCheckpointer via ocp.StandardCheckpointer for
async-safe atomic writes.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from maxsquareloss_tpu.convert import torch_state_dict_to_pytrees
from maxsquareloss_tpu.optim import SGDState
from maxsquareloss_tpu.train.steps import TrainState

LATEST = "checkpoint_latest"
BEST = "checkpoint_best"


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


# One long-lived checkpointer so saves can complete in the background while
# training continues (§5.3: async checkpointing for preemption resilience).
_CKPT: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPT
    if _CKPT is None:
        _CKPT = ocp.StandardCheckpointer()
    return _CKPT


def wait_for_saves():
    """Block until any in-flight async save has committed."""
    if _CKPT is not None:
        _CKPT.wait_until_finished()


def save_checkpoint(
    checkpoint_dir: str,
    state: TrainState,
    frozen: Any,
    epoch: int,
    best_miou: float,
    is_best: bool = False,
    wait: bool = False,
    epoch_batch: int = 0,
):
    """Write latest (and optionally best) checkpoint atomically.

    The write is ASYNC by default: the payload is snapshotted to host
    memory up front, the previous in-flight save (if any) is drained, and
    the new save commits in the background while training continues. Pass
    ``wait=True`` (or call wait_for_saves) to block until durable.
    """
    payload = {
        "params": _to_host(state.params),
        "momentum": _to_host(state.opt.momentum),
        "opt_initialized": bool(np.asarray(state.opt.initialized)),
        "frozen": _to_host(frozen),
        "iteration": int(np.asarray(state.iteration)),
        "epoch": int(epoch),
        # batches already consumed within `epoch` (mid-epoch saves); resume
        # skips this many batches of the SAME epoch → exact data-order resume
        "epoch_batch": int(epoch_batch),
        "best_miou": float(best_miou),
    }
    ckpt = _checkpointer()
    ckpt.wait_until_finished()  # at most one save in flight
    path = os.path.abspath(os.path.join(checkpoint_dir, LATEST))
    ckpt.save(path, payload, force=True)
    if is_best:
        ckpt.save(os.path.abspath(os.path.join(checkpoint_dir, BEST)), payload, force=True)
    if wait:
        ckpt.wait_until_finished()


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint directory written by save_checkpoint."""
    wait_for_saves()  # a resume racing an in-flight save must see it land
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path))


def restore_train_state(
    payload: dict,
) -> tuple[TrainState, Any, int, float]:
    """payload → (TrainState, frozen, epoch, best_miou).

    Mid-epoch position is in ``payload['epoch_batch']`` (0 for epoch-end
    checkpoints and pre-round-2 checkpoints)."""
    import jax.numpy as jnp

    state = TrainState(
        params=jax.tree.map(jnp.asarray, payload["params"]),
        opt=SGDState(
            momentum=jax.tree.map(jnp.asarray, payload["momentum"]),
            initialized=jnp.asarray(bool(payload["opt_initialized"])),
        ),
        iteration=jnp.asarray(int(payload["iteration"]), jnp.int32),
    )
    frozen = jax.tree.map(jnp.asarray, payload["frozen"])
    return state, frozen, int(payload["epoch"]), float(payload["best_miou"])


def load_torch_pth(path: str, num_classes: int | None = None) -> tuple[dict, dict]:
    """Import a reference torch .pth → (params, frozen) pytrees.

    Accepts both bare state dicts (pretrained inits) and full training
    checkpoints with a 'state_dict' key (reference load_checkpoint handles
    both — SURVEY.md §3.5).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return torch_state_dict_to_pytrees(sd_np, num_classes=num_classes)
