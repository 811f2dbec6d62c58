"""Device mesh + shardings: data-parallel (+ optional spatial) over ICI.

The reference's entire parallelism story is single-process
``nn.DataParallel`` (replicate + scatter/gather each step — SURVEY.md
C18/§5.8 and the §2 parallelism census: DP only; no TP/PP/EP apply to
this 43M-param CNN). The TPU-native equivalents built here:

- **DP**: a 1-D ``jax.sharding.Mesh`` over all local devices, axis
  ``'data'``; batches sharded on 'data', params/optimizer state replicated;
  the jitted train step is annotated with these shardings — XLA inserts the
  gradient all-reduce over ICI (psum) automatically.
- **SP (spatial partitioning)**: an optional second axis ``'space'`` that
  shards the image **height** dimension. GSPMD propagates the H-sharding
  through every conv/pool and inserts the halo exchanges (collective-permute
  over ICI) itself — no manual ghost-row code. This is the scale-out path DP
  cannot cover: batch-1 / full-resolution inference and eval (2048x1024
  labels), where the batch axis has nothing left to shard. Verified
  equivalent on the virtual mesh: eval confusion matrix bit-exact, UDA train
  step max param delta ~7e-9 vs the 1-device step (tests/test_parallel.py).
- multi-host DP over DCN extends the same picture via
  ``jax.distributed.initialize()`` + a leading 'dcn' axis
  (parallel/multihost.py).

Eval confusion-matrix partials computed from sharded batches are likewise
all-reduced by XLA since the output sharding is replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def data_parallel_mesh(devices=None, sp: int = 1) -> Mesh:
    """Mesh over the given (default: all local) devices.

    ``sp`` > 1 adds a trailing ``'space'`` axis of that size (sharding the
    image H dimension — see module docstring); the 'data' axis covers the
    remaining ``len(devices) // sp`` ways of batch parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if sp <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % sp:
        raise ValueError(
            f"--sp {sp} does not divide the device count {len(devices)}"
        )
    arr = np.asarray(devices).reshape(len(devices) // sp, sp)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def local_data_axis_size(data_parallel: bool, sp: int = 1) -> int:
    """How many ways THIS process's batch shard splits across its local
    devices — the one source of truth for batch-divisibility checks
    (tools/common.make_loader) so they cannot drift from the mesh geometry
    above. Raises the same error data_parallel_mesh would, but before any
    loader/compile work."""
    if not data_parallel:
        return 1
    n = jax.local_device_count()
    sp = max(1, sp)
    if n % sp:
        raise ValueError(
            f"--sp {sp} does not divide the local device count {n}"
        )
    return n // sp


def make_mesh(data_parallel: bool = True, sp: int = 1) -> Mesh | None:
    """Mesh (or None) from the CLI parallelism flags.

    - data_parallel: DP over ALL local devices, optionally with a trailing
      'space' axis of size sp (dp x sp).
    - no data_parallel but sp > 1: PURE spatial partitioning over the first
      sp devices — a (1, sp) mesh. The batch-1 serving case
      (tools/predict.py --sp) and small-batch full-res eval.
    - neither: None (single device).
    """
    if data_parallel:
        return data_parallel_mesh(sp=sp)
    if sp > 1:
        return data_parallel_mesh(jax.devices()[:sp], sp=sp)
    return None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, H, ...) image/label batches on this mesh.

    The leading (batch) dim shards across every non-'space' axis — for the
    1-D local mesh that is P('data'); for the multi-host (dcn, ici) mesh it
    flattens both axes onto the batch dim (pure hierarchical data
    parallelism, SURVEY.md §5.8). When the mesh has a 'space' axis, dim 1
    (image height) additionally shards across it — every array this helper
    is applied to (images NHWC, labels NHW) has H at dim 1.
    """
    if SPACE_AXIS in mesh.axis_names:
        data_axes = tuple(a for a in mesh.axis_names if a != SPACE_AXIS)
        return NamedSharding(mesh, P(data_axes, SPACE_AXIS))
    return NamedSharding(mesh, P(mesh.axis_names))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """device_put host batches with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / frozen / opt state) across the mesh."""
    sh = replicate(mesh)
    return jax.device_put(tree, sh)
