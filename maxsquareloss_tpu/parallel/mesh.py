"""Device mesh + shardings: pure data-parallel over ICI.

The reference's entire parallelism story is single-process
``nn.DataParallel`` (replicate + scatter/gather each step — SURVEY.md
C18/§5.8 and the §2 parallelism census: DP only; no TP/PP/SP/EP apply to
this 43M-param CNN). The TPU-native equivalent built here:

- a 1-D ``jax.sharding.Mesh`` over all local devices, axis ``'data'``;
- batches sharded on 'data', params/optimizer state replicated;
- the jitted train step is annotated with these shardings — XLA inserts the
  gradient all-reduce over ICI (psum) automatically;
- multi-host DP over DCN later extends the same mesh via
  ``jax.distributed.initialize()`` + a second axis.

Eval confusion-matrix partials computed from sharded batches are likewise
all-reduced by XLA since the output sharding is replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices=None) -> Mesh:
    """1-D mesh over the given (default: all local) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across ALL mesh axes.

    For the 1-D local mesh this is P('data'); for the multi-host
    (dcn, ici) mesh it flattens both axes onto the batch dim — pure
    hierarchical data parallelism (SURVEY.md §5.8).
    """
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
