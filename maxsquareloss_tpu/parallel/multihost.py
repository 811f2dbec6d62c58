"""Multi-host data parallelism over DCN (SURVEY.md §5.8 rebuild plan).

The reference is strictly single-process (nn.DataParallel). The TPU-native
scale-out path: ``jax.distributed.initialize()`` per host, then a 2-D mesh
``(dcn, ici)`` where the inner axis rides ICI within a slice and the outer
axis crosses hosts over DCN. Training stays pure data-parallel: the global
batch is sharded over BOTH axes (flattened 'data' view), params replicated;
XLA hierarchically reduces gradients (ICI first, then DCN).

On a single host this degenerates to the 1-D mesh from parallel.mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the multi-host runtime (no-op for single-process runs).

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU test rigs pass them explicitly.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def hierarchical_dp_mesh(ici_size: int | None = None, sp: int = 1) -> Mesh:
    """(dcn, ici[, space]) mesh over all global devices.

    ``ici_size`` defaults to the local device count (devices per host /
    slice); the dcn axis spans process groups. ``sp`` > 1 carves a trailing
    'space' axis out of the ICI dimension (spatial partitioning of image
    height — parallel/mesh.py): the halo exchanges stay on ICI within a
    slice, only the batch/gradient reduction crosses DCN.
    """
    from maxsquareloss_tpu.parallel.mesh import SPACE_AXIS

    devices = jax.devices()
    if ici_size is None:
        ici_size = jax.local_device_count()
    assert len(devices) % ici_size == 0, (
        f"{len(devices)} devices not divisible by ici_size={ici_size}"
    )
    if sp <= 1:
        arr = np.asarray(devices).reshape(len(devices) // ici_size, ici_size)
        return Mesh(arr, (DCN_AXIS, ICI_AXIS))
    if ici_size % sp:
        raise ValueError(f"--sp {sp} does not divide ici_size={ici_size}")
    arr = np.asarray(devices).reshape(
        len(devices) // ici_size, ici_size // sp, sp
    )
    return Mesh(arr, (DCN_AXIS, ICI_AXIS, SPACE_AXIS))


def hierarchical_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch sharded over both axes (hierarchical data parallelism).

    Delegates to the generic mesh helper so there is exactly one place the
    batch partition spec is defined (Trainer uses that helper directly;
    per-host batch slicing lives in the sharded loaders — tools/common.py).
    """
    from maxsquareloss_tpu.parallel.mesh import batch_sharding

    return batch_sharding(mesh)


def hierarchical_replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
