"""Multi-process (multi-host / DCN) execution.

The reference has no distributed layer at all (SURVEY §2.6: no
NCCL/MPI/threads anywhere — its only cross-process contract is CSV files
compared offline). The TPU-native way to cross hosts is jax.distributed:
one JAX process per host joins a global runtime, the ``Mesh`` spans every
host's devices, ``NamedSharding('scene')`` places per-host scene shards,
and XLA routes scene-axis collectives over ICI within a pod slice and
DCN across hosts. The sharded programs themselves are UNCHANGED from the
single-host path (``parallel/multiscene.py``, ``parallel/multi_scan.py``)
— only mesh construction and array placement differ, which this module
packages.

Validated without TPU pods by ``tests/test_distributed.py``: N worker
processes × M virtual CPU devices each form one global mesh and run the
scene-sharded two-view stage with cross-process collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join this process to the global JAX runtime.

    Call once per process, BEFORE any other JAX API touches the backend —
    including ``import sfm_tpu`` (its import tree warms compute modules).
    The canonical multi-host entry order is::

        import jax
        jax.distributed.initialize(...)   # or this wrapper via a
                                          # deferred import
        import sfm_tpu                    # everything else afterwards

    On real TPU pods the arguments come from the deployment environment
    (and on Cloud TPU ``jax.distributed.initialize()`` autodetects them);
    for CPU validation the test harness passes an explicit local
    coordinator."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(hyp_axis: int = 1) -> Mesh:
    """('scene','hyp') mesh over ALL global devices (every process).

    Identical semantics to ``mesh.make_mesh`` but documented for the
    multi-process case: ``jax.devices()`` returns the global device list
    after ``initialize``, so the same constructor spans hosts."""
    devs = jax.devices()
    n = len(devs)
    if n % hyp_axis != 0:
        raise ValueError(f"{n} global devices not divisible by {hyp_axis}")
    arr = np.array(devs).reshape(n // hyp_axis, hyp_axis)
    return Mesh(arr, ("scene", "hyp"))


def scene_shard(mesh: Mesh, global_batch: np.ndarray) -> jax.Array:
    """Build a global array sharded over the mesh 'scene' axis from
    process-local data.

    ``global_batch`` is the FULL (S, ...) batch, identical on every
    process (cheap for metadata-scale inputs); each process contributes
    only the rows its devices own. For host-local datasets, slice the
    per-process rows before calling and pass just the local shard via
    ``jax.make_array_from_process_local_data`` directly."""
    sharding = NamedSharding(mesh, P("scene"))
    S = global_batch.shape[0]
    n_scene = mesh.shape["scene"]
    if S % n_scene != 0:
        raise ValueError(f"batch {S} not divisible by scene axis {n_scene}")
    rows_per = S // n_scene
    # rows owned by this process = rows of scene-axis slots whose device
    # is addressable here
    local_rows = []
    scene_devs = mesh.devices[:, 0]
    for slot, d in enumerate(scene_devs):
        if d.process_index == jax.process_index():
            local_rows.append(
                global_batch[slot * rows_per:(slot + 1) * rows_per])
    local = np.concatenate(local_rows, axis=0) if local_rows else \
        np.zeros((0,) + global_batch.shape[1:], global_batch.dtype)
    return jax.make_array_from_process_local_data(
        sharding, local, global_batch.shape)
