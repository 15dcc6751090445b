"""Device mesh + sharding layout for SPMD data parallelism.

The reference is single-GPU (mngrdevice.py:18); the TPU-native replacement
is GSPMD: one logical program over a jax.sharding.Mesh, batch dimension
sharded over the 'data' axis, parameters/optimizer state replicated. XLA
inserts the gradient all-reduce (psum over ICI) automatically from the
sharding propagation — there is no hand-written collective in the train
step. BatchNorm statistics are computed over the *global* batch (reductions
over a sharded axis lower to ICI collectives), i.e. sync-BN for free.

Tested on a CPU-simulated 8-device mesh (tests/conftest.py) — the TPU
analogue of multi-node simulation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The mesh the current Trainer is sharding over, for compute layers that
# need a concrete mesh at trace time (ops/pallas spmd_call wraps Mosaic
# kernels in shard_map over this mesh's data axis — pallas_call has no
# GSPMD partitioning rule of its own). One process drives one mesh at a
# time; Trainer registers its mesh on construction.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data",
              mesh_shape=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    mesh_shape: optional tuple for future nD layouts; a 1-D (N,) shape is
    the DP-only layout that matches the reference's capability surface
    (SURVEY.md §2.3).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if mesh_shape is not None:
        devices = devices.reshape(mesh_shape)
        axis_names = tuple(f"axis{i}" for i in range(devices.ndim - 1)) + (axis_name,)
        return Mesh(devices, axis_names)
    return Mesh(devices, (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place host arrays as global arrays sharded on the batch axis."""
    s = data_sharding(mesh, axis_name)
    return tuple(jax.device_put(b, s) for b in batch)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> tuple:
    """Multi-host runtime bring-up (DCN): call once per host before any
    jax use, then make_mesh() sees every chip in the slice. Single-host
    (including this repo's 1-chip dev loop) needs no call. Returns
    (process_index, process_count, local_device_count) for wiring the
    per-host DataLoader shard (loader.host_id/num_hosts)."""
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count(), jax.local_device_count()
