"""Multi-host (DCN) helpers.

Single-host meshes cover every testable configuration in this environment;
these helpers extend the same layouts across hosts: each process feeds its
local slice of the global batch / corpus and the global array is assembled
with ``jax.make_array_from_process_local_data``, so host->device traffic
stays local and only collectives ride DCN (SURVEY.md §2.12 plan).

Untestable without multiple hosts; kept thin and mirroring the documented
jax multi-process recipe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names=("data",), shape=None) -> Mesh:
    """Mesh over ALL devices across processes (jax.devices() is global)."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),)
        axis_names = tuple(axis_names)[:1]
    return Mesh(devices.reshape(shape), tuple(axis_names))


def host_local_batch_to_global(
    local_batch, mesh: Mesh, axis: str = "data"
):
    """Assemble a per-process batch slice into the global sharded batch.

    Each process passes its own rows; the result is a global array whose
    leading axis is the concatenation over processes, sharded over ``axis``.
    """
    sharding = NamedSharding(mesh, P(axis))

    def convert(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(convert, local_batch)


def process_slice(n_global: int) -> Tuple[int, int]:
    """This process's [start, end) slice of a length-n_global leading axis
    split evenly over processes."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = n_global // np_
    return p * per, (p + 1) * per if p < np_ - 1 else n_global
