"""Multi-host execution: jax.distributed bring-up and cross-host render.

SURVEY.md §5.8: the reference has no distributed backend at all; the
TPU-native story is the JAX global runtime — one process per host, all
chips in one global mesh, ICI inside a slice, DCN across hosts.  Sample
accumulation (`psum` over "spp") stays on ICI by construction because the
spp axis is laid out within a host's chips; the "tiles" (pixel) axis
crosses hosts but needs no communication until image assembly.

Single-host (or CPU-simulated) runs work unchanged: `bring_up()` is a
no-op when there is one process, and `global_mesh()` is then just
`make_mesh` over the local devices.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils.profiling import log
from .mesh import make_mesh


_brought_up = False


def bring_up(coordinator: Optional[str] = None,
             num_processes: Optional[int] = None,
             process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, reads the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata on Cloud TPU) and no-ops for single-process runs.

    Must run before any other JAX call: querying the backend (even
    `jax.process_count()`) initializes it single-process and the
    coordination service can no longer join, which is why the guard here
    is a module flag, not a backend query.
    """
    global _brought_up
    if _brought_up:
        return
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _brought_up = True
    log.info("distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def global_mesh(n_spp: int = 1) -> Mesh:
    """(tiles, spp) mesh over ALL devices of every host.

    The spp axis is laid out over chips WITHIN a host (contiguous local
    devices) so its psum rides ICI; the tiles axis spans hosts (DCN sees
    only the final sharded image, which is never all-gathered unless the
    caller asks).
    """
    devices = jax.devices()
    n = len(devices)
    assert n % n_spp == 0, f"{n} devices not divisible by spp={n_spp}"
    # jax.devices() orders by (process, local id); reshaping to
    # (tiles, spp) with spp fastest keeps each spp group within a process
    # as long as n_spp divides the local device count.
    dev_array = np.array(devices).reshape(n // n_spp, n_spp)
    return Mesh(dev_array, ("tiles", "spp"))


def assemble_image(img_sharded) -> np.ndarray:
    """Fetch a "tiles"-sharded image to the host as one numpy array (the
    only cross-host gather in the pipeline; for pure rendering jobs each
    host could instead persist its own shard)."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return np.asarray(img_sharded)
    return np.asarray(
        multihost_utils.process_allgather(img_sharded, tiled=True))
