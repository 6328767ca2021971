"""Multi-host initialization + pod-slice mesh construction.

Single-host multi-chip needs nothing special (jax.devices() sees the
slice). Across hosts, call init() once per process before any jax use —
it wires jax.distributed over DCN — then make_pod_mesh() builds the
(tile, spp) mesh over the GLOBAL device set. The render/train steps in
parallel.distributed work unchanged: psum over 'spp' rides ICI within
a host's chips and DCN only where the mesh axis crosses hosts, so lay
out 'spp' within hosts (make_pod_mesh does) to keep the radiance
all-reduce off DCN.
"""
from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with env-var defaults (a no-op on a
    single process when no coordinator is configured)."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_pod_mesh(spp: Optional[int] = None):
    """(tile, spp) mesh over all global devices, with the spp axis kept
    WITHIN hosts (contiguous local devices) so the per-pixel radiance
    psum stays on ICI."""
    devices = jax.devices()
    local = jax.local_device_count()
    if spp is None:
        # largest spp axis that divides the local chip count
        spp = 1
        for cand in (2, 4, 8):
            if local % cand == 0:
                spp = cand
    return make_mesh(devices, spp=spp)
