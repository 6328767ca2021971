"""Device mesh construction for the (tile, spp) axes."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _factor(n: int) -> tuple:
    """Split n devices into (tile, spp) as square-ish as possible with
    tile >= spp (pixel parallelism first — it is load-balanced)."""
    best = (n, 1)
    for spp in range(1, int(np.sqrt(n)) + 1):
        if n % spp == 0:
            best = (n // spp, spp)
    return best


def make_mesh(
    devices: Optional[Sequence] = None,
    tile: Optional[int] = None,
    spp: Optional[int] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None and spp is None:
        tile, spp = _factor(n)
    elif tile is None:
        tile = n // spp
    elif spp is None:
        spp = n // tile
    assert tile * spp == n, f"mesh {tile}x{spp} != {n} devices"
    arr = np.asarray(devices).reshape(tile, spp)
    return Mesh(arr, axis_names=("tile", "spp"))
