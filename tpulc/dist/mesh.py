"""Device mesh construction for block data-parallelism."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

BLOCKS_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis: str = BLOCKS_AXIS) -> Mesh:
    """1D mesh over the first `n_devices` devices (default: all).

    Compression blocks are embarrassingly parallel, so a single mesh
    axis suffices; ICI/DCN topology only matters for the ordered
    compressed-stream gather, which is a single all_gather at the end.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
