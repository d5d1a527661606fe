"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices (default: all).

    Multi-host: call ``jax.distributed.initialize()`` before this; the mesh
    spans all processes' devices and shard_map collectives ride ICI/DCN.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
