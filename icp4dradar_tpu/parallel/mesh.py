"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (or reshaped) mesh over the first n devices.

    Single-axis "dp" shards scans/factors; pass axis_names=("dp","map") with
    a 2-D shape to also shard map blocks spatially (SURVEY.md §7 step 7).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    import numpy as np

    return Mesh(np.asarray(devs).reshape(shape), axis_names)
