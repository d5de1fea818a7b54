"""Device mesh helpers.

The reference has no distributed machinery at all (SURVEY.md §2.9: single
GPU, no NCCL/MPI). facekit's scale axis is the gallery (§5.7): million-row
galleries shard row-wise over ICI via ``jax.sharding``; training (a facekit
extension) adds a data axis. All collectives are XLA-inserted.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh; default: all devices on a single 'gallery' axis."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"gallery": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh needs {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)
