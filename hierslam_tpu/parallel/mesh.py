"""Device-mesh helpers.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed
anywhere); multi-chip here is a TPU-native *extension*: a 1-D ICI mesh with
a ``data`` axis for keyframe-parallel mapping and a ``tile`` view for
pixel-parallel rendering.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))
