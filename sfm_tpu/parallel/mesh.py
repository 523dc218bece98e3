"""Device-mesh construction helpers.

The reference has no distributed layer at all (SURVEY §2.6: no
NCCL/MPI/threads anywhere). This module is its TPU-native replacement:
scaling is expressed as a ``jax.sharding.Mesh`` with a ``scene`` axis
(data parallelism over independent reconstructions — BASELINE config 5)
and an optional ``hyp`` axis (tensor-style parallelism over RANSAC
hypotheses), with XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, hyp_axis: int = 1) -> Mesh:
    """Build a ('scene','hyp') mesh over the first ``n_devices`` devices.

    ``hyp_axis`` devices are dedicated to hypothesis sharding; the rest
    to scene parallelism. Defaults to all devices on the scene axis.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % hyp_axis != 0:
        raise ValueError(f"n_devices={n} not divisible by hyp_axis={hyp_axis}")
    arr = np.array(devs[:n]).reshape(n // hyp_axis, hyp_axis)
    return Mesh(arr, ("scene", "hyp"))
