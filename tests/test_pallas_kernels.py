"""Pallas kernels vs their XLA twins (interpret mode on CPU).

The round-1 LK Pallas kernel (per-track sequential grid with windowed
ref loads) was DELETED in round 2: its dynamic lane-dimension ref slices
cannot lower to Mosaic TC on real hardware at all, and the batched XLA
window formulation (ops/klt.py) already runs the level in ~0.02 ms.
The Shi-Tomasi kernel measured 1.3-1.9x faster than its XLA twin on a
v5e chip (tools/bench_pallas.py) and is the TPU-backend default."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import features, image as im, klt
from sfm_tpu.ops.pallas import shi_tomasi_kernel


def make_textured(rng, H=128, W=256):
    from scipy.ndimage import gaussian_filter

    return (gaussian_filter(rng.standard_normal((H, W)), 2.0) * 60 + 128).astype(
        np.float32
    )


def test_shi_tomasi_pallas_matches_xla(rng):
    img = jnp.asarray(make_textured(rng))
    ref = np.asarray(features.shi_tomasi_score(img, block_radius=2))
    out = np.asarray(
        shi_tomasi_kernel.shi_tomasi_score_pallas(img, block_radius=2,
                                                  interpret=True)
    )
    # borders differ (wrap vs zero); compare the interior
    b = 4
    np.testing.assert_allclose(out[b:-b, b:-b], ref[b:-b, b:-b], rtol=1e-4,
                               atol=1e-3)


