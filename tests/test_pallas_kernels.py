"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import features, image as im, klt
from sfm_tpu.ops.pallas import lk_kernel, shi_tomasi_kernel


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


def test_lk_pallas_matches_xla(rng):
    from scipy.ndimage import shift as ndshift

    img0 = make_textured(rng)
    img1 = ndshift(img0, (1.3, -2.1), order=3, mode="nearest").astype(np.float32)
    T = 32
    pts = rng.uniform(20, 100, (T, 2)).astype(np.float32)
    v0 = jnp.zeros((T, 2), jnp.float32)
    v_ref = klt._lk_level(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(pts), v0, 10, 5, 1e-4,
    )
    v_pal = lk_kernel.lk_level_pallas(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts), v0,
        iters=10, radius=5, interpret=True,
    )
    # both must recover the (-2.1, 1.3) flow for interior points
    flow_ref = np.asarray(v_ref)
    flow_pal = np.asarray(v_pal)
    np.testing.assert_allclose(np.median(flow_pal[:, 0]), -2.1, atol=0.15)
    np.testing.assert_allclose(np.median(flow_pal[:, 1]), 1.3, atol=0.15)
    # agreement with the XLA path (same algorithm, different sampling of
    # gradients: XLA samples precomputed gradient images, the kernel
    # differentiates the bilinear window — allow a small tolerance)
    d = np.linalg.norm(flow_ref - flow_pal, axis=1)
    assert np.median(d) < 0.2, np.median(d)


def test_lk_pallas_border_clamp(rng):
    """Near-border tracks must sample the clamped position consistently
    (round-1 latent bug: slice origin clamped but fractional offsets
    computed from the unclamped floor -> wrong bilinear location)."""
    from scipy.ndimage import shift as ndshift

    img0 = make_textured(rng, H=64, W=96)
    img1 = ndshift(img0, (0.6, -0.8), order=3, mode="nearest").astype(np.float32)
    # points within radius+1 of every border, plus a few fully outside
    pts = np.array([
        [1.0, 1.0], [94.0, 62.0], [2.5, 60.5], [93.2, 2.2],
        [0.0, 30.0], [95.9, 30.0], [48.0, 0.0], [48.0, 63.0],
        [-3.0, 30.0], [99.0, 30.0],
    ], np.float32)
    v0 = jnp.zeros((len(pts), 2), jnp.float32)
    v = lk_kernel.lk_level_pallas(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts), v0,
        iters=8, radius=5, interpret=True,
    )
    v = np.asarray(v)
    # no NaN/Inf and no runaway updates: border tracks stay bounded (the
    # fb gate downstream rejects them; the kernel must not blow up)
    assert np.isfinite(v).all()
    assert (np.abs(v) < 8.0).all(), v
