"""Image primitives: pyramids, gradients, batched bilinear sampling.

TPU-native replacement for the reference's scalar image ops
(reference: cpp/src/templering_sfm.cpp:183-232 — bilinear ``sample``,
2x2 box ``downsample2``, ``build_pyr``). Sampling is fully batched over
arbitrary point sets so the KLT tracker can gather all track patches in
one XLA op.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_float(img):
    """uint8 HxW -> f32 HxW in [0,255]."""
    return img.astype(jnp.float32)


def downsample2(img):
    """2x2 box-filter downsample (ref: cpp:200-218). Truncates odd edges."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    x = img[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2)
    return x.mean(axis=(1, 3))


def build_pyramid(img, levels: int):
    """List of ``levels`` images, finest first (ref: cpp:220-232)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def gradients(img):
    """Central-difference gradients (gx, gy), zero at borders
    (ref: cpp shi_tomasi uses the same stencil, cpp:243-249)."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def bilinear(img, xy):
    """Bilinear sample ``img`` (H,W) at points ``xy`` (...,2) in (x,y) pixel
    coords; clamps to the valid domain (ref: cpp:183-198)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def box_filter(img, radius: int):
    """(2r+1)^2 box sum via separable cumulative sums — O(HW) regardless of
    radius, replacing the reference's per-pixel (2r+1)^2 loop (cpp:252-263)."""
    k = 2 * radius + 1
    # pad so output is same-size with zero boundary contributions
    p = jnp.pad(img, ((radius + 1, radius), (radius + 1, radius)))
    ci = jnp.cumsum(p, axis=0)
    rows = ci[k:, :] - ci[:-k, :]
    cj = jnp.cumsum(rows, axis=1)
    return cj[:, k:] - cj[:, :-k]


def patch_grid(radius: int, dtype=jnp.float32):
    """(P,2) offsets of a (2r+1)x(2r+1) patch in (dx,dy) order."""
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    dx, dy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)
