"""Pyramidal Lucas-Kanade optical flow, batched over all tracks.

TPU-native replacement for the reference's per-track LK loops
(reference: cpp/src/templering_sfm.cpp:307-466 ``KLTTracker``:
coarse-to-fine per-track ``track_one`` with per-level ``lk_step`` 2x2
normal equations over a (2r+1)² patch, forward+backward gating in
``step``; python/src/templering_sfm.py:426-450 via
cv2.calcOpticalFlowPyrLK fwd+bwd with fb-error gate).

Here every track runs simultaneously: patch gathers are one batched
bilinear sample of shape (T, P), the 2x2 solves are closed-form over the
track axis, and the iteration/level loops are unrolled statically (levels
and iters are small compile-time constants).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.ops import image as im


def _lk_level(img0, img1, g1x, g1y, p0_l, v, offsets, iters: int, min_det: float):
    """Run ``iters`` LK updates at one pyramid level for all tracks.

    p0_l: (T,2) template positions at this level; v: (T,2) current flow.
    Returns updated flow v.
    """
    # template patch is fixed per level: sample once
    tmpl = im.bilinear(img0, p0_l[:, None, :] + offsets[None])  # (T,P)

    def body(_, v):
        q = p0_l + v
        coords = q[:, None, :] + offsets[None]
        cur = im.bilinear(img1, coords)
        gx = im.bilinear(g1x, coords)
        gy = im.bilinear(g1y, coords)
        r = tmpl - cur
        gxx = jnp.sum(gx * gx, axis=-1)
        gxy = jnp.sum(gx * gy, axis=-1)
        gyy = jnp.sum(gy * gy, axis=-1)
        bx = jnp.sum(gx * r, axis=-1)
        by = jnp.sum(gy * r, axis=-1)
        det = gxx * gyy - gxy * gxy
        inv_det = jnp.where(jnp.abs(det) > min_det, 1.0 / det, 0.0)
        dvx = (gyy * bx - gxy * by) * inv_det
        dvy = (gxx * by - gxy * bx) * inv_det
        return v + jnp.stack([dvx, dvy], axis=-1)

    return jax.lax.fori_loop(0, iters, body, v)


@partial(jax.jit, static_argnames=("levels", "iters", "radius"))
def lk_track(pyr0, pyr1, pts, valid, levels: int, iters: int, radius: int,
             min_det: float = 1e-4):
    """Track ``pts`` from pyramid ``pyr0`` to ``pyr1`` (finest-first tuples).

    Returns (new_pts (T,2), ok (T,) bool). ref: cpp:402-460 coarse-to-fine.
    """
    offsets = im.patch_grid(radius, pts.dtype)
    grads = [im.gradients(p) for p in pyr1]
    v = jnp.zeros_like(pts)
    for L in range(levels - 1, -1, -1):
        scale = float(2**L)
        p0_l = pts / scale
        v = _lk_level(pyr0[L], pyr1[L], grads[L][0], grads[L][1],
                      p0_l, v, offsets, iters, min_det)
        if L > 0:
            v = v * 2.0
    new_pts = pts + v
    H, W = pyr1[0].shape
    b = float(radius)
    inb = (
        (new_pts[:, 0] >= b)
        & (new_pts[:, 0] < W - b)
        & (new_pts[:, 1] >= b)
        & (new_pts[:, 1] < H - b)
    )
    return new_pts, valid & inb


@partial(jax.jit, static_argnames=("levels", "iters", "radius"))
def lk_track_fb(pyr0, pyr1, pts, valid, levels: int, iters: int, radius: int,
                fb_thresh: float = 1.0):
    """Forward-backward LK with fb-error gating (ref: cpp:356-367 /
    py:436-450). Returns (new_pts, ok)."""
    fwd, ok_f = lk_track(pyr0, pyr1, pts, valid, levels, iters, radius)
    back, ok_b = lk_track(pyr1, pyr0, fwd, ok_f, levels, iters, radius)
    fb = jnp.linalg.norm(back - pts, axis=-1)
    ok = ok_f & ok_b & (fb < fb_thresh)
    return fwd, ok
