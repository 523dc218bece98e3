"""Pallas TPU kernel for one pyramidal-LK level over all tracks.

The XLA path (ops/klt.py) expresses the patch reads as bilinear gathers:
(T, P) point-gathers per iteration, which XLA lowers to serialized
dynamic gathers. This kernel keeps both images resident
in VMEM and processes one track per grid program (note: the TPU grid is
sequential, so this trades the gather parallelism for zero-gather window
algebra — profitable when gathers dominate, not when T is huge):
each LK iteration is ONE aligned dynamic-slice window load per image
plus vectorized window algebra — the bilinear interpolation with a
per-track constant fractional offset is four shifted multiplies of the
window, no per-pixel gathers at all.

ref: the per-track scalar loops this replaces are
cpp/src/templering_sfm.cpp:402-460 (track_one / lk_step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lk_level_kernel(pts_ref, v_ref, img0_ref, img1_ref, out_ref, *,
                     iters: int, radius: int, min_det: float):
    P = 2 * radius + 1
    WIN = P + 2  # +1 for bilinear, +1 slack for gradient shifts
    i = pl.program_id(0)
    H = img1_ref.shape[0]
    W = img1_ref.shape[1]

    p0x = pts_ref[i, 0]
    p0y = pts_ref[i, 1]

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    def window(img_ref, cx, cy):
        """Load a (WIN+2, WIN+2) window centered-ish at (cx, cy) with the
        anchor chosen so patch sample (0,0) maps to (cx - radius, cy -
        radius); returns (win, fx, fy) with the fractional offsets."""
        # clamp the SAMPLING position (not just the slice origin) so the
        # fractional offsets stay consistent with the loaded window at
        # image borders — clamping only xi/yi would bilinear-sample the
        # wrong location near the edge (the XLA twin recomputes q against
        # the clamped anchor the same way, ops/klt.py:89-92)
        xs = clamp(cx - radius, 1.0, jnp.float32(W - WIN - 1))
        ys = clamp(cy - radius, 1.0, jnp.float32(H - WIN - 1))
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0
        fy = ys - y0
        xi = clamp(x0.astype(jnp.int32) - 1, 0, W - (WIN + 2))
        yi = clamp(y0.astype(jnp.int32) - 1, 0, H - (WIN + 2))
        win = img_ref[pl.ds(yi, WIN + 2), pl.ds(xi, WIN + 2)]
        return win, fx, fy

    def bil(win, fx, fy, ox: int, oy: int):
        """PxP bilinear patch from the loaded window at static extra
        offset (ox, oy) in pixels (for gradients)."""
        base_y = 1 + oy
        base_x = 1 + ox
        w00 = jax.lax.dynamic_slice(win, (base_y, base_x), (P, P))
        w01 = jax.lax.dynamic_slice(win, (base_y, base_x + 1), (P, P))
        w10 = jax.lax.dynamic_slice(win, (base_y + 1, base_x), (P, P))
        w11 = jax.lax.dynamic_slice(win, (base_y + 1, base_x + 1), (P, P))
        return (
            w00 * (1.0 - fx) * (1.0 - fy)
            + w01 * fx * (1.0 - fy)
            + w10 * (1.0 - fx) * fy
            + w11 * fx * fy
        )

    # fixed template from img0 at p0
    win0, fx0, fy0 = window(img0_ref, p0x, p0y)
    tmpl = bil(win0, fx0, fy0, 0, 0)

    def body(_, v):
        vx, vy = v
        win1, fx1, fy1 = window(img1_ref, p0x + vx, p0y + vy)
        cur = bil(win1, fx1, fy1, 0, 0)
        gx = 0.5 * (bil(win1, fx1, fy1, 1, 0) - bil(win1, fx1, fy1, -1, 0))
        gy = 0.5 * (bil(win1, fx1, fy1, 0, 1) - bil(win1, fx1, fy1, 0, -1))
        r = tmpl - cur
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        bx = jnp.sum(gx * r)
        by = jnp.sum(gy * r)
        det = gxx * gyy - gxy * gxy
        inv_det = jnp.where(jnp.abs(det) > min_det, 1.0 / det, 0.0)
        dvx = (gyy * bx - gxy * by) * inv_det
        dvy = (gxx * by - gxy * bx) * inv_det
        return (vx + dvx, vy + dvy)

    vx, vy = jax.lax.fori_loop(0, iters, body, (v_ref[i, 0], v_ref[i, 1]))
    out_ref[i, 0] = vx
    out_ref[i, 1] = vy


@functools.partial(
    jax.jit, static_argnames=("iters", "radius", "interpret")
)
def lk_level_pallas(img0, img1, p0_l, v, iters: int, radius: int,
                    min_det: float = 1e-4, interpret: bool = False):
    """Run ``iters`` LK updates at one pyramid level for all tracks.

    Drop-in replacement for ops/klt._lk_level (same semantics: forward
    additive, template fixed at p0_l). img0/img1 (H,W) f32; p0_l/v (T,2).
    Returns updated flow v (T,2)."""
    T = p0_l.shape[0]
    kernel = functools.partial(
        _lk_level_kernel, iters=iters, radius=radius, min_det=min_det
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2), p0_l.dtype),
        interpret=interpret,
    )(p0_l, v, img0, img1)
