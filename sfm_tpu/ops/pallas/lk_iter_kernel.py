"""Fused pyramidal-LK iteration loop as a Pallas TPU kernel.

The XLA path (ops/klt._lk_level) runs the per-level LK iteration loop as
a `fori_loop` whose body barrel-shifts the (WINy, WINx, T) target block
to the per-track sub-window. XLA cannot keep the block resident across
`fori_loop` iterations: every iteration's fused body re-streams the
full block array (plus the select ladder's temporaries) through HBM —
at bench scale (T=2200, WIN=28, 16 iters, 4 levels, fwd+bwd) that is
multiple GB of pure data movement per tracked frame, ~85% of the
tracker's device time (tools/bench_prefix_stages.py).

This kernel runs the ENTIRE iteration loop for a 128-track tile with
the tile's blocks pinned in VMEM: HBM sees one block load and one
(2, T) flow store, full stop. The algorithm is the XLA path's, step for
step (same clamp bounds, same select-ladder shift composition, same f32
accumulation of the 2x2 normal equations), so flows agree to float
rounding; the row-remainder shift the XLA path applies after the block
gather (ops/klt._load_blocks) is composed into the same ladder here —
composition of shifts selects identical elements, it does not change
the clamp bounds (the round-3 anchor-absorption lesson,
docs/BENCHMARKS.md "accuracy incident").

ref: the per-track scalar LK iteration is
cpp/src/templering_sfm.cpp:402-460 (track_one / lk_step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _shift_ladder(x, q, kmax: int, axis: int):
    """out[..i..] = x[..q+i..] with per-track (lane) shift q >= 0,
    q <= kmax, as a static select ladder (ops/klt._barrel_take twin —
    jnp.roll with a STATIC shift lowers to a vector rotate; the
    per-lane choice is a lane-wise select).

    Int math sticks to raw i32 lax primitives: under jax_enable_x64
    (the package default) jnp sugar with Python-int operands
    materializes i64 inside the kernel, which Mosaic cannot legalize
    (see ops/pallas/block_gather_kernel._kernel)."""
    q = q.reshape((1, 1, -1))
    two = jnp.int32(2)
    one = jnp.int32(1)
    k = 1
    while k <= kmax:
        bit = jax.lax.rem(jax.lax.div(q, jnp.int32(k)), two) == one
        x = jnp.where(bit, jnp.roll(x, -k, axis=axis), x)
        k *= 2
    return x


def _bil(sub, fx, fy, P: int, ox: int, oy: int):
    """(P,P,TB) bilinear read at static offset (ox,oy) — the transposed
    block layout twin of ops/klt._bil_t (f32 in, f32 out)."""
    y0 = 1 + oy
    x0 = 1 + ox
    w00 = sub[y0:y0 + P, x0:x0 + P]
    w01 = sub[y0:y0 + P, x0 + 1:x0 + P + 1]
    w10 = sub[y0 + 1:y0 + P + 1, x0:x0 + P]
    w11 = sub[y0 + 1:y0 + P + 1, x0 + 1:x0 + P + 1]
    fx = fx.reshape((1, 1, -1))
    fy = fy.reshape((1, 1, -1))
    return (w00 * (1.0 - fx) * (1.0 - fy) + w01 * fx * (1.0 - fy)
            + w10 * (1.0 - fx) * fy + w11 * fx * fy)


def _kernel(d_ref, scal_ref, B_ref, tmpl_ref, out_ref, *, P: int,
            WIN: int, slack: int, iters: int, min_det: float):
    """One 128-track tile: iterate LK to convergence entirely in VMEM.

    d_ref    (1, TB) i32   row remainder of the aligned block gather
    scal_ref (4, TB) f32   [base_x, base_y, v0_x, v0_y]; base = p0_l -
                           radius - anchor (anchor = clipped float start)
    B_ref    (WIN+slack, pad8(WIN), TB) f32  raw gathered target blocks
    tmpl_ref (P, pad8(P), TB) f32            template patch
    out_ref  (2, TB) f32                     final flow
    """
    tmpl = tmpl_ref[:, :P, :]
    _iterate(d_ref[0], scal_ref, B_ref, tmpl, out_ref, P=P, WIN=WIN,
             slack=slack, iters=iters, min_det=min_det)


def _iterate(d, scal_ref, B_ref, tmpl, out_ref, *, P: int, WIN: int,
             slack: int, iters: int, min_det: float):
    """The shared VMEM-resident iteration loop of `_kernel` /
    `_kernel_tmpl`."""
    S = P + 3
    # blocks arrive in their storage dtype (bf16 on TPU, ops/klt
    # ._lk_dtype) and upcast HERE, in VMEM — upcasting before the
    # pallas_call would materialize (and re-stream) an f32 copy of the
    # whole block array through HBM, doubling the kernel's only large
    # HBM read. All iteration arithmetic is f32 (matches _bil_t's
    # upcast-at-read contract).
    B = B_ref[...].astype(jnp.float32)
    base_x = scal_ref[0]
    base_y = scal_ref[1]
    v0 = jnp.stack([scal_ref[2], scal_ref[3]])

    # the gather's row remainder is per-track but iteration-invariant:
    # shift it out once (kept rows stay in range — d <= slack-1 and the
    # loop's row reads stop at qii_y + S - 1 <= (WIN-P-3) + P + 2
    # = WIN - 1, so composed reads stay < WIN + slack)
    B = _shift_ladder(B, d, slack - 1, axis=0)[:WIN]

    qhi = jnp.float32(WIN - P - 2)
    lo = jnp.float32(1.0)
    ione = jnp.int32(1)

    def body(_, v):
        # _qf twin: per-axis clamp of the sub-window origin
        qx = base_x + v[0]
        qy = base_y + v[1]
        qix = jnp.clip(jnp.floor(qx), lo, qhi)
        qiy = jnp.clip(jnp.floor(qy), lo, qhi)
        fx = qx - qix
        fy = qy - qiy
        qiix = qix.astype(jnp.int32) - ione
        qiiy = qiy.astype(jnp.int32) - ione
        sub = _shift_ladder(B, qiiy, WIN - P - 3, axis=0)[:S]
        sub = _shift_ladder(sub, qiix, WIN - P - 3, axis=1)
        cur = _bil(sub, fx, fy, P, 0, 0)
        gx = 0.5 * (_bil(sub, fx, fy, P, 1, 0) - _bil(sub, fx, fy, P, -1, 0))
        gy = 0.5 * (_bil(sub, fx, fy, P, 0, 1) - _bil(sub, fx, fy, P, 0, -1))
        r = tmpl - cur
        gxx = jnp.sum(gx * gx, axis=(0, 1))
        gxy = jnp.sum(gx * gy, axis=(0, 1))
        gyy = jnp.sum(gy * gy, axis=(0, 1))
        bx = jnp.sum(gx * r, axis=(0, 1))
        by = jnp.sum(gy * r, axis=(0, 1))
        det = gxx * gyy - gxy * gxy
        # f32-pinned literals: a bare Python 0.0 reaches jnp.where as a
        # weak f64 scalar under x64 and lands an f64 var in the kernel
        inv_det = jnp.where(jnp.abs(det) > jnp.float32(min_det),
                            jnp.float32(1.0) / det, jnp.float32(0.0))
        dvx = (gyy * bx - gxy * by) * inv_det
        dvy = (gxx * by - gxy * bx) * inv_det
        return v + jnp.stack([dvx, dvy])

    out_ref[...] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(iters),
                                     body, v0)


def _kernel_tmpl(dd_ref, scal_ref, B_ref, T0_ref, out_ref, *, P: int,
                 WIN: int, slack: int, WIN0: int, slack0: int,
                 iters: int, min_det: float):
    """`_kernel` plus in-VMEM template extraction: the raw template
    blocks (margin=0 gather from the SOURCE image) arrive in storage
    dtype and the (P, P, TB) template patch is built HERE — the last
    XLA-side patch machinery (strips load + barrel takes + _bil_t,
    ops/klt._lk_level template path) folds into the kernel.

    dd_ref   (2, TB) i32   [d  target-row remainder, d0 template-row]
    scal_ref (6, TB) f32   [base_x, base_y, v0_x, v0_y, f0_x, f0_y];
                           f0 = (p0_l - radius - anchor0) - 1, the
                           margin=0 `_qf` fraction (qi clamps to 1)
    B_ref    (WIN+slack, pad(WIN), TB)    raw target blocks
    T0_ref   (WIN0+slack0, pad(WIN0), TB) raw template blocks
    out_ref  (2, TB) f32                  final flow
    """
    B0 = T0_ref[...].astype(jnp.float32)
    B0 = _shift_ladder(B0, dd_ref[1], slack0 - 1, axis=0)
    # margin=0 clamp bounds: WIN0 = P + 3 makes `_qf`'s qi identically
    # (1,1), so the sub-window IS rows/cols [0, P+3) and only the
    # fractional part varies — one bilinear read, no per-track shift
    tmpl = _bil(B0[:WIN0], scal_ref[4], scal_ref[5], P, 0, 0)
    _iterate(dd_ref[0], scal_ref, B_ref, tmpl, out_ref, P=P, WIN=WIN,
             slack=slack, iters=iters, min_det=min_det)


@functools.partial(jax.jit, static_argnames=("P", "slack", "iters",
                                             "min_det", "interpret"))
def lk_iter_pallas(blocks_raw, d, tmpl, base, v0, *, P: int, slack: int,
                   iters: int, min_det: float, interpret: bool = False):
    """Run ``iters`` LK updates for all tracks with blocks VMEM-resident.

    blocks_raw (T, WIN+slack, WIN)  raw load_blocks_pallas output (any
                                    float dtype; streamed to VMEM in
                                    storage dtype and upcast in-kernel —
                                    a shift ladder is pure data movement,
                                    so pre- vs post-shift upcast is
                                    bit-equivalent)
    d          (T,) i32             start_y - aligned anchor_y remainder
    tmpl       (P, P, T) f32        template patches (transposed layout,
                                    as built by ops/klt._lk_level)
    base       (T, 2) f32           p0_l - radius - anchor (float)
    v0         (T, 2) f32           incoming flow
    Returns v (T, 2) f32.
    """
    T, WINB, WIN = blocks_raw.shape
    assert WINB == WIN + slack, (WINB, WIN, slack)
    TB = LANE
    T_pad = -(-max(T, 1) // TB) * TB
    # bf16 storage needs a 16-sublane-aligned second-to-last block dim
    sub = 16 if jnp.dtype(blocks_raw.dtype).itemsize == 2 else 8
    WIN_P = -(-WIN // sub) * sub
    P_P = _pad8(P)
    f32 = jnp.float32

    Bt = jnp.transpose(blocks_raw, (1, 2, 0))
    Bt = jnp.pad(Bt, ((0, 0), (0, WIN_P - WIN), (0, T_pad - T)))
    Tt = jnp.pad(tmpl.astype(f32),
                 ((0, 0), (0, P_P - P), (0, T_pad - T)))
    scal = jnp.concatenate([base.astype(f32).T, v0.astype(f32).T])
    scal = jnp.pad(scal, ((0, 0), (0, T_pad - T)))
    d_p = jnp.pad(d.astype(jnp.int32), (0, T_pad - T)).reshape(1, T_pad)

    grid = (T_pad // TB,)
    kernel = functools.partial(_kernel, P=P, WIN=WIN, slack=slack,
                               iters=iters, min_det=float(min_det))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # index-map literals are explicit i32 (see the x64 notes in
            # block_gather_kernel); built INSIDE the lambda — captured
            # tracers are rejected by pallas_call
            pl.BlockSpec((1, TB), lambda g: (jnp.int32(0), g)),
            pl.BlockSpec((4, TB), lambda g: (jnp.int32(0), g)),
            pl.BlockSpec((WINB, WIN_P, TB),
                         lambda g: (jnp.int32(0), jnp.int32(0), g)),
            pl.BlockSpec((P, P_P, TB),
                         lambda g: (jnp.int32(0), jnp.int32(0), g)),
        ],
        out_specs=pl.BlockSpec((2, TB), lambda g: (jnp.int32(0), g)),
        out_shape=jax.ShapeDtypeStruct((2, T_pad), f32),
        interpret=interpret,
    )(d_p, scal, Bt, Tt)
    return out[:, :T].T


@functools.partial(jax.jit, static_argnames=("P", "slack", "slack0",
                                             "iters", "min_det",
                                             "interpret"))
def lk_iter_tmpl_pallas(blocks_raw, d, tmpl_raw, d0, f0, base, v0, *,
                        P: int, slack: int, slack0: int, iters: int,
                        min_det: float, interpret: bool = False):
    """`lk_iter_pallas` with IN-KERNEL template extraction from raw
    margin=0 gathered blocks (load_blocks_pair_pallas output).

    blocks_raw (T, WIN+slack, WIN)     raw target blocks (any float
                                       dtype; upcast in-kernel)
    d          (T,) i32                target start_y - anchor_y
    tmpl_raw   (T, WIN0+slack0, WIN0)  raw template blocks, WIN0 = P+3
    d0         (T,) i32                template start_y - anchor_y
    f0         (T, 2) f32              template bilinear fraction:
                                       (p0_l - radius - anchor0) - 1
                                       (the margin=0 `_qf` fraction)
    base       (T, 2) f32              p0_l - radius - anchor1 (float)
    v0         (T, 2) f32              incoming flow
    Returns v (T, 2) f32.
    """
    T, WINB, WIN = blocks_raw.shape
    T0, WIN0B, WIN0 = tmpl_raw.shape
    assert WINB == WIN + slack, (WINB, WIN, slack)
    assert WIN0B == WIN0 + slack0, (WIN0B, WIN0, slack0)
    assert WIN0 == P + 3 and T0 == T, (WIN0, P, T0, T)
    TB = LANE
    T_pad = -(-max(T, 1) // TB) * TB
    sub = 16 if jnp.dtype(blocks_raw.dtype).itemsize == 2 else 8
    WIN_P = -(-WIN // sub) * sub
    WIN0_P = -(-WIN0 // sub) * sub
    f32 = jnp.float32

    Bt = jnp.transpose(blocks_raw, (1, 2, 0))
    Bt = jnp.pad(Bt, ((0, 0), (0, WIN_P - WIN), (0, T_pad - T)))
    T0t = jnp.transpose(tmpl_raw, (1, 2, 0))
    T0t = jnp.pad(T0t, ((0, 0), (0, WIN0_P - WIN0), (0, T_pad - T)))
    scal = jnp.concatenate([base.astype(f32).T, v0.astype(f32).T,
                            f0.astype(f32).T])
    scal = jnp.pad(scal, ((0, 0), (0, T_pad - T)))
    dd = jnp.stack([d.astype(jnp.int32), d0.astype(jnp.int32)])
    dd = jnp.pad(dd, ((0, 0), (0, T_pad - T)))

    grid = (T_pad // TB,)
    kernel = functools.partial(_kernel_tmpl, P=P, WIN=WIN, slack=slack,
                               WIN0=WIN0, slack0=slack0, iters=iters,
                               min_det=float(min_det))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, TB), lambda g: (jnp.int32(0), g)),
            pl.BlockSpec((6, TB), lambda g: (jnp.int32(0), g)),
            pl.BlockSpec((WINB, WIN_P, TB),
                         lambda g: (jnp.int32(0), jnp.int32(0), g)),
            pl.BlockSpec((WIN0B, WIN0_P, TB),
                         lambda g: (jnp.int32(0), jnp.int32(0), g)),
        ],
        out_specs=pl.BlockSpec((2, TB), lambda g: (jnp.int32(0), g)),
        out_shape=jax.ShapeDtypeStruct((2, T_pad), f32),
        interpret=interpret,
    )(dd, scal, Bt, T0t)
    return out[:, :T].T
