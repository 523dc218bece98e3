"""Pyramidal Lucas-Kanade optical flow, batched over all tracks.

TPU-native replacement for the reference's per-track LK loops
(reference: cpp/src/templering_sfm.cpp:307-466 ``KLTTracker``:
coarse-to-fine per-track ``track_one`` with per-level ``lk_step`` 2x2
normal equations over a (2r+1)² patch, forward+backward gating in
``step``; python/src/templering_sfm.py:426-450 via
cv2.calcOpticalFlowPyrLK fwd+bwd with fb-error gate).

TPU design: point-gathers are pathological on TPU (the naive
"(T,P) bilinear gathers per iteration" formulation costs seconds per
frame), so each track instead loads ONE contiguous window per pyramid
level (a batched ``dynamic_slice``), and every LK iteration runs as pure
VPU window algebra: bilinear interpolation with a per-track fractional
offset is four shifted multiplies of the window, and the image gradients
are ±1 shifted slices of the same window — zero gathers in the iteration
loop. The window margin bounds the per-level search range (like the
reference's window radius bounds its convergence basin); flows that
drift outside are clamped by the slice and rejected by the
forward-backward gate.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.ops import image as im

MARGIN = 6  # per-level search margin in px beyond the patch


def _use_pallas() -> bool:
    """Pallas block-gather kernel default on the TPU backend (measured
    ~1.8x on the margin-block loads that dominate the tracker, v5e —
    tools/bench_pallas.py); the XLA strips path serves CPU/interpret.
    SFM_TPU_PALLAS=0/1 overrides (same kill-switch as ops/features)."""
    env = os.environ.get("SFM_TPU_PALLAS", "").strip()
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_LK_DTYPE_RESOLVED = None  # memoized by _lk_dtype(); patch this in tests


def _use_fused_lk() -> bool:
    """Fused Pallas LK-iteration kernel (ops/pallas/lk_iter_kernel):
    the entire per-level iteration loop runs with the track tile's
    blocks pinned in VMEM, eliminating the per-iteration HBM re-stream
    of the (WIN, WIN, T) block array that dominates lk_track_fb
    (tools/bench_prefix_stages.py). SFM_TPU_LK_FUSED=0/1 overrides; the
    default follows the _use_pallas() gate at the call site."""
    env = os.environ.get("SFM_TPU_LK_FUSED", "").strip()
    if env in ("0", "1"):
        return env == "1"
    return True


def _use_fused_tmpl() -> bool:
    """In-kernel template extraction for the fused LK path: the
    template blocks ride the SAME Pallas gather as the target blocks
    (load_blocks_pair_pallas — one per-track loop for both reads) and
    the (P,P,T) template patch is built inside the iteration kernel,
    removing the last XLA-side patch machinery (strips load + barrel
    takes + _bil_t; measured ~1.5 ms of the 6.2 ms lk_track_fb at bench
    scale). SFM_TPU_LK_FUSED_TMPL=0/1 overrides; default on wherever
    the fused kernel runs."""
    env = os.environ.get("SFM_TPU_LK_FUSED_TMPL", "").strip()
    if env in ("0", "1"):
        return env == "1"
    return True


def _lk_dtype():
    """Block-storage dtype for the LK load/iterate path.

    The tracker is bandwidth-bound on its per-level block loads and the
    per-iteration barrel shifts (tools/bench_prefix_stages.py: ~85% of
    the 8.9 ms device time of lk_track_fb at bench scale) — bf16 storage
    halves that traffic. Accuracy: pyramid level values are box-filtered
    u8 intensities (0..255); bf16 quantizes them to <=0.5 intensity LSB,
    below the sensor-noise floor the LK solve already tolerates, and the
    2x2 normal equations still ACCUMULATE in f32 (_bil_t upcasts at the
    patch read). Default bf16 on TPU, f32 elsewhere; SFM_TPU_LK_BF16=0/1
    overrides (validated by tests/test_klt.py::test_lk_bf16_matches_f32
    and the bench ATE).

    Resolved ONCE (first call) and memoized: the choice is read at trace
    time inside jitted callers whose cache keys do not include the env
    var, so a mid-process env toggle could otherwise silently no-op
    depending on compile-cache state. Tests that need both paths patch
    ``_LK_DTYPE_RESOLVED`` and ``jax.clear_caches()``."""
    global _LK_DTYPE_RESOLVED
    if _LK_DTYPE_RESOLVED is not None:
        return _LK_DTYPE_RESOLVED
    env = os.environ.get("SFM_TPU_LK_BF16", "").strip()
    if env in ("0", "1"):
        dt = jnp.bfloat16 if env == "1" else jnp.float32
    else:
        try:
            dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                  else jnp.float32)
        except Exception:
            dt = jnp.float32
    _LK_DTYPE_RESOLVED = dt
    return dt


def _bil_patch(block, fx, fy, P: int, ox: int, oy: int):
    """(...,P,P) bilinear patch from (...,P+3,P+3) blocks at static pixel
    offset (ox,oy) ∈ {-1,0,1} and per-item fractional offsets fx/fy."""
    y0 = 1 + oy
    x0 = 1 + ox
    w00 = block[..., y0 : y0 + P, x0 : x0 + P]
    w01 = block[..., y0 : y0 + P, x0 + 1 : x0 + P + 1]
    w10 = block[..., y0 + 1 : y0 + P + 1, x0 : x0 + P]
    w11 = block[..., y0 + 1 : y0 + P + 1, x0 + 1 : x0 + P + 1]
    fx = fx[..., None, None]
    fy = fy[..., None, None]
    return (
        w00 * (1.0 - fx) * (1.0 - fy)
        + w01 * fx * (1.0 - fy)
        + w10 * (1.0 - fx) * fy
        + w11 * fx * fy
    )


def _load_blocks_raw(img, origins, P: int, margin: int):
    """Raw Pallas block gather for the search-margin blocks: one
    tile-aligned (WIN+slack, WIN) VMEM read per track, NO row-remainder
    correction. Returns (blocks (T, WIN+slack, WIN), start (T,2) float
    clipped top-left, d (T,) i32 row remainder of the aligned anchor).
    Callers either barrel-shift the remainder out (``_load_blocks``) or
    compose it into their own shift ladder (``lk_iter_pallas``)."""
    WIN = P + 2 * margin + 3
    H, W = img.shape
    start = jnp.floor(jnp.nan_to_num(origins)) - (margin + 1)
    start = jnp.clip(start, 0.0, jnp.array([W - WIN, H - WIN], origins.dtype))
    starts = start.astype(jnp.int32)
    from sfm_tpu.ops.pallas.block_gather_kernel import load_blocks_pallas

    blocks, anchors = load_blocks_pallas(
        img, starts, WIN, interpret=jax.default_backend() != "tpu")
    d = starts[:, 1] - anchors[:, 1]  # 0..slack-1 row remainder
    return blocks, start, d


def _load_blocks(img, origins, P: int, margin: int):
    """One contiguous square block per track around each float patch
    origin. Returns (blocks (T,WIN,WIN), anchors (T,2) float top-left).

    TPU note: 2D block gathers (vmapped dynamic_slice) are slow; instead
    gather whole ROWS (contiguous lines, the fast gather case) and
    extract the column window with a one-hot matmul on the MXU."""
    WIN = P + 2 * margin + 3  # +1 bilinear, +2 gradient shifts
    H, W = img.shape
    # dead/lost slots can carry non-finite positions; NaN survives clip
    # (clip(NaN)=NaN) and casts to an undefined int32 — sanitize first
    # so both gather paths stay in bounds (the Pallas kernel's dynamic
    # VMEM reads fault the TPU worker on out-of-bounds starts)
    start = jnp.floor(jnp.nan_to_num(origins)) - (margin + 1)
    start = jnp.clip(start, 0.0, jnp.array([W - WIN, H - WIN], origins.dtype))
    starts = start.astype(jnp.int32)

    # Pallas fast path for the search-margin blocks (the dominant load):
    # per-track tile-aligned VMEM reads instead of (T,WIN,W) row strips.
    # Template loads (margin=0, narrow strips) stay on the XLA path —
    # measured slower in the kernel. The kernel returns blocks 8 rows
    # taller, anchored at the 8-ALIGNED row below the request; the
    # per-track row remainder is barrel-shifted out HERE so this branch
    # returns bit-identical (blocks, anchors) to the strips path below.
    # (Round-3 lesson: absorbing the remainder downstream through the
    # anchor instead shifts the LK sub-window CLAMP bounds by 0..7 rows
    # per track — marginal tracks then converge to different, fb-gate-
    # passing flows than the XLA path, and on the 47-frame bench that
    # deterministically tripled the trajectory ATE.)
    if margin > 0 and WIN <= 128 and H >= WIN and W >= WIN and _use_pallas():
        blocks, start, d = _load_blocks_raw(img, origins, P, margin)
        slack = blocks.shape[1] - WIN  # 8 (f32) or 16 (bf16 sublane tile)
        k = 1
        while k < slack:
            bit = (d // k) % 2 == 1
            blocks = jnp.where(bit[:, None, None],
                               jnp.roll(blocks, -k, axis=1), blocks)
            k *= 2
        return blocks[:, :WIN, :], start

    row_idx = starts[:, 1:2] + jnp.arange(WIN, dtype=jnp.int32)[None]  # (T,WIN)
    strips = jnp.take(img, row_idx, axis=0)  # (T,WIN,W) row gather
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W, WIN), 1)
    sel = starts[:, 0][:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, W, WIN), 2
    )
    Sx = (cols == sel).astype(img.dtype)  # (T,W,WIN) one-hot column picker
    # selector-matmul precision: the package-wide "highest" matmul
    # setting (6-pass f32, needed by the geometric solvers) would
    # multiply this bandwidth-bound extraction 6x; a one-hot times
    # image-intensity product is exact in bf16 for the selector and
    # within ~0.5 intensity LSB for the pyramid values — far below the
    # sensor noise LK already tolerates. Measured: _load_blocks 4.4 ms ->
    # ~1 ms per level at bench scale (v5e).
    blocks = jnp.einsum("tiw,twj->tij", strips, Sx,
                        precision=jax.lax.Precision.DEFAULT)
    return blocks, start


def _patch(blocks, anchors, origins, P: int, ox: int = 0, oy: int = 0):
    """(T,P,P) bilinear patches at float ``origins`` (+static offset) from
    pre-loaded blocks.

    The (P+3,P+3) sub-window at a per-track integer offset is extracted
    with two one-hot matmuls instead of a batched dynamic-slice: gathers
    are the slowest primitive on TPU while batched small matmuls ride the
    MXU — this keeps the entire LK iteration loop gather-free."""
    # blocks may be rectangular: the Pallas gather returns row-aligned
    # (WINy = WIN+8, WINx = WIN) blocks whose extra rows are absorbed
    # here through the anchor (per-axis clip bounds)
    WINy, WINx = blocks.shape[-2], blocks.shape[-1]
    S = P + 3
    dtype = blocks.dtype
    q = origins - anchors
    qi = jnp.clip(jnp.floor(q), 1.0,
                  jnp.array([WINx - P - 2.0, WINy - P - 2.0], q.dtype))
    f = q - qi
    qii = qi.astype(jnp.int32) - 1  # sub-window origin inside the block

    cols_y = jax.lax.broadcasted_iota(jnp.int32, (1, S, WINy), 2)
    rows_y = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) + qii[:, 1][:, None, None]
    Sy = (cols_y == rows_y).astype(dtype)  # (T,S,WINy) one-hot row selector
    cols_x = jax.lax.broadcasted_iota(jnp.int32, (1, S, WINx), 2)
    rows_x = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) + qii[:, 0][:, None, None]
    Sx = (cols_x == rows_x).astype(dtype)  # (T,S,WINx) one-hot col selector
    # DEFAULT precision: one-hot selector x image data (see _load_blocks)
    sub_rows = jnp.einsum("tiw,twv->tiv", Sy, blocks,
                          precision=jax.lax.Precision.DEFAULT)  # (T,S,WIN)
    sub = jnp.einsum("tiv,tjv->tij", sub_rows, Sx,
                     precision=jax.lax.Precision.DEFAULT)  # (T,S,S)
    return _bil_patch(sub, f[:, 0], f[:, 1], P, ox, oy), sub, f


def _barrel_take(x, q, S: int, axis: int):
    """``out[..i..] = x[..q+i..]`` along ``axis`` for i < S, with a
    per-TRACK shift q (tracks on the LAST axis), as an unrolled binary
    barrel shifter: log2(range) conditional static rolls instead of a
    per-track one-hot matmul. On TPU the lane-wise selects run at full
    VPU width because tracks ride the 128-lane axis, whereas the
    (T, small, small) batched-matmul formulation leaves ~90% of each
    vector lane idle. q must already be clipped to [0, size-S], so the
    circular wrap never reaches the first S kept entries."""
    size = x.shape[axis]
    k = 1
    while k <= size - S:
        bit = (q // k) % 2 == 1  # (T,) — broadcasts against (..., T)
        x = jnp.where(bit, jnp.roll(x, -k, axis=axis), x)
        k *= 2
    return jax.lax.slice_in_dim(x, 0, S, axis=axis)


def _bil_t(block, fx, fy, P: int, ox: int, oy: int):
    """(P,P,T) bilinear patch from (S,S,T) sub-blocks — the transposed
    twin of _bil_patch (patch dims leading, tracks on lanes).

    Blocks may be stored in bf16 (_lk_dtype): the four shifted reads
    upcast to f32 HERE, so the bilinear combination and every downstream
    reduction (gradients, 2x2 normal equations) accumulate in f32."""
    y0 = 1 + oy
    x0 = 1 + ox
    f32 = jnp.float32
    w00 = block[y0 : y0 + P, x0 : x0 + P].astype(f32)
    w01 = block[y0 : y0 + P, x0 + 1 : x0 + P + 1].astype(f32)
    w10 = block[y0 + 1 : y0 + P + 1, x0 : x0 + P].astype(f32)
    w11 = block[y0 + 1 : y0 + P + 1, x0 + 1 : x0 + P + 1].astype(f32)
    fx = fx[None, None, :].astype(f32)
    fy = fy[None, None, :].astype(f32)
    return (
        w00 * (1.0 - fx) * (1.0 - fy)
        + w01 * fx * (1.0 - fy)
        + w10 * (1.0 - fx) * fy
        + w11 * fx * fy
    )


def _qf(origins, anchors, P: int, WINx: int, WINy: int):
    """Integer sub-window origin (clipped per axis) + fractional rest."""
    q = origins - anchors
    qi = jnp.clip(jnp.floor(q), 1.0,
                  jnp.array([WINx - P - 2.0, WINy - P - 2.0], q.dtype))
    return qi.astype(jnp.int32) - 1, q - qi


def _lk_level(img0, img1, p0_l, v, iters: int, radius: int, min_det: float,
              margin: int = MARGIN):
    """Run ``iters`` LK updates at one pyramid level for all tracks.

    p0_l: (T,2) template positions at this level; v: (T,2) current flow.
    Returns updated flow v.

    The iteration loop runs in TRANSPOSED layout — blocks as
    (WINy, WINx, T) with tracks on the 128-lane axis — so the per-track
    sub-window extraction is a barrel shifter (_barrel_take) and all
    patch algebra runs at full VPU width. The previous
    (T, small, small) one-hot-matmul formulation (kept as
    ``_patch`` for the template path users) spent its per-iteration
    time in batched 16x28 matmuls that use a fraction of the MXU and
    13 of 128 lanes in the elementwise steps.
    """
    P = 2 * radius + 1
    S = P + 3

    WIN = P + 2 * margin + 3
    H1, W1 = img1.shape
    fused_ok = (margin > 0 and WIN <= 128 and H1 >= WIN and W1 >= WIN
                and _use_pallas() and _use_fused_lk())
    interp = jax.default_backend() != "tpu"

    if fused_ok and _use_fused_tmpl() and img0.shape == img1.shape:
        # fully fused path: ONE pair gather (template + search blocks
        # in one per-track loop) + the whole iteration loop in one
        # kernel with in-VMEM template extraction. Anchor/clamp
        # semantics are the XLA paths' exactly: clipped float starts,
        # f0 = q0 - 1 (margin=0 makes `_qf`'s qi identically 1).
        from sfm_tpu.ops.pallas.block_gather_kernel import (
            load_blocks_pair_pallas)
        from sfm_tpu.ops.pallas.lk_iter_kernel import lk_iter_tmpl_pallas

        WIN0 = P + 3
        o0 = p0_l - radius
        start0 = jnp.floor(jnp.nan_to_num(o0)) - 1.0
        start0 = jnp.clip(start0, 0.0,
                          jnp.array([W1 - WIN0, H1 - WIN0], o0.dtype))
        o1 = p0_l + v - radius
        start1 = jnp.floor(jnp.nan_to_num(o1)) - (margin + 1)
        start1 = jnp.clip(start1, 0.0,
                          jnp.array([W1 - WIN, H1 - WIN], o1.dtype))
        b0, a0i, b1, a1i = load_blocks_pair_pallas(
            img0, start0.astype(jnp.int32), WIN0,
            img1, start1.astype(jnp.int32), WIN, interpret=interp)
        d0 = start0.astype(jnp.int32)[:, 1] - a0i[:, 1]
        d1 = start1.astype(jnp.int32)[:, 1] - a1i[:, 1]
        return lk_iter_tmpl_pallas(
            b1, d1, b0, d0, (o0 - start0) - 1.0, o0 - start1, v,
            P=P, slack=int(b1.shape[1]) - WIN,
            slack0=int(b0.shape[1]) - WIN0, iters=iters,
            min_det=float(min_det), interpret=interp)

    # template: fixed patch from img0 (no search margin)
    blk0, a0 = _load_blocks(img0, p0_l - radius, P, margin=0)

    if fused_ok:
        # fused path: raw aligned gather + the whole iteration loop in
        # one kernel (same clamp bounds and shift selections as below —
        # the row remainder is composed into the kernel's ladder)
        from sfm_tpu.ops.pallas.lk_iter_kernel import lk_iter_pallas

        B0 = jnp.transpose(blk0, (1, 2, 0))
        qii0, f0 = _qf(p0_l - radius, a0, P, B0.shape[1], B0.shape[0])
        sub0 = _barrel_take(
            _barrel_take(B0, qii0[:, 1], S, 0), qii0[:, 0], S, 1)
        tmpl = _bil_t(sub0, f0[:, 0], f0[:, 1], P, 0, 0)  # (P,P,T)
        blocks_raw, a1, d1 = _load_blocks_raw(
            img1, p0_l + v - radius, P, margin)
        return lk_iter_pallas(
            blocks_raw, d1, tmpl, p0_l - radius - a1, v,
            P=P, slack=int(blocks_raw.shape[1]) - WIN, iters=iters,
            min_det=float(min_det), interpret=interp)

    # target: one block per track with the search margin, loaded once
    blk1, a1 = _load_blocks(img1, p0_l + v - radius, P, margin=margin)

    B0 = jnp.transpose(blk0, (1, 2, 0))  # (WINy,WINx,T)
    B1 = jnp.transpose(blk1, (1, 2, 0))
    WINy0, WINx0 = B0.shape[0], B0.shape[1]
    WINy1, WINx1 = B1.shape[0], B1.shape[1]

    qii0, f0 = _qf(p0_l - radius, a0, P, WINx0, WINy0)
    sub0 = _barrel_take(
        _barrel_take(B0, qii0[:, 1], S, 0), qii0[:, 0], S, 1)
    tmpl = _bil_t(sub0, f0[:, 0], f0[:, 1], P, 0, 0)  # (P,P,T)

    def body(_, v):
        origins = p0_l + v - radius
        qii, f = _qf(origins, a1, P, WINx1, WINy1)
        sub = _barrel_take(
            _barrel_take(B1, qii[:, 1], S, 0), qii[:, 0], S, 1)
        fx, fy = f[:, 0], f[:, 1]
        cur = _bil_t(sub, fx, fy, P, 0, 0)
        gx = 0.5 * (
            _bil_t(sub, fx, fy, P, 1, 0) - _bil_t(sub, fx, fy, P, -1, 0)
        )
        gy = 0.5 * (
            _bil_t(sub, fx, fy, P, 0, 1) - _bil_t(sub, fx, fy, P, 0, -1)
        )
        r = tmpl - cur
        gxx = jnp.sum(gx * gx, axis=(0, 1))
        gxy = jnp.sum(gx * gy, axis=(0, 1))
        gyy = jnp.sum(gy * gy, axis=(0, 1))
        bx = jnp.sum(gx * r, axis=(0, 1))
        by = jnp.sum(gy * r, axis=(0, 1))
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
    dt = _lk_dtype()
    if pyr0[0].dtype != dt:
        pyr0 = tuple(p.astype(dt) for p in pyr0)
        pyr1 = tuple(p.astype(dt) for p in pyr1)
    v = jnp.zeros_like(pts)
    for L in range(levels - 1, -1, -1):
        scale = float(2**L)
        p0_l = pts / scale
        v = _lk_level(pyr0[L], pyr1[L], p0_l, v, iters, radius, min_det)
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
    py:436-450). Returns (new_pts, ok).

    The backward pass re-tracks from scratch (full pyramid): a forward
    match stuck in a false minimum would trivially pass a check that is
    merely initialized at the negative forward flow."""
    fwd, ok_f = lk_track(pyr0, pyr1, pts, valid, levels, iters, radius)
    back, ok_b = lk_track(pyr1, pyr0, fwd, ok_f, levels, iters, radius)
    fb = jnp.linalg.norm(back - pts, axis=-1)
    ok = ok_f & ok_b & (fb < fb_thresh)
    return fwd, ok
