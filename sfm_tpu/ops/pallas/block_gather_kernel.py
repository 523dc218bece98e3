"""Per-track window-block gather Pallas kernel for the KLT tracker.

The XLA path (ops/klt._load_blocks) gathers whole image ROWS per track
((T,WIN,W) strips — ~150 MB of HBM traffic at bench scale) and extracts
the column window with a batched one-hot matmul. Profiling on a v5e
shows this per-level block loading dominates the tracker (~8 ms of the
13 ms fwd+bwd track; the LK iteration loop itself is only ~0.08 ms/iter).

This kernel keeps the image in VMEM and per track reads ONE
(WIN+8, 256) tile-aligned sub-block:

  * rows start at the 8-ALIGNED sublane below the wanted origin —
    Mosaic only lowers dynamic-sublane loads it can statically prove
    8-aligned, and `(sy // 8) * 8` qualifies (a runtime clamp does not,
    so the wrapper pads the image instead of clamping);
  * lanes start at the 128-ALIGNED tile holding the wanted column — the
    requested WIN <= 128 columns span at most two adjacent lane tiles,
    so a (rows, 256) slice always covers them (the wrapper pads the
    width by an extra tile so the slice never runs off the edge);
  * the in-tile column remainder is rotated out with `pltpu.roll`
    (tpu.dynamic_rotate — the one supported dynamic-shift axis; neither
    dynamic lane slices nor dynamic sublane rotates lower to Mosaic).

The returned blocks are 8 rows taller than requested and anchored at
the aligned row; the caller's one-hot sub-window extraction
(ops/klt._patch) absorbs the 0..7-row remainder through the anchor at
zero extra cost. One HBM read of the image, one write of the blocks,
zero strips.

ref: the reference's per-track scalar window reads are
cpp/src/templering_sfm.cpp:408-423 (track_one window loads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128       # lane-tile width


def _row_slack(dtype) -> int:
    """Extra block rows from the sublane-aligned row anchor: Mosaic only
    lowers dynamic-sublane loads provably aligned to the dtype's sublane
    tile — 8 rows for f32, 16 for bf16 (see the tiling table in the TPU
    guide)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _read_one(img_ref, sx, sy8, WIN: int, slack: int, interpret: bool):
    """One rotated (WIN+slack, WIN) block read from a VMEM image at the
    (128-tile x, sublane-aligned y) anchor — the body of `_kernel`,
    shared with the pair kernel."""
    lane = jnp.int32(LANE)
    two_lane = jnp.int32(2 * LANE)
    align = jnp.int32(slack)
    WIN_AL = WIN + slack
    # non-negative (wrapper clamps), so trunc-div == floor-div
    tx = jax.lax.div(sx, lane) * lane  # 128-aligned tile start
    strip = img_ref[pl.ds(jax.lax.div(sy8, align) * align, WIN_AL),
                    pl.ds(tx, 2 * LANE)]  # (WIN_AL, 256)
    lx = sx - tx  # 0..127 in-tile column remainder
    # left-rotate lanes so column lx lands at 0 (jnp.roll moves
    # i -> i+s, so s = -lx; the hardware rotate wants a
    # non-negative shift: (2*LANE - lx) % 2*LANE, 0 when lx == 0)
    if interpret:
        rolled = jnp.roll(strip, -lx, axis=1)
    else:
        # Mosaic's tpu.dynamic_rotate only supports 32-bit data;
        # 16-bit strips (bf16 LK storage, ops/klt._lk_dtype) round-
        # trip through f32 for the rotate — exact (bf16 ⊂ f32) and
        # cheap (the kernel is per-track latency-bound, not VPU-bound)
        dt = strip.dtype
        if jnp.dtype(dt).itemsize == 2:
            strip = strip.astype(jnp.float32)
        rolled = pltpu.roll(
            strip, jax.lax.rem(two_lane - lx, two_lane), axis=1)
        rolled = rolled.astype(dt)
    return rolled[:, :WIN]


def _kernel(starts_ref, img_ref, out_ref, *, WIN: int, TB: int,
            slack: int, interpret: bool):
    # Everything in _read_one sticks to raw i32 lax primitives. Under
    # jax_enable_x64 (the package default) jnp sugar is a compile-time
    # trap in two distinct ways, both hit here before being fixed:
    #   * jnp.floor_divide / jnp.where with Python-int operands
    #     materialize i64 constants whose i64->i32 convert makes
    #     Mosaic's _convert_helper recurse forever (RecursionError);
    #   * even with i32-only operands they trace as inner `jit`
    #     closures that Mosaic RE-TRACES at lowering time under the
    #     global x64 flag, reintroducing i64 ("failed to legalize
    #     func.return (i32, i64)").
    # lax.div/rem/sub have direct Mosaic lowering rules, no re-trace.
    def body(t, carry):
        out_ref[pl.ds(t, 1)] = _read_one(
            img_ref, starts_ref[t, 0], starts_ref[t, 1], WIN, slack,
            interpret)[None]
        return carry

    # i32-pinned bounds/carry for the same x64 reason
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(TB), body,
                      jnp.int32(0))


def _kernel_pair(starts0_ref, starts1_ref, img0_ref, img1_ref,
                 out0_ref, out1_ref, *, WIN0: int, WIN1: int, TB: int,
                 slack: int, interpret: bool):
    """Two block reads per track — template (img0) + search-margin
    target (img1) — in ONE per-track loop: the gather is per-track
    LATENCY-bound, not payload-bound, so folding the narrow template
    read into the target gather's loop costs a fraction of a second
    kernel's full per-track loop (the reason template loads previously
    stayed on the XLA strips path)."""
    def body(t, carry):
        out0_ref[pl.ds(t, 1)] = _read_one(
            img0_ref, starts0_ref[t, 0], starts0_ref[t, 1], WIN0, slack,
            interpret)[None]
        out1_ref[pl.ds(t, 1)] = _read_one(
            img1_ref, starts1_ref[t, 0], starts1_ref[t, 1], WIN1, slack,
            interpret)[None]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(TB), body,
                      jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("WIN", "TB", "interpret"))
def load_blocks_pallas(img, starts, WIN: int, TB: int = 256,
                       interpret: bool = False):
    """Gather a row-aligned (WIN+8, WIN) block per track.

    img (H,W) f32; starts (T,2) i32 wanted top-left corners (x, y),
    clipped to [0, W-WIN] x [0, H-WIN]; WIN <= 128. Returns
    (blocks (T, WIN+8, WIN), anchors (T,2) i32) where ``anchors`` is
    (x, 8-aligned y): block row ``r`` holds image row ``anchor_y + r``,
    so rows [y - anchor_y, y - anchor_y + WIN) are the requested window.
    """
    H, W = img.shape
    slack = _row_slack(img.dtype)
    # pad: `slack` rows (aligned row start without a clamp) and one
    # extra lane tile past the rounded-up width (the 2-tile lane slice
    # never runs off the edge). Pad content never reaches the first WIN
    # rows / the extracted columns. The hard in-bounds clamp inside
    # `_pad_clamp` is load-bearing: dead/lost tracks can carry garbage
    # positions (a NaN float origin casts to INT_MIN on some backends)
    # and the kernel's dynamic VMEM reads do NOT clamp — an
    # out-of-bounds start faults the TPU worker process (measured),
    # where the XLA gather path would have clamped silently.
    img, W_pad, anchors = _pad_clamp(img, starts, WIN)
    T = starts.shape[0]
    TB = min(TB, max(T, 1))
    T_pad = -(-T // TB) * TB
    starts_p = jnp.zeros((T_pad, 2), jnp.int32).at[:T].set(anchors)
    grid = (T_pad // TB,)
    kernel = functools.partial(_kernel, WIN=WIN, TB=TB, slack=slack,
                               interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # per-step (TB,2) slice of the starts in SMEM (scalar reads);
            # prefetching ALL starts as a scalar operand blew the 1 MB
            # SMEM budget at bench scale.
            # Index-map literals are explicit i32: under jax_enable_x64
            # a Python `0` traces as i64 and Mosaic cannot legalize the
            # map's `func.return (i32, i64)`.
            pl.BlockSpec((TB, 2), lambda g: (g, jnp.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H + slack, W_pad),
                         lambda g: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, WIN + slack, WIN),
            lambda g: (g, jnp.int32(0), jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((T_pad, WIN + slack, WIN),
                                       img.dtype),
        interpret=interpret,
    )(starts_p, img)
    return out[:T], anchors


def _pad_clamp(img, starts, WIN: int):
    """The single-gather wrapper's pad/clamp/anchor prep, shared with
    the pair gather. Returns (padded img, padded-width W_pad, clamped
    anchors (T,2) i32)."""
    H, W = img.shape
    if H < WIN or W < WIN:
        raise ValueError(f"image {H}x{W} too small for WIN={WIN}")
    if WIN > LANE:
        raise ValueError(f"WIN={WIN} exceeds one lane tile ({LANE})")
    W_pad = -(-W // LANE) * LANE + LANE
    slack = _row_slack(img.dtype)
    img = jnp.pad(img, ((0, slack), (0, W_pad - W)))
    starts = jnp.clip(starts.astype(jnp.int32), 0,
                      jnp.asarray([W - WIN, H - WIN], jnp.int32))
    anchors = jnp.stack(
        [starts[:, 0], (starts[:, 1] // slack) * slack], axis=-1)
    return img, W_pad, anchors


@functools.partial(jax.jit, static_argnames=("WIN0", "WIN1", "TB",
                                             "interpret"))
def load_blocks_pair_pallas(img0, starts0, WIN0: int, img1, starts1,
                            WIN1: int, TB: int = 256,
                            interpret: bool = False):
    """Gather a row-aligned block per track from TWO images in one
    kernel: (WIN0+slack, WIN0) template blocks from ``img0`` and
    (WIN1+slack, WIN1) search blocks from ``img1`` (same shape/dtype,
    e.g. the two pyramid levels of an LK frame pair). One per-track
    loop covers both reads — see `_kernel_pair`.

    Returns (blocks0, anchors0, blocks1, anchors1) with the same
    anchor semantics as `load_blocks_pallas`.
    """
    assert img0.shape == img1.shape and img0.dtype == img1.dtype
    H, W = img0.shape
    slack = _row_slack(img0.dtype)
    img0, W_pad, anchors0 = _pad_clamp(img0, starts0, WIN0)
    img1, _, anchors1 = _pad_clamp(img1, starts1, WIN1)
    T = starts0.shape[0]
    TB = min(TB, max(T, 1))
    T_pad = -(-T // TB) * TB
    s0p = jnp.zeros((T_pad, 2), jnp.int32).at[:T].set(anchors0)
    s1p = jnp.zeros((T_pad, 2), jnp.int32).at[:T].set(anchors1)
    grid = (T_pad // TB,)
    kernel = functools.partial(_kernel_pair, WIN0=WIN0, WIN1=WIN1,
                               TB=TB, slack=slack, interpret=interpret)
    starts_spec = pl.BlockSpec((TB, 2), lambda g: (g, jnp.int32(0)),
                               memory_space=pltpu.SMEM)
    img_spec = pl.BlockSpec((H + slack, W_pad),
                            lambda g: (jnp.int32(0), jnp.int32(0)),
                            memory_space=pltpu.VMEM)
    out0, out1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[starts_spec, starts_spec, img_spec, img_spec],
        out_specs=[
            pl.BlockSpec((TB, WIN0 + slack, WIN0),
                         lambda g: (g, jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((TB, WIN1 + slack, WIN1),
                         lambda g: (g, jnp.int32(0), jnp.int32(0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, WIN0 + slack, WIN0),
                                 img0.dtype),
            jax.ShapeDtypeStruct((T_pad, WIN1 + slack, WIN1),
                                 img1.dtype),
        ],
        interpret=interpret,
    )(s0p, s1p, img0, img1)
    return out0[:T], anchors0, out1[:T], anchors1
