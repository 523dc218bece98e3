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


def _kernel(starts_ref, img_ref, out_ref, *, WIN: int, TB: int,
            slack: int, interpret: bool):
    WIN_AL = WIN + slack

    # Everything below sticks to raw i32 lax primitives. Under
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
    lane = jnp.int32(LANE)
    two_lane = jnp.int32(2 * LANE)
    align = jnp.int32(slack)

    def body(t, carry):
        sy8 = starts_ref[t, 1]  # pre-aligned by the wrapper
        sx = starts_ref[t, 0]
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
        out_ref[pl.ds(t, 1)] = rolled[:, :WIN][None]
        return carry

    # i32-pinned bounds/carry for the same x64 reason
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
    if H < WIN or W < WIN:
        raise ValueError(f"image {H}x{W} too small for WIN={WIN}")
    if WIN > LANE:
        raise ValueError(f"WIN={WIN} exceeds one lane tile ({LANE})")
    # pad: 8 slack rows (8-aligned row start without a clamp) and one
    # extra lane tile past the rounded-up width (the 2-tile lane slice
    # never runs off the edge). Pad content never reaches the first WIN
    # rows / the extracted columns.
    W_pad = -(-W // LANE) * LANE + LANE
    slack = _row_slack(img.dtype)
    img = jnp.pad(img, ((0, slack), (0, W_pad - W)))
    T = starts.shape[0]
    TB = min(TB, max(T, 1))
    T_pad = -(-T // TB) * TB
    # hard in-bounds clamp: dead/lost tracks can carry garbage positions
    # (a NaN float origin casts to INT_MIN on some backends) and the
    # kernel's dynamic VMEM reads do NOT clamp — an out-of-bounds start
    # faults the TPU worker process (measured), where the XLA gather
    # path would have clamped silently. Clamping here keeps the kernel
    # total for any finite-or-not input; garbage slots return in-bounds
    # (masked-out) data just like the strips path.
    starts = jnp.clip(starts.astype(jnp.int32), 0,
                      jnp.asarray([W - WIN, H - WIN], jnp.int32))
    anchors = jnp.stack(
        [starts[:, 0], (starts[:, 1] // slack) * slack], axis=-1)
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
