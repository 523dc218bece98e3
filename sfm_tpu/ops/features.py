"""Shi-Tomasi corner detection as one fused tensor program.

TPU-native replacement for the reference's scalar detector
(reference: cpp/src/templering_sfm.cpp:237-302 ``shi_tomasi``:
central-difference gradients, 5x5 box structure tensor, min-eigenvalue
score (tr − sqrt(tr² − 4 det))/2, quality threshold, greedy min-distance
NMS; python/src/templering_sfm.py:403-417 uses cv2.goodFeaturesToTrack
with an exclusion mask).

The greedy NMS becomes a grid-cell max: the image is tiled into
``min_distance``-sized cells, each cell keeps its best corner, and cells
touched by an existing track are suppressed. This is the standard batched
equivalent (identical guarantees: no two kept corners within one cell;
at most ~2x the reference's min-distance radius) and is fully jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.ops import image as im


def _use_pallas() -> bool:
    """The fused Pallas corner kernel is the default on the TPU backend —
    measured 1.3-1.9x faster than the XLA twin on a v5e chip
    (tools/bench_pallas.py); the XLA path serves CPU/interpret.

    SFM_TPU_PALLAS overrides the backend default in both directions:
    "0" forces the XLA path (the kill-switch if the kernel misbehaves on
    a new TPU generation/toolchain), "1" forces the Pallas path."""
    import os

    env = os.environ.get("SFM_TPU_PALLAS", "").strip()
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend init failure -> safe fallback
        return False


def shi_tomasi_score(img, block_radius: int = 2):
    """Min-eigenvalue corner response map (H,W); ref cpp:237-269."""
    gx, gy = im.gradients(img)
    # structure tensor, box-summed over the block window
    a = im.box_filter(gx * gx, block_radius)
    b = im.box_filter(gx * gy, block_radius)
    c = im.box_filter(gy * gy, block_radius)
    tr = a + c
    det = a * c - b * b
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


@partial(jax.jit, static_argnames=("max_new", "cell", "border", "block_radius"))
def detect_corners(img, exclude_xy, exclude_valid, max_new: int, cell: int,
                   quality: float = 0.01, border: int = 8, block_radius: int = 2):
    """Top-``max_new`` corners outside occupied grid cells.

    Args:
      img: (H,W) f32 grayscale.
      exclude_xy: (T,2) existing track positions (x,y).
      exclude_valid: (T,) bool.
      max_new: static — number of corners to return (padded with valid=False).
      cell: static — min-distance grid cell size in px.
    Returns:
      xy (max_new,2) f32, score (max_new,), valid (max_new,) bool.
    """
    H, W = img.shape
    if _use_pallas():
        from sfm_tpu.ops.pallas.shi_tomasi_kernel import shi_tomasi_score_pallas

        score = shi_tomasi_score_pallas(img, block_radius)
    else:
        score = shi_tomasi_score(img, block_radius)
    # border + quality gating (ref cpp:271-284)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (
        (xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border)
    )
    smax = jnp.max(jnp.where(in_border, score, 0.0))
    ok = in_border & (score > quality * smax)
    score = jnp.where(ok, score, -1.0)

    # grid-cell max-pool NMS
    gh, gw = H // cell, W // cell
    sc = score[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    cell_best = sc.max(axis=(1, 3))  # (gh,gw)
    flat = sc.transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    arg = jnp.argmax(flat, axis=-1)  # (gh,gw) index within cell
    cy = arg // cell
    cx = arg % cell
    gy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    best_x = (gx * cell + cx).astype(jnp.float32)
    best_y = (gy * cell + cy).astype(jnp.float32)

    # suppress cells occupied by existing tracks (and their 8-neighborhood,
    # matching the reference's min-distance exclusion, cpp:374-389)
    ex = jnp.clip((exclude_xy[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    ey = jnp.clip((exclude_xy[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    occ = jnp.zeros((gh, gw), dtype=jnp.bool_)
    upd = exclude_valid
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            iy = jnp.clip(ey + dy, 0, gh - 1)
            ix = jnp.clip(ex + dx, 0, gw - 1)
            occ = occ.at[iy, ix].max(upd)
    cell_best = jnp.where(occ, -1.0, cell_best)

    # global top-k over cells
    k = min(max_new, gh * gw)
    top_scores, top_idx = jax.lax.top_k(cell_best.ravel(), k)
    xy = jnp.stack([best_x.ravel()[top_idx], best_y.ravel()[top_idx]], axis=-1)
    valid = top_scores > 0.0
    if k < max_new:
        pad = max_new - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        top_scores = jnp.concatenate([top_scores, -jnp.ones((pad,), top_scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.bool_)])
    return xy, top_scores, valid
