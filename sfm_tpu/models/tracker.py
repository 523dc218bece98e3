"""Stable-ID sparse feature tracker over a fixed-capacity track table.

TPU-native replacement for the reference's dynamic track containers
(reference: python/src/templering_sfm.py:395-470 ``KLTTracker`` —
goodFeaturesToTrack detection with exclusion mask, fwd+bwd LK with
fb-error gate, replenish to ``max_tracks`` when below ``min_tracks``;
cpp/src/templering_sfm.cpp:323-466). The dict-of-tracks becomes a
``(MAX_TRACKS,)`` masked table: dead slots are reused by masked writes,
ids grow monotonically, and the whole step (track + gate + replenish)
is one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import KLTConfig
from sfm_tpu.ops import features, image as im, klt


class TrackerState(NamedTuple):
    pos: jnp.ndarray  # (T,2) f32 current positions
    valid: jnp.ndarray  # (T,) bool
    ids: jnp.ndarray  # (T,) i32 stable track ids (-1 when dead)
    next_id: jnp.ndarray  # () i32


def init_state(max_tracks: int) -> TrackerState:
    return TrackerState(
        pos=jnp.zeros((max_tracks, 2), jnp.float32),
        valid=jnp.zeros((max_tracks,), jnp.bool_),
        ids=-jnp.ones((max_tracks,), jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
    )


def _replenish(state: TrackerState, img, cfg: KLTConfig) -> TrackerState:
    """Detect new corners and write them into free slots (ref py:462-468)."""
    T = state.pos.shape[0]
    xy, _, new_valid = features.detect_corners(
        img,
        state.pos,
        state.valid,
        max_new=T,
        cell=max(int(cfg.min_distance), 2),
        quality=cfg.quality,
        block_radius=max(int(cfg.block_size) // 2, 1),
    )
    # All-i32 free-slot compaction. Under the package-wide x64 mode,
    # jnp.nonzero/sum(bool)/arange default to int64, which TPU emulates as
    # u32 pairs — the nonzero-internal i64 cumsum compiles to a
    # (u32,u32)-pair reduce-window that blows the 16M scoped-vmem limit
    # (observed: 19.10M on the host pipeline's first replenish).
    iota = jnp.arange(T, dtype=jnp.int32)
    free = ~state.valid
    rank = jnp.cumsum(free.astype(jnp.int32), dtype=jnp.int32) - 1
    # free_idx[k] = slot index of the k-th free slot (T where none)
    free_idx = jnp.full((T,), T, jnp.int32).at[
        jnp.where(free, rank, T)].set(iota, mode="drop")
    n_free = jnp.sum(free, dtype=jnp.int32)
    # k-th new detection goes to k-th free slot; only while both exist
    take = new_valid & (iota < n_free)
    slot = jnp.where(take, free_idx, T)  # out-of-range writes are dropped
    new_ids = state.next_id + jnp.cumsum(
        take.astype(jnp.int32), dtype=jnp.int32) - 1
    pos = state.pos.at[slot].set(xy, mode="drop")
    valid = state.valid.at[slot].set(True, mode="drop")
    ids = state.ids.at[slot].set(jnp.where(take, new_ids, -1), mode="drop")
    next_id = state.next_id + jnp.sum(take, dtype=jnp.int32)
    return TrackerState(pos=pos, valid=valid, ids=ids, next_id=next_id)


@partial(jax.jit, static_argnames=("cfg",))
def bootstrap(img, cfg: KLTConfig) -> TrackerState:
    """Initial detection on the first frame (ref py:419-424 reset)."""
    return _replenish(init_state(cfg.max_tracks), img, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def step(pyr_prev, pyr_cur, state: TrackerState, cfg: KLTConfig):
    """Track all live tracks prev->cur, gate, and replenish if starved.

    Returns (new_state, prev_pos (T,2), matched (T,) bool) where
    ``matched`` marks tracks alive in BOTH frames (the correspondence set
    handed to two-view geometry, ref py:426-460 step return).
    """
    new_pos, ok = klt.lk_track_fb(
        pyr_prev,
        pyr_cur,
        state.pos,
        state.valid,
        levels=cfg.pyr_levels,
        iters=cfg.iters,
        radius=cfg.win_radius,
        fb_thresh=cfg.fb_thresh,
    )
    matched = state.valid & ok
    surv = TrackerState(
        pos=jnp.where(matched[:, None], new_pos, state.pos),
        valid=matched,
        ids=jnp.where(matched, state.ids, -1),
        next_id=state.next_id,
    )
    n_alive = jnp.sum(matched)
    new_state = jax.lax.cond(
        n_alive < cfg.min_tracks,
        lambda s: _replenish(s, pyr_cur[0], cfg),
        lambda s: s,
        surv,
    )
    return new_state, state.pos, matched
