"""Multi-scene / multi-device execution of the SfM compute path.

The reference processes one sequence in one thread (SURVEY §2.6). Here
the per-frame stages (pyramid build, KLT, LO-RANSAC, triangulation, BA
iteration) take a leading ``scene`` axis: ``vmap`` batches scenes on one
chip and ``shard_map`` over a ``Mesh('scene','hyp')`` spreads them over
devices (BASELINE config 5). RANSAC hypothesis generation/scoring can
additionally shard over the ``hyp`` axis with an all-reduce argmax —
the tensor-parallel analogue for this workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sfm_tpu.config import KLTConfig
from sfm_tpu.models import tracker
from sfm_tpu.ops import ba as ba_ops, epipolar, image as im, klt


# ---------------------------------------------------------------------------
# scene-batched stages (vmap over a leading S axis)
# ---------------------------------------------------------------------------


def batched_two_view(keys, xi, xj, valid, num_hypotheses: int = 256,
                     sampson_thresh: float = 2e-5, min_inliers: int = 16):
    """vmap of LO-RANSAC over scenes: keys (S,2), xi/xj (S,N,2)."""
    fn = partial(
        epipolar.find_E_ransac,
        num_hypotheses=num_hypotheses,
        sampson_thresh=sampson_thresh,
        min_inliers=min_inliers,
    )
    return jax.vmap(fn)(keys, xi, xj, valid)


def batched_lk(pyr0, pyr1, pts, valid, levels: int, iters: int, radius: int,
               fb_thresh: float = 1.0):
    """vmap of forward-backward LK over scenes.

    pyr0/pyr1: tuples of (S,H,W) arrays (finest first)."""
    fn = partial(klt.lk_track_fb, levels=levels, iters=iters, radius=radius,
                 fb_thresh=fb_thresh)
    return jax.vmap(fn)(pyr0, pyr1, pts, valid)


def batched_ba_step(problems: ba_ops.BAProblem, iters: int = 3,
                    huber_delta: float = 2e-3):
    """vmap of the Schur-LM bundle adjuster over scenes (leading S axis
    on every BAProblem field)."""
    fn = partial(ba_ops.bundle_adjust, iters=iters, huber_delta=huber_delta)
    return jax.vmap(fn)(problems)


# ---------------------------------------------------------------------------
# hypothesis-sharded RANSAC (tensor-parallel analogue)
# ---------------------------------------------------------------------------


def _hyp_shard_scores(key, xi, xj, valid, num_hypotheses: int, thr):
    """Per-device hypothesis chunk: generate, fit, score. Runs inside
    shard_map with axis ``hyp``; returns the device-local best (E, cost)."""
    idx = jax.lax.axis_index("hyp")
    key = jax.random.fold_in(key, idx)
    N = xi.shape[0]
    pri = jax.random.uniform(key, (num_hypotheses, N), dtype=jnp.float32)
    pri = jnp.where(valid[None, :], pri, -jnp.inf)
    _, sample_idx = jax.lax.top_k(pri, 8)
    E = epipolar.eight_point_E(xi[sample_idx], xj[sample_idx])
    err = epipolar.sampson_error(E, xi[None], xj[None])
    cost = jnp.sum(jnp.where(valid[None], jnp.minimum(err, thr), 0.0), axis=-1)
    best = jnp.argmin(cost)
    return E[best], cost[best]


def find_E_sharded(key, xi, xj, valid, mesh, num_hypotheses_total: int = 2048,
                   sampson_thresh: float = 2e-5):
    """Essential-matrix search with hypotheses sharded over the mesh's
    ``hyp`` axis: each device fits/scores its chunk, the winner is chosen
    by an all-reduce min over the truncated cost (ICI collective), and
    every device returns the same best E."""
    n_hyp_dev = mesh.shape["hyp"]
    chunk = max(num_hypotheses_total // n_hyp_dev, 8)
    thr = jnp.asarray(sampson_thresh, xi.dtype)

    def shard_fn(key, xi, xj, valid):
        E_loc, c_loc = _hyp_shard_scores(key, xi, xj, valid, chunk, thr)
        c_min = jax.lax.pmin(c_loc, "hyp")
        is_best = (c_loc == c_min).astype(xi.dtype)
        # normalize in case of exact ties across devices
        n_best = jax.lax.psum(is_best, "hyp")
        E_best = jax.lax.psum(E_loc * is_best / jnp.maximum(n_best, 1.0), "hyp")
        return E_best, c_min

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(key, xi, xj, valid)


# ---------------------------------------------------------------------------
# scene-sharded lockstep odometry step (the multi-chip "training step")
# ---------------------------------------------------------------------------


def make_scene_step(mesh, klt_cfg: KLTConfig, num_hypotheses: int = 128,
                    sampson_thresh: float = 2e-5, ba_iters: int = 2,
                    huber_delta: float = 2e-3):
    """Build the jitted multi-chip frame step.

    Per scene (sharded over the ``scene`` mesh axis): LK-track the track
    table into the new frame, run LO-RANSAC for the relative pose, and
    run ``ba_iters`` LM iterations of the window BA. Global health
    metrics (total live tracks / inliers) reduce over the mesh with
    ``psum`` so the step exercises real cross-device collectives.

    Returns step(keys, pyr0, pyr1, state, ba_problem) ->
    (new_state, RelPose batch, (R_wc, t_wc, X), metrics dict).
    """
    levels = klt_cfg.pyr_levels
    spec_img = tuple(P("scene") for _ in range(levels))
    state_spec = tracker.TrackerState(
        pos=P("scene"), valid=P("scene"), ids=P("scene"), next_id=P("scene")
    )
    ba_spec = ba_ops.BAProblem(*([P("scene")] * 8))
    relpose_spec = epipolar.RelPose(*([P("scene")] * 6))

    def per_scene(key, K, pyr0, pyr1, state, prob):
        new_pos, ok = klt.lk_track_fb(
            pyr0, pyr1, state.pos, state.valid,
            levels=levels, iters=klt_cfg.iters, radius=klt_cfg.win_radius,
            fb_thresh=klt_cfg.fb_thresh,
        )
        matched = state.valid & ok
        new_state = tracker.TrackerState(
            pos=jnp.where(matched[:, None], new_pos, state.pos),
            valid=matched,
            ids=jnp.where(matched, state.ids, -1),
            next_id=state.next_id,
        )
        xi = epipolar.normalize_by_K(K, state.pos)
        xj = epipolar.normalize_by_K(K, new_pos)
        rp = epipolar.find_E_ransac(
            key, xi, xj, matched,
            num_hypotheses=num_hypotheses,
            sampson_thresh=sampson_thresh,
            min_inliers=8,
        )
        R_wc, t_wc, X, info = ba_ops.bundle_adjust(
            prob, iters=ba_iters, huber_delta=huber_delta
        )
        return new_state, rp, (R_wc, t_wc, X), info["cost"]

    def sharded(keys, K, pyr0, pyr1, state, prob):
        new_state, rp, ba_out, ba_cost = jax.vmap(
            per_scene, in_axes=(0, None, 0, 0, 0, 0)
        )(keys, K, pyr0, pyr1, state, prob)
        metrics = {
            "tracks_alive": jax.lax.psum(jnp.sum(new_state.valid), "scene"),
            "inliers": jax.lax.psum(jnp.sum(rp.num_inliers), "scene"),
            "ba_cost": jax.lax.psum(jnp.sum(ba_cost), "scene"),
        }
        return new_state, rp, ba_out, metrics

    fn = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P("scene"), P(), spec_img, spec_img, state_spec, ba_spec),
        out_specs=(state_spec, relpose_spec,
                   (P("scene"), P("scene"), P("scene")),
                   {"tracks_alive": P(), "inliers": P(), "ba_cost": P()}),
        check_vma=False,
    )
    return jax.jit(fn)
