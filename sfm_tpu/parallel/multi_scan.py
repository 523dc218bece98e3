"""Multi-scene device-resident reconstruction: vmap over the scan loop.

BASELINE config 5 (N TempleRing-style sequences in parallel) on the
round-2 flagship path: the ENTIRE per-frame pipeline of
``models/scan_pipeline.py`` — tracking, LO-RANSAC, keyframe policy,
triangulation, sliding-window Schur-LM BA — is ``jax.vmap``-ed over a
scene axis and runs for all scenes in ONE compiled chunk program.
Compared to ``parallel/batch_runner.py`` (lockstep visual odometry, no
mapping/BA) this is full reconstruction per scene.

Under vmap the keyframe ``lax.cond`` becomes a select (both branches run
for every scene every frame) — the natural cost model for homogeneous
lockstep captures, where scenes keyframe on similar cadences anyway.

Single-chip: one vmapped program (this module). Multi-chip: shard the
scene axis over a ``Mesh`` with ``NamedSharding(P("scene"))`` on the
carry/batch — the program is identical, XLA partitions it (SURVEY §2.6
scene/data parallelism row; exercised on a virtual mesh by
``__graft_entry__.dryrun_multichip`` and ``tests/test_parallel.py``).
"""

from __future__ import annotations

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import SystemConfig
from sfm_tpu.models import scan_pipeline as sp

log = logging.getLogger("sfm_tpu")


@partial(jax.jit, static_argnames=("cfg", "kf_cap", "p_cap"))
def _bootstrap_scenes(cfg: SystemConfig, kf_cap: int, p_cap: int,
                      imgs0, idx0, keys):
    """(S,H,W) first frames -> vmapped ScanCarry with leading scene axis."""
    return jax.vmap(
        lambda im, k: sp.bootstrap_carry.__wrapped__(cfg, kf_cap, p_cap, im, idx0, k)
    )(imgs0, keys)


@partial(jax.jit, static_argnames=("cfg", "p_ba"),
         donate_argnames=("carry",))
def _run_chunk_scenes(cfg: SystemConfig, p_ba: int, Kf, carry,
                      imgs, idxs, fvalid):
    """imgs (S,C,H,W); idxs (C,); fvalid (C,). One program, all scenes."""
    return jax.vmap(
        lambda c, im: sp.run_chunk.__wrapped__(cfg, p_ba, Kf, c, im, idxs, fvalid)
    )(carry, imgs)


@partial(jax.jit, static_argnames=("cfg", "p_ba"),
         donate_argnames=("carry",))
def _run_chunk_scenes_gated(cfg: SystemConfig, p_ba: int, Kf, carry,
                            imgs, idxs, fvalid):
    """Scene-batched chunk with an ANY-scene keyframe gate.

    Wholesale ``vmap(run_chunk)`` turns the per-frame keyframe
    ``lax.cond`` into a select: the heavy branch (edge RANSAC + PnP +
    triangulation + window BA) runs for EVERY scene on EVERY frame. Here
    the scene axis is explicit inside the scan body: the always-on
    prefix (tracking + two-view) is vmapped, and the keyframe branch
    runs under ONE ``lax.cond`` gated on ``any(make_kf)``, with the
    per-scene results masked back in. For lockstep captures (scenes
    keyframing on similar cadences — the multi-scene design point) the
    branch then fires at single-scene cadence instead of always.

    imgs (S,C,H,W); idxs (C,); fvalid (C,). Returns (carry, ys(S,C,NY)).
    """
    S = imgs.shape[0]

    def frame_step(carry, inp):
        img_s, idx, fval = inp

        def do(carry):
            carry, make_kf, keys, rps, y_pre = jax.vmap(
                lambda c, im: sp._track_and_pose_rp(cfg, Kf, c, im, idx)
            )(carry, img_s)
            ykf_none = jnp.tile(sp.ykf_none(), (S, 1))

            def kf_any(args):
                c, ks, rp = args
                c2, ykf2 = jax.vmap(
                    lambda ci, ki, rpi: sp._keyframe_branch(
                        cfg, p_ba, Kf, (ci, idx, ki, rpi))
                )(c, ks, rp)

                def sel(n, o):
                    m = make_kf.reshape(
                        make_kf.shape + (1,) * (n.ndim - 1))
                    return jnp.where(m, n, o)

                c3 = jax.tree.map(sel, c2, c)
                return c3, jnp.where(make_kf[:, None], ykf2, ykf_none)

            def kf_none(args):
                return args[0], ykf_none

            carry, ykf = jax.lax.cond(
                jnp.any(make_kf), kf_any, kf_none, (carry, keys, rps))
            y = jax.vmap(sp._pack_frame_metrics,
                         in_axes=(0, None, 0, 0))(carry, idx, y_pre, ykf)
            return carry, y

        def skip(carry):
            return carry, jnp.zeros((S, sp.NY), jnp.float32)

        return jax.lax.cond(fval, do, skip, carry)

    imgs_t = jnp.swapaxes(imgs, 0, 1)  # scan over frames: (C,S,H,W)
    carry, ys = jax.lax.scan(frame_step, carry, (imgs_t, idxs, fvalid))
    return carry, jnp.swapaxes(ys, 0, 1)  # (S,C,NY)


def _scene_view(datasets, images, cfg, s, n, chunk, p_cap, p_ba):
    """A per-scene ScanSfM shell that borrows the single-scene host-side
    machinery (loop verification, pose-graph pushback, finalize, export)
    for scene ``s`` of the vmapped carry. Its ``.carry`` is refreshed from
    the batched carry before each use and the (tiny) pose fields written
    back after a pushback."""
    v = sp.ScanSfM(datasets[s].K, cfg, n_frames=n, chunk=chunk,
                   p_cap=p_cap, p_ba=p_ba)
    v._names = [datasets[s].records[i].img for i in range(n)]
    v._images[0] = np.asarray(images[s][0])  # bootstrap keyframe
    return v


@jax.jit
def _drain_stage_scenes(carry):
    """One vmapped drain pull for ALL scenes, (S, L): the per-scene
    finalize previously sliced the batched carry (~20 eager dispatches
    × ~25 ms relay latency per scene) and pulled S separate drains."""
    return jax.vmap(sp._drain_stage.__wrapped__)(carry)


@jax.jit
def _ring_pose_stage_scenes(carry):
    """One packed pull of ALL scenes' ring poses, (S, L). Gating each
    scene from its own carry slice costs ~20 eager leaf slices × ~25 ms
    dispatch on the remote relay BEFORE the host gate can reject; one
    vmapped pull amortizes that to a single device call per chunk."""
    return jax.vmap(sp._ring_pose_stage.__wrapped__)(carry)


@partial(jax.jit, static_argnames=("levels", "lk_iters", "radius"))
def _verify_scene_stage(Kf, img_old, img_new, carry, s, cand_kf, cur_kf,
                        levels, lk_iters, radius, fb_thresh, huber_delta):
    """Fused gather + LK+PnP loop verification for ONE scene of the
    batched carry. Slicing a scene's ~20 carry leaves eagerly costs
    ~25 ms relay dispatch EACH before the verification can even start;
    here the scene/keyframe gather rides inside the same program as
    `_loop_pnp_edge_stage` and the host pulls one 16-float pack."""
    ring = carry.ring
    return sp._loop_pnp_edge_stage.__wrapped__(
        Kf, img_old, img_new,
        ring.uv[s, cand_kf], ring.pid[s, cand_kf],
        ring.tvalid[s, cand_kf],
        ring.R_cw[s, cand_kf], ring.t_cw[s, cand_kf], carry.X[s],
        ring.pid[s, cur_kf], ring.tvalid[s, cur_kf],
        ring.R_cw[s, cur_kf], ring.t_cw[s, cur_kf],
        levels=levels, lk_iters=lk_iters, radius=radius,
        fb_thresh=fb_thresh, huber_delta=huber_delta)


@jax.jit
def _apply_pushback(carry, s, ring_R, ring_t, last_R, last_t):
    """Write one scene's pose-graph-corrected ring poses + current pose
    into the batched carry in ONE program (vs ~6 eager `.at[].set`
    dispatches through a sliced per-scene carry)."""
    return carry._replace(
        R_cw=carry.R_cw.at[s].set(last_R),
        t_cw=carry.t_cw.at[s].set(last_t),
        ring=carry.ring._replace(
            R_cw=carry.ring.R_cw.at[s].set(ring_R),
            t_cw=carry.ring.t_cw.at[s].set(ring_t)))


@partial(jax.jit, static_argnames=("iters", "rounds"))
def _finalize_refine_scenes_stage(Kf, carry, do0, later, enab, iters,
                                  rounds, lambda0, huber_delta):
    """`_finalize_refine_core` vmapped over the batched carry: ALL
    scenes' re-triangulate + frozen-pose polish rounds in ONE program,
    one (S, P*3+2) pull. Gate flags are traced per-scene scalars (the
    single-scene wrapper uses static flags instead — lockstep scenes
    almost always share them, so the masked dead work is negligible)."""
    return jax.vmap(
        lambda c, f0, fl, fe: sp._finalize_refine_core(
            Kf, c.ring, c.X, c.n_pts, f0, fl, fe, iters, rounds,
            lambda0, huber_delta)
    )(carry, do0, later, enab)


def _refine_scenes(views, cfg, carry) -> None:
    """Cross-scene batched twin of `ScanSfM.finalize`'s refinement loop
    (finalize was called with ``refine=False``): one vmapped
    `_finalize_refine_core` program replaces 2×S serial device
    round-trips. Updates each view's ``_X`` in place."""
    if not views:
        return
    rounds = views[0].refine_rounds
    if rounds < 1:
        return
    do0, later, enab = [], [], []
    for v in views:
        n_kf, n_pts = len(v.kfs), len(v._X)
        m = 0
        if n_kf:
            tval = np.stack([kf.valid for kf in v.kfs])
            m = int((tval & (v._ring_pid >= 0)
                     & (v._ring_pid < n_pts)).sum())
        do0.append(bool(v._pg_ran and n_pts >= 10))
        later.append(bool(n_pts >= 10))
        enab.append(bool(cfg.ba.global_iters > 0 and n_kf >= 3
                         and n_pts >= 10 and m >= 30))
    touched = [d or e or (rounds > 1 and lt)
               for d, lt, e in zip(do0, later, enab)]
    if not any(touched):
        return
    fx = float(views[0].K[0, 0])
    out = np.asarray(_finalize_refine_scenes_stage(
        views[0]._Kj, carry, np.asarray(do0), np.asarray(later),
        np.asarray(enab), iters=cfg.ba.global_iters, rounds=rounds,
        lambda0=cfg.ba.lambda0,
        huber_delta=cfg.ba.huber_delta / fx), np.float64)
    for s, v in enumerate(views):
        if not touched[s]:
            continue
        v._X = out[s, :-2].reshape(-1, 3)[: len(v._X)]
        if enab[s]:
            log.info("structure refine (scene %d): cost %.3e -> %.3e "
                     "(%d kfs, %d pts)", s, out[s, -2], out[s, -1],
                     len(v.kfs), len(v._X))


def _writeback_scene_poses(carry, s, vc):
    """Push a scene view's pose-graph-corrected poses back into the
    batched carry (only the fields _pose_graph_pushback touches)."""
    return carry._replace(
        R_cw=carry.R_cw.at[s].set(vc.R_cw),
        t_cw=carry.t_cw.at[s].set(vc.t_cw),
        ring=carry.ring._replace(
            R_cw=carry.ring.R_cw.at[s].set(vc.ring.R_cw),
            t_cw=carry.ring.t_cw.at[s].set(vc.ring.t_cw),
        ),
    )


def run_scenes_scan(datasets, cfg: SystemConfig, frames: int | None = None,
                    chunk: int = 16, p_cap: int = 16384, p_ba: int = 1024,
                    seed: int | None = None, images=None, mesh=None,
                    gated: bool = True, out_dirs=None,
                    checkpoint_path=None, checkpoint_every: int = 0,
                    resume: bool = False):
    """Reconstruct N scenes in lockstep with full per-scene mapping + BA,
    loop closure, pose graph, and finalize/export — the same work as a
    single-scene ``ScanSfM`` run (ref cpp/src/templering_sfm.cpp:1822-1866
    fires loop checks every keyframe; here, as in the single-scene scan
    pipeline, they fire per chunk, per scene).

    ``datasets``: list of TempleRing handles with identical K/shape.
    ``images``: optional preloaded grays, ``images[s][i]`` (keeps file IO
    out of benchmark timing). ``mesh``: optional ``jax.sharding.Mesh``
    with a ``scene`` axis — the carry and image batch are placed with
    ``NamedSharding(P('scene'))`` and XLA partitions the (embarrassingly
    scene-parallel) program across devices; S must divide the axis size.
    ``out_dirs``: optional per-scene output directories — when given,
    each scene's artifacts (centers CSV, edges CSV, PLY) are exported.
    ``checkpoint_path`` + ``checkpoint_every``: write a resumable
    checkpoint (scene-batched carry + per-scene host state + pulled
    metric rows) every N chunks (SURVEY §5 checkpointed re-entry for
    multi-sequence runs). ``resume=True`` re-enters a run from
    ``checkpoint_path`` bit-identically (same datasets/config/capacities
    required) instead of bootstrapping from frame 0.
    Returns dict with per-scene keyframe centers, counts, loop edges,
    points, and metrics. Centers/frames are the post-pose-graph,
    post-finalize keyframe values (identical semantics to single-scene
    ``ScanSfM.kfs``).
    """
    S = len(datasets)
    # force host-side loop verification: under vmap the device-verify
    # lax.cond becomes a select, and every scene would pay the full
    # LK+PnP verification on every keyframe (see LoopConfig.device_verify)
    if cfg.loop.enabled and cfg.loop.device_verify:
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, loop=_dc.replace(cfg.loop, device_verify=False))
    n = frames or min(len(d) for d in datasets)
    if images is None:
        images = [[d.load_gray(i) for i in range(n)] for d in datasets]
    kf_cap = sp._next_pow2(n + 1, lo=16)
    Kf = jnp.asarray(datasets[0].K, jnp.float32)
    # scene 0 gets the EXACT single-scene RNG stream (ScanSfM seeds from
    # cfg.ransac.seed): adding scenes must not perturb a scene's result
    # (test_single_scene_equivalence); later scenes fold in their index
    base = jax.random.PRNGKey(cfg.ransac.seed if seed is None else seed)
    keys = jnp.stack([base] + [jax.random.fold_in(base, s)
                               for s in range(1, S)]) if S > 1 \
        else base[None]

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("scene"))

    views = [_scene_view(datasets, images, cfg, s, n, chunk, p_cap, p_ba)
             for s in range(S)]

    imgs0 = jnp.stack([jnp.asarray(images[s][0]) for s in range(S)])
    ys_all = []
    # coarse host-side phase timers (the per-chunk ys pull and the
    # finalize pulls are real syncs, so the segments are attributable)
    tm = {"chunks": 0.0, "loop_check": 0.0, "finalize": 0.0}
    start_ci = 0
    if resume:
        from sfm_tpu.utils import checkpoint as ckpt

        carry, meta, ys_ck, loops = ckpt.load_multiscene_checkpoint(
            checkpoint_path)
        assert meta["n_scenes"] == S, "checkpoint scene count mismatch"
        start_ci = meta["next_chunk"]
        tm.update(meta["timers"])
        if ys_ck is not None:
            ys_all.append(ys_ck)
            # re-seed each view's host state: keyframe grays (from the
            # already-pulled metric rows) + loop/pose-graph bookkeeping
            for s in range(S):
                rows = ys_ck[s]
                kf_rows = rows[(rows[:, sp.Y_VALID] > 0.5)
                               & (rows[:, sp.Y_KF] > 0.5)]
                for fi in kf_rows[:, sp.Y_FRAME].astype(int):
                    views[s]._images[int(fi)] = images[s][int(fi)]
        for s in range(S):
            views[s].loop_edges = loops[s]
            views[s]._pg_ran = meta["pg_ran"][s]
    else:
        carry = _bootstrap_scenes(cfg, kf_cap, p_cap, imgs0,
                                  jnp.zeros((), jnp.int32), keys)
    if shard is not None:
        carry = jax.device_put(carry, shard)

    def _assemble(start):
        """Host-assemble one chunk's (S,C,H,W) image batch and DISPATCH
        its H2D transfer (jnp.asarray returns at dispatch; the copy
        streams in the background). At bench scale the batch is ~20 MB
        ≈ 500 ms over the axon relay — prefetching the next chunk while
        the current one computes takes that off the critical path."""
        stop = min(start + chunk, n)
        imgs = np.zeros((S, chunk, *imgs0.shape[1:]), np.uint8)
        idxs = np.zeros((chunk,), np.int32)
        fvalid = np.zeros((chunk,), bool)
        for k, fi in enumerate(range(start, stop)):
            for s in range(S):
                imgs[s, k] = images[s][fi]
            idxs[k] = fi
            fvalid[k] = True
        imgs_j = jnp.asarray(imgs)
        if shard is not None:
            imgs_j = jax.device_put(imgs_j, shard)
        return imgs_j, jnp.asarray(idxs), jnp.asarray(fvalid)

    starts = list(range(1, n, chunk))
    run = _run_chunk_scenes_gated if gated else _run_chunk_scenes
    nxt = _assemble(starts[start_ci]) if starts[start_ci:] else None
    for ci in range(start_ci, len(starts)):
        t0 = time.perf_counter()
        imgs_j, idxs_j, fvalid_j = nxt
        carry, ys = run(cfg, p_ba, Kf, carry, imgs_j, idxs_j, fvalid_j)
        if ci + 1 < len(starts):
            # overlap the next chunk's upload with this chunk's compute
            nxt = _assemble(starts[ci + 1])
        ys_c = np.asarray(ys)  # (S,C,NY) — the chunk's single bulk pull
        ys_all.append(ys_c)
        t1 = time.perf_counter()
        tm["chunks"] += t1 - t0

        # per-scene host-side work, gated on the (already pulled) metrics
        # so scenes without candidates cost zero extra device traffic
        maybe: list[int] = []
        for s in range(S):
            v = views[s]
            rows = ys_c[s]
            kf_rows = rows[(rows[:, sp.Y_VALID] > 0.5)
                           & (rows[:, sp.Y_KF] > 0.5)]
            for fi in kf_rows[:, sp.Y_FRAME].astype(int):
                v._images[int(fi)] = images[s][int(fi)]
            if not cfg.loop.enabled:
                continue
            # ORB candidates come from the ORB match bank, scored per new
            # keyframe — any keyframe in the chunk is a candidate scene;
            # the descriptor flavor pre-gates on the ring score
            if (len(kf_rows) if cfg.loop.method == "orb" else
                    sp.ScanSfM.loop_candidate_rows(rows, cfg.loop).any()):
                maybe.append(s)
        if maybe and cfg.loop.method == "orb":
            # ORB candidates come from the view's descriptor bank, not
            # the ring scores — fall back to the per-scene path. One
            # batched pose pull gates on keyframe count first: a full
            # carry slice costs ~20 eager dispatches and no scene can
            # close a loop before min_kf_gap keyframes exist.
            K_ = int(carry.ring.pid.shape[1])
            rp_flat = np.asarray(_ring_pose_stage_scenes(carry),
                                 np.float64)
            for s in maybe:
                if int(rp_flat[s][K_ * 28]) <= cfg.loop.min_kf_gap:
                    continue
                v = views[s]
                v.carry = jax.tree.map(lambda a: a[s], carry)
                n0 = len(v.loop_edges)
                v._check_loops(ys_c[s])
                if len(v.loop_edges) > n0:
                    carry = _writeback_scene_poses(carry, s, v.carry)
        elif maybe:
            # one batched pose pull for every candidate scene, host-side
            # numpy gating, and a carry slice ONLY for gate survivors
            K_ = int(carry.ring.pid.shape[1])
            rp_flat = np.asarray(_ring_pose_stage_scenes(carry),
                                 np.float64)
            for s in maybe:
                v = views[s]
                rp = sp._unpack_ring_poses(rp_flat[s], K_)
                cands = sp.ScanSfM.gate_loop_candidates(
                    ys_c[s], rp, cfg.loop)
                if not cands:
                    continue
                kcfg = cfg.klt
                fx = float(v.K[0, 0])

                def verify(cand_kf, cur_kf, old_img, new_img, cs=None,
                           v=v, s=s):
                    pack = np.asarray(_verify_scene_stage(
                        v._Kj, jnp.asarray(old_img),
                        jnp.asarray(new_img), carry,
                        jnp.asarray(s, jnp.int32),
                        jnp.asarray(cand_kf, jnp.int32),
                        jnp.asarray(cur_kf, jnp.int32),
                        levels=kcfg.pyr_levels, lk_iters=kcfg.iters,
                        radius=kcfg.win_radius, fb_thresh=kcfg.fb_thresh,
                        huber_delta=cfg.ba.huber_delta / fx), np.float64)
                    if pack[15] < 30:
                        # unmapped old keyframe — rare E-RANSAC fallback
                        # through the per-scene path (needs the slice)
                        v.carry = jax.tree.map(lambda a: a[s], carry)
                        return v._verify_loop(cand_kf, cur_kf, old_img,
                                              new_img, cs=cs)
                    return v._pnp_edge_from_pack(pack, cand_kf, cur_kf,
                                                 cs=cs)

                if v._verify_candidates(cands, rp, verify=verify,
                                        label=f" (scene {s})"):
                    solved = v._pose_graph_solve(rp)
                    if solved is not None:
                        ring_R, ring_t = solved
                        nk = rp["n_kf"]
                        carry = _apply_pushback(
                            carry, jnp.asarray(s, jnp.int32), ring_R,
                            ring_t, ring_R[nk - 1], ring_t[nk - 1])
                        v._pg_ran = True
        tm["loop_check"] += time.perf_counter() - t1
        if (checkpoint_path is not None and checkpoint_every > 0
                and (ci + 1) % checkpoint_every == 0
                and ci + 1 < len(starts)):
            from sfm_tpu.utils import checkpoint as ckpt

            ckpt.save_multiscene_checkpoint(
                checkpoint_path, carry, views, ys_all, ci + 1, tm)
    ys = np.concatenate(ys_all, axis=1)
    t2 = time.perf_counter()

    # per-scene finalize (drain + retriangulate + structure-only refine)
    # and optional export — the multiscene path now does the same closing
    # work as a single-scene run. ONE vmapped drain pull feeds every
    # scene's finalize; no per-scene carry slices.
    K_, T_ = (int(carry.ring.pid.shape[1]), int(carry.ring.pid.shape[2]))
    D_ = int(carry.ring.desc.shape[2])
    P_ = int(carry.X.shape[1])
    drain_flat = np.asarray(_drain_stage_scenes(carry), np.float64)
    t2a = time.perf_counter()
    tm["finalize_drain"] = t2a - t2
    for s in range(S):
        views[s].finalize(
            drained=sp._unpack_drain(drain_flat[s], K_, T_, D_, P_),
            refine=False)
    t2b = time.perf_counter()
    tm["finalize_host"] = t2b - t2a
    # the refinement rounds run batched across scenes: one vmapped
    # device program instead of 2×S round-trips
    _refine_scenes(views, cfg, carry)
    tm["finalize_refine"] = time.perf_counter() - t2b
    tm["finalize"] = time.perf_counter() - t2
    if out_dirs is not None:
        for s in range(S):
            views[s].export(out_dirs[s], dataset=datasets[s])

    return {
        "timers": tm,
        "centers": [np.stack([kf.center for kf in v.kfs])
                    if v.kfs else np.zeros((0, 3)) for v in views],
        "kf_frames": [np.asarray([kf.frame_idx for kf in v.kfs])
                      for v in views],
        "n_keyframes": np.asarray([len(v.kfs) for v in views]),
        "n_points": np.asarray(carry.n_pts),
        "loop_edges": [list(v.loop_edges) for v in views],
        "views": views,
        "metrics": ys,
    }
