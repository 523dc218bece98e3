"""Device-resident SfM frame loop: ``lax.scan`` over frame chunks.

TPU-native re-design of the reference's per-frame orchestrator loop
(reference: cpp/src/templering_sfm.cpp:1708-1871 main frame loop;
python/src/templering_sfm.py:1022-1059 ``ClassicSystem.process``) as ONE
compiled program per chunk of frames. The host-driven pipeline in
``models/system.py`` pays ~30 ms of device→host latency per pull with
5-7 pulls per keyframe (pyramid/KLT sync, two-view pull, snapshot pull,
fused-keyframe pull, BA pull) — the dominant cost of the whole run. Here
the ENTIRE per-frame pipeline (pyramid build → KLT tracking → two-view
LO-RANSAC → keyframe policy → edge RANSAC + scale propagation + PnP →
first-vs-last triangulation → map/observation bookkeeping → sliding
window Schur-LM BA → loop-closure descriptor scoring) runs device-side
under ``lax.scan``; the host uploads a chunk of images, receives one
small per-frame metrics array back, and only intervenes between chunks
(loop-closure verification + pose-graph solve, which fire rarely).

Device state design (SURVEY §7 "fixed-capacity state"):
  * track table        (T,)    — TrackerState from models/tracker.py
  * keyframe ring      (K,)    — pose, frame idx, full (T,)-slot snapshot
                                 (uv/ids/valid), per-slot point ids, the
                                 32x32 loop descriptor, and the incoming
                                 odometry edge
  * map point table    (P,3)   — cursor-allocated, never compacted
  * per-slot overlays  (T,)    — current point id, first-observation
                                 (kf, uv) for deferred triangulation

Observations are NOT stored in a separate grow-only list (the host
pipeline's MapState): the keyframe ring's per-slot point-id matrix
``pid (K,T)`` IS the observation table — entry (k,s) with ``pid>=0``
means keyframe k observed point ``pid`` at ``uv[k,s]``. Triangulating a
track backfills its id into every earlier ring row where the same track
id occupied slot s (full track-history semantics, ref py:935-975), so
window BA reads its observation set with plain gathers and zero host
bookkeeping.

Keyframe decisions are data-dependent control flow: on device they are a
scalar-predicate ``lax.cond`` (compiled to a real conditional, so
non-keyframes skip the heavy geometry), replacing the reference's
``if make_kf`` (py:915-920, cpp:1765).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import SystemConfig, TranslationMode
from sfm_tpu.models import tracker
from sfm_tpu.models.mapstate import Edge, Keyframe
from sfm_tpu.ops import (ba as ba_ops, descriptors, epipolar, features,
                         klt, pnp as pnp_ops, triangulate)

log = logging.getLogger("sfm_tpu")

f32 = jnp.float32
i32 = jnp.int32

# per-frame metrics vector layout (the only per-frame device→host data).
# Y_KFID..Y_LV_T carry the device-verified loop edge (loop.device_verify):
# Y_LV_OK is 1.0 verified / 0.0 ran-and-rejected / -1.0 not-run.
Y_FRAME, Y_VALID, Y_KF, Y_OK, Y_INL, Y_PAR, Y_ALIVE, Y_NPTS, \
    Y_LOOP_S, Y_LOOP_K, Y_BA0, Y_BA1, Y_EDGE_INL, Y_SCALE, Y_PNP_INL, \
    Y_NEW_PTS, Y_KFID, Y_LV_OK, Y_LV_I, Y_LV_INL, Y_LV_NTR, \
    Y_LV_SREL = range(22)
Y_LV_R = 22          # ..30: R_ji row-major
Y_LV_T = 31          # ..33: t_ji
NY = 34


class KeyframeRing(NamedTuple):
    """Fixed-capacity keyframe store, indexed by absolute kf_id.

    Capacity K bounds the number of keyframes per run segment (chosen by
    the host as next_pow2(n_frames) — every frame can be a keyframe)."""

    R_cw: jnp.ndarray      # (K,3,3) camera-to-world rotation
    t_cw: jnp.ndarray      # (K,3)   camera center
    frame: jnp.ndarray     # (K,)    i32 source frame index
    kvalid: jnp.ndarray    # (K,)    bool
    uv: jnp.ndarray        # (K,T,2) track-table snapshot
    ids: jnp.ndarray       # (K,T)   i32
    tvalid: jnp.ndarray    # (K,T)   bool
    pid: jnp.ndarray       # (K,T)   i32 point id observed at slot (-1 none)
    desc: jnp.ndarray      # (K,D)   32x32 global loop descriptor
    e_Rji: jnp.ndarray     # (K,3,3) odometry edge (k-1)->k
    e_tji: jnp.ndarray     # (K,3)
    e_inl: jnp.ndarray     # (K,)    i32
    e_valid: jnp.ndarray   # (K,)    bool
    img: jnp.ndarray       # (K,H,W) u8 keyframe grays for device-side
    #                        loop verification ((K,1,1) dummy when
    #                        loop.device_verify is off)


class ScanCarry(NamedTuple):
    trk: tracker.TrackerState
    prev_pyr: tuple        # image pyramid of the previous frame
    R_cw: jnp.ndarray      # (3,3) current camera-to-world pose
    t_cw: jnp.ndarray      # (3,)
    last_kf_frame: jnp.ndarray  # () i32
    kf_count: jnp.ndarray  # () i32
    slot_pid: jnp.ndarray  # (T,) i32 current map point per track slot
    fo_kf: jnp.ndarray     # (T,) i32 first-observation keyframe (-1 none)
    fo_uv: jnp.ndarray     # (T,2)
    ring: KeyframeRing
    X: jnp.ndarray         # (P,3) map point table
    n_pts: jnp.ndarray     # () i32 allocation cursor
    key: jnp.ndarray       # PRNG key


@jax.jit
def _orb_score_bank(d_bank, v_bank, d_j, v_j):
    """Ratio-passing ORB match counts of keyframe j against a bank of
    older keyframes, one device call (ref py:557-570 candidate scoring).
    d_bank (K,N,256) f32 bits, v_bank (K,N) bool; returns (K,) i32."""
    from sfm_tpu.ops import orb as orb_ops

    def one(d_i, v_i):
        _, ok, _ = orb_ops.match_hamming(d_i, v_i, d_j, v_j)
        return jnp.sum(ok, dtype=i32)

    return jax.vmap(one)(d_bank, v_bank)


def _empty_ring(K: int, T: int, H: int = 1, W: int = 1) -> KeyframeRing:
    return KeyframeRing(
        img=jnp.zeros((K, H, W), jnp.uint8),
        R_cw=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        t_cw=jnp.zeros((K, 3), f32),
        frame=-jnp.ones((K,), i32),
        kvalid=jnp.zeros((K,), bool),
        uv=jnp.zeros((K, T, 2), f32),
        ids=-jnp.ones((K, T), i32),
        tvalid=jnp.zeros((K, T), bool),
        pid=-jnp.ones((K, T), i32),
        desc=jnp.zeros((K, descriptors.DESC_DIM), f32),
        e_Rji=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        e_tji=jnp.zeros((K, 3), f32),
        e_inl=jnp.zeros((K,), i32),
        e_valid=jnp.zeros((K,), bool),
    )


@partial(jax.jit, static_argnames=("cfg", "kf_cap", "p_cap"))
def bootstrap_carry(cfg: SystemConfig, kf_cap: int, p_cap: int,
                    img0, idx0, key) -> ScanCarry:
    """First frame: detect corners, register keyframe 0 (ref py:1022-1028
    bootstrap branch)."""
    T = cfg.klt.max_tracks
    pyr = tuple(jnp.asarray(p) for p in
                _build_pyr(img0, cfg.klt.pyr_levels))
    trk = tracker.bootstrap(pyr[0], cfg.klt)
    store_img = cfg.loop.enabled and cfg.loop.device_verify
    ring = _empty_ring(kf_cap, T,
                       *(img0.shape if store_img else (1, 1)))
    desc = descriptors.global_desc_32(pyr[0])
    ring = ring._replace(
        frame=ring.frame.at[0].set(idx0.astype(i32)),
        kvalid=ring.kvalid.at[0].set(True),
        uv=ring.uv.at[0].set(trk.pos.astype(f32)),
        ids=ring.ids.at[0].set(trk.ids),
        tvalid=ring.tvalid.at[0].set(trk.valid),
        desc=ring.desc.at[0].set(desc.astype(f32)),
    )
    if store_img:
        ring = ring._replace(
            img=ring.img.at[0].set(pyr[0].astype(jnp.uint8)))
    return ScanCarry(
        trk=trk,
        prev_pyr=pyr,
        R_cw=jnp.eye(3, dtype=f32),
        t_cw=jnp.zeros(3, f32),
        last_kf_frame=idx0.astype(i32),
        kf_count=jnp.ones((), i32),
        slot_pid=-jnp.ones((T,), i32),
        fo_kf=jnp.where(trk.valid, 0, -1).astype(i32),
        fo_uv=trk.pos.astype(f32),
        ring=ring,
        X=jnp.zeros((p_cap, 3), f32),
        n_pts=jnp.zeros((), i32),
        key=key,
    )


def _build_pyr(img, levels: int):
    from sfm_tpu.ops import image as im

    return tuple(im.build_pyramid(img.astype(f32), levels))


def _wc(R_cw, t_cw):
    """cam→world pose to world→cam."""
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    t_wc = -jnp.einsum("...ij,...j->...i", R_wc, t_cw)
    return R_wc, t_wc


def _cw(R_wc, t_wc):
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("...ij,...j->...i", R_cw, t_wc)
    return R_cw, t_cw


def _window_ba(cfg: SystemConfig, p_ba: int, Kf, ring: KeyframeRing,
               X, n_pts, kf_id):
    """Sliding-window Schur-LM BA over the keyframe ring (ref cpp:848-1097
    window semantics). The observation set is read straight out of the
    ring's (K,T) pid matrix — no host-side selection pass.

    Returns (ring', X', R_cw_cur, t_cw_cur, cost0, cost)."""
    W = cfg.ba.window
    K = ring.pid.shape[0]
    P_CAP = X.shape[0]
    T = ring.pid.shape[1]

    w_start = jnp.maximum(kf_id - (W - 1), 0)
    w_idx = w_start + jnp.arange(W, dtype=i32)          # (W,)
    row_ok = w_idx <= kf_id
    gidx = jnp.clip(w_idx, 0, K - 1)
    R_wc, t_wc = _wc(ring.R_cw[gidx], ring.t_cw[gidx])  # (W,3,3),(W,3)

    pid_w = ring.pid[gidx]                              # (W,T)
    uv_w = ring.uv[gidx]                                # (W,T,2)
    ov_w = ring.tvalid[gidx] & (pid_w >= 0) & row_ok[:, None]

    pid_flat = pid_w.reshape(-1)
    ov_flat = ov_w.reshape(-1)
    # per-point window observation counts (one scatter per keyframe)
    cnt = jax.ops.segment_sum(
        ov_flat.astype(i32), jnp.clip(pid_flat, 0, P_CAP - 1),
        num_segments=P_CAP,
    )
    elig = (cnt >= 2) & (jnp.arange(P_CAP) < n_pts)
    # best-observed selection, capped at max_points (ref py:733-739 /
    # cpp:881); top_k sorts descending so the cap keeps the best
    score = jnp.where(elig, cnt.astype(f32), -1.0)
    top_c, loc_pid = jax.lax.top_k(score, p_ba)
    loc_ok = (top_c > 0) & (jnp.arange(p_ba) < cfg.ba.max_points)
    inv = jnp.full((P_CAP,), -1, i32).at[
        jnp.where(loc_ok, loc_pid, P_CAP)
    ].set(jnp.arange(p_ba, dtype=i32), mode="drop")
    lp = inv[jnp.clip(pid_flat, 0, P_CAP - 1)]          # (W*T,)
    obs_ok = ov_flat & (pid_flat >= 0) & (lp >= 0)

    cam_idx = jnp.repeat(jnp.arange(W, dtype=i32), T)
    obs_n = epipolar.normalize_by_K(Kf, uv_w.reshape(-1, 2))
    Xl = X[jnp.clip(loc_pid, 0, P_CAP - 1)]

    prob = ba_ops.BAProblem(
        R_wc=R_wc, t_wc=t_wc, X=Xl,
        cam_idx=cam_idx, pid_idx=jnp.clip(lp, 0, p_ba - 1),
        obs=obs_n, obs_valid=obs_ok, point_valid=loc_ok,
    )
    fx = Kf[0, 0]
    Rn, tn, Xn, info = ba_ops.bundle_adjust(
        prob, iters=cfg.ba.iters, lambda0=cfg.ba.lambda0,
        huber_delta=cfg.ba.huber_delta / fx, n_fix=1,
        update_points=cfg.ba.update_points,
    )
    R_cw_n, t_cw_n = _cw(Rn, tn)

    # --- monocular gauge retraction -----------------------------------
    # BA with a single fixed pose leaves the global SCALE mode free
    # (uniform scaling about the anchor camera changes no reprojection),
    # so LM noise random-walks the scale a few percent per solve — which
    # compounds into collapse over tens of keyframes (observed: s_map
    # 0.92 -> 0.11 across 10 keyframes on a hard ring). A uniform
    # rescale about the anchor is an EXACT gauge transform, so restoring
    # the window's first baseline to its pre-solve length cancels the
    # drift without touching the reprojection optimum.
    C0 = ring.t_cw[gidx[0]]                 # anchor (n_fix=1: unchanged)
    b_before = jnp.linalg.norm(ring.t_cw[gidx[1]] - C0)
    b_after = jnp.linalg.norm(t_cw_n[1] - C0)
    ok_fix = row_ok[1] & (b_before > 1e-9) & (b_after > 1e-9)
    s_fix = jnp.where(ok_fix, b_before / jnp.maximum(b_after, 1e-12), 1.0)

    sidx = jnp.where(row_ok, w_idx, K)
    ring = ring._replace(
        R_cw=ring.R_cw.at[sidx].set(R_cw_n, mode="drop"),
        t_cw=ring.t_cw.at[sidx].set(t_cw_n, mode="drop"),
    )
    if cfg.ba.update_points:
        X = X.at[jnp.where(loc_ok, loc_pid, P_CAP)].set(Xn, mode="drop")
    # one global similarity about C0 (poses in AND out of the window plus
    # all points): scaling the window alone would tear it away from the
    # older map, while the global transform is reprojection-exact
    ring = ring._replace(t_cw=C0 + s_fix * (ring.t_cw - C0))
    X = C0 + s_fix * (X - C0)
    cur = kf_id - w_start
    return (ring, X, R_cw_n[cur], C0 + s_fix * (t_cw_n[cur] - C0),
            info["cost0"], info["cost"])


def _keyframe_branch(cfg: SystemConfig, p_ba: int, Kf, args, gt_C=None):
    """All keyframe-time geometry + bookkeeping, device-side (ref
    py:951-988 add_keyframe / cpp:1765-1871 keyframe block).

    ``args`` is (carry, idx, k_edge) or (carry, idx, k_edge, rp_frame):
    with ``rp_frame`` (this frame's two-view result from the tracking
    prefix), the edge RANSAC is skipped via ``lax.cond`` whenever the
    previous keyframe IS the previous frame — the snapshot then equals
    the prefix's input and the two solves are statistically identical
    (saves one full LO-RANSAC per keyframe on keyframe-dense runs).

    ``gt_C`` (F,3) f32 per-frame ground-truth camera centers: when
    ``cfg.use_gt_scale`` is set, the edge translation is scaled by the
    GT baseline between the previous keyframe's frame and this frame
    (ref py:888-898) instead of the monocular scale estimate."""
    if len(args) == 3:
        carry, idx, k_edge = args
        rp_frame = None
    else:
        carry, idx, k_edge, rp_frame = args
    ring = carry.ring
    K = ring.pid.shape[0]
    P_CAP = carry.X.shape[0]
    kf_id = carry.kf_count                      # bootstrap wrote kf 0
    prev_i = kf_id - 1

    uv = carry.trk.pos.astype(f32)
    ids = carry.trk.ids
    tval = carry.trk.valid

    # --- odometry-edge LO-RANSAC vs the previous keyframe snapshot -----
    # (ref cpp:1782-1798; slot-aligned id match replaces matching)
    puv = ring.uv[prev_i]
    shared = ring.tvalid[prev_i] & tval & (ring.ids[prev_i] == ids)
    R_cw_i, t_cw_i = ring.R_cw[prev_i], ring.t_cw[prev_i]
    R_wc_i, t_wc_i = _wc(R_cw_i, t_cw_i)
    xi = epipolar.normalize_by_K(Kf, puv)
    xj = epipolar.normalize_by_K(Kf, uv)

    def _edge_ransac(operands):
        k_e, a, b, m = operands
        return epipolar.find_E_ransac(
            k_e, a, b, m,
            num_hypotheses=cfg.ransac.num_hypotheses,
            sampson_thresh=cfg.ransac.sampson_thresh,
            min_inliers=cfg.ransac.min_inliers,
        )

    if rp_frame is None:
        rp = _edge_ransac((k_edge, xi, xj, shared))
    else:
        reuse = (ring.frame[prev_i] == idx - 1) & rp_frame.ok
        rp = jax.lax.cond(
            reuse,
            lambda op: rp_frame,
            _edge_ransac,
            (k_edge, xi, xj, shared),
        )
    # chain fallback: relative pose from the composed frame-to-frame chain
    R_wj = carry.R_cw.T
    R_chain = R_wj @ R_cw_i
    t_chain = R_wj @ (t_cw_i - carry.t_cw)
    t_chain_u = t_chain / (jnp.linalg.norm(t_chain) + 1e-12)
    R_e = jnp.where(rp.ok, rp.R, R_chain)
    t_eu = jnp.where(rp.ok, rp.t, t_chain_u)

    # --- monocular scale propagation from mapped tracks (1-dof robust
    # LS; twin of system._keyframe_fused_stage) -------------------------
    pid_ok = tval & (carry.slot_pid >= 0)
    Xs = carry.X[jnp.clip(carry.slot_pid, 0, P_CAP - 1)]
    if cfg.use_gt_scale and gt_C is not None:
        # GT baseline between the previous keyframe's frame and this one
        # (ref py:888-898): exact metric scale, no estimator, no clamp
        s_gt = jnp.linalg.norm(
            gt_C[idx] - gt_C[jnp.maximum(ring.frame[prev_i], 0)])
        s_map = jnp.where(s_gt > 1e-12, s_gt, 1.0).astype(f32)
    else:
        Xi_cam = Xs @ R_wc_i.T + t_wc_i
        w3 = Xi_cam @ R_e.T
        a = t_eu[None, :2] - xj * t_eu[2]
        b = xj * w3[:, 2:3] - w3[:, :2]
        den = jnp.sum(a * a, axis=-1)
        good = pid_ok & (Xi_cam[:, 2] > 1e-6) & (den > 1e-10)
        sols = jnp.sum(a * b, axis=-1) / jnp.where(den > 1e-10, den, 1.0)
        s_est = jnp.nan_to_num(
            jnp.nanmedian(jnp.where(good, sols, jnp.nan)), nan=1.0)
        s_map = jnp.where((jnp.sum(good) >= 5) & (s_est > 1e-6), s_est, 1.0)
        # monocular scale-smoothness prior: adjacent keyframe baselines on
        # a continuous trajectory change smoothly, but the median-of-ratios
        # scale estimate can misfire when few mapped tracks survive a hard
        # frame (observed: one 3x scale jump at ~60 shared tracks collapses
        # the rest of the run). Clamp the propagated step length to
        # [1/3, 3]x the previous keyframe baseline. (The reference has no
        # guard — its --use-gt-scale option sidesteps the problem entirely,
        # ref py:888-898.)
        b_prev = jnp.linalg.norm(
            ring.t_cw[prev_i] - ring.t_cw[jnp.maximum(prev_i - 1, 0)])
        have_prev = (prev_i >= 1) & (b_prev > 1e-9)
        s_map = jnp.clip(
            s_map,
            jnp.where(have_prev, b_prev / 3.0, 0.0),
            jnp.where(have_prev, 3.0 * b_prev, jnp.inf),
        )

    # --- anchored pose + PnP refinement against the map ----------------
    R_a = R_e @ R_wc_i
    t_a = R_e @ t_wc_i + s_map * t_eu
    fx = Kf[0, 0]
    # dual-init PnP, batched via vmap (one LM scan over both starts —
    # half the op overhead of two sequential solves):
    #   1. the anchored pose (two-view edge + propagated scale)
    #   2. the PREVIOUS keyframe's pose (constant-position init): for
    #      ordinary inter-keyframe motion it is inside the convergence
    #      basin regardless of the propagated scale, so a mis-estimated
    #      s_map cannot poison the localization via a bad anchored init
    #      (the classic monocular feedback collapse).
    # Keep the better solution by inlier count, then cost.
    R0s = jnp.stack([R_a, R_wc_i])
    t0s = jnp.stack([t_a, t_wc_i])
    Rs, ts, pinfos = jax.vmap(
        lambda R0, t0: pnp_ops.refine_pose(
            R0, t0, Xs, xj, pid_ok, iters=10,
            huber_delta=cfg.ba.huber_delta / fx)
    )(R0s, t0s)
    which = jnp.argmax(
        pinfos["inliers"].astype(f32) * 1e6 - pinfos["cost"])
    R_p, t_p = Rs[which], ts[which]
    pnp_info = {"inliers": pinfos["inliers"][which]}
    use_pnp = pnp_info["inliers"] >= 30
    R_f = jnp.where(use_pnp, R_p, R_a)
    t_f = jnp.where(use_pnp, t_p, t_a)
    R_ji = R_f @ R_wc_i.T
    t_ji = t_f - R_ji @ t_wc_i
    R_cw_new, t_cw_new = _cw(R_f, t_f)

    # --- first-vs-last triangulation of unmapped tracks ----------------
    # (ref py:935-949 / cpp:1801-1813, with the refined pose)
    tri_cand = tval & (carry.slot_pid < 0) & (carry.fo_kf >= 0)
    fo = jnp.clip(carry.fo_kf, 0, K - 1)
    R_wc_f, t_wc_f = _wc(ring.R_cw[fo], ring.t_cw[fo])  # (T,3,3),(T,3)
    xa = epipolar.normalize_by_K(Kf, carry.fo_uv)
    T = uv.shape[0]
    Rb = jnp.broadcast_to(R_f, (T, 3, 3))
    tb = jnp.broadcast_to(t_f, (T, 3))
    X3, za, zb = triangulate.triangulate_dlt(R_wc_f, t_wc_f, xa, Rb, tb, xj)
    err_a = triangulate.reprojection_error(R_wc_f, t_wc_f, X3, xa)
    err_b = triangulate.reprojection_error(Rb, tb, X3, xj)
    ok_tri = (tri_cand & (za > 1e-6) & (zb > 1e-6)
              & (err_a < 0.01) & (err_b < 0.01))

    # --- cursor allocation of new point ids ----------------------------
    new_pid = carry.n_pts + jnp.cumsum(ok_tri, dtype=i32) - 1
    ok_new = ok_tri & (new_pid < P_CAP)
    widx = jnp.where(ok_new, new_pid, P_CAP)
    X = carry.X.at[widx].set(X3.astype(f32), mode="drop")
    slot_pid = jnp.where(ok_new, new_pid, carry.slot_pid)
    n_pts = carry.n_pts + jnp.sum(ok_new, dtype=i32)

    # --- first-observation registration for fresh tracks ---------------
    fresh = tval & (slot_pid < 0) & (carry.fo_kf < 0)
    fo_kf = jnp.where(fresh, kf_id, carry.fo_kf)
    fo_uv = jnp.where(fresh[:, None], uv, carry.fo_uv)

    # --- snapshot + edge into the ring ---------------------------------
    desc = descriptors.global_desc_32(carry.prev_pyr[0])
    t_store = t_ji
    if cfg.translation_mode != TranslationMode.FULL:
        n = jnp.linalg.norm(t_ji)
        t_store = jnp.where(n > 1e-12, t_ji / jnp.maximum(n, 1e-12), t_ji)
    ring = ring._replace(
        R_cw=ring.R_cw.at[kf_id].set(R_cw_new),
        t_cw=ring.t_cw.at[kf_id].set(t_cw_new),
        frame=ring.frame.at[kf_id].set(idx.astype(i32)),
        kvalid=ring.kvalid.at[kf_id].set(True),
        uv=ring.uv.at[kf_id].set(uv),
        ids=ring.ids.at[kf_id].set(ids),
        tvalid=ring.tvalid.at[kf_id].set(tval),
        pid=ring.pid.at[kf_id].set(jnp.where(tval, slot_pid, -1)),
        desc=ring.desc.at[kf_id].set(desc.astype(f32)),
        e_Rji=ring.e_Rji.at[kf_id].set(R_ji.astype(f32)),
        e_tji=ring.e_tji.at[kf_id].set(t_store.astype(f32)),
        e_inl=ring.e_inl.at[kf_id].set(rp.num_inliers),
        e_valid=ring.e_valid.at[kf_id].set(True),
    )
    if cfg.loop.enabled and cfg.loop.device_verify:
        ring = ring._replace(
            img=ring.img.at[kf_id].set(
                carry.prev_pyr[0].astype(jnp.uint8)))
    # --- observation backfill: newly triangulated points get their id
    # written into every earlier ring row where the same track id held
    # slot s (full track history, ref py:935-975) ------------------------
    karange = jnp.arange(K, dtype=i32)[:, None]
    cond_bf = (
        ok_new[None, :]
        & (ring.ids == ids[None, :])
        & ring.tvalid
        & (karange >= fo_kf[None, :])
        & (karange < kf_id)
        & ring.kvalid[:, None]
    )
    ring = ring._replace(
        pid=jnp.where(cond_bf, new_pid[None, :], ring.pid))

    # --- sliding-window BA ---------------------------------------------
    ring, X, R_cw_cur, t_cw_cur, ba0, ba1 = _window_ba(
        cfg, p_ba, Kf, ring, X, n_pts, kf_id)

    # --- loop-closure candidate scoring (cpp:1827-1831) ----------------
    cand = (karange[:, 0] <= kf_id - cfg.loop.min_kf_gap) & ring.kvalid
    scores = jnp.where(cand, ring.desc @ desc, -jnp.inf)
    best_k = jnp.argmax(scores)
    best_s = scores[best_k]

    # --- device-side loop verification (loop.device_verify): the host
    # round-2/3 flow pulled metrics, gated, then ran _loop_pnp_edge_stage
    # per candidate (~0.1 s of host traffic each). Here the SAME gates
    # (score, spatial consistency, mapped-track count) and the SAME
    # LK-retrack + PnP verification run cond-gated inside the keyframe
    # branch, at per-keyframe cadence (the reference fires per keyframe,
    # cpp:1822-1866); the edge rides out in the metrics row. Pose-graph
    # pushback remains a host step. ------------------------------------
    lv = jnp.concatenate([-jnp.ones((2,), f32), jnp.zeros((15,), f32)])
    if cfg.loop.enabled and cfg.loop.device_verify:
        lcfg = cfg.loop
        # spatial-consistency pre-gate (twin of the host _check_loops
        # gate): true revisits are within a few odometry steps; noise-
        # texture false positives are anywhere on the trajectory
        kv_prev = ring.kvalid & (karange[:, 0] <= kf_id)
        Cs = ring.t_cw
        step_m = kv_prev[1:] & kv_prev[:-1]
        steps = jnp.linalg.norm(Cs[1:] - Cs[:-1], axis=-1)
        med = jnp.nan_to_num(
            jnp.nanmedian(jnp.where(step_m, steps, jnp.nan)), nan=1.0)
        nv = jnp.maximum(jnp.sum(kv_prev), 1)
        ctr = jnp.sum(jnp.where(kv_prev[:, None], Cs, 0.0), axis=0) / nv
        extent = jnp.max(jnp.where(
            kv_prev, jnp.linalg.norm(Cs - ctr, axis=-1), 0.0))
        b_cand = jnp.linalg.norm(Cs[kf_id] - Cs[best_k])
        b_gate = jnp.maximum(5.0 * med, 0.25 * extent)
        n_mapped_old = jnp.sum(
            ring.tvalid[best_k] & (ring.pid[best_k] >= 0), dtype=i32)
        fire = (jnp.isfinite(best_s) & (best_s > lcfg.score_thresh)
                & (b_cand <= b_gate) & (n_mapped_old >= 30))

        def _lv_verify(_):
            pyr_old = _build_pyr(ring.img[best_k].astype(f32),
                                 cfg.klt.pyr_levels)
            uv_old = ring.uv[best_k]
            pid_old = ring.pid[best_k]
            m_old = ring.tvalid[best_k] & (pid_old >= 0)
            X_old = X[jnp.clip(pid_old, 0, P_CAP - 1)]
            R_cw_o, C_o = ring.R_cw[best_k], ring.t_cw[best_k]
            R_wc0, t_wc0 = _wc(R_cw_o, C_o)
            new_pts, okk = klt.lk_track_fb(
                pyr_old, carry.prev_pyr, uv_old, m_old,
                levels=cfg.klt.pyr_levels, iters=cfg.klt.iters,
                radius=cfg.klt.win_radius, fb_thresh=cfg.klt.fb_thresh)
            xjv = epipolar.normalize_by_K(Kf, new_pts.astype(f32))
            use = okk & m_old
            Rv, tv, vinfo = pnp_ops.refine_pose(
                R_wc0.astype(f32), t_wc0.astype(f32), X_old.astype(f32),
                xjv, use, iters=12, huber_delta=cfg.ba.huber_delta / fx)
            n_tracked = jnp.sum(use, dtype=i32)
            ok_edge = ((n_tracked >= min(lcfg.min_tracked, 30))
                       & (vinfo["inliers"] >= lcfg.min_inliers))
            # pose-graph edge i->j from the metric PnP pose
            R_ji_l = Rv @ R_cw_o
            t_ji_l = Rv @ C_o + tv
            # revealed relative scale (twin of _loop_pnp_edge_stage)
            d_i = (X_old @ Rv.T + tv)[:, 2]
            ok_i = m_old & (d_i > 1e-9)
            pid_j = ring.pid[kf_id]
            m_j = ring.tvalid[kf_id] & (pid_j >= 0)
            X_j = X[jnp.clip(pid_j, 0, P_CAP - 1)]
            d_j = ((X_j - ring.t_cw[kf_id]) @ ring.R_cw[kf_id])[:, 2]
            ok_j = m_j & (d_j > 1e-9)
            med_i = jnp.nanmedian(jnp.where(ok_i, d_i, jnp.nan))
            med_j = jnp.nanmedian(jnp.where(ok_j, d_j, jnp.nan))
            s_ok = ((jnp.sum(ok_i) >= 20) & (jnp.sum(ok_j) >= 20)
                    & (med_i > 1e-12))
            s_rel = jnp.nan_to_num(jnp.where(
                s_ok, med_j / jnp.maximum(med_i, 1e-12), 1.0), nan=1.0)
            return jnp.concatenate([
                jnp.stack([ok_edge.astype(f32), best_k.astype(f32),
                           vinfo["inliers"].astype(f32),
                           n_tracked.astype(f32), s_rel.astype(f32)]),
                R_ji_l.reshape(9).astype(f32), t_ji_l.astype(f32),
            ])

        lv = jax.lax.cond(
            fire, _lv_verify,
            lambda _: jnp.concatenate(
                [-jnp.ones((2,), f32), jnp.zeros((15,), f32)]),
            None)

    carry = carry._replace(
        R_cw=R_cw_cur, t_cw=t_cw_cur,
        last_kf_frame=idx.astype(i32),
        kf_count=kf_id + 1,
        slot_pid=slot_pid, fo_kf=fo_kf, fo_uv=fo_uv,
        ring=ring, X=X, n_pts=n_pts,
    )
    ykf = jnp.concatenate([
        jnp.stack([
            jnp.float32(1.0),
            jnp.where(jnp.isfinite(best_s), best_s, -1.0).astype(f32),
            best_k.astype(f32),
            ba0.astype(f32), ba1.astype(f32),
            rp.num_inliers.astype(f32),
            s_map.astype(f32),
            pnp_info["inliers"].astype(f32),
            jnp.sum(ok_new).astype(f32),
            kf_id.astype(f32),
        ]),
        lv,
    ])
    return carry, ykf


def ykf_none() -> jnp.ndarray:
    """The keyframe-branch metrics vector for a non-keyframe: kf flag 0,
    loop score/candidate -1, zeros, kf_id -1, not-run loop-verify pack."""
    return jnp.concatenate([
        jnp.zeros((1,), f32),
        jnp.array([-1.0, -1.0], f32),
        jnp.zeros((6,), f32),
        jnp.array([-1.0], f32),          # kf_id
        jnp.array([-1.0, -1.0], f32),    # lv ok / candidate
        jnp.zeros((15,), f32),
    ])


def _no_kf_branch(cfg, p_ba, Kf, args):
    carry, idx, k_edge = args
    return carry, ykf_none()


@partial(jax.jit, static_argnames=("cfg", "p_ba"),
         donate_argnames=("carry",))
def run_chunk(cfg: SystemConfig, p_ba: int, Kf, carry: ScanCarry,
              imgs, idxs, fvalid, gt_C=None):
    """Process a chunk of frames in ONE device program.

    imgs (C,H,W) u8/f32; idxs (C,) i32 frame indices; fvalid (C,) bool
    marks padding frames (no-ops), so every chunk invocation reuses one
    compiled program regardless of tail length. ``gt_C`` (F,3) optional
    per-frame GT centers for cfg.use_gt_scale (see _keyframe_branch)."""

    def frame_step(carry, inp):
        img, idx, fval = inp

        def do(carry):
            carry, make_kf, k2, rp, y_pre = _track_and_pose_rp(
                cfg, Kf, carry, img, idx)
            carry, ykf = jax.lax.cond(
                make_kf,
                partial(_keyframe_branch, cfg, p_ba, Kf, gt_C=gt_C),
                lambda a: _no_kf_branch(cfg, p_ba, Kf, a[:3]),
                (carry, idx, k2, rp),
            )
            return carry, _pack_frame_metrics(carry, idx, y_pre, ykf)

        def skip(carry):
            return carry, jnp.zeros((NY,), f32)

        return jax.lax.cond(fval, do, skip, carry)

    carry, ys = jax.lax.scan(frame_step, carry, (imgs, idxs, fvalid))
    return carry, ys


def _track_and_pose(cfg: SystemConfig, Kf, carry: ScanCarry, img, idx):
    """Back-compat wrapper over ``_track_and_pose_rp`` that drops the
    two-view result (see there)."""
    carry, make_kf, k2, _rp, y_pre = _track_and_pose_rp(
        cfg, Kf, carry, img, idx)
    return carry, make_kf, k2, y_pre


def _track_and_pose_rp(cfg: SystemConfig, Kf, carry: ScanCarry, img, idx):
    """The always-on per-frame prefix: pyramid build → KLT step →
    two-view LO-RANSAC → pose compose → keyframe policy. Shared by the
    single-scene ``run_chunk`` and the scene-batched gated runner
    (parallel/multi_scan.run_chunk_scenes_gated).

    Returns (carry', make_kf, kf_key, rp, y_pre) with rp the frame's
    two-view RelPose (reusable as the keyframe edge when the previous
    keyframe is the previous frame) and y_pre = (rp_ok, rp_inliers,
    parallax, n_matched) as f32 scalars."""
    pyr = _build_pyr(img, cfg.klt.pyr_levels)
    trk, prev_pos, matched = tracker.step(
        carry.prev_pyr, pyr, carry.trk, cfg.klt)
    # track death / replenish clears slot associations
    slot_pid = jnp.where(matched, carry.slot_pid, -1)
    fo_kf = jnp.where(matched, carry.fo_kf, -1)
    key, k1, k2 = jax.random.split(carry.key, 3)
    xi = epipolar.normalize_by_K(Kf, prev_pos.astype(f32))
    xj = epipolar.normalize_by_K(Kf, trk.pos.astype(f32))
    rp = epipolar.find_E_ransac(
        k1, xi, xj, matched,
        num_hypotheses=cfg.ransac.num_hypotheses,
        sampson_thresh=cfg.ransac.sampson_thresh,
        min_inliers=cfg.ransac.min_inliers,
    )
    flow = jnp.linalg.norm(trk.pos - prev_pos, axis=-1)
    parallax = jnp.nan_to_num(
        jnp.nanmedian(jnp.where(matched, flow, jnp.nan)))
    # frame-to-frame pose compose T_cw' = T_cw ∘ T_ji^{-1}
    # (ref py:117-127, py:1044); unit-scale between keyframes —
    # the keyframe stage re-derives metric scale from the map
    R_cw_n = jnp.where(rp.ok, carry.R_cw @ rp.R.T, carry.R_cw)
    t_cw_n = jnp.where(
        rp.ok,
        carry.R_cw @ (-rp.R.T @ rp.t) + carry.t_cw,
        carry.t_cw,
    )
    gap = idx - carry.last_kf_frame
    make_kf = (~rp.ok) | (
        (gap >= cfg.keyframe.min_gap)
        & ((parallax >= cfg.keyframe.parallax_px)
           | (rp.num_inliers < cfg.keyframe.min_inliers))
    )
    carry = carry._replace(
        trk=trk, prev_pyr=pyr, R_cw=R_cw_n, t_cw=t_cw_n,
        slot_pid=slot_pid, fo_kf=fo_kf, key=key)
    y_pre = (rp.ok.astype(f32), rp.num_inliers.astype(f32),
             parallax.astype(f32), jnp.sum(matched).astype(f32))
    return carry, make_kf, k2, rp, y_pre


def _pack_frame_metrics(carry: ScanCarry, idx, y_pre, ykf):
    rp_ok, rp_inl, parallax, n_matched = y_pre
    return jnp.concatenate([
        jnp.stack([
            idx.astype(f32), jnp.float32(1.0), ykf[0],
            rp_ok, rp_inl, parallax, n_matched,
            carry.n_pts.astype(f32),
        ]),
        ykf[1:3],          # loop score / loop candidate kf
        ykf[3:5],          # BA cost before/after
        ykf[5:6],          # edge inliers
        ykf[6:7],          # propagated scale
        ykf[7:8],          # PnP inliers
        ykf[8:9],          # newly triangulated points
        ykf[9:10],         # kf_id
        ykf[10:],          # device loop-verify pack (Y_LV_*)
    ])


@partial(jax.jit, static_argnames=("levels", "lk_iters", "radius", "cell",
                                   "num_hypotheses", "min_inliers"))
def _loop_verify_stage(key, Kf, img_old, img_new, levels: int,
                       lk_iters: int, radius: int, fb_thresh, cell: int,
                       quality, num_hypotheses: int, sampson_thresh,
                       min_inliers: int):
    """Loop-candidate geometric verification in ONE device program
    (ref cpp:1833-1859: shi-tomasi re-detect on the old keyframe + LK
    fwd/bwd re-track + E-RANSAC gate). Packs the TwoView vector plus the
    tracked-survivor count so the host needs a single pull."""
    pyr_old = _build_pyr(img_old, levels)
    pyr_new = _build_pyr(img_new, levels)
    xy, _, dvalid = features.detect_corners(
        pyr_old[0], jnp.zeros((1, 2)), jnp.zeros(1, bool),
        max_new=1024, cell=cell, quality=quality)
    new_pts, ok = klt.lk_track_fb(
        pyr_old, pyr_new, xy, dvalid,
        levels=levels, iters=lk_iters, radius=radius, fb_thresh=fb_thresh)
    xi = epipolar.normalize_by_K(Kf, xy.astype(f32))
    xj = epipolar.normalize_by_K(Kf, new_pts.astype(f32))
    rp = epipolar.find_E_ransac(
        key, xi, xj, ok, num_hypotheses=num_hypotheses,
        sampson_thresh=sampson_thresh, min_inliers=min_inliers)
    return jnp.concatenate([
        rp.R.reshape(9).astype(f32), rp.t.astype(f32),
        jnp.stack([
            rp.ok.astype(f32), rp.num_inliers.astype(f32),
            jnp.float32(0.0), jnp.sum(ok).astype(f32),
        ]),
        jnp.sum(ok, dtype=i32).astype(f32)[None],
    ])


@partial(jax.jit, static_argnames=("levels", "lk_iters", "radius",
                                   "pnp_iters"))
def _loop_pnp_stage(Kf, img_old, img_new, uv_old, X_old, m_old,
                    R_wc0, t_wc0, levels: int, lk_iters: int, radius: int,
                    fb_thresh, huber_delta, pnp_iters: int = 12):
    """Loop-closure verification via PnP against the old keyframe's map.

    The reference verifies loops with an E-matrix re-estimate
    (cpp:1856-1859), but E = [t]x R vanishes with the baseline: at a
    (near-)exact revisit BOTH the recovered rotation and direction are
    noise, and a pose-graph edge built from them corrupts trajectories
    whose drift is smaller than that noise. Once a map exists the
    strictly better measurement is 3D->2D: LK-retrack the old keyframe's
    MAPPED tracks into the new frame and run robust PnP — metric,
    scale-resolved, and accurate at ANY baseline (including zero).
    One device program, one host pull.

    Returns pack [R_wc(9), t_wc(3), pnp_inliers, n_tracked, inlier_rms].
    """
    pyr_old = _build_pyr(img_old, levels)
    pyr_new = _build_pyr(img_new, levels)
    new_pts, ok = klt.lk_track_fb(
        pyr_old, pyr_new, uv_old, m_old,
        levels=levels, iters=lk_iters, radius=radius, fb_thresh=fb_thresh)
    xj = epipolar.normalize_by_K(Kf, new_pts.astype(f32))
    use = ok & m_old
    R, t, info = pnp_ops.refine_pose(
        R_wc0.astype(f32), t_wc0.astype(f32), X_old.astype(f32), xj, use,
        iters=pnp_iters, huber_delta=huber_delta)
    return jnp.concatenate([
        R.reshape(9).astype(f32), t.astype(f32),
        jnp.stack([
            info["inliers"].astype(f32),
            jnp.sum(use).astype(f32),
            info["inlier_rms"].astype(f32),
        ]),
    ])


@partial(jax.jit, static_argnames=("levels", "lk_iters", "radius",
                                   "pnp_iters"))
def _loop_pnp_edge_stage(Kf, img_old, img_new, uv_old, pid_old, tval_old,
                         R_cw_o, C_o, X, pid_j, tval_j, R_cw_j_ring, C_j,
                         levels: int, lk_iters: int, radius: int,
                         fb_thresh, huber_delta, pnp_iters: int = 12):
    """Fused loop-edge builder: _loop_pnp_stage plus the edge transform
    and the revealed-relative-scale estimate, all device-side.

    The round-2 host wrapper pulled the old keyframe's pid/tvalid rows,
    the FULL map-point table (twice: X_old and the s_rel block), and the
    ring pose rows before re-uploading them — ~0.35 s per verification,
    all device->host churn. Here the host passes device slices and pulls
    ONE 16-float pack: [R_ji(9), t_ji(3), inliers, n_tracked, s_rel,
    n_mapped_old].
    """
    P_CAP = X.shape[0]
    m_old = tval_old & (pid_old >= 0)
    X_old = X[jnp.clip(pid_old, 0, P_CAP - 1)]
    R_wc0 = R_cw_o.T
    t_wc0 = -R_wc0 @ C_o
    pack = _loop_pnp_stage.__wrapped__(
        Kf, img_old, img_new, uv_old, X_old.astype(f32), m_old,
        R_wc0, t_wc0, levels, lk_iters, radius, fb_thresh, huber_delta,
        pnp_iters)
    R_wc_j = pack[:9].reshape(3, 3)
    t_wc_j = pack[9:12]
    # pose-graph edge i->j from the metric PnP pose
    R_ji = R_wc_j @ R_cw_o
    t_ji = R_wc_j @ C_o + t_wc_j
    # relative scale revealed by the closure (see _verify_loop): median
    # depth of j in its OWN map vs in the OLD segment's map at the PnP
    # pose — node convention x_w = s·R·x_c + C gives s_rel = s_i/s_j
    d_i = (X_old @ R_wc_j.T + t_wc_j)[:, 2]
    ok_i = m_old & (d_i > 1e-9)
    m_j = tval_j & (pid_j >= 0)
    X_j = X[jnp.clip(pid_j, 0, P_CAP - 1)]
    d_j = ((X_j - C_j) @ R_cw_j_ring)[:, 2]
    ok_j = m_j & (d_j > 1e-9)
    med_i = jnp.nanmedian(jnp.where(ok_i, d_i, jnp.nan))
    med_j = jnp.nanmedian(jnp.where(ok_j, d_j, jnp.nan))
    s_ok = ((jnp.sum(ok_i) >= 20) & (jnp.sum(ok_j) >= 20)
            & (med_i > 1e-12))
    s_rel = jnp.where(s_ok, med_j / jnp.maximum(med_i, 1e-12), 1.0)
    s_rel = jnp.nan_to_num(s_rel, nan=1.0)
    return jnp.concatenate([
        R_ji.reshape(9).astype(f32), t_ji.astype(f32),
        jnp.stack([pack[12], pack[13], s_rel.astype(f32),
                   jnp.sum(m_old).astype(f32)]),
    ])


@jax.jit
def _drain_stage(carry: ScanCarry):
    """Pack the whole drainable device state into ONE flat f32 vector:
    on the relay every device->host pull costs ~30 ms regardless of
    size, and the round-2 finalize made 13 of them (9 ring fields +
    X + 2 scalars + edge arrays). Integer fields ride as f32 — exact
    for ids < 2^24, far beyond any supported run length."""
    ring = carry.ring
    parts = [
        ring.R_cw.ravel(), ring.t_cw.ravel(),
        ring.frame.astype(f32), ring.uv.ravel(),
        ring.ids.astype(f32).ravel(), ring.tvalid.astype(f32).ravel(),
        ring.pid.astype(f32).ravel(), ring.desc.ravel(),
        ring.e_Rji.ravel(), ring.e_tji.ravel(),
        ring.e_inl.astype(f32), ring.e_valid.astype(f32),
        carry.X.ravel(),
        jnp.stack([carry.kf_count.astype(f32), carry.n_pts.astype(f32)]),
    ]
    return jnp.concatenate([p.astype(f32) for p in parts])


@jax.jit
def _ring_pose_stage(carry: ScanCarry):
    """Packed pull of the ring poses + odometry edges + bookkeeping used
    by the host between chunks (loop gating, pose-graph assembly): one
    pull instead of 8-9 separate np.asarray conversions (~30 ms each on
    the relay)."""
    ring = carry.ring
    return jnp.concatenate([
        ring.R_cw.ravel(), ring.t_cw.ravel(),
        ring.frame.astype(f32), ring.kvalid.astype(f32),
        ring.e_Rji.ravel(), ring.e_tji.ravel(),
        ring.e_inl.astype(f32), ring.e_valid.astype(f32),
        carry.kf_count.astype(f32)[None],
    ])


def _unpack_ring_poses(flat: np.ndarray, K: int) -> dict:
    out = {
        "R_cw": flat[: K * 9].reshape(K, 3, 3),
        "t_cw": flat[K * 9 : K * 12].reshape(K, 3),
        "frame": flat[K * 12 : K * 13].astype(np.int64),
        "kvalid": flat[K * 13 : K * 14] > 0.5,
        "e_Rji": flat[K * 14 : K * 23].reshape(K, 3, 3),
        "e_tji": flat[K * 23 : K * 26].reshape(K, 3),
        "e_inl": flat[K * 26 : K * 27].astype(np.int64),
        "e_valid": flat[K * 27 : K * 28] > 0.5,
        "n_kf": int(flat[K * 28]),
    }
    return out


@jax.jit
def _dlt_packed(Ra, ta, xa, Rb, tb, xb):
    """triangulate_dlt with its three outputs packed into one (N,5)
    array — one pull instead of three (see _drain_stage)."""
    X3, za, zb = triangulate.triangulate_dlt(Ra, ta, xa, Rb, tb, xb)
    return jnp.concatenate([X3, za[:, None], zb[:, None]], axis=1)


def _finalize_refine_core(Kf, ring: KeyframeRing, X, n_pts, do_retri0,
                          do_retri_later, enable_refine, iters: int,
                          rounds: int, lambda0, huber_delta):
    """Device-side twin of ``ScanSfM.finalize``'s refinement rounds
    (re-triangulate + frozen-pose point polish), reading the ring in
    place.

    The host path (`_retri_prep`/`_refine_prep`) lexsorts ~50k
    observations on the host, uploads ~2 MB of padded operands, and
    round-trips the device 2× per round. Here each point's first/last
    observing (keyframe, slot) comes from two segment reductions over
    the ring's (K,T) point-id matrix (same ordering as the host's
    lexsort: row-major (k,s) codes), and the polish uses every ring slot
    as a masked observation row — no host prep at all.

    The three gate flags may be Python bools (static call sites — XLA
    dead-code-eliminates a disabled block) or traced per-scene scalars
    (the vmapped multiscene wrapper). Returns [X.ravel() | cost0 | cost]
    (f32), one pull."""
    K_, T_ = ring.pid.shape
    P = X.shape[0]
    obs_ok = (ring.tvalid & (ring.pid >= 0) & (ring.pid < n_pts)
              & ring.kvalid[:, None])
    pid_safe = jnp.where(obs_ok, ring.pid, P)
    BIG = K_ * T_
    code = (jax.lax.broadcasted_iota(i32, (K_, T_), 0) * T_
            + jax.lax.broadcasted_iota(i32, (K_, T_), 1))
    first = jax.ops.segment_min(
        jnp.where(obs_ok, code, BIG).ravel(), pid_safe.ravel(),
        num_segments=P + 1)[:P]
    last = jax.ops.segment_max(
        jnp.where(obs_ok, code, -1).ravel(), pid_safe.ravel(),
        num_segments=P + 1)[:P]
    has = (first < BIG) & (last >= 0)
    fc = jnp.clip(first, 0, BIG - 1)
    lc = jnp.clip(last, 0, BIG - 1)
    ka, sa = fc // T_, fc % T_
    kb, sb = lc // T_, lc % T_
    ok2 = has & (ka != kb)
    # world->camera extrinsics from the (pose-graph-corrected) ring
    R_wc = jnp.swapaxes(ring.R_cw, -1, -2)
    t_wc = -jnp.einsum("kij,kj->ki", R_wc, ring.t_cw)
    xa = epipolar.normalize_by_K(Kf, ring.uv[ka, sa].astype(f32))
    xb = epipolar.normalize_by_K(Kf, ring.uv[kb, sb].astype(f32))
    # the polish problem's static side: every (k,s) ring slot is an
    # observation row, invalid slots masked via obs_valid
    cam_idx = jax.lax.broadcasted_iota(i32, (K_, T_), 0).ravel()
    pid_idx = jnp.where(obs_ok, ring.pid, 0).ravel().astype(i32)
    obs_n = epipolar.normalize_by_K(Kf, ring.uv.reshape(-1, 2).astype(f32))
    point_valid = jax.lax.iota(i32, P) < n_pts
    X = X.astype(f32)
    cost0 = cost = jnp.zeros((), f32)
    for r in range(rounds):
        retri = do_retri0 if r == 0 else do_retri_later
        X3, za, zb = triangulate.triangulate_dlt(
            R_wc[ka], t_wc[ka], xa, R_wc[kb], t_wc[kb], xb)
        good = (ok2 & (za > 1e-6) & (zb > 1e-6)
                & jnp.isfinite(X3).all(-1) & retri)
        X = jnp.where(good[:, None], X3.astype(f32), X)
        prob = ba_ops.BAProblem(
            R_wc=R_wc.astype(f32), t_wc=t_wc.astype(f32), X=X,
            cam_idx=cam_idx, pid_idx=pid_idx, obs=obs_n,
            obs_valid=obs_ok.ravel(), point_valid=point_valid)
        Xr, info = ba_ops.refine_points.__wrapped__(
            prob, iters=iters, lambda0=lambda0, huber_delta=huber_delta,
            max_obs_per_point=K_)  # ring: one obs per keyframe row
        X = jnp.where(enable_refine, Xr.astype(f32), X)
        if r == 0:
            cost0 = info["cost0"].astype(f32)
        cost = info["cost"].astype(f32)
    return jnp.concatenate([X.ravel(), jnp.stack([cost0, cost])])


@partial(jax.jit, static_argnames=("do_retri0", "do_retri_later",
                                   "enable_refine", "iters", "rounds"))
def _finalize_refine_stage(Kf, carry: ScanCarry, do_retri0: bool,
                           do_retri_later: bool, enable_refine: bool,
                           iters: int, rounds: int, lambda0, huber_delta):
    """Single-scene wrapper of `_finalize_refine_core`: static gate flags
    so a disabled block (e.g. no pose graph ran -> no round-0
    re-triangulation) is dead-code-eliminated."""
    return _finalize_refine_core(
        Kf, carry.ring, carry.X, carry.n_pts, do_retri0, do_retri_later,
        enable_refine, iters, rounds, lambda0, huber_delta)


def _unpack_drain(flat: np.ndarray, K: int, T: int, D: int, P: int) -> dict:
    """Host twin of _drain_stage's layout."""
    shapes = [
        ("R_cw", (K, 3, 3)), ("t_cw", (K, 3)), ("frame", (K,)),
        ("uv", (K, T, 2)), ("ids", (K, T)), ("tvalid", (K, T)),
        ("pid", (K, T)), ("desc", (K, D)), ("e_Rji", (K, 3, 3)),
        ("e_tji", (K, 3)), ("e_inl", (K,)), ("e_valid", (K,)),
        ("X", (P, 3)), ("counts", (2,)),
    ]
    out = {}
    off = 0
    for name, shp in shapes:
        n = int(np.prod(shp))
        out[name] = flat[off:off + n].reshape(shp)
        off += n
    assert off == len(flat)
    for name in ("frame", "ids", "pid", "e_inl"):
        out[name] = out[name].astype(np.int64)
    for name in ("tvalid", "e_valid"):
        out[name] = out[name] > 0.5
    return out


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _next_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class ScanSfM:
    """Host orchestrator for the device-resident pipeline.

    Per chunk of frames: one ``run_chunk`` dispatch + one small metrics
    pull. Between chunks: loop-closure verification + SE(3) pose graph
    (host-driven, rare). At the end: drain the ring, global BA, export.

    Mirrors the external surface of ``models/system.SfMSystem`` (kfs /
    edges / metrics / export) so eval tooling is shared.
    """

    def __init__(self, K: np.ndarray, cfg: SystemConfig,
                 n_frames: int | None = None, chunk: int = 16,
                 p_cap: int = 16384, p_ba: int = 1024, gt_records=None):
        self._gt_C = None
        if cfg.use_gt_scale:
            if gt_records is None:
                raise ValueError(
                    "cfg.use_gt_scale requires gt_records (the dataset's "
                    "Middlebury records with GT centers, ref py:888-898)")
            self._gt_C = jnp.asarray(
                np.stack([r.center for r in gt_records]), f32)
        self.K = np.asarray(K, np.float64)
        self._Kj = jnp.asarray(self.K, f32)
        self.cfg = cfg
        self.chunk = int(chunk)
        self.kf_cap = _next_pow2((n_frames or cfg.frames) + 1, lo=16)
        self.p_cap = int(p_cap)
        self.p_ba = min(int(p_ba), self.p_cap)
        self.carry: ScanCarry | None = None
        self.metrics: list[dict] = []
        self.loop_edges: list[Edge] = []
        # ORB loop-method state: per-keyframe features + a persistent
        # device-side descriptor bank (kf_cap, max_kp, 256)
        self._orb_ids: dict[int, tuple] = {}
        self._orb_bank = None
        self._orb_bank_valid = None
        # keyframe images only (frame_idx -> u8 gray), for loop-closure
        # verification — retaining every input frame made host memory grow
        # without bound on long runs while only keyframe images are ever
        # read (_check_loops indexes by keyframe frame)
        self._images: dict[int, np.ndarray] = {}
        self._names: list[str] = []
        self._pending: list[tuple[int, str, np.ndarray, jax.Array]] = []
        self.kfs: list[Keyframe] = []
        self.edges: list[Edge] = []
        self._pg_ran = False
        self.refine_rounds = 1  # re-triangulate/global-BA cycles at finalize

    # -- streaming interface -------------------------------------------
    def process(self, frame_idx: int, img_name: str,
                gray_u8: np.ndarray) -> None:
        self._names.append(img_name)
        if self.carry is None:
            self._images[int(frame_idx)] = np.asarray(gray_u8)
            key = jax.random.PRNGKey(self.cfg.ransac.seed)
            self.carry = bootstrap_carry(
                self.cfg, self.kf_cap, self.p_cap,
                jnp.asarray(gray_u8), jnp.asarray(frame_idx, i32), key)
            self.metrics.append(
                {"frame": frame_idx, "image": img_name, "keyframe": True,
                 "tracks": int(self.cfg.klt.max_tracks)})
            return
        # dispatch the frame's H2D transfer NOW (jnp.asarray returns at
        # dispatch; the ~300 KB copy streams in the background) so the
        # upload overlaps the previous chunk's device compute instead of
        # serializing into _flush — ~130 ms/chunk on the axon relay
        self._pending.append((frame_idx, img_name, gray_u8,
                              jnp.asarray(gray_u8)))
        if len(self._pending) >= self.chunk:
            self._flush()

    def _flush(self) -> None:
        if not self._pending:
            return
        C = self.chunk
        idxs = np.zeros((C,), np.int32)
        fvalid = np.zeros((C,), bool)
        devs = []
        for k, (idx, _, g, d) in enumerate(self._pending):
            devs.append(d)
            idxs[k] = idx
            fvalid[k] = True
        if len(devs) < C:  # tail chunk: pad with a zero frame
            z = jnp.zeros_like(devs[0])
            devs.extend([z] * (C - len(devs)))
        names = {idx: name for idx, name, _, _ in self._pending}
        pend_imgs = {idx: g for idx, _, g, _ in self._pending}
        self._pending = []
        self.carry, ys = run_chunk(
            self.cfg, self.p_ba, self._Kj, self.carry,
            jnp.stack(devs), jnp.asarray(idxs), jnp.asarray(fvalid),
            gt_C=self._gt_C)
        ys = np.asarray(ys, np.float64)  # the chunk's single D2H pull
        for row in ys:
            if row[Y_VALID] < 0.5:
                continue
            fi = int(row[Y_FRAME])
            met = {
                "frame": fi,
                "image": names.get(fi, ""),
                "keyframe": bool(row[Y_KF] > 0.5),
                "inliers": int(row[Y_INL]),
                "parallax": float(row[Y_PAR]),
                "tracks": int(row[Y_ALIVE]),
                "map_points": int(row[Y_NPTS]),
            }
            if row[Y_KF] > 0.5:
                met["loop_score"] = float(row[Y_LOOP_S])
                met["loop_cand"] = int(row[Y_LOOP_K])
                met["ba_cost0"] = float(row[Y_BA0])
                met["ba_cost"] = float(row[Y_BA1])
                if fi in pend_imgs:  # keep keyframe images only
                    self._images[fi] = np.asarray(pend_imgs[fi])
            self.metrics.append(met)
            log.info(
                "frame %d | kf=%s | inliers=%d | parallax=%.2f | "
                "tracks=%d | map_points=%d",
                fi, met["keyframe"], met.get("inliers", 0),
                met.get("parallax", 0.0), met["tracks"],
                met["map_points"],
            )
        self._check_loops(ys)

    # -- loop closure + pose graph (between chunks) ---------------------
    @staticmethod
    def loop_candidate_rows(ys: np.ndarray, lcfg) -> np.ndarray:
        """Row mask of above-threshold loop candidates in a pulled
        metrics array — THE candidate predicate, shared by the
        pre-gate, `gate_loop_candidates`, and the multiscene maybe-gate
        so the three cannot drift apart."""
        return ((ys[:, Y_VALID] > 0.5) & (ys[:, Y_KF] > 0.5)
                & (ys[:, Y_LOOP_S] > lcfg.score_thresh))

    @staticmethod
    def gate_loop_candidates(ys: np.ndarray, rp: dict,
                             lcfg) -> list[tuple[int, int, int]]:
        """Host-side (numpy-only) candidate gate: from the chunk's pulled
        metrics rows and an unpacked ring-pose dict, return the top-k
        ``(cand_kf, cur_kf, cur_frame)`` pairs worth a device
        verification. Pure host math — callers (single-scene
        ``_check_loops``, multiscene ``run_scenes_scan``) can gate many
        scenes from one batched pose pull before paying any per-scene
        device traffic.

        Gates, in order: descriptor score threshold; top-k by score (the
        32x32 descriptor's margin between a true revisit and texture
        noise can be thin — docs/BENCHMARKS.md — so gating on a single
        best-of-chunk row can starve the true loop behind a false
        candidate); dedup of repeated (cand, cur) pairs; and a
        spatial-consistency pre-gate — a true revisit's estimated centers
        are close (odometry drift is a small fraction of the trajectory)
        while descriptor false positives land anywhere on the ring, and
        skipping far-apart candidates saves a ~300 ms device verification
        each (measured: ~10 false verifications per bench run without
        it)."""
        rows = ys[ScanSfM.loop_candidate_rows(ys, lcfg)]
        if len(rows) == 0:
            return []
        order = np.argsort(-rows[:, Y_LOOP_S])[: max(lcfg.top_k, 1)]
        frames = rp["frame"]
        kvalid = rp["kvalid"]
        n_kf = rp["n_kf"]
        cs = rp["t_cw"][:n_kf]
        odo = np.linalg.norm(np.diff(cs, axis=0), axis=1)
        extent = float(np.linalg.norm(cs - cs.mean(0), axis=1).max()) \
            if n_kf else 0.0
        b_gate = max(5.0 * (float(np.median(odo)) if len(odo) else 1.0),
                     0.25 * extent)
        tried: set[tuple[int, int]] = set()
        cands: list[tuple[int, int, int]] = []
        for row in rows[order]:
            cand_kf = int(row[Y_LOOP_K])
            cur_frame = int(row[Y_FRAME])
            cur_kf_arr = np.nonzero(kvalid & (frames == cur_frame))[0]
            if len(cur_kf_arr) == 0 or not kvalid[cand_kf]:
                continue
            cur_kf = int(cur_kf_arr[0])
            if (cand_kf, cur_kf) in tried:
                continue
            tried.add((cand_kf, cur_kf))
            if (cand_kf < n_kf and cur_kf < n_kf
                    and np.linalg.norm(cs[cur_kf] - cs[cand_kf]) > b_gate):
                continue
            cands.append((cand_kf, cur_kf, cur_frame))
        return cands

    def _check_loops(self, ys: np.ndarray) -> None:
        """Verify the best above-threshold loop candidate of the chunk
        (ref cpp:1833-1859: re-detect + LK re-track + E-RANSAC gate),
        then run the SE(3) pose graph and push corrected poses back into
        the device carry. With ``loop.method == "orb"`` candidates come
        from oriented-binary-feature ratio matching instead of the ring's
        32x32 descriptors (ref py:557-595 semantics at chunk cadence)."""
        lcfg = self.cfg.loop
        if not lcfg.enabled:
            return
        if lcfg.method == "orb":
            self._check_loops_orb(ys)
            return
        if lcfg.device_verify:
            self._collect_device_loops(ys)
            return
        # cheap ys-only pre-gate: most chunks have no above-threshold
        # candidate — skip the ~30 ms ring-pose pull entirely
        if not self.loop_candidate_rows(ys, lcfg).any():
            return
        K_ = self.carry.ring.pid.shape[0]
        rp = _unpack_ring_poses(
            np.asarray(_ring_pose_stage(self.carry), np.float64), K_)
        cands = self.gate_loop_candidates(ys, rp, lcfg)
        if not cands:
            return
        if self._verify_candidates(cands, rp):
            self._pose_graph_pushback(pr=rp)

    def _verify_candidates(self, cands: list[tuple[int, int, int]],
                           rp: dict, verify=None,
                           label: str = "") -> bool:
        """Run the loop verification on already-gated
        ``(cand_kf, cur_kf, cur_frame)`` pairs, appending surviving
        ``Edge``s. Returns True if any edge was added (caller runs the
        pose-graph pushback).

        ``verify``: optional ``(cand_kf, cur_kf, old_img, new_img, cs)
        -> Edge | None`` override — the multiscene path substitutes its
        fused batched-carry stage (parallel/multi_scan) while sharing
        this orchestration (image fetch, edge append, metrics
        annotation)."""
        if verify is None:
            verify = self._verify_loop
        cs = rp["t_cw"][: rp["n_kf"]]
        frames = rp["frame"]
        found = False
        for cand_kf, cur_kf, cur_frame in cands:
            old_img = self._images.get(int(frames[cand_kf]))
            new_img = self._images.get(cur_frame)
            if old_img is None or new_img is None:
                continue  # image not retained (non-keyframe or pre-resume)
            edge = verify(cand_kf, cur_kf, old_img, new_img, cs=cs)
            if edge is None:
                continue
            self.loop_edges.append(edge)
            found = True
            for met in reversed(self.metrics):
                if met.get("frame") == cur_frame:
                    met["loop"] = (cand_kf, cur_kf)
                    break
            log.info("loop closure%s %d -> %d (inliers %d)", label,
                     cand_kf, cur_kf, edge.inliers)
        return found

    def _collect_device_loops(self, ys: np.ndarray) -> None:
        """Drain loop edges verified INSIDE the chunk program
        (loop.device_verify): the gates and the LK+PnP verification ran
        per keyframe in ``_keyframe_branch``; here the host only builds
        ``Edge`` objects from the already-pulled metrics rows and runs
        the pose-graph pushback if anything was found. No per-candidate
        device traffic at all. The <30-mapped-obs E-RANSAC fallback of
        ``_verify_loop`` is not replicated device-side (an old keyframe
        with fewer than 30 mapped tracks is a degenerate map segment);
        such candidates are logged and skipped."""
        lcfg = self.cfg.loop
        lw = self.cfg.pose_graph.loop_weight
        rows = ys[(ys[:, Y_VALID] > 0.5) & (ys[:, Y_KF] > 0.5)]
        hits = []
        for row in rows:
            if (row[Y_LOOP_S] > lcfg.score_thresh
                    and row[Y_LV_OK] < -0.5 and row[Y_LOOP_K] >= 0):
                log.debug("loop candidate %d->%d not verified on device "
                          "(gate fail or <30 mapped obs)",
                          int(row[Y_LOOP_K]), int(row[Y_KFID]))
            if row[Y_LV_OK] > 0.5:
                hits.append(row)
        if not hits:
            return
        # one packed pose pull for the dir-mode translation weight
        K_ = self.carry.ring.pid.shape[0]
        rp = _unpack_ring_poses(
            np.asarray(_ring_pose_stage(self.carry), np.float64), K_)
        cs = rp["t_cw"][: rp["n_kf"]]
        odo = np.linalg.norm(np.diff(cs, axis=0), axis=1)
        b_ref = float(np.median(odo)) if len(odo) else 1.0
        for row in hits:
            i, j = int(row[Y_LV_I]), int(row[Y_KFID])
            R_ji = np.asarray(row[Y_LV_R:Y_LV_R + 9],
                              np.float64).reshape(3, 3)
            t_ji = np.asarray(row[Y_LV_T:Y_LV_T + 3], np.float64)
            w_tr = lw
            if self.cfg.translation_mode != TranslationMode.FULL:
                b = float(np.linalg.norm(t_ji))
                w_tr = lw * min(1.0, b / max(b_ref, 1e-12))
            self.loop_edges.append(Edge(
                i=i, j=j, R_ji=R_ji, t_ji=t_ji,
                inliers=int(row[Y_LV_INL]), is_loop=True,
                w_rot=lw, w_trans=w_tr, s_rel=float(row[Y_LV_SREL])))
            for met in reversed(self.metrics):
                if met.get("frame") == int(row[Y_FRAME]):
                    met["loop"] = (i, j)
                    break
            log.info("loop closure (device) %d -> %d (inliers %d, "
                     "tracked %d)", i, j, int(row[Y_LV_INL]),
                     int(row[Y_LV_NTR]))
        self._pose_graph_pushback(pr=rp)

    def _orb_for(self, kf_id: int, img) -> None:
        """Compute + cache ORB features for keyframe ``kf_id`` and write
        them into the persistent device-side descriptor bank (so scoring
        a new keyframe against ALL older ones is one device call with no
        host->device bank re-upload)."""
        if kf_id in self._orb_ids:
            return
        from sfm_tpu.ops import orb as orb_ops

        lcfg = self.cfg.loop
        xy, d, v = orb_ops.detect_and_describe(
            jnp.asarray(img, f32), max_kp=lcfg.max_keypoints)
        if self._orb_bank is None:
            self._orb_bank = jnp.zeros(
                (self.kf_cap, *d.shape), f32)
            self._orb_bank_valid = jnp.zeros(
                (self.kf_cap, v.shape[0]), bool)
        self._orb_bank = self._orb_bank.at[kf_id].set(d)
        self._orb_bank_valid = self._orb_bank_valid.at[kf_id].set(v)
        self._orb_ids[kf_id] = (xy, d, v)

    def _check_loops_orb(self, ys: np.ndarray) -> None:
        """ORB-flavor loop candidates (ref py:557-570: ratio matching
        against all >= min_kf_gap older keyframes, top-k by match count),
        verified by the same PnP-primary ``_verify_loop`` machinery as
        the descriptor flavor. Match counts for all candidates come from
        ONE vmapped device call against the persistent bank."""
        from sfm_tpu.ops import orb as orb_ops

        lcfg = self.cfg.loop
        rows = ys[(ys[:, Y_VALID] > 0.5) & (ys[:, Y_KF] > 0.5)]
        if len(rows) == 0:
            return
        ring = self.carry.ring
        frames = np.asarray(ring.frame)
        kvalid = np.asarray(ring.kvalid)
        found = False
        if 0 not in self._orb_ids and 0 in self._images:
            self._orb_for(0, self._images[0])  # bootstrap keyframe
        for row in rows:
            cur_frame = int(row[Y_FRAME])
            arr = np.nonzero(kvalid & (frames == cur_frame))[0]
            if len(arr) == 0:
                continue
            cur_kf = int(arr[0])
            img_j = self._images.get(cur_frame)
            if img_j is None:
                continue
            self._orb_for(cur_kf, img_j)
            _, d_j, v_j = self._orb_ids[cur_kf]
            counts = np.asarray(_orb_score_bank(
                self._orb_bank, self._orb_bank_valid, d_j, v_j))
            has = np.zeros(self.kf_cap, bool)
            for k in self._orb_ids:
                has[k] = True
            counts = np.where(has, counts, 0)
            lim = max(cur_kf - lcfg.min_kf_gap + 1, 0)
            scored = [(int(counts[k]), k) for k in range(lim)
                      if kvalid[k] and counts[k] >= lcfg.min_matches]
            scored.sort(reverse=True)
            for n, cand_kf in scored[: max(lcfg.top_k, 1)]:
                old_img = self._images.get(int(frames[cand_kf]))
                if old_img is None:
                    continue
                edge = self._verify_loop(cand_kf, cur_kf, old_img, img_j)
                if edge is None:
                    continue
                self.loop_edges.append(edge)
                found = True
                for met in reversed(self.metrics):
                    if met.get("frame") == cur_frame:
                        met["loop"] = (cand_kf, cur_kf)
                        break
                log.info("loop closure (orb) %d -> %d (matches %d, "
                         "inliers %d)", cand_kf, cur_kf, n, edge.inliers)
                break
        if found:
            self._pose_graph_pushback()

    def _pnp_edge_from_pack(self, pack: np.ndarray, cand_kf: int,
                            cur_kf: int, cs: np.ndarray | None = None):
        """Build the loop ``Edge`` from a pulled `_loop_pnp_edge_stage`
        pack ([R_ji(9), t_ji(3), inliers, n_tracked, s_rel, ...]);
        None when the PnP verification rejects the candidate. Shared by
        the single-scene `_verify_loop` and the multiscene fused-gather
        verification (parallel/multi_scan)."""
        lcfg = self.cfg.loop
        lw = self.cfg.pose_graph.loop_weight
        R_ji = pack[:9].reshape(3, 3)
        t_ji = pack[9:12]
        inliers = int(pack[12])
        n_tracked = int(pack[13])
        s_rel = float(pack[14])
        if n_tracked < min(lcfg.min_tracked, 30) \
                or inliers < lcfg.min_inliers:
            log.info("loop candidate %d->%d rejected "
                     "(pnp tracked=%d inliers=%d)",
                     cand_kf, cur_kf, n_tracked, inliers)
            return None
        b = float(np.linalg.norm(t_ji))
        w_tr = lw
        if self.cfg.translation_mode != TranslationMode.FULL:
            # dir-mode residual compares unit vectors: still gate the
            # translation by the (now metric, PnP-measured) baseline —
            # a zero-length translation has no direction
            if cs is None:
                n_kf = int(self.carry.kf_count)
                cs = np.asarray(self.carry.ring.t_cw, np.float64)[:n_kf]
            odo = np.linalg.norm(np.diff(cs, axis=0), axis=1)
            b_ref = float(np.median(odo)) if len(odo) else 1.0
            w_tr = lw * min(1.0, b / max(b_ref, 1e-12))
        return Edge(i=cand_kf, j=cur_kf, R_ji=R_ji, t_ji=t_ji,
                    inliers=inliers, is_loop=True,
                    w_rot=lw, w_trans=w_tr, s_rel=s_rel)

    def _verify_loop(self, cand_kf: int, cur_kf: int, old_img, new_img,
                     cs: np.ndarray | None = None):
        """Verify a loop candidate and build its pose-graph edge.

        Primary path: PnP against the old keyframe's mapped tracks
        (``_loop_pnp_stage``) — metric and reliable at any baseline.
        Fallback (old keyframe has too few mapped tracks): the
        reference-style corner re-detect + LK + E-RANSAC
        (``_loop_verify_stage``), with its edge weight gated by baseline
        since E degenerates as the baseline vanishes."""
        lcfg = self.cfg.loop
        kcfg = self.cfg.klt
        ring = self.carry.ring
        lw = self.cfg.pose_graph.loop_weight
        # one scalar pull decides the branch; everything else stays on
        # device inside _loop_pnp_edge_stage (the round-2 wrapper's
        # array pulls cost ~0.35 s per verification)
        n_mapped = int(np.asarray(
            jnp.sum(ring.tvalid[cand_kf] & (ring.pid[cand_kf] >= 0),
                    dtype=i32)))
        if n_mapped >= 30:
            fx = float(self.K[0, 0])
            pack = np.asarray(_loop_pnp_edge_stage(
                self._Kj, jnp.asarray(old_img), jnp.asarray(new_img),
                ring.uv[cand_kf], ring.pid[cand_kf], ring.tvalid[cand_kf],
                ring.R_cw[cand_kf], ring.t_cw[cand_kf], self.carry.X,
                ring.pid[cur_kf], ring.tvalid[cur_kf],
                ring.R_cw[cur_kf], ring.t_cw[cur_kf],
                levels=kcfg.pyr_levels, lk_iters=kcfg.iters,
                radius=kcfg.win_radius, fb_thresh=kcfg.fb_thresh,
                huber_delta=self.cfg.ba.huber_delta / fx,
            ), np.float64)  # one pull
            return self._pnp_edge_from_pack(pack, cand_kf, cur_kf, cs)
        # ---- fallback: reference-style E-RANSAC verification ----------
        rp, n_tracked = self._verify_pair(old_img, new_img)
        if rp is None:
            log.info("loop candidate %d->%d rejected (tracked=%d)",
                     cand_kf, cur_kf, n_tracked)
            return None
        t_ji = rp.t.copy()
        if self.cfg.translation_mode != TranslationMode.FULL:
            n = np.linalg.norm(t_ji)
            if n > 1e-12:
                t_ji = t_ji / n
        # E = [t]x R vanishes with the baseline: gate BOTH rotation and
        # translation weights by the estimated baseline so a near-revisit
        # edge (direction AND rotation unobservable) self-silences — the
        # reference's center-only solve does this implicitly via its
        # length scaling (cpp:1156-1157)
        if cs is None:
            n_kf = int(self.carry.kf_count)
            cs = np.asarray(ring.t_cw, np.float64)[:n_kf]
        odo = np.linalg.norm(np.diff(cs, axis=0), axis=1)
        b_ref = float(np.median(odo)) if len(odo) else 1.0
        b = float(np.linalg.norm(cs[cur_kf] - cs[cand_kf]))
        w_loop = lw * min(1.0, b / max(b_ref, 1e-12))
        return Edge(i=cand_kf, j=cur_kf, R_ji=rp.R.copy(), t_ji=t_ji,
                    inliers=rp.num_inliers, is_loop=True,
                    w_rot=w_loop, w_trans=w_loop)

    def _verify_pair(self, old_img, new_img):
        from sfm_tpu.models.system import TwoView

        lcfg = self.cfg.loop
        kcfg = self.cfg.klt
        key = jax.random.PRNGKey(self.cfg.ransac.seed + 7919)
        pack = _loop_verify_stage(
            key, self._Kj, jnp.asarray(old_img), jnp.asarray(new_img),
            levels=kcfg.pyr_levels, lk_iters=kcfg.iters,
            radius=kcfg.win_radius, fb_thresh=kcfg.fb_thresh,
            cell=max(int(kcfg.min_distance), 2), quality=kcfg.quality,
            num_hypotheses=lcfg.ransac_iters,
            sampson_thresh=lcfg.ransac_thresh,
            min_inliers=lcfg.min_inliers,
        )
        rp = TwoView(pack[:16])  # one pull for the whole verification
        n_tracked = int(np.asarray(pack[16]))
        if n_tracked < lcfg.min_tracked:
            return None, n_tracked
        if not rp.ok or rp.num_inliers < lcfg.min_inliers:
            return None, n_tracked
        return rp, n_tracked

    def _drain_edges(self, drained: dict | None = None):
        """Odometry edges from a packed drain: `drained` is either the
        full `_unpack_drain` dict or a `_unpack_ring_poses` dict (both
        carry the e_* fields — no separate per-field pulls)."""
        if drained is not None:
            n_kf = int(drained["counts"][0]) if "counts" in drained \
                else drained["n_kf"]
            e_R, e_t = drained["e_Rji"], drained["e_tji"]
            e_inl, e_val = drained["e_inl"], drained["e_valid"]
        else:
            ring = self.carry.ring
            n_kf = int(self.carry.kf_count)
            e_R = np.asarray(ring.e_Rji, np.float64)
            e_t = np.asarray(ring.e_tji, np.float64)
            e_inl = np.asarray(ring.e_inl)
            e_val = np.asarray(ring.e_valid)
        edges = [
            Edge(i=k - 1, j=k, R_ji=e_R[k], t_ji=e_t[k],
                 inliers=int(e_inl[k]), is_loop=False)
            for k in range(1, n_kf) if e_val[k]
        ]
        return edges + list(self.loop_edges)

    def _pose_graph_pushback(self, pr: dict | None = None) -> None:
        """SE(3)/centers pose graph over drained poses+edges; corrected
        poses are pushed back into the device carry (ref py:990-1001 /
        cpp:1862). ``pr``: optional pre-pulled `_unpack_ring_poses` dict
        (verification does not move poses, so the gate's pull is still
        exact here — saves one ~30 ms pull)."""
        if pr is None:
            K_ = self.carry.ring.pid.shape[0]
            pr = _unpack_ring_poses(
                np.asarray(_ring_pose_stage(self.carry), np.float64), K_)
        solved = self._pose_graph_solve(pr)
        if solved is None:
            return
        ring_R, ring_t = solved
        n_kf = pr["n_kf"]
        self.carry = self.carry._replace(
            ring=self.carry.ring._replace(R_cw=jnp.asarray(ring_R),
                                          t_cw=jnp.asarray(ring_t)),
            R_cw=jnp.asarray(ring_R[n_kf - 1]),
            t_cw=jnp.asarray(ring_t[n_kf - 1]),
        )
        self._pg_ran = True

    def _pose_graph_solve(self, pr: dict):
        """Solve the pose graph from a pre-pulled ring-pose dict. Returns
        the full-ring corrected ``(ring_R, ring_t)`` float32 arrays (rows
        past n_kf unchanged), or None when the graph is degenerate. Pure
        host+device math — does NOT touch ``self.carry``, so the
        multiscene path can solve from its batched pull and write back
        with one program (parallel/multi_scan)."""
        from sfm_tpu.ops import posegraph as pg_ops

        pcfg = self.cfg.pose_graph
        n_kf = pr["n_kf"]
        edges = self._drain_edges(drained=pr)
        if n_kf < 3 or len(edges) < 2:
            return None
        Np = _next_pow2(n_kf, lo=8)
        Ep = _next_pow2(len(edges), lo=8)
        R_all = pr["R_cw"]
        C_all = pr["t_cw"]
        R_cw = np.concatenate(
            [R_all[:n_kf], np.tile(np.eye(3), (Np - n_kf, 1, 1))])
        C = np.concatenate([C_all[:n_kf], np.zeros((Np - n_kf, 3))])
        e_i = np.zeros(Ep, np.int32)
        e_j = np.zeros(Ep, np.int32)
        R_meas = np.tile(np.eye(3), (Ep, 1, 1))
        t_meas = np.zeros((Ep, 3))
        t_meas[:, 2] = 1.0
        w_rot = np.zeros(Ep)
        w_trans = np.zeros(Ep)
        valid = np.zeros(Ep, bool)
        # R_all/C_all come from the packed _ring_pose_stage pull above
        t_full = np.zeros(Ep, bool)
        for k, e in enumerate(edges):
            e_i[k], e_j[k] = e.i, e.j
            if not e.is_loop and e.j == e.i + 1:
                # refresh odometry constraints from the BA-refined ring
                # poses (metric, t_full) so the solve distributes loop
                # error instead of dragging refined poses toward raw
                # pre-BA measurements — and so dir-mode centers cannot
                # slide along fixed directions at zero cost (see
                # system.py:_run_pose_graph for the full rationale)
                R_meas[k] = R_all[e.j].T @ R_all[e.i]
                t_meas[k] = R_all[e.j].T @ (C_all[e.i] - C_all[e.j])
                t_full[k] = True
            else:
                R_meas[k], t_meas[k] = e.R_ji, e.t_ji
            w_rot[k] = pcfg.w_rot * e.w_rot
            w_trans[k] = pcfg.w_trans * e.w_trans
            valid[k] = True
        prob = pg_ops.PoseGraphProblem(
            R_cw=jnp.asarray(R_cw), C=jnp.asarray(C),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            R_meas=jnp.asarray(R_meas), t_meas=jnp.asarray(t_meas),
            w_rot=jnp.asarray(w_rot), w_trans=jnp.asarray(w_trans),
            valid=jnp.asarray(valid), t_full=jnp.asarray(t_full),
        )
        if pcfg.mode == "centers":
            R_new, C_new, _ = pg_ops.optimize_centers(prob)
        elif pcfg.mode == "sim3":
            s_meas = np.ones(Ep)
            for k, e in enumerate(edges):
                s_meas[k] = e.s_rel
            R_new, C_new, _s, _ = pg_ops.optimize_sim3(
                prob, s_meas=jnp.asarray(s_meas),
                mode=self.cfg.translation_mode.value,
                iters=pcfg.iters, lambda0=pcfg.lambda0)
        else:
            R_new, C_new, _ = pg_ops.optimize_se3(
                prob, mode=self.cfg.translation_mode.value,
                iters=pcfg.iters, lambda0=pcfg.lambda0)
        R_new = np.asarray(R_new, np.float32)[:n_kf]
        C_new = np.asarray(C_new, np.float32)[:n_kf]
        ring_R = R_all.astype(np.float32).copy()
        ring_t = C_all.astype(np.float32).copy()
        ring_R[:n_kf] = R_new
        ring_t[:n_kf] = C_new
        return ring_R, ring_t

    # -- finalize + export ---------------------------------------------
    def finalize(self, drained: dict | None = None,
                 refine: bool = True) -> None:
        """Flush, drain the device state, run the global BA, and build
        the host-side keyframe/edge views (export parity with
        models/system.SfMSystem).

        ``drained``: optional pre-pulled ``_unpack_drain`` dict. The
        multiscene path (parallel/multi_scan.run_scenes_scan) drains ALL
        scenes in one vmapped device pull and hands each scene its slice
        here — S separate carry slices + drain pulls would cost ~20
        eager dispatches each on the remote relay. Callers passing
        ``drained`` must have no pending frames (a flush would make the
        pre-pulled drain stale).

        ``refine=False`` skips the re-triangulate/structure-refine
        rounds (they only touch ``self._X``); the multiscene path runs
        them afterwards batched across scenes
        (parallel/multi_scan._refine_scenes)."""
        assert drained is None or not self._pending, \
            "finalize(drained=...) with pending frames"
        self._flush()
        if drained is None:
            c = self.carry
            K_, T_ = c.ring.pid.shape
            # ONE packed pull for the whole drain (see _drain_stage)
            d = _unpack_drain(
                np.asarray(_drain_stage(c), np.float64),
                K_, T_, c.ring.desc.shape[1], c.X.shape[0])
        else:
            d = drained
        n_kf = int(d["counts"][0])
        n_pts = int(d["counts"][1])
        R_cw = d["R_cw"][:n_kf]
        t_cw = d["t_cw"][:n_kf]
        frames = d["frame"][:n_kf]
        uv = d["uv"][:n_kf]
        ids = d["ids"][:n_kf]
        tvalid = d["tvalid"][:n_kf]
        pid = d["pid"][:n_kf]
        desc = d["desc"][:n_kf]
        X = d["X"][:n_pts]

        # Final refinement is STRUCTURE-ONLY: after a pose-graph
        # correction the map is triangulated against stale poses, so
        # re-triangulate first-vs-last with the corrected poses, then
        # polish points with frozen-pose LM (ops/ba.refine_points).
        # Full pose+point BA here measurably bends the monocular gauge:
        # on the 47-frame ring it degrades ATE from 0.74% to 1.3% of
        # extent while lowering reprojection error — the trajectory is
        # already optimal from the in-loop window BA + PnP + pose graph.
        # the refinement rounds run in ONE fused device program reading
        # the carry in place (`_finalize_refine_core`); the host
        # `_retriangulate`/`_refine_structure` twins remain the reference
        # implementation (parity: test_scan_pipeline) and serve the
        # multiscene batched path
        if refine and self.refine_rounds > 0 and drained is None:
            m = int((tvalid & (pid >= 0) & (pid < n_pts)).sum())
            do0 = self._pg_ran and n_pts >= 10
            later = n_pts >= 10
            en_ref = (self.cfg.ba.global_iters > 0 and n_kf >= 3
                      and n_pts >= 10 and m >= 30)
            if do0 or (later and self.refine_rounds > 1) or en_ref:
                fx = float(self.K[0, 0])
                out = np.asarray(_finalize_refine_stage(
                    self._Kj, self.carry, do0, later, en_ref,
                    iters=self.cfg.ba.global_iters,
                    rounds=self.refine_rounds,
                    lambda0=self.cfg.ba.lambda0,
                    huber_delta=self.cfg.ba.huber_delta / fx),
                    np.float64)  # one pull: [X | cost0 | cost]
                X = out[:-2].reshape(-1, 3)[:n_pts]
                if en_ref:
                    log.info("structure refine: cost %.3e -> %.3e "
                             "(%d kfs, %d pts, %d obs)", out[-2],
                             out[-1], n_kf, n_pts, m)
        elif refine:
            for r in range(self.refine_rounds):
                if (self._pg_ran or r > 0) and n_pts >= 10:
                    X = self._retriangulate(R_cw, t_cw, pid, uv,
                                            tvalid, X)
                if (self.cfg.ba.global_iters > 0 and n_kf >= 3
                        and n_pts >= 10):
                    X = self._refine_structure(R_cw, t_cw, pid, uv,
                                               tvalid, X)

        # gt-scale re-anchor: the window BA fixes only its oldest camera
        # (ref py:741 — same gauge as the reference's LocalBA), so the
        # monocular scale gauge drifts NON-UNIFORMLY over a long run even
        # when every keyframe EDGE was created at the GT baseline (ref
        # py:888-898 scale_translation; measured: ~20% over 47
        # keyframes, and a single global rescale only moved the Umeyama
        # alignment scale 1.199 -> 1.173). Re-apply the SAME per-edge GT
        # information once more at finalize: re-integrate the trajectory
        # keeping the optimized edge DIRECTIONS and rotations but setting
        # each consecutive-keyframe baseline to its GT length — exactly
        # the reference's scale_translation semantic, applied to the
        # final (BA/pose-graph-corrected) geometry. The map is rescaled
        # by the median edge ratio about the first keyframe (a global
        # approximation; the metric contract of --use-gt-scale is the
        # trajectory). The reference's published SE(3) regime (N=2/N=4
        # keyframe subsets, BASELINE.md) never exposes this drift.
        s_edge = None
        s_anchor = 1.0
        if self.cfg.use_gt_scale and self._gt_C is not None and n_kf >= 2:
            gt = np.asarray(self._gt_C, np.float64)[
                np.asarray(frames[:n_kf], int)]
            # ring poses are cam->world (see _wc): t_cw IS the camera
            # center (Keyframe.center returns it verbatim)
            C = np.asarray(t_cw[:n_kf], np.float64)
            dC = np.diff(C, axis=0)
            eb = np.linalg.norm(dC, axis=1)
            gb = np.linalg.norm(np.diff(gt, axis=0), axis=1)
            ok = eb > 1e-12
            if ok.any():
                s_edge = np.where(ok, gb / np.where(ok, eb, 1.0), 1.0)
                s_anchor = float(np.median(s_edge[ok]))
                t_cw = np.concatenate(
                    [C[:1], C[0] + np.cumsum(s_edge[:, None] * dC, 0)])
                if len(X):
                    X = C[0] + s_anchor * (X - C[0])

        self.kfs = [
            Keyframe(kf_id=k, frame_idx=int(frames[k]),
                     img_name=self._names[int(frames[k])],
                     R_cw=R_cw[k], t_cw=t_cw[k], ids=ids[k], uv=uv[k],
                     valid=tvalid[k], desc=desc[k])
            for k in range(n_kf)
        ]
        self.edges = self._drain_edges(drained=d)
        if s_edge is not None:
            # odometry edge (k-1 -> k) gets ITS re-integrated edge scale;
            # loop edges (arbitrary i -> j) get the median
            self.edges = [
                dataclasses.replace(
                    e, t_ji=e.t_ji * (
                        s_edge[e.j - 1]
                        if not e.is_loop and 1 <= e.j <= len(s_edge)
                        else s_anchor))
                for e in self.edges
            ]
        self._X = X
        self._ring_pid = pid  # (n_kf, T) observation matrix, for tooling

    def _retri_prep(self, R_cw, t_cw, pid, uv, tvalid, X):
        """Host-side prep for the first-vs-last DLT: pick each point's
        first/last observing keyframe and build the padded `_dlt_packed`
        operands. Returns ``(ops6, ok)`` — ``ops6`` the six (Np,…) numpy
        operands, ``ok`` the (n_pts,) host validity mask. This is the
        host reference twin of the selection inside
        `_finalize_refine_core` (parity: test_scan_pipeline)."""
        from sfm_tpu.utils import np_geom

        n_pts = len(X)
        kk, ss = np.nonzero(tvalid & (pid >= 0) & (pid < n_pts))
        p = pid[kk, ss]
        order = np.lexsort((kk, p))
        ps, ks, sl = p[order], kk[order], ss[order]
        firsts = np.searchsorted(ps, np.arange(n_pts), "left")
        lasts = np.searchsorted(ps, np.arange(n_pts), "right") - 1
        ok = (lasts >= 0) & (firsts < len(ps)) & (lasts > firsts)
        fi = np.clip(firsts, 0, len(ps) - 1)
        li = np.clip(lasts, 0, len(ps) - 1)
        ka, sa = ks[fi], sl[fi]
        kb, sb = ks[li], sl[li]
        ok &= ka != kb
        R_wc = np.swapaxes(R_cw, -1, -2)
        t_wc = -np.einsum("fij,fj->fi", R_wc, t_cw)
        xa = np_geom.normalize_by_K(self.K, uv[ka, sa])
        xb = np_geom.normalize_by_K(self.K, uv[kb, sb])
        # pad to a pow2 bucket: every reconstruction has a different
        # point count, and an unpadded shape would recompile the DLT
        # program per run (minutes over the remote-compile tunnel)
        Np = _next_pow2(n_pts, lo=1024)

        def pad(a, eye=False):
            out = (np.tile(np.eye(3, dtype=np.float32), (Np, 1, 1))
                   if eye else np.zeros((Np, *a.shape[1:]), np.float32))
            out[: len(a)] = a
            return out

        ops6 = (pad(R_wc[ka], eye=True), pad(t_wc[ka]), pad(xa),
                pad(R_wc[kb], eye=True), pad(t_wc[kb]), pad(xb))
        return ops6, ok

    @staticmethod
    def _retri_post(packed: np.ndarray, ok: np.ndarray,
                    X: np.ndarray) -> np.ndarray:
        """Accept the re-triangulated points that pass the cheirality +
        finiteness gates; keep the old point otherwise. ``packed`` is
        the (n_pts,5) `_dlt_packed` pull (X3, za, zb)."""
        X3, za, zb = packed[:, :3], packed[:, 3], packed[:, 4]
        good = ok & (za > 1e-6) & (zb > 1e-6) & np.isfinite(X3).all(-1)
        return np.where(good[:, None], X3, X)

    def _retriangulate(self, R_cw, t_cw, pid, uv, tvalid, X):
        """Batched first-vs-last DLT re-triangulation of every map point
        from the (corrected) keyframe poses."""
        ops6, ok = self._retri_prep(R_cw, t_cw, pid, uv, tvalid, X)
        packed = np.asarray(_dlt_packed(*ops6),
                            np.float64)[: len(X)]  # one pull (X3, za, zb)
        return self._retri_post(packed, ok, X)

    def _refine_prep(self, R_cw, t_cw, pid, uv, tvalid, X):
        """Host-side prep for the frozen-pose point polish: build the
        padded `ops/ba.BAProblem` (numpy leaves). Returns ``(prob, m)``,
        or ``None`` when there are fewer than 30 observations (degenerate
        map segment — nothing worth polishing). Host reference twin of
        the problem built inside `_finalize_refine_core`."""
        from sfm_tpu.utils import np_geom

        n_kf, T = pid.shape
        n_pts = len(X)
        ok = tvalid & (pid >= 0) & (pid < n_pts)
        kk, ss = np.nonzero(ok)
        m = len(kk)
        if m < 30:
            return None
        F = _next_pow2(n_kf, lo=8)
        P = _next_pow2(n_pts, lo=1024)
        M = _next_pow2(m, lo=4096)
        cam_idx = np.zeros(M, np.int32)
        pidx = np.zeros(M, np.int32)
        obs_n = np.zeros((M, 2))
        ovalid = np.zeros(M, bool)
        cam_idx[:m] = kk
        pidx[:m] = pid[kk, ss]
        obs_n[:m] = np_geom.normalize_by_K(self.K, uv[kk, ss])
        ovalid[:m] = True
        Xp = np.zeros((P, 3))
        Xp[:n_pts] = X
        pvalid = np.zeros(P, bool)
        pvalid[:n_pts] = True
        R_wc = np.swapaxes(R_cw, -1, -2)
        t_wc = -np.einsum("fij,fj->fi", R_wc, t_cw)
        R_wc = np.concatenate([R_wc, np.tile(np.eye(3), (F - n_kf, 1, 1))])
        t_wc = np.concatenate([t_wc, np.zeros((F - n_kf, 3))])
        prob = ba_ops.BAProblem(
            R_wc=np.asarray(R_wc, np.float32),
            t_wc=np.asarray(t_wc, np.float32),
            X=np.asarray(Xp, np.float32),
            cam_idx=cam_idx, pid_idx=pidx,
            obs=np.asarray(obs_n, np.float32), obs_valid=ovalid,
            point_valid=pvalid,
        )
        return prob, m

    def _refine_structure(self, R_cw, t_cw, pid, uv, tvalid, X):
        """Frozen-pose point polish over the full drained observation set
        (see finalize for why poses stay fixed)."""
        prep = self._refine_prep(R_cw, t_cw, pid, uv, tvalid, X)
        if prep is None:
            return X
        prob, m = prep
        n_kf, n_pts = len(R_cw), len(X)
        fx = float(self.K[0, 0])
        Xn, info = ba_ops.refine_points(
            prob, iters=self.cfg.ba.global_iters,
            lambda0=self.cfg.ba.lambda0,
            huber_delta=self.cfg.ba.huber_delta / fx,
            max_obs_per_point=prob.R_wc.shape[0])
        Xn = np.asarray(Xn, np.float64)[:n_pts]
        log.info("structure refine: cost %.3e -> %.3e (%d kfs, %d pts, "
                 "%d obs)", float(info["cost0"]), float(info["cost"]),
                 n_kf, n_pts, m)
        return Xn

    @property
    def map_xyz(self) -> np.ndarray:
        return self._X

    def export(self, out_dir, dataset=None) -> dict:
        from pathlib import Path

        from sfm_tpu.config import ExportGeometry
        from sfm_tpu.utils import artifacts, np_geom

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        rows = []
        for kf in self.kfs:
            lat, lon = (float("nan"), float("nan"))
            if dataset is not None:
                lat, lon = dataset.angles_for(kf.img_name)
            C = kf.center
            rows.append(dict(
                kf_id=kf.kf_id, frame_idx=kf.frame_idx, image=kf.img_name,
                x=float(C[0]), y=float(C[1]), z=float(C[2]),
                lat=lat, lon=lon))
        artifacts.write_csv_centers(
            out / "keyframes_camera_centers.csv", rows)
        edge_rows = []
        for e in self.edges:
            rvec = np_geom.so3_log(np.asarray(e.R_ji, np.float64))
            edge_rows.append(dict(
                i=e.i, j=e.j, kind="loop" if e.is_loop else "odom",
                rvec=rvec, t=e.t_ji))
        artifacts.write_posegraph_edges(out / "posegraph_edges.csv",
                                        edge_rows)
        culled = 0
        if self.cfg.export_geometry in (
                ExportGeometry.POINTCLOUD, ExportGeometry.BOTH):
            X = np.asarray(self._X, np.float64)
            if self.kfs and len(X):
                # cull export noise: a point whose best residual is past
                # the BA gross-outlier gate carried zero weight in every
                # solve (see np_geom.export_keep_mask)
                fx = float(self.K[0, 0])
                keep = np_geom.export_keep_mask(
                    self.K, np.stack([kf.R_cw for kf in self.kfs]),
                    np.stack([kf.center for kf in self.kfs]),
                    np.stack([kf.uv for kf in self.kfs]),
                    np.stack([kf.valid for kf in self.kfs]),
                    self._ring_pid, X,
                    thresh_norm=ba_ops._CUTOFF
                    * self.cfg.ba.huber_delta / fx)
                culled = int((~keep).sum())
                X = X[keep]
            artifacts.write_ply_xyz(
                out / "templeRing_sparse_points.ply", X)
        return {"keyframes": len(self.kfs), "map_points": len(self._X),
                "culled": culled, "edges": len(self.edges),
                "out": str(out)}
