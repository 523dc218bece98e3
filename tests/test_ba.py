"""Bundle adjustment tests: synthetic convergence + e2e structure quality
(SURVEY §4 test plan: 'BA convergence on a synthetic two-view problem')."""

import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.ops import ba, lie, umeyama


pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def make_ba_problem(rng, F=4, P=120, noise=1e-4, perturb_pose=0.02,
                    perturb_pts=0.02, step=0.15):
    """Cameras on an arc looking at a blob of points; GT + perturbed init."""
    X_gt = rng.standard_normal((P, 3)) * np.array([0.4, 0.4, 0.25]) + np.array(
        [0, 0, 4.0]
    )
    R_gt, t_gt = [], []
    for f in range(F):
        ang = step * (f - F / 2)
        w = np.array([0.0, ang, 0.0])
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        C = np.array([4.0 * np.sin(ang), 0.2 * f, 4.0 - 4.0 * np.cos(ang)])
        R_gt.append(R)
        t_gt.append(-R @ C)
    R_gt = np.stack(R_gt)
    t_gt = np.stack(t_gt)

    cam_idx, pid_idx, obs = [], [], []
    for f in range(F):
        Xc = X_gt @ R_gt[f].T + t_gt[f]
        proj = Xc[:, :2] / Xc[:, 2:3]
        for pp in range(P):
            cam_idx.append(f)
            pid_idx.append(pp)
            obs.append(proj[pp] + rng.standard_normal(2) * noise)
    M = len(obs)
    # perturb all but the first (gauge) pose
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for f in range(1, F):
        dw = rng.standard_normal(3) * perturb_pose
        R0.append(np.asarray(lie.so3_exp(jnp.asarray(dw))) @ R_gt[f])
        t0.append(t_gt[f] + rng.standard_normal(3) * perturb_pose)
    X0 = X_gt + rng.standard_normal((P, 3)) * perturb_pts
    prob = ba.BAProblem(
        R_wc=jnp.asarray(np.stack(R0)),
        t_wc=jnp.asarray(np.stack(t0)),
        X=jnp.asarray(X0),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pid_idx=jnp.asarray(pid_idx, jnp.int32),
        obs=jnp.asarray(np.stack(obs)),
        obs_valid=jnp.ones(M, bool),
        point_valid=jnp.ones(P, bool),
    )
    return prob, R_gt, t_gt, X_gt


def test_ba_cost_soa_matches_tensor(rng):
    """ba_cost_soa is the LM accept/reject oracle — it must agree with
    the tensor form on every regime: inliers, Huber tail, gross
    outliers, behind-camera points, invalid observations."""
    prob, *_ = make_ba_problem(rng, noise=1e-3)
    # poison some observations into every branch of the robust cost
    obs = np.asarray(prob.obs).copy()
    obs[5] += 0.5        # gross outlier (past _CUTOFF*delta)
    obs[17] += 0.03      # Huber linear tail
    X = np.asarray(prob.X).copy()
    X[3] = [0.0, 0.0, -5.0]  # behind every camera
    obs_valid = np.asarray(prob.obs_valid).copy()
    obs_valid[40:60] = False
    prob = prob._replace(obs=jnp.asarray(obs), X=jnp.asarray(X),
                         obs_valid=jnp.asarray(obs_valid))
    for delta in (1e-2, 2e-3):
        c_t = float(ba.ba_cost(prob, delta))
        c_s = float(ba.ba_cost_soa(prob, delta))
        assert c_t == pytest.approx(c_s, rel=1e-6)


def test_ba_reduces_cost(rng):
    prob, *_ = make_ba_problem(rng)
    R, t, X, info = ba.bundle_adjust(prob, iters=8, huber_delta=1e-2)
    assert float(info["cost"]) < 0.1 * float(info["cost0"])


def test_ba_recovers_poses(rng):
    prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=0.0)
    R, t, X, info = ba.bundle_adjust(prob, iters=10, huber_delta=1e-2)
    # gauge is fixed by pose 0; with zero noise poses must recover exactly
    for f in range(len(R_gt)):
        dR = np.asarray(R[f]) @ R_gt[f].T
        ang = np.rad2deg(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 0.02, (f, ang)
        assert np.linalg.norm(np.asarray(t[f]) - t_gt[f]) < 2e-3, f
    np.testing.assert_allclose(np.asarray(X), X_gt, atol=5e-3)


def test_ba_handles_outlier_obs(rng):
    prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=1e-4)
    # corrupt 5% of observations hugely
    obs = np.asarray(prob.obs).copy()
    n_bad = len(obs) // 20
    obs[:n_bad] += rng.uniform(0.05, 0.2, (n_bad, 2))
    prob = prob._replace(obs=jnp.asarray(obs))
    R, t, X, info = ba.bundle_adjust(prob, iters=10, huber_delta=3e-3)
    for f in range(len(R_gt)):
        dR = np.asarray(R[f]) @ R_gt[f].T
        ang = np.rad2deg(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 0.2, (f, ang)


def test_ba_respects_masks(rng):
    """Padded invalid observations/points must not move anything."""
    prob, *_ = make_ba_problem(rng, F=3, P=40, noise=1e-4)
    M = prob.obs.shape[0]
    pad_m, pad_p = 64, 16
    prob2 = ba.BAProblem(
        R_wc=prob.R_wc,
        t_wc=prob.t_wc,
        X=jnp.concatenate([prob.X, jnp.full((pad_p, 3), 1e6)]),
        cam_idx=jnp.concatenate([prob.cam_idx, jnp.zeros(pad_m, jnp.int32)]),
        pid_idx=jnp.concatenate(
            [prob.pid_idx, jnp.full(pad_m, 40 + pad_p - 1, jnp.int32)]
        ),
        obs=jnp.concatenate([prob.obs, jnp.full((pad_m, 2), 77.0)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(pad_m, bool)]),
        point_valid=jnp.concatenate([prob.point_valid, jnp.zeros(pad_p, bool)]),
    )
    R1, t1, X1, i1 = ba.bundle_adjust(prob, iters=5, huber_delta=1e-2)
    R2, t2, X2, i2 = ba.bundle_adjust(prob2, iters=5, huber_delta=1e-2)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2)[:40], atol=1e-10)


def test_e2e_with_ba_structure(tmp_path_factory, rng):
    """BASELINE config 2: 8-frame sequence + sliding-window BA. The strict
    structure check deferred from test_system.py."""
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.config import (KLTConfig, KeyframeConfig, RansacConfig,
                                SystemConfig, BAConfig)
    from sfm_tpu.models.system import SfMSystem

    out = tmp_path_factory.mktemp("ring_ba")
    spec = SyntheticRingSpec(n_frames=8, width=480, height=360, fx=1100.0,
                             fy=1100.0, arc_deg=40.0)
    generate_dataset(out, spec)
    ds = TempleRing.from_dir(out)
    cfg = SystemConfig(
        frames=8,
        klt=KLTConfig(max_tracks=512, min_tracks=300, min_distance=8,
                      pyr_levels=3, win_radius=5, iters=10),
        ransac=RansacConfig(num_hypotheses=256, sampson_thresh=2e-5, min_inliers=40),
        keyframe=KeyframeConfig(min_inliers=150, min_gap=1, parallax_px=6.0),
        ba=BAConfig(window=6, iters=5, max_points=512, huber_delta=3.0),
    )
    sys_ = SfMSystem(ds.K, cfg, gt_records=ds.records)
    for i in range(len(ds)):
        sys_.process(i, ds.records[i].img, ds.load_gray(i))

    est = np.stack([kf.center for kf in sys_.kfs])
    gt = np.stack([ds.records[kf.frame_idx].center for kf in sys_.kfs])
    res = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    extent = np.linalg.norm(gt - gt.mean(0), axis=1).max()
    assert float(res["rmse"]) < 0.04 * extent

    s, R, t = umeyama.umeyama(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    X = sys_.map.xyz()
    Xa = float(s) * X @ np.asarray(R).T + np.asarray(t)
    r = np.linalg.norm(Xa[:, :2], axis=1)
    # structure on the synthetic cylinder (r=0.10): the residual spread is
    # dominated by LK appearance drift under object rotation (same physics
    # as the reference's OpenCV LK), so the gate is calibrated to measured
    # front-end quality, with BA required to keep the median unbiased
    frac = np.mean(np.abs(r - 0.10) < 0.03)
    assert frac > 0.55, frac
    assert abs(np.median(r) - 0.10) < 0.015, np.median(r)


def test_global_ba_beyond_64_keyframes(rng):
    """Sequences longer than the old 64-keyframe cap must refine, not
    warn-skip (round-1 defect: system.py returned early past 64 kfs)."""
    from sfm_tpu.config import SystemConfig
    from sfm_tpu.models.mapstate import Keyframe
    from sfm_tpu.models.system import SfMSystem, _gba_caps

    F, P, M = _gba_caps(96, 2000, 40000)
    assert F >= 96 and P >= 2000 and M >= 40000

    prob, R_gt, t_gt, X_gt = make_ba_problem(rng, F=96, P=60,
                                             perturb_pose=0.01, step=0.008)
    K = np.eye(3)
    sys_ = SfMSystem(K, SystemConfig(), gt_records=None)
    R0 = np.asarray(prob.R_wc)
    t0 = np.asarray(prob.t_wc)
    for f in range(96):
        sys_.kfs.append(Keyframe(
            kf_id=f, frame_idx=f, img_name=f"f{f}",
            R_cw=R0[f].T, t_cw=-R0[f].T @ t0[f],
            ids=np.zeros(1, np.int64), uv=np.zeros((1, 2)),
            valid=np.zeros(1, bool),
        ))
    for p in range(60):
        sys_.map.add_point(p, np.asarray(prob.X)[p])
    cam = np.asarray(prob.cam_idx)
    pid = np.asarray(prob.pid_idx)
    obs = np.asarray(prob.obs)
    sys_.map.add_obs_batch(0, pid[cam == 0], obs[cam == 0])
    for f in range(1, 96):
        m = cam == f
        sys_.map.add_obs_batch(f, pid[m], obs[m])
    # K = I so normalize_by_K is the identity: obs are already normalized
    sys_._run_global_ba(iters=8)
    C_est = np.stack([kf.t_cw for kf in sys_.kfs])
    C_gt = np.stack([-R_gt[f].T @ t_gt[f] for f in range(96)])
    # monocular BA with one gauge pose leaves scale free: compare Sim(3)-
    # aligned (same protocol as the ATE tools)
    res = umeyama.ate(jnp.asarray(C_est), jnp.asarray(C_gt), with_scale=True)
    init_rmse = float(np.sqrt(np.mean(np.sum(
        (np.stack([-R0[f].T @ t0[f] for f in range(96)]) - C_gt) ** 2,
        axis=1))))
    assert float(res["rmse"]) < 0.2 * init_rmse, (float(res["rmse"]),
                                                  init_rmse)


def test_window_ba_obs_ranking():
    """When window observations exceed BA_OBS_CAP the best-observed
    points' observations are kept (round-1 took an arbitrary prefix)."""
    import sfm_tpu.models.system as sysmod
    from sfm_tpu.config import SystemConfig
    from sfm_tpu.models.mapstate import Keyframe
    from sfm_tpu.models.system import SfMSystem

    captured = {}
    real = sysmod._ba_packed

    def spy(prob, **kw):
        captured["prob"] = prob
        return real(prob, **kw)

    rng = np.random.default_rng(0)
    K = np.eye(3)
    sys_ = SfMSystem(K, SystemConfig(), gt_records=None)
    F = 6
    for f in range(F):
        sys_.kfs.append(Keyframe(
            kf_id=f, frame_idx=f, img_name=f"f{f}",
            R_cw=np.eye(3), t_cw=np.array([0.1 * f, 0, 0]),
            ids=np.zeros(1, np.int64), uv=np.zeros((1, 2)),
            valid=np.zeros(1, bool),
        ))
    # 500 "long" tracks seen in all 6 kfs + 2000 "short" ones seen twice;
    # 500*6 + 2000*2 = 7000 > BA_OBS_CAP=4096, so ranking must keep the
    # long tracks' observations
    X = rng.standard_normal((2500, 3)) * 0.3 + np.array([0, 0, 4.0])
    for p in range(2500):
        sys_.map.add_point(p, X[p])
    for f in range(F):
        long_p = np.arange(500)
        sys_.map.add_obs_batch(
            f, long_p, X[long_p, :2] / X[long_p, 2:3] + 0.1 * f
        )
    for p in range(500, 2500):
        for f in (0, 1):
            sys_.map.add_obs(f, p, X[p, :2] / X[p, 2:3])
    sysmod._ba_packed = spy
    try:
        sys_._run_local_ba()
    finally:
        sysmod._ba_packed = real
    prob = captured["prob"]
    kept_pids = np.asarray(prob.pid_idx)[np.asarray(prob.obs_valid)]
    # local pids 0..499 are the long tracks (sorted by obs count first);
    # each must keep all 6 observations
    counts = np.bincount(kept_pids, minlength=500)
    assert (counts[:500] == 6).all(), counts[:500].min()


def test_refine_points_structure_only(rng):
    """Frozen-pose point polish: noisy points converge to GT; poses by
    construction untouched (the finalize-stage refinement of the scan
    pipeline)."""
    import jax.numpy as jnp

    from sfm_tpu.ops import ba as ba_ops

    F, P = 4, 64
    M = 4 * P
    Xgt = rng.standard_normal((P, 3)) * 0.4 + np.array([0, 0, 5.0])
    R_wc = np.stack([np.eye(3)] * F)
    t_wc = np.zeros((F, 3))
    t_wc[:, 0] = np.linspace(0, 1.0, F)
    cam = (np.arange(M) % F).astype(np.int32)
    pid = (np.arange(M) // F).astype(np.int32)
    Xc = np.einsum("mij,mj->mi", R_wc[cam], Xgt[pid]) + t_wc[cam]
    obs = Xc[:, :2] / Xc[:, 2:3]
    X0 = Xgt + rng.standard_normal((P, 3)) * 0.05
    prob = ba_ops.BAProblem(
        R_wc=jnp.asarray(R_wc), t_wc=jnp.asarray(t_wc), X=jnp.asarray(X0),
        cam_idx=jnp.asarray(cam), pid_idx=jnp.asarray(pid),
        obs=jnp.asarray(obs), obs_valid=jnp.ones(M, bool),
        point_valid=jnp.ones(P, bool),
    )
    Xn, info = ba_ops.refine_points(prob, iters=8, huber_delta=1e-2)
    err0 = np.linalg.norm(X0 - Xgt, axis=1).mean()
    err1 = np.linalg.norm(np.asarray(Xn) - Xgt, axis=1).mean()
    assert float(info["cost"]) < float(info["cost0"]) * 1e-2
    assert err1 < err0 * 0.05, (err0, err1)

    # an undersized max_obs_per_point silently under-assembles the
    # Hessian; under the opt-in sanitizer flag it must be detected
    # (each point has F=4 observations, so cap=2 drops two per point)
    import jax

    from sfm_tpu.utils import debug as dbg

    dbg.enable_numeric_checks(True)
    try:
        with pytest.raises(Exception, match="exceed"):
            out = ba_ops.refine_points(prob, iters=1, max_obs_per_point=2)
            jax.block_until_ready(out[0])
    finally:
        dbg.enable_numeric_checks(False)
