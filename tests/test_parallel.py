"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.config import KLTConfig
from sfm_tpu.models import tracker
from sfm_tpu.ops import ba as ba_ops, lie
from sfm_tpu.parallel import mesh as mesh_lib, multiscene


def test_mesh_shapes():
    m = mesh_lib.make_mesh(8, hyp_axis=2)
    assert m.shape["scene"] == 4 and m.shape["hyp"] == 2
    m2 = mesh_lib.make_mesh(8)
    assert m2.shape["scene"] == 8


def _toy_scene_batch(rng, S, N=64, noise=1e-4):
    """S copies of a synthetic two-view problem (normalized coords)."""
    import sys as _s
    _s.path.insert(0, "tests")
    from test_epipolar import make_two_view

    xi, xj, Rg, tg = [], [], [], []
    for _ in range(S):
        a, b, R, t, _X = make_two_view(rng, n=N, noise=noise)
        xi.append(a)
        xj.append(b)
        Rg.append(R)
        tg.append(t / np.linalg.norm(t))
    return (jnp.asarray(np.stack(xi)), jnp.asarray(np.stack(xj)),
            np.stack(Rg), np.stack(tg))


def test_batched_two_view(rng):
    S = 4
    xi, xj, Rg, tg = _toy_scene_batch(rng, S)
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    valid = jnp.ones((S, xi.shape[1]), bool)
    rp = multiscene.batched_two_view(keys, xi, xj, valid,
                                     num_hypotheses=128, sampson_thresh=1e-5)
    assert bool(jnp.all(rp.ok))
    for s in range(S):
        dirr = np.rad2deg(np.arccos(np.clip(abs(float(
            jnp.dot(rp.t[s], jnp.asarray(tg[s])))), 0, 1)))
        assert dirr < 3.0, (s, dirr)


def test_find_E_sharded_matches_truth(rng):
    m = mesh_lib.make_mesh(8, hyp_axis=8)
    xi, xj, Rg, tg = _toy_scene_batch(rng, 1, N=128)
    E, cost = multiscene.find_E_sharded(
        jax.random.PRNGKey(3), xi[0], xj[0], jnp.ones(128, bool), m,
        num_hypotheses_total=1024, sampson_thresh=1e-5,
    )
    E_gt = np.asarray(lie.hat(jnp.asarray(tg[0]))) @ Rg[0]
    E_n = np.asarray(E) / np.linalg.norm(np.asarray(E))
    E_g = E_gt / np.linalg.norm(E_gt)
    err = min(np.abs(E_n - E_g).max(), np.abs(E_n + E_g).max())
    assert err < 0.05, err


def test_scene_step_runs_on_mesh(rng):
    """The multi-chip lockstep frame step: 8 scenes over 8 devices."""
    from scipy.ndimage import gaussian_filter, shift

    S, T, H, W = 8, 64, 96, 128
    m = mesh_lib.make_mesh(8)  # scene=8, hyp=1
    kcfg = KLTConfig(max_tracks=T, min_tracks=8, pyr_levels=2, win_radius=3,
                     iters=6)
    step = multiscene.make_scene_step(m, kcfg, num_hypotheses=64, ba_iters=2)

    imgs0, imgs1 = [], []
    pos = []
    for s in range(S):
        img = gaussian_filter(rng.standard_normal((H, W)), 2.0) * 60 + 128
        imgs0.append(img.astype(np.float32))
        imgs1.append(shift(img, (1.0, 2.0), order=3).astype(np.float32))
        pos.append(rng.uniform(10, 80, (T, 2)))
    pyr0 = (jnp.asarray(np.stack(imgs0)),
            jnp.asarray(np.stack([i[::2, ::2] for i in imgs0])))
    pyr1 = (jnp.asarray(np.stack(imgs1)),
            jnp.asarray(np.stack([i[::2, ::2] for i in imgs1])))
    state = tracker.TrackerState(
        pos=jnp.asarray(np.stack(pos), jnp.float32),
        valid=jnp.ones((S, T), bool),
        ids=jnp.tile(jnp.arange(T, dtype=jnp.int32), (S, 1)),
        next_id=jnp.full((S,), T, jnp.int32),
    )
    # tiny BA problems per scene
    P_, M_ = 16, 64
    prob = ba_ops.BAProblem(
        R_wc=jnp.tile(jnp.eye(3), (S, 2, 1, 1)),
        t_wc=jnp.zeros((S, 2, 3)).at[:, 1, 0].set(0.5),
        X=jnp.asarray(rng.standard_normal((S, P_, 3)) * 0.3 + np.array([0, 0, 4.0])),
        cam_idx=jnp.tile(jnp.arange(M_, dtype=jnp.int32) % 2, (S, 1)),
        pid_idx=jnp.tile(jnp.arange(M_, dtype=jnp.int32) % P_, (S, 1)),
        obs=jnp.zeros((S, M_, 2)),
        obs_valid=jnp.ones((S, M_), bool),
        point_valid=jnp.ones((S, P_), bool),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32)
    new_state, rp, ba_out, metrics = step(keys, K, pyr0, pyr1, state, prob)
    assert new_state.pos.shape == (S, T, 2)
    assert int(metrics["tracks_alive"]) > S * T // 4
    # flow recovered ~ (2,1) for surviving tracks in every scene
    flow = np.asarray(new_state.pos - state.pos)
    ok = np.asarray(new_state.valid)
    med = np.median(flow[ok], axis=0)
    np.testing.assert_allclose(med, [2.0, 1.0], atol=0.3)


def test_run_scenes_lockstep(tmp_path_factory, rng):
    """BASELINE config 5: multiple synthetic rings reconstructed in
    lockstep over the scene-sharded mesh; each trajectory must align to
    its GT."""
    import jax.numpy as jnp
    from sfm_tpu.config import RansacConfig
    from sfm_tpu.ops import umeyama
    from sfm_tpu.parallel import batch_runner
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset

    datasets = []
    for s in range(4):
        out = tmp_path_factory.mktemp(f"scene{s}")
        spec = SyntheticRingSpec(n_frames=5, width=320, height=240, fx=760.0,
                                 fy=760.0, arc_deg=20.0, seed=10 + s)
        generate_dataset(out, spec)
        datasets.append(TempleRing.from_dir(out))

    m = mesh_lib.make_mesh(4)
    kcfg = KLTConfig(max_tracks=256, min_tracks=120, pyr_levels=3,
                     win_radius=5, iters=10)
    res = batch_runner.run_scenes(
        datasets, m, kcfg=kcfg,
        rcfg=RansacConfig(num_hypotheses=128, sampson_thresh=2e-5,
                          min_inliers=30),
    )
    C = res["centers"]
    assert C.shape == (4, 5, 3)
    for s, ds in enumerate(datasets):
        gt = np.stack([r.center for r in ds.records])
        ate = umeyama.ate(jnp.asarray(C[s]), jnp.asarray(gt), with_scale=True)
        ext = np.linalg.norm(gt - gt.mean(0), axis=1).max()
        assert float(ate["rmse"]) < 0.2 * ext, (s, float(ate["rmse"]) / ext)
