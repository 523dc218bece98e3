"""End-to-end pipeline test on the synthetic ring with exact GT
(SURVEY §4: artifact-level contract + ATE tolerance as the integration
test; configs 1-2 of BASELINE.json)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.config import SystemConfig, KLTConfig, RansacConfig, KeyframeConfig
from sfm_tpu.models.system import SfMSystem
from sfm_tpu.ops import lie, umeyama
from sfm_tpu.utils import artifacts


@pytest.fixture(scope="module")
def small_ring(tmp_path_factory):
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset
    from sfm_tpu.utils.dataset import TempleRing

    out = tmp_path_factory.mktemp("ring_e2e")
    spec = SyntheticRingSpec(
        n_frames=8, width=480, height=360, fx=1100.0, fy=1100.0, arc_deg=40.0
    )
    generate_dataset(out, spec)
    return TempleRing.from_dir(out)


def small_cfg():
    return SystemConfig(
        frames=8,
        klt=KLTConfig(max_tracks=512, min_tracks=300, min_distance=8,
                      pyr_levels=3, win_radius=5, iters=10),
        ransac=RansacConfig(num_hypotheses=256, sampson_thresh=2e-5, min_inliers=40),
        keyframe=KeyframeConfig(min_inliers=150, min_gap=1, parallax_px=6.0),
    )


@pytest.fixture(scope="module")
def ran_system(small_ring):
    ds = small_ring
    sys_ = SfMSystem(ds.K, small_cfg(), gt_records=ds.records)
    for i in range(len(ds)):
        sys_.process(i, ds.records[i].img, ds.load_gray(i))
    return sys_


def test_keyframes_and_map(ran_system):
    sys_ = ran_system
    assert len(sys_.kfs) >= 4
    assert sys_.map.num_points > 100
    assert sys_.map.num_obs >= 2 * sys_.map.num_points
    assert len(sys_.edges) == len(sys_.kfs) - 1


def test_trajectory_ate_sim3(ran_system, small_ring):
    """Front-end-only (no BA yet) trajectory must align to GT within a few
    percent of the trajectory extent after Sim(3)."""
    sys_ = ran_system
    est = np.stack([kf.center for kf in sys_.kfs])
    gt = np.stack(
        [small_ring.records[kf.frame_idx].center for kf in sys_.kfs]
    )
    res = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    extent = np.linalg.norm(gt - gt.mean(0), axis=1).max()
    rmse = float(res["rmse"])
    assert rmse < 0.05 * extent, (rmse, extent)


def test_edges_vs_gt(ran_system, small_ring):
    """Relative keyframe edges vs GT (ref edge errors ~4-5°, BASELINE.md)."""
    sys_ = ran_system
    rot_errs, dir_errs = [], []
    for e in sys_.edges:
        ri = small_ring.records[sys_.kfs[e.i].frame_idx]
        rj = small_ring.records[sys_.kfs[e.j].frame_idx]
        R_gt = rj.R @ ri.R.T
        t_gt = rj.t - R_gt @ ri.t
        re, te = umeyama.edge_errors(
            jnp.asarray(e.R_ji), jnp.asarray(e.t_ji),
            jnp.asarray(R_gt), jnp.asarray(t_gt),
        )
        rot_errs.append(float(re))
        dir_errs.append(float(te))
    # reference's own published edge errors on TempleRing are 5.04° rot /
    # 3.94° dir (BASELINE.md) — gate at the same level
    assert np.median(rot_errs) < 2.0, rot_errs
    assert np.median(dir_errs) < 4.0, dir_errs


def test_exports(ran_system, small_ring, tmp_path):
    info = ran_system.export(tmp_path, dataset=small_ring)
    assert info["keyframes"] == len(ran_system.kfs)
    centers = artifacts.read_csv_centers(tmp_path / "keyframes_camera_centers.csv")
    assert len(centers) == len(ran_system.kfs)
    pts = artifacts.read_ply_xyz(tmp_path / "templeRing_sparse_points.ply")
    assert len(pts) == ran_system.map.num_points
    hdr = (tmp_path / "posegraph_edges.csv").read_text().splitlines()[0]
    assert hdr.startswith("i,j,kind,rvec_x")


def test_map_points_near_cylinder(ran_system, small_ring):
    """Triangulated structure must lie on the synthetic cylinder (r=0.10)
    up to the monocular gauge: check after Sim(3) alignment of the
    trajectory, whose scale transfer applies to the map too."""
    sys_ = ran_system
    est = np.stack([kf.center for kf in sys_.kfs])
    gt = np.stack([small_ring.records[kf.frame_idx].center for kf in sys_.kfs])
    s, R, t = umeyama.umeyama(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    X = sys_.map.xyz()
    Xa = float(s) * X @ np.asarray(R).T + np.asarray(t)
    r = np.linalg.norm(Xa[:, :2], axis=1)
    # Front-end only (no BA): accumulated per-edge rotation drift (~0.1-0.6°
    # per edge) limits structure coherence; the strict version of this check
    # lives in test_ba.py where bundle adjustment is enabled.
    frac = np.mean(np.abs(r - 0.10) < 0.03)
    assert frac > 0.2, frac
    assert abs(np.median(r) - 0.10) < 0.05
