"""CLI end-to-end + mesh exporter tests (reference L7/P13/C13 parity)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from sfm_tpu.utils import artifacts


def test_cli_synthetic_run(tmp_path):
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({
        "common": {
            "system": {"frames": 6},
            "keyframe": {"min_inliers": 150, "parallax_px": 6.0},
            "klt": {"max_tracks": 512, "min_tracks": 300},
        },
        "tpu": {"ransac": {"num_hypotheses": 256, "sampson_thresh": 2e-5,
                           "min_inliers": 40},
                "ba": {"global_iters": 4}},
    }))
    out = tmp_path / "run"
    from sfm_tpu.cli import main

    rc = main([
        "--synthetic", "6", "--config", str(cfg), "--out", str(out),
        "--export-geometry", "both", "--visuals",
    ])
    assert rc == 0
    assert (out / "keyframes_camera_centers.csv").exists()
    assert (out / "posegraph_edges.csv").exists()
    assert (out / "templeRing_sparse_points.ply").exists()
    assert (out / "sparse_pointcloud.png").exists()
    assert (out / "camera_trajectory.png").exists()
    assert (out / "input_montage.png").exists()
    meshes = list(out.glob("templeRing_mesh_sparse_kf*.ply"))
    assert meshes, "sparse mesh expected"
    rows = artifacts.read_csv_centers(out / "keyframes_camera_centers.csv")
    assert len(rows) >= 3


def test_sparse_mesh_on_synthetic_points(rng):
    from sfm_tpu.models.mapstate import Keyframe
    from sfm_tpu.models.mesh import build_sparse_mesh

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # camera at -z looking at origin: R_cw = I, t_cw = (0,0,-4)
    kf = Keyframe(kf_id=0, frame_idx=0, img_name="x", R_cw=np.eye(3),
                  t_cw=np.array([0, 0, -4.0]), ids=np.zeros(1, np.int32),
                  uv=np.zeros((1, 2)), valid=np.zeros(1, bool))
    pts = rng.uniform(-0.5, 0.5, (500, 3))
    verts, faces = build_sparse_mesh(K, kf, pts, max_points=400, grid_px=8,
                                     max_edge_px=120.0)
    assert len(verts) > 100
    assert len(faces) > 100
    assert faces.max() < len(verts)


def test_stereo_mesh_runs(rng):
    """Stereo block matcher on a synthetic fronto-parallel pair."""
    from sfm_tpu.models.mesh import _disparity_sad
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    H, W = 96, 128
    img = (gaussian_filter(rng.standard_normal((H, W + 32)), 1.5) * 60 + 128)
    d_true = 6
    # standard stereo: right camera at +x -> content shifts left by d,
    # i.e. x_r = x_l - d, disparity d = x_l - x_r > 0
    left = img[:, 16 : W + 16].astype(np.float32)
    right = img[:, 16 + d_true : W + 16 + d_true].astype(np.float32)
    disp, ok = _disparity_sad(jnp.asarray(left), jnp.asarray(right), 16, 3)
    disp = np.asarray(disp)
    ok = np.asarray(ok)
    inner = np.zeros((H, W), bool)
    inner[8:-8, 24:-8] = True
    m = ok & inner
    assert m.mean() > 0.2
    med = np.median(disp[m])
    assert abs(med - d_true) < 0.5, med


def test_stereo_sgm_beats_plain_sad(rng):
    """SGM aggregation must reduce disparity error vs the plain block
    matcher on a weakly-textured slanted scene (the regime SGBM exists
    for, ref py:1168-1182)."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from sfm_tpu.models.mesh import _disparity_sad

    H, W = 96, 128
    # slanted plane: disparity ramps 4..12 across x, with a textureless
    # band where local SAD matching is ambiguous and SGM's smoothness
    # paths must carry the disparity across
    img = (gaussian_filter(rng.standard_normal((H, W + 48)), 2.5) * 25 + 128)
    img[:, 80:110] = 128.0
    left = img[:, 24 : W + 24].astype(np.float32)
    # right pixel x_r samples the scene at x_l = x_r + d_r(x_r)
    d_r = 4.0 + 8.0 * np.arange(W) / W
    src = 24 + np.arange(W) + d_r
    right = np.stack([np.interp(src, np.arange(img.shape[1]), row)
                      for row in img]).astype(np.float32)
    # ground-truth disparity at LEFT pixel x_l (invert the linear ramp)
    xl = np.arange(W, dtype=np.float64)
    xr = (xl - 4.0) / (1.0 + 8.0 / W)
    d_true = xl - xr
    good = {}
    for sgm in (False, True):
        disp, ok = _disparity_sad(jnp.asarray(left), jnp.asarray(right),
                                  16, 3, sgm=sgm)
        disp, ok = np.asarray(disp), np.asarray(ok)
        inner = np.zeros((H, W), bool)
        inner[8:-8, 24:-8] = True
        # coverage-of-correct: confident AND within 1 px of truth
        hit = ok & (np.abs(disp - d_true[None, :]) < 1.0)
        good[sgm] = hit[inner].mean()
    assert good[True] > good[False], good
    assert good[True] > 0.8, good


def test_stereo_mesh_depth_quality(tmp_path):
    """End-to-end dense stereo export on a rendered pair with GT poses:
    mesh vertices must land on the GT cylinder surface (radius 0.10)."""
    from sfm_tpu.config import StereoMeshConfig
    from sfm_tpu.models.mapstate import Keyframe
    from sfm_tpu.models.mesh import export_stereo_grid_mesh
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset

    spec = SyntheticRingSpec(n_frames=2, width=480, height=360,
                             fx=1100.0, fy=1100.0, arc_deg=5.0)
    generate_dataset(tmp_path, spec)
    ds = TempleRing.from_dir(tmp_path)
    kfs = []
    for i, r in enumerate(ds.records):
        R_cw, t_cw = r.pose_cw
        kfs.append(Keyframe(kf_id=i, frame_idx=i, img_name=r.img,
                            R_cw=R_cw, t_cw=t_cw, ids=np.zeros(1, np.int32),
                            uv=np.zeros((1, 2)), valid=np.zeros(1, bool)))
    cfg = StereoMeshConfig(num_disparities=160, step=4, block_size=7)
    verts, faces = export_stereo_grid_mesh(
        ds.K, kfs[0], kfs[1], ds.load_gray(0), ds.load_gray(1), cfg)
    assert len(verts) > 300
    assert len(faces) > 200
    # GT: cylinder of radius 0.10 about the world z-axis, |z| <= 0.10
    rad = np.hypot(verts[:, 0], verts[:, 1])
    med_err = np.median(np.abs(rad - spec.cylinder_radius))
    frac_on = np.mean(np.abs(rad - spec.cylinder_radius) < 0.02)
    assert med_err < 0.02, (med_err, frac_on)
    assert frac_on > 0.5, (med_err, frac_on)
