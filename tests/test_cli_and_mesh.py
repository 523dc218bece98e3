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
