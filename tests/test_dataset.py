"""Dataset parsing + synthetic generator geometry consistency tests."""

import numpy as np

from sfm_tpu.utils import artifacts, dataset
from sfm_tpu.utils.synthetic import SyntheticRingSpec, make_ring_cameras


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def test_par_roundtrip(tmp_path):
    K = np.array([[1520.0, 0, 302.3], [0, 1525.9, 246.9], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0.1, -0.2, 0.3])
    vals = np.concatenate([K.ravel(), R.ravel(), t])
    txt = "2\n" + "\n".join(
        f"img{i:02d}.png " + " ".join(f"{x:.17g}" for x in vals) for i in range(2)
    )
    p = tmp_path / "x_par.txt"
    p.write_text(txt + "\n")
    recs = dataset.read_par(p)
    assert len(recs) == 2
    np.testing.assert_allclose(recs[0].K, K)
    np.testing.assert_allclose(recs[0].center, -R.T @ t)


def test_pgm_roundtrip(tmp_path):
    img = ((np.arange(48).reshape(6, 8) * 5) % 256).astype(np.uint8)
    p = tmp_path / "a.pgm"
    dataset.write_pgm(p, img)
    back = dataset.read_pgm(p)
    np.testing.assert_array_equal(back, img)


def test_synthetic_cameras_look_at_center():
    spec = SyntheticRingSpec(n_frames=8)
    K, Rs, ts, Cs, lons = make_ring_cameras(spec)
    for R, t, C in zip(Rs, ts, Cs):
        np.testing.assert_allclose(-R.T @ t, C, atol=1e-12)
        # optical axis (3rd row of R_wc) points from C toward origin
        z = R[2]
        np.testing.assert_allclose(z, -C / np.linalg.norm(C), atol=1e-12)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.99


def test_synthetic_dataset_renders_and_parses(synthetic_ring):
    ds = synthetic_ring
    assert len(ds) == 12
    img = ds.load_gray(0)
    assert img.shape == (480, 640)
    # object must occupy a good chunk of the frame with texture variance
    assert img.std() > 20
    # GT projection sanity: project the cylinder center-top into frame 0
    rec = ds.records[0]
    X = np.array([0.0, 0.0, 0.05])
    x = rec.K @ (rec.R @ X + rec.t)
    u, v = x[:2] / x[2]
    assert 0 <= u < 480 and 0 <= v < 360


def test_artifact_roundtrip(tmp_path):
    pts = np.random.default_rng(1).standard_normal((17, 3))
    p = tmp_path / "pts.ply"
    artifacts.write_ply_xyz(p, pts)
    back = artifacts.read_ply_xyz(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)

    rows = [
        dict(kf_id=0, frame_idx=0, image="a.png", x=0.0, y=1.0, z=2.0, lat=-82.2, lon=-180.0),
        dict(kf_id=1, frame_idx=2, image="b.png", x=0.5, y=1.5, z=2.5, lat=-82.2, lon=-160.0),
    ]
    c = tmp_path / "centers.csv"
    artifacts.write_csv_centers(c, rows)
    back_rows = artifacts.read_csv_centers(c)
    assert back_rows[1]["image"] == "b.png"
    assert back_rows[1]["x"] == 0.5

    e = tmp_path / "edges.csv"
    artifacts.write_posegraph_edges(
        e, [dict(i=0, j=1, kind="odom", rvec=np.zeros(3), t=np.array([0.0, 0.1, 0.2]))]
    )
    hdr = e.read_text().splitlines()[0]
    assert hdr == "i,j,kind,rvec_x,rvec_y,rvec_z,t_x,t_y,t_z"
