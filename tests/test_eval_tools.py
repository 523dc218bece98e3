"""Native eval tools (cpp/tools): build, run, and agree with the
in-process JAX implementations (SURVEY §4 artifact-schema contract)."""

import shutil
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.ops import lie, umeyama
from sfm_tpu.utils import artifacts

REPO = Path(__file__).resolve().parents[1]
BUILD = REPO / "cpp" / "build"


@pytest.fixture(scope="module")
def tools():
    if not shutil.which("cmake"):
        pytest.skip("cmake unavailable")
    if not (BUILD / "ate_keyframes").exists():
        subprocess.run(
            ["cmake", "-S", str(REPO / "cpp"), "-B", str(BUILD),
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True,
        )
        subprocess.run(["cmake", "--build", str(BUILD)], check=True,
                       capture_output=True)
    return BUILD


@pytest.fixture(scope="module")
def artifacts_dir(tmp_path_factory, tools):
    """Synthetic GT + fake estimated trajectory in artifact form."""
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("eval")
    n = 8
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    par = [str(n)]
    gt_centers = []
    Rs = []
    for i in range(n):
        w = rng.standard_normal(3) * 0.3
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        C = rng.standard_normal(3)
        t = -R @ C
        Rs.append(R)
        gt_centers.append(C)
        vals = np.concatenate([K.ravel(), R.ravel(), t])
        par.append(f"img{i:04d}.png " + " ".join(f"{x:.17g}" for x in vals))
    (d / "templeR_par.txt").write_text("\n".join(par) + "\n")

    # estimated = GT through a random Sim(3) + small noise
    s = 1.7
    Rg = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3))))
    tg = rng.standard_normal(3)
    est = [s * Rg @ C + tg + rng.standard_normal(3) * 1e-3 for C in gt_centers]
    rows = [
        dict(kf_id=i, frame_idx=i, image=f"img{i:04d}.png",
             x=e[0], y=e[1], z=e[2], lat=0.0, lon=0.0)
        for i, e in enumerate(est)
    ]
    artifacts.write_csv_centers(d / "keyframes.csv", rows)

    # edges: exact GT relative poses
    edges = []
    for i in range(n - 1):
        R_ji = Rs[i + 1] @ Rs[i].T
        # t in the "dir" convention: unit direction
        t_ji = -Rs[i + 1] @ (gt_centers[i + 1] - gt_centers[i])
        edges.append(dict(i=i, j=i + 1, kind="odom",
                          rvec=np.asarray(lie.so3_log(jnp.asarray(R_ji))),
                          t=t_ji / np.linalg.norm(t_ji)))
    artifacts.write_posegraph_edges(d / "edges.csv", edges)
    return d, np.stack(gt_centers), np.stack(est)


def run(tool, *args):
    res = subprocess.run([str(tool), *map(str, args)], capture_output=True,
                         text=True)
    assert res.returncode == 0, res.stderr
    return res.stdout


def parse_val(out, key):
    for line in out.splitlines():
        if key in line:
            sep = "=" if "=" in line.split(key)[-1] else ":"
            return float(line.split(sep)[-1].strip())
    raise KeyError(key)


def test_ate_keyframes_matches_jax(tools, artifacts_dir):
    d, gt, est = artifacts_dir
    out = run(tools / "ate_keyframes", "--par", d / "templeR_par.txt",
              "--keyframes", d / "keyframes.csv", "--start", 0, "--count", 8,
              "--sim3")
    rmse_cpp = parse_val(out, "ATE_RMSE")
    res = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    np.testing.assert_allclose(rmse_cpp, float(res["rmse"]), rtol=1e-4)
    # SE(3) mode differs (scale off)
    out2 = run(tools / "ate_keyframes", "--par", d / "templeR_par.txt",
               "--keyframes", d / "keyframes.csv", "--start", 0, "--count", 8,
               "--se3")
    res2 = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=False)
    np.testing.assert_allclose(parse_val(out2, "ATE_RMSE"),
                               float(res2["rmse"]), rtol=1e-4)


def test_ate_two_frames_near_zero_for_pair(tools, artifacts_dir):
    d, gt, est = artifacts_dir
    out = run(tools / "ate_two_frames", "--par", d / "templeR_par.txt",
              "--keyframes", d / "keyframes.csv", "--i", 0, "--j", 3, "--sim3")
    # Sim(3) alignment of two points is exact up to f64 rounding
    assert parse_val(out, "ATE_RMSE") < 1e-10


def test_gt_keyframe_edge_zero_error_for_exact_edges(tools, artifacts_dir):
    d, gt, est = artifacts_dir
    out = run(tools / "gt_keyframe_edge", "--par", d / "templeR_par.txt",
              "--keyframes", d / "keyframes.csv", "--i", 2, "--j", 3,
              "--edges", d / "edges.csv")
    rot = parse_val(out, "rotation error (deg)")
    tr = parse_val(out, "translation direction error (deg)")
    assert rot < 1e-6
    assert tr < 1e-4


def test_gt_keyframe_edge_emit_csv(tools, artifacts_dir):
    d, gt, est = artifacts_dir
    out = run(tools / "gt_keyframe_edge", "--par", d / "templeR_par.txt",
              "--keyframes", d / "keyframes.csv", "--i", 0, "--j", 1,
              "--emit-csv")
    lines = out.strip().splitlines()
    assert lines[0] == "i,j,kind,rvec_x,rvec_y,rvec_z,t_x,t_y,t_z"
    vals = lines[1].split(",")
    assert vals[0] == "0" and vals[1] == "1"
    float(vals[3])  # parses
