"""Native eval tools (cpp/tools): build, run, and agree with the
in-process JAX implementations (SURVEY §4 artifact-schema contract)."""

import os
import shutil
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.ops import lie, umeyama
from sfm_tpu.utils import artifacts

REPO = Path(__file__).resolve().parents[1]
# SFM_EVAL_SANITIZE=1 routes the whole module through ASan+UBSan
# instrumented binaries (SURVEY §5 race/memory detection;
# `make test-eval-asan`) — same tests, error-checked native code.
SANITIZE = os.environ.get("SFM_EVAL_SANITIZE", "") == "1"
BUILD = REPO / "cpp" / ("build-asan" if SANITIZE else "build")


@pytest.fixture(scope="module")
def tools():
    if not shutil.which("cmake"):
        pytest.skip("cmake unavailable")
    subprocess.run(
        ["cmake", "-S", str(REPO / "cpp"), "-B", str(BUILD),
         "-DCMAKE_BUILD_TYPE=Release"]
        + (["-DSFM_EVAL_SANITIZE=ON"] if SANITIZE else []),
        check=True, capture_output=True,
    )
    # always build — incremental no-op when sources are unchanged, and it
    # guarantees header edits (e.g. eval/linalg3.hpp) reach the binaries
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


def _numpy_umeyama_rmse(src, dst, with_scale):
    """Mathematical optimum: textbook Umeyama (1991) via LAPACK SVD in f64.
    The yardstick the binaries are tested against — independent of both the
    C++ `ev::svd3` and the JAX `svd3_jacobi` implementations."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    a, b = dst - mu_d, src - mu_s
    cov = a.T @ b / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.ones(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        d[2] = -1.0
    R = U @ np.diag(d) @ Vt
    var = (b ** 2).sum() / len(src)
    s = float((S * d).sum() / var) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    resid = dst - (s * (R @ src.T).T + t)
    return float(np.sqrt((resid ** 2).sum(1).mean()))


def _write_problem(d, gt, est):
    n = len(gt)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    par = [str(n)]
    for i, C in enumerate(gt):
        R = np.asarray(lie.so3_exp(jnp.asarray([0.1 * i, -0.2, 0.05 * i])))
        t = -R @ C
        vals = np.concatenate([K.ravel(), R.ravel(), t])
        par.append(f"img{i:04d}.png " + " ".join(f"{x:.17g}" for x in vals))
    (d / "par.txt").write_text("\n".join(par) + "\n")
    rows = [
        dict(kf_id=i, frame_idx=i, image=f"img{i:04d}.png",
             x=e[0], y=e[1], z=e[2], lat=0.0, lon=0.0)
        for i, e in enumerate(est)
    ]
    artifacts.write_csv_centers(d / "kf.csv", rows)


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    """Compile the reference's own ate_keyframes (read-only source) so the
    sweep can cross-check against it where it is itself optimal."""
    src = Path("/root/reference/cpp/tools/ate_keyframes.cpp")
    inc = Path("/root/reference/cpp/include")
    if not src.exists() or not shutil.which("g++"):
        pytest.skip("reference source or g++ unavailable")
    out = tmp_path_factory.mktemp("refbin") / "ate_keyframes_ref"
    res = subprocess.run(
        ["g++", "-O2", "-std=c++17", str(src), "-I", str(inc), "-o", str(out)],
        capture_output=True, text=True)
    if res.returncode != 0:
        pytest.skip(f"reference tool failed to compile: {res.stderr[:200]}")
    return out


def test_ate_keyframes_random_sweep(tools, reference_binary, tmp_path):
    """50 random Sim(3)/SE(3) alignment problems: our binary must match the
    LAPACK-SVD Umeyama optimum (regression for the svd3 U-sign bug, where
    u2 = u0 x u1 could be anti-parallel to A v2 and the recovered rotation
    was off by a reflection on ~1/3 of random alignments).

    Also cross-checks the reference binary (the behavioural spec,
    /root/reference/cpp/tools/ate_keyframes.cpp:334-389): where IT attains
    the optimum we must agree with it; where it does not (its svd3 has the
    same missing sign fix) we document the divergence rather than copy the
    bug — our result must never be worse than the reference's."""
    rng = np.random.default_rng(7)
    n = 10
    ref_suboptimal = 0
    for trial in range(50):
        with_scale = trial % 2 == 0
        gt = rng.standard_normal((n, 3)) * 2.0
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.0, np.pi)
        Rg = np.asarray(lie.so3_exp(jnp.asarray(axis * ang)))
        s = rng.uniform(0.3, 3.0) if with_scale else 1.0
        tg = rng.standard_normal(3) * 3.0
        est = (s * (Rg @ gt.T).T + tg) + rng.standard_normal((n, 3)) * 1e-2

        d = tmp_path / f"case{trial:02d}"
        d.mkdir()
        _write_problem(d, gt, est)
        mode = "--sim3" if with_scale else "--se3"
        args = ["--par", d / "par.txt", "--keyframes", d / "kf.csv",
                "--start", 0, "--count", n, mode]
        rmse_ours = parse_val(run(tools / "ate_keyframes", *args), "ATE_RMSE")
        rmse_ref = parse_val(run(reference_binary, *args), "ATE_RMSE")
        opt = _numpy_umeyama_rmse(est, gt, with_scale)

        # (a) we attain the mathematical optimum (%g print precision)
        np.testing.assert_allclose(rmse_ours, opt, rtol=5e-5, atol=1e-9,
                                   err_msg=f"trial {trial} mode={mode}")
        # (b) never worse than the reference binary; agree where it is optimal
        assert rmse_ours <= rmse_ref * (1 + 5e-5) + 1e-9, (
            f"trial {trial}: ours {rmse_ours} worse than reference {rmse_ref}")
        if abs(rmse_ref - opt) <= 5e-5 * opt + 1e-9:
            np.testing.assert_allclose(rmse_ours, rmse_ref, rtol=5e-5,
                                       atol=1e-9)
        else:
            ref_suboptimal += 1
    # The reference's own svd3 lacks the U-sign fix; on a fair random sweep
    # it is measurably suboptimal on a nonzero fraction of cases. If this
    # starts failing because ref_suboptimal == 0, the pinned reference
    # changed — loosen to >= 0 and drop the doc note in PARITY.md.
    assert ref_suboptimal > 0


def test_ate_two_frames_random_pairs(tools, tmp_path):
    """Two-point Sim(3) alignment is exact for any pair orientation — sweep
    random geometries through ate_two_frames (shares ev::umeyama/svd3)."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        gt = rng.standard_normal((6, 3)) * 2.0
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        Rg = np.asarray(lie.so3_exp(jnp.asarray(axis * rng.uniform(0, np.pi))))
        est = 1.4 * (Rg @ gt.T).T + rng.standard_normal(3)
        d = tmp_path / f"pair{trial:02d}"
        d.mkdir()
        _write_problem(d, gt, est)
        out = run(tools / "ate_two_frames", "--par", d / "par.txt",
                  "--keyframes", d / "kf.csv", "--i", 0, "--j", 4, "--sim3")
        assert parse_val(out, "ATE_RMSE") < 1e-9


# --- reference-binary artifact contract (SURVEY §4) ---------------------
# The byte-level integration test the reference itself uses: feed the
# pipeline's ACTUAL exported artifacts to the REFERENCE-BUILT eval tools
# (/root/reference/cpp/tools/ate_keyframes.cpp:120-150 CSV reader;
# gt_keyframe_edge.cpp:217,225 `kind` requirement) and require agreement
# with the in-process JAX metrics.


def _compile_reference_tool(tmp_path_factory, name):
    src = Path(f"/root/reference/cpp/tools/{name}.cpp")
    inc = Path("/root/reference/cpp/include")
    if not src.exists() or not shutil.which("g++"):
        pytest.skip("reference source or g++ unavailable")
    out = tmp_path_factory.mktemp("refbin") / f"{name}_ref"
    res = subprocess.run(
        ["g++", "-O2", "-std=c++20", str(src), "-I", str(inc), "-o", str(out)],
        capture_output=True, text=True)
    if res.returncode != 0:
        pytest.skip(f"reference tool failed to compile: {res.stderr[:200]}")
    return out


@pytest.fixture(scope="module")
def gt_edge_reference_binary(tmp_path_factory):
    return _compile_reference_tool(tmp_path_factory, "gt_keyframe_edge")


@pytest.fixture(scope="module")
def pipeline_artifacts(tmp_path_factory, synthetic_ring):
    """A real end-to-end ScanSfM run exported in artifact form."""
    from sfm_tpu.config import (BAConfig, KLTConfig, KeyframeConfig,
                                LoopConfig, RansacConfig, SystemConfig)
    from sfm_tpu.models.scan_pipeline import ScanSfM

    ds = synthetic_ring
    n = len(ds.records)
    cfg = SystemConfig(
        frames=n,
        klt=KLTConfig(max_tracks=512, min_tracks=300, pyr_levels=4,
                      win_radius=6, iters=16, min_distance=8),
        keyframe=KeyframeConfig(min_inliers=60, min_gap=1, parallax_px=12.0),
        ransac=RansacConfig(num_hypotheses=256, sampson_thresh=2e-5,
                            min_inliers=30),
        ba=BAConfig(window=4, iters=3, max_points=256, global_iters=5),
        loop=LoopConfig(enabled=False),
    )
    s = ScanSfM(ds.K, cfg, n_frames=n, chunk=4, p_cap=4096, p_ba=256)
    for i in range(n):
        s.process(i, ds.records[i].img, ds.load_gray(i))
    s.finalize()
    out = tmp_path_factory.mktemp("pipe_artifacts")
    s.export(out, dataset=ds)
    return ds, s, out


def test_reference_ate_keyframes_on_pipeline_artifacts(
        tools, reference_binary, pipeline_artifacts):
    """The reference's own ate_keyframes, run unmodified on our exported
    keyframes_camera_centers.csv, must agree with the in-process JAX ATE
    (and with our native rewrite of the tool)."""
    ds, s, out_dir = pipeline_artifacts
    par = next(ds.root.glob("*_par.txt"))
    n_kf = len(s.kfs)
    for mode, with_scale in (("--sim3", True), ("--se3", False)):
        args = ["--par", par, "--keyframes",
                out_dir / "keyframes_camera_centers.csv",
                "--start", 0, "--count", n_kf, mode]
        rmse_ref = parse_val(run(reference_binary, *args), "ATE_RMSE")
        rmse_ours = parse_val(run(tools / "ate_keyframes", *args), "ATE_RMSE")
        est = np.stack([kf.center for kf in s.kfs])
        gt = np.stack([ds.records[kf.frame_idx].center for kf in s.kfs])
        res = umeyama.ate(jnp.asarray(est), jnp.asarray(gt),
                          with_scale=with_scale)
        # in-process JAX vs our binary vs the reference binary: one number
        np.testing.assert_allclose(rmse_ours, float(res["rmse"]), rtol=1e-4)
        np.testing.assert_allclose(rmse_ref, rmse_ours, rtol=1e-4)
        # and the run itself is good (sanity that the contract test bites)
        extent = float(np.linalg.norm(gt - gt.mean(0), axis=1).max())
        if with_scale:
            assert rmse_ref / extent < 0.05


def test_reference_gt_keyframe_edge_on_pipeline_artifacts(
        gt_edge_reference_binary, pipeline_artifacts):
    """The reference's gt_keyframe_edge consumes our posegraph_edges.csv
    as-is (the `kind` column contract, gt_keyframe_edge.cpp:217,225) and
    reports small errors for the first odometry edge."""
    ds, s, out_dir = pipeline_artifacts
    par = next(ds.root.glob("*_par.txt"))
    out = run(gt_edge_reference_binary, "--par", par,
              "--keyframes", out_dir / "keyframes_camera_centers.csv",
              "--i", 0, "--j", 1,
              "--edges", out_dir / "posegraph_edges.csv")
    rot = parse_val(out, "rotation error (deg)")
    tr = parse_val(out, "translation direction error (deg)")
    # reference's own published numbers on its sample run are ~5 deg / ~4
    # deg (docs/benchmark_report.md:87-88); hold our first edge to better
    assert 0.0 <= rot < 5.0
    assert 0.0 <= tr < 5.0


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
