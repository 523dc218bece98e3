"""Absolute utilization for the two hot kernels (VERDICT r4 ask #7).

Reports, for `lk_track_fb` (bench scale: 2200 tracks x 4 levels,
fwd+bwd) and one window-BA LM iteration (6 cams x 1024 pts x 13.2k
obs):
  * measured ms (warm, fetch-synced, median of reps)
  * XLA cost_analysis FLOPs + HBM bytes accessed of the compiled program
  * achieved FLOP/s and bytes/s as a fraction of v5e peaks

v5e peaks used (public numbers, "How to Scale Your Model" / TPU docs):
  MXU bf16: 197e12 FLOP/s   MXU-free VPU f32: ~3.9e12 FLOP/s
  HBM: 819e9 B/s
The honest utilization statement for a bandwidth-bound kernel is the
HBM share; for a VPU-bound kernel the f32-VPU share. Both are printed —
the larger one is the binding resource.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
os.environ.setdefault("SFM_TPU_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_HBM = 819e9
PEAK_MXU_BF16 = 197e12
PEAK_VPU_F32 = 3.9e12


def timed(fn, *args, reps=30):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) / reps)
    return sorted(ts)[len(ts) // 2]


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return {"flops": float(c.get("flops", -1)),
            "bytes": float(c.get("bytes accessed", -1))}


def report(name, ms, ca, extra=None):
    sec = ms / 1e3
    line = {"kernel": name, "ms": round(ms, 3),
            "xla_flops": ca["flops"], "xla_bytes": ca["bytes"],
            "achieved_gflops": round(ca["flops"] / sec / 1e9, 1),
            "achieved_gbps": round(ca["bytes"] / sec / 1e9, 1),
            "hbm_share": round(ca["bytes"] / sec / PEAK_HBM, 4),
            "vpu_f32_share": round(ca["flops"] / sec / PEAK_VPU_F32, 4),
            "mxu_bf16_share": round(ca["flops"] / sec / PEAK_MXU_BF16, 5)}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)


def main():
    import bench as B
    from sfm_tpu.models import tracker
    from sfm_tpu.models.scan_pipeline import _build_pyr
    from sfm_tpu.ops import ba as ba_ops
    from sfm_tpu.ops import klt
    from sfm_tpu.utils.dataset import TempleRing

    root = B.ensure_dataset()
    ds = TempleRing.from_dir(root / "templeRing")
    cfg = B.bench_config(B.FRAMES)
    kcfg = cfg.klt
    L = kcfg.pyr_levels
    im0 = jnp.asarray(ds.load_gray(0))
    im1 = jnp.asarray(ds.load_gray(1))
    pyr_fn = jax.jit(lambda im: _build_pyr(im, L))
    p0 = jax.block_until_ready(pyr_fn(im0))
    p1 = jax.block_until_ready(pyr_fn(im1))
    st = jax.block_until_ready(tracker.bootstrap(p0[0], kcfg))

    lk = lambda a, b, p, v: klt.lk_track_fb(
        a, b, p, v, levels=L, iters=kcfg.iters, radius=kcfg.win_radius,
        fb_thresh=kcfg.fb_thresh)
    lk_j = jax.jit(lk)
    ms = 1e3 * timed(lk_j, p0, p1, st.pos, st.valid)
    report("lk_track_fb", ms, cost(lk, p0, p1, st.pos, st.valid),
           {"fused": klt._use_fused_lk() and klt._use_pallas(),
            "tracks": int(st.pos.shape[0])})

    # one window-BA LM iteration at bench scale (bench_ba_iters problem)
    rng = np.random.default_rng(0)
    F, P, M = 6, 1024, 13200
    X = rng.standard_normal((P, 3)) * 0.3 + np.array([0, 0, 4.0])
    R_wc = np.tile(np.eye(3), (F, 1, 1))
    t_wc = np.zeros((F, 3))
    t_wc[:, 0] = np.linspace(0, 0.5, F)
    cam = (np.arange(M) % F).astype(np.int32)
    pid = (np.arange(M) % P).astype(np.int32)
    Xc = np.einsum("mij,mj->mi", R_wc[cam], X[pid]) + t_wc[cam]
    obs = Xc[:, :2] / Xc[:, 2:3] + rng.standard_normal((M, 2)) * 1e-3
    prob = ba_ops.BAProblem(
        R_wc=jnp.asarray(R_wc, jnp.float32),
        t_wc=jnp.asarray(t_wc, jnp.float32),
        X=jnp.asarray(X, jnp.float32),
        cam_idx=jnp.asarray(cam), pid_idx=jnp.asarray(pid),
        obs=jnp.asarray(obs, jnp.float32),
        obs_valid=jnp.ones(M, bool), point_valid=jnp.ones(P, bool))
    ITERS = 50
    ba = lambda p: ba_ops.bundle_adjust(p, iters=ITERS, lambda0=1e-3,
                                        huber_delta=2e-3, n_fix=1,
                                        update_points=True)
    ba_j = jax.jit(ba)
    ms_all = 1e3 * timed(ba_j, prob, reps=3)
    ca = cost(ba, prob)
    ca_iter = {"flops": ca["flops"] / ITERS, "bytes": ca["bytes"] / ITERS}
    report("window_ba_lm_iter", ms_all / ITERS, ca_iter,
           {"cams": F, "points": P, "obs": M})


if __name__ == "__main__":
    main()
