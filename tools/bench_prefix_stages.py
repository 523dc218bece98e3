"""Decompose the always-on per-frame prefix (~19 ms/frame in the chunk
ablation, tools/bench_ablate.py) into stage costs on chip.

The ablation showed klt-iters/hypotheses/levels are all small — so the
prefix budget sits in fixed costs: pyramid build, LK patch machinery,
Shi-Tomasi replenish, RANSAC fixed parts, H2D, or scan/dispatch
overhead. This times each stage standalone, warm, with the chained-reps
+ single-fetch pattern the axon relay requires (block_until_ready
returns at dispatch; only a materializing fetch synchronizes).
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import os

os.environ.setdefault("SFM_TPU_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30, fetch=None):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    import bench as B
    from sfm_tpu.models import tracker
    from sfm_tpu.models.scan_pipeline import _build_pyr
    from sfm_tpu.ops import epipolar, features, klt
    from sfm_tpu.utils.dataset import TempleRing

    root = B.ensure_dataset()
    ds = TempleRing.from_dir(root / "templeRing")
    cfg = B.bench_config(B.FRAMES)
    kcfg = cfg.klt
    g0, g1 = ds.load_gray(0), ds.load_gray(1)
    im0, im1 = jnp.asarray(g0), jnp.asarray(g1)
    Kf = jnp.asarray(ds.K, jnp.float32)
    L = kcfg.pyr_levels

    pyr_fn = jax.jit(lambda im: _build_pyr(im, L))
    p0 = jax.block_until_ready(pyr_fn(im0))
    p1 = jax.block_until_ready(pyr_fn(im1))
    print(json.dumps({"stage": "build_pyr(u8->f32 x%d)" % L,
                      "ms": round(timeit(pyr_fn, im0), 3)}), flush=True)

    # realistic track table: bootstrap on frame 0
    st = jax.block_until_ready(tracker.bootstrap(p0[0], kcfg))
    n0 = int(jnp.sum(st.valid))

    lk_fn = jax.jit(lambda a, b, p, v: klt.lk_track_fb(
        a, b, p, v, levels=L, iters=kcfg.iters, radius=kcfg.win_radius,
        fb_thresh=kcfg.fb_thresh))
    print(json.dumps({"stage": "lk_track_fb", "tracks": n0,
                      "ms": round(timeit(lk_fn, p0, p1, st.pos, st.valid),
                                  3)}), flush=True)

    det_fn = jax.jit(lambda img, p, v: features.detect_corners(
        img, p, v, max_new=kcfg.max_tracks,
        cell=max(int(kcfg.min_distance), 2), quality=kcfg.quality,
        block_radius=max(int(kcfg.block_size) // 2, 1)))
    print(json.dumps({"stage": "detect_corners(replenish)",
                      "ms": round(timeit(det_fn, p1[0], st.pos, st.valid),
                                  3)}), flush=True)

    step_fn = jax.jit(lambda a, b, s: tracker.step(a, b, s, kcfg))
    print(json.dumps({"stage": "tracker.step(full)",
                      "ms": round(timeit(step_fn, p0, p1, st), 3)}),
          flush=True)

    new_pos, ok = lk_fn(p0, p1, st.pos, st.valid)
    xi = epipolar.normalize_by_K(Kf, st.pos)
    xj = epipolar.normalize_by_K(Kf, new_pos)
    m = st.valid & ok
    key = jax.random.PRNGKey(0)
    rans_fn = jax.jit(lambda k, a, b, mm: epipolar.find_E_ransac(
        k, a, b, mm, num_hypotheses=cfg.ransac.num_hypotheses,
        sampson_thresh=cfg.ransac.sampson_thresh,
        min_inliers=cfg.ransac.min_inliers))
    print(json.dumps({"stage": "find_E_ransac(%d hyp)"
                      % cfg.ransac.num_hypotheses,
                      "matched": int(jnp.sum(m)),
                      "ms": round(timeit(rans_fn, key, xi, xj, m), 3)}),
          flush=True)

    # whole prefix as one program (the chunk's per-frame always-on part)
    from sfm_tpu.models import scan_pipeline as sp

    carry = jax.block_until_ready(sp.bootstrap_carry(
        cfg, 64, 16384, im0, jnp.zeros((), jnp.int32), key))

    @jax.jit
    def prefix_fn(c, img):
        c2, make_kf, k2, rp, y = sp._track_and_pose_rp(
            cfg, Kf, c, img, jnp.ones((), jnp.int32))
        return c2, make_kf

    print(json.dumps({"stage": "_track_and_pose_rp(one program)",
                      "ms": round(timeit(prefix_fn, carry, im1), 3)}),
          flush=True)

    # H2D: one bench frame uploaded + materialized on device
    def h2d(x):
        return jnp.asarray(x) + 0  # + 0 forces a device op on the upload

    h = jax.jit(h2d)
    arr = np.ascontiguousarray(g1)
    t0 = time.perf_counter()
    reps = 30
    outs = [h(arr) for _ in range(reps)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    print(json.dumps({"stage": "h2d_one_frame",
                      "ms": round(1e3 * (time.perf_counter() - t0) / reps,
                                  3)}), flush=True)

    # chunk program with images PRE-STAGED on device (no H2D in loop):
    # isolates the fused scan's device time from upload + host dispatch
    import dataclasses as _dc

    grays = [ds.load_gray(i) for i in range(B.FRAMES)]
    imgs_dev = jax.block_until_ready(
        jnp.stack([jnp.asarray(g) for g in grays]))

    s = sp.ScanSfM(ds.K, cfg, n_frames=B.FRAMES, chunk=16)
    for i in range(B.FRAMES):
        s.process(i, ds.records[i].img, grays[i])
    s.finalize()  # warm all programs

    def run_once(pre_staged):
        s = sp.ScanSfM(ds.K, cfg, n_frames=B.FRAMES, chunk=16)
        t0 = time.perf_counter()
        for i in range(B.FRAMES):
            img = imgs_dev[i] if pre_staged else grays[i]
            s.process(i, ds.records[i].img, img)
        s.finalize()
        return time.perf_counter() - t0

    run_once(True)
    for tag, pre in (("scan47_prestaged_imgs", True),
                     ("scan47_host_imgs", False)):
        dts = [run_once(pre) for _ in range(3)]
        dt = sorted(dts)[1]
        print(json.dumps({"stage": tag, "wall_s": round(dt, 3),
                          "ms_per_frame": round(1e3 * dt / B.FRAMES, 2),
                          "fps": round(B.FRAMES / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
