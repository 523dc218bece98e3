"""Pallas kernels vs XLA twins on the real chip — the promote-or-delete
measurement (VERDICT round-1 item 5).

Times, at bench scale (640x480 f32 image, 2200 tracks, radius 6,
16 iterations):
  1. Shi-Tomasi corner response map: ops/features.shi_tomasi_score vs
     ops/pallas/shi_tomasi_kernel.shi_tomasi_score_pallas
  2. ops/klt._lk_level (transposed barrel-shift iteration, round 3)
  3. per-track block gather: ops/pallas/block_gather_kernel vs the XLA
     strips path (round-2's full LK-iteration kernel stays deleted —
     per-track dynamic lane-dimension window loads cannot lower to
     Mosaic TC; the round-3 gather kernel sidesteps that with
     tile-aligned loads + lane rotates)

Usage: python tools/bench_pallas.py   (on the TPU host env)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SFM_TPU_X64", "0")
ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    # force a REAL device->host fetch: on the axon relay,
    # block_until_ready returns at dispatch (reads 0.05 ms for a 28 ms
    # stage); only a materializing np.asarray synchronizes
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    from scipy.ndimage import gaussian_filter

    from sfm_tpu.ops import features, klt
    from sfm_tpu.ops.pallas import shi_tomasi_kernel

    rng = np.random.default_rng(0)
    H, W, T, R, IT = 480, 640, 2200, 6, 16
    img0 = (gaussian_filter(rng.standard_normal((H, W)), 1.5) * 60 + 128
            ).astype(np.float32)
    img1 = np.roll(img0, (2, -3), axis=(0, 1))
    img0j, img1j = jnp.asarray(img0), jnp.asarray(img1)
    pts = jnp.asarray(rng.uniform(30, 400, (T, 2)), jnp.float32)
    v0 = jnp.zeros((T, 2), jnp.float32)

    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}",
          flush=True)
    st_xla = timeit(jax.jit(lambda im: features.shi_tomasi_score(im, 2)),
                    img0j)
    print(f"shi_tomasi  XLA    {st_xla:8.3f} ms", flush=True)
    st_pal = timeit(
        jax.jit(lambda im: shi_tomasi_kernel.shi_tomasi_score_pallas(im, 2)),
        img0j)
    print(f"shi_tomasi  Pallas {st_pal:8.3f} ms   speedup "
          f"x{st_xla / st_pal:.2f}", flush=True)

    lk_xla = timeit(
        jax.jit(lambda a, b, p, v: klt._lk_level(a, b, p, v, IT, R, 1e-4)),
        img0j, img1j, pts, v0)
    print(f"lk_level           {lk_xla:8.3f} ms (transposed barrel-shift "
          "iteration; loader per SFM_TPU_PALLAS)", flush=True)

    # per-track block gather: Pallas kernel vs XLA strips path
    from sfm_tpu.ops.pallas import block_gather_kernel

    P = 2 * R + 1
    WIN = P + 2 * klt.MARGIN + 3
    starts = jnp.asarray(
        np.clip(np.floor(np.asarray(pts)) - klt.MARGIN - 1 - R, 0,
                [W - WIN, H - WIN]), jnp.int32)
    blk_pal = timeit(
        lambda i_, s_: block_gather_kernel.load_blocks_pallas(i_, s_, WIN)[0],
        img1j, starts)
    orig = klt._use_pallas
    klt._use_pallas = lambda: False
    blk_xla = timeit(
        jax.jit(lambda i_, p_: klt._load_blocks(i_, p_ - R, P, klt.MARGIN)[0]),
        img1j, pts)
    klt._use_pallas = orig
    print(f"block_gather XLA   {blk_xla:8.3f} ms", flush=True)
    print(f"block_gather Pallas{blk_pal:8.3f} ms   speedup "
          f"x{blk_xla / blk_pal:.2f}  (standalone; end-to-end neutral — "
          "the loader is off the fused tracker's critical path)", flush=True)


if __name__ == "__main__":
    main()
