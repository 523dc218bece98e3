"""Isolate the tracker's per-level / per-iteration cost on chip.

The chunk ablation (bench_ablate.py) showed pyr_levels 4->3 saving
~11 ms/frame while klt iters 16->8 saved nothing — surprising if the
cost were the iteration loop. This times ``klt.lk_track_fb`` standalone
at bench scale for the (levels, iters) grid to locate the cost.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

sys.setrecursionlimit(10000)


def main():
    from sfm_tpu.models.scan_pipeline import _build_pyr
    from sfm_tpu.ops import klt

    H, W, T, R = 480, 640, 2048, 6
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))
    # smooth shifted copy so LK has real structure to track
    img1 = jnp.roll(img0, (7, 13), (0, 1))
    pos = jnp.asarray(rng.uniform([40, 40], [W - 40, H - 40], (T, 2)),
                      jnp.float32)
    valid = jnp.ones(T, bool)

    for levels in (3, 4):
        p0 = jax.block_until_ready(_build_pyr(img0, levels))
        p1 = jax.block_until_ready(_build_pyr(img1, levels))
        for iters in (8, 16):
            fn = jax.jit(lambda a, b, p, v, L=levels, I=iters:
                         klt.lk_track_fb(a, b, p, v, levels=L, iters=I,
                                         radius=R, fb_thresh=1.0))
            out = fn(p0, p1, pos, valid)
            _ = np.asarray(out[0]).ravel()[:1]  # axon relay: only a
            # materializing fetch synchronizes (block_until_ready
            # returns at dispatch — see tools/bench_pallas.timeit)
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = fn(p0, p1, pos, valid)
            _ = np.asarray(out[0]).ravel()[:1]
            ms = 1e3 * (time.perf_counter() - t0) / reps
            print(json.dumps({"levels": levels, "iters": iters,
                              "ms": round(ms, 3)}), flush=True)

    # pyramid build alone
    for levels in (3, 4):
        fn = jax.jit(lambda im, L=levels: _build_pyr(im, L))
        out = fn(img0)
        _ = np.asarray(out[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(img0)
        _ = np.asarray(out[0]).ravel()[:1]
        ms = 1e3 * (time.perf_counter() - t0) / 50
        print(json.dumps({"build_pyr_levels": levels, "ms": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
