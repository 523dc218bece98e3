"""Per-stage attribution for the scan chunk program by config ablation.

The chunk program is ONE fused lax.scan — individual stages can't be
timed in place without splitting the program (which changes what XLA
fuses). Instead, time the full 47-frame run under config ablations that
shrink one stage at a time; the delta vs base attributes that stage's
share. Each variant is a separate jit entry (cfg is a static argument),
so one process measures all of them warm.

Run on the real chip: `python tools/bench_ablate.py` (compiles each
variant over the remote tunnel, ~3-6 min each; budget ~40 min).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import numpy as np


def main():
    import bench as bench_mod
    from sfm_tpu.models import scan_pipeline as sp
    from sfm_tpu.utils.dataset import TempleRing

    root = bench_mod.ensure_dataset()
    ds = TempleRing.from_dir(root / "templeRing")
    n = bench_mod.FRAMES
    grays = [ds.load_gray(i) for i in range(n)]
    base = bench_mod.bench_config(n)

    def variant(label, **over):
        cfg = base
        for path, val in over.items():
            group, field = path.split(".")
            cfg = dataclasses.replace(
                cfg, **{group: dataclasses.replace(
                    getattr(cfg, group), **{field: val})})
        return label, cfg

    variants = [
        ("base", base),
        variant("ba_iters1", **{"ba.iters": 1}),
        variant("klt_iters8", **{"klt.iters": 8}),
        variant("hyp256", **{"ransac.num_hypotheses": 256}),
        variant("levels3", **{"klt.pyr_levels": 3}),
        # keyframe branch never fires -> isolates the always-on prefix
        # (pyramid + KLT + two-view RANSAC + policy); the reconstruction
        # is meaningless, only the timing matters
        variant("no_keyframes", **{"keyframe.parallax_px": 1e9,
                                   "keyframe.min_inliers": 0}),
        # in-chunk loop scoring + device LK/PnP verification off
        variant("no_loop", **{"loop.enabled": False}),
    ]

    results = {}
    for label, cfg in variants:
        # warmup run compiles this variant's programs
        for rep in range(2):
            s = sp.ScanSfM(ds.K, cfg, n_frames=n, chunk=16)
            t0 = time.perf_counter()
            for i in range(n):
                s.process(i, ds.records[i].img, grays[i])
            t1 = time.perf_counter()
            s.finalize()
            t2 = time.perf_counter()
        results[label] = {
            "chunks_s": round(t1 - t0, 3),
            "finalize_s": round(t2 - t1, 3),
            "ms_per_frame": round(1e3 * (t1 - t0) / n, 2),
        }
        print(json.dumps({"variant": label, **results[label]}), flush=True)

    base_ms = results["base"]["ms_per_frame"]
    attrib = {k: round(base_ms - v["ms_per_frame"], 2)
              for k, v in results.items() if k != "base"}
    print(json.dumps({"base_ms_per_frame": base_ms,
                      "delta_ms_vs_base": attrib}))


if __name__ == "__main__":
    main()
