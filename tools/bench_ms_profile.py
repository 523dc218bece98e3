"""Profile the multiscene vs single-scene scan paths on chip.

Prints per-phase timers for run_scenes_scan at S in {1,2,4} and the
single-scene ScanSfM loop, all warm (second run timed). Used to attribute
the multiscene break-even (VERDICT r3 next-steps #1).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SFM_TPU_X64", "0")
ROOT = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(ROOT))

import numpy as np

import bench as B


def main():
    data_root = B.ensure_dataset()
    from sfm_tpu.parallel.multi_scan import run_scenes_scan
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset

    dss = [TempleRing.from_dir(data_root / "templeRing")]
    for s in range(1, 4):
        root = B.BENCH_DIR / f"data_ms{s}" / "templeRing"
        if not (root / "templeR_par.txt").exists():
            spec = SyntheticRingSpec(
                n_frames=B.FRAMES, width=640, height=480, fx=1520.0,
                fy=1520.0, cylinder_radius=0.10, cylinder_zmin=-0.10,
                cylinder_zmax=0.10, ring_radius=0.60, ring_z=0.05,
                arc_deg=360.0, texture_blur=1.5, seed=7 + s,
            )
            generate_dataset(root, spec, name_prefix="templeR")
        dss.append(TempleRing.from_dir(root))
    cfg = B.bench_config(B.FRAMES)
    images = [[d.load_gray(i) for i in range(B.FRAMES)] for d in dss]

    for S in (1, 2, 4):
        kw = dict(frames=B.FRAMES, chunk=16, images=images[:S])
        run_scenes_scan(dss[:S], cfg, **kw)  # warm
        t0 = time.perf_counter()
        res = run_scenes_scan(dss[:S], cfg, **kw)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "S": S, "wall_s": round(dt, 3),
            "sf_per_s": round(S * B.FRAMES / dt, 3),
            "timers": {k: round(v, 3) for k, v in res["timers"].items()},
            "loop_edges": [len(le) for le in res["loop_edges"]],
        }))

    # single-scene flagship for comparison
    ours = B.run_ours(data_root)
    ours = B.run_ours(data_root)
    print(json.dumps({"single_scene_fps": round(ours["fps"], 3),
                      "wall_s": round(ours["wall_s"], 3)}))


if __name__ == "__main__":
    main()
