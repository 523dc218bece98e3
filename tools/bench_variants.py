"""Speed+ATE for candidate bench-config variants (one chip, warm).

The ablation harness (bench_ablate.py) attributes wall-clock but not
accuracy; this runs the full 47-frame pipeline per variant and reports
BOTH, so a speed win that costs trajectory quality is visible before it
ships (the round-3 Pallas incident rule: never trade ATE blind).
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import bench as bench_mod
    import jax.numpy as jnp
    from sfm_tpu.models import scan_pipeline as sp
    from sfm_tpu.ops import umeyama
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
        variant("levels3", **{"klt.pyr_levels": 3}),
        variant("levels3_hyp512", **{"klt.pyr_levels": 3,
                                     "ransac.num_hypotheses": 512}),
    ]
    if len(sys.argv) > 1:  # extra ad-hoc variants: "klt.iters=12,..."
        for spec in sys.argv[1:]:
            over = {}
            for kv in spec.split(","):
                k, v = kv.split("=")
                over[k] = type(getattr(
                    getattr(base, k.split(".")[0]), k.split(".")[1]))(v)
            variants.append(variant(spec, **over))

    for label, cfg in variants:
        best = None
        for rep in range(2):
            s = sp.ScanSfM(ds.K, cfg, n_frames=n, chunk=16)
            t0 = time.perf_counter()
            for i in range(n):
                s.process(i, ds.records[i].img, grays[i])
            s.finalize()
            dt = time.perf_counter() - t0
            best = min(best, dt) if best else dt
        est = np.stack([kf.center for kf in s.kfs])
        gt = np.stack([ds.records[kf.frame_idx].center for kf in s.kfs])
        r = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
        extent = float(np.linalg.norm(gt - gt.mean(0), axis=1).max())
        print(json.dumps({
            "variant": label,
            "fps": round(n / best, 2),
            "ate_ratio_extent": round(float(r["rmse"]) / extent, 5),
            "keyframes": len(s.kfs),
            "loop_edges": sum(1 for e in s.edges if e.is_loop),
            "map_points": int(s.map_xyz.shape[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
