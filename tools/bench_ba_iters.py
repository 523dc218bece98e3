"""On-chip ba.iters ablation for the scan pipeline.

The window BA's LM loop is latency-bound, not resource-bound
(docs/BENCHMARKS.md utilization table: 1% of HBM/VPU peak at the
window's problem size), so its wall cost is ~linear in the sequential
iteration count. This sweeps cfg.ba.iters on the full 47-frame bench
regime and reports fps + ATE + loop edges per setting — the fps slope
attributes the per-iteration cost inside the real pipeline, and the
ATE column prices the accuracy trade.

Usage: python tools/bench_ba_iters.py [iters ...]  (default 2 3 5 7)
"""
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("SFM_TPU_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax


def main():
    import bench as B

    sweep = [int(a) for a in sys.argv[1:]] or [2, 3, 5, 7]
    root = B.ensure_dataset()
    base_config = B.bench_config

    res = {}
    # interleave arms (2 cycles) to cancel relay load drift
    for cycle in range(2):
        for it in sweep:
            def cfgfn(frames, _it=it):
                import dataclasses
                c = base_config(frames)
                return dataclasses.replace(
                    c, ba=dataclasses.replace(c.ba, iters=_it))
            B.bench_config = cfgfn
            jax.clear_caches()
            B.run_ours(root)  # warm
            r = B.run_ours(root)
            res.setdefault(it, []).append(
                (r["fps"], r["ate_ratio_extent"], r["keyframes"],
                 r["loop_edges"]))
            print(f"cycle{cycle} ba.iters={it}: fps={r['fps']:.2f} "
                  f"ate={r['ate_ratio_extent']:.5f} kf={r['keyframes']} "
                  f"loop={r['loop_edges']}", flush=True)
    B.bench_config = base_config
    print("\n| ba.iters | fps (best of 2) | ATE/extent | kf | loop |")
    print("|---|---|---|---|---|")
    for it in sweep:
        rs = res[it]
        best = max(rs)
        print(f"| {it} | {best[0]:.2f} | {best[1]:.5f} | {best[2]} "
              f"| {best[3]} |", flush=True)


if __name__ == "__main__":
    main()
