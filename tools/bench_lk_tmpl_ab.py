"""Same-session scan47 A/B of SFM_TPU_LK_FUSED_TMPL (toggle +
jax.clear_caches between arms; persistent compile cache keeps the
recompiles cheap). Interleaved arms to cancel relay load drift."""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("SFM_TPU_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / "out" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np


def main():
    import bench as B

    root = B.ensure_dataset()
    res = {"0": [], "1": []}
    ate = {}
    for cycle in range(4):
        for flag in ("0", "1"):
            os.environ["SFM_TPU_LK_FUSED_TMPL"] = flag
            jax.clear_caches()
            r = B.run_ours(root)  # warm (fills jit cache post-clear)
            r = B.run_ours(root)
            res[flag].append(r["fps"])
            ate[flag] = (r["ate_ratio_extent"], r["keyframes"],
                         r["loop_edges"])
            print(f"cycle{cycle} tmpl={flag}: fps={r['fps']:.2f}",
                  flush=True)
    for flag in ("0", "1"):
        rs = sorted(res[flag])
        print(f"tmpl={flag}: median={rs[len(rs)//2]:.2f} "
              f"runs={[round(x,2) for x in rs]} ate/kf/loop={ate[flag]}",
              flush=True)


if __name__ == "__main__":
    main()
