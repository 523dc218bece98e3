"""Attribute the scan pipeline's finalize budget on chip.

bench_ablate shows ~1.0 s between the last process() return and
finalize() return (≈45% of total wall at 47 frames). This splits that
segment: tail-chunk flush, loop bookkeeping, drain pull, fused
refine stage, host view building — by monkeypatch-timing the stage
entry points on a real run.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import bench as bench_mod
    import jax
    from sfm_tpu.models import scan_pipeline as sp
    from sfm_tpu.utils.dataset import TempleRing

    root = bench_mod.ensure_dataset()
    ds = TempleRing.from_dir(root / "templeRing")
    n = bench_mod.FRAMES
    grays = [ds.load_gray(i) for i in range(n)]
    cfg = bench_mod.bench_config(n)

    tm = {}

    def wrap(obj, name, label):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            tm[label] = tm.get(label, 0.0) + time.perf_counter() - t0
            return out

        setattr(obj, name, timed)
        return orig

    for rep in range(2):  # rep 0 compiles; rep 1 is the measurement
        tm.clear()
        s = sp.ScanSfM(ds.K, cfg, n_frames=n, chunk=32)
        t0 = time.perf_counter()
        for i in range(n):
            s.process(i, ds.records[i].img, grays[i])
        t_proc = time.perf_counter()
        orig_flush = wrap(s, "_flush", "tail_flush")
        orig_drain = wrap(sp, "_drain_stage", "drain_pull")
        orig_ref = wrap(sp, "_finalize_refine_stage", "refine_stage")
        orig_loops = wrap(s, "_check_loops", "check_loops")
        orig_pg = wrap(s, "_pose_graph_pushback", "pose_graph")
        orig_edges = wrap(s, "_drain_edges", "drain_edges")
        s.finalize()
        t_fin = time.perf_counter()
        sp._drain_stage = orig_drain
        sp._finalize_refine_stage = orig_ref
        # stage pulls are async on the relay: only the np.asarray inside
        # each stage's caller synchronizes, so per-stage walls are real
        tm["process_s"] = t_proc - t0
        tm["finalize_s"] = t_fin - t_proc
        tm["finalize_other"] = tm["finalize_s"] - sum(
            v for k, v in tm.items()
            if k in ("tail_flush", "drain_pull", "refine_stage",
                     "check_loops", "pose_graph", "drain_edges"))
    print(json.dumps({k: round(v, 4) for k, v in tm.items()}, indent=1))

    # also: how much of tail_flush is chunk compute vs loop work — a
    # second run with loop disabled at same cadence
    import dataclasses as dc
    cfg2 = dc.replace(cfg, loop=dc.replace(cfg.loop, enabled=False))
    for rep in range(2):
        s = sp.ScanSfM(ds.K, cfg2, n_frames=n, chunk=32)
        t0 = time.perf_counter()
        for i in range(n):
            s.process(i, ds.records[i].img, grays[i])
        t_proc = time.perf_counter()
        s.finalize()
        t_fin = time.perf_counter()
    print(json.dumps({"noloop_process_s": round(t_proc - t0, 4),
                      "noloop_finalize_s": round(t_fin - t_proc, 4)}))


if __name__ == "__main__":
    main()
