"""Checkpoint / resume for long multi-scene runs (SURVEY §5: the
reference has none — each run restarts from frame 0; we serialize
(poses, map points, track table, edges, RNG key) per keyframe so runs
resume mid-sequence)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def save_checkpoint(system, path: str | Path) -> None:
    """Serialize the full SfMSystem state into one .npz + meta json."""
    import jax.numpy as jnp

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    meta: dict = {
        "n_kfs": len(system.kfs),
        "n_edges": len(system.edges),
        "prev_frame_idx": system.prev_frame_idx,
        "last_kf_frame": system.last_kf_frame,
        "kf_meta": [
            dict(kf_id=k.kf_id, frame_idx=k.frame_idx, img_name=k.img_name)
            for k in system.kfs
        ],
        "edge_meta": [
            dict(i=e.i, j=e.j, inliers=e.inliers, is_loop=e.is_loop,
                 w_rot=e.w_rot, w_trans=e.w_trans, s_rel=e.s_rel)
            for e in system.edges
        ],
        "first_obs_tid": [int(t) for t in system.first_obs],
        "point_tid": list(system.map.point_tid),
    }
    arrays["pose_R"] = system.pose_R
    arrays["pose_t"] = system.pose_t
    arrays["rng_key"] = np.asarray(system._key)
    if system.kfs:
        arrays["kf_R"] = np.stack([k.R_cw for k in system.kfs])
        arrays["kf_t"] = np.stack([k.t_cw for k in system.kfs])
        arrays["kf_ids"] = np.stack([k.ids for k in system.kfs])
        arrays["kf_uv"] = np.stack([k.uv for k in system.kfs])
        arrays["kf_valid"] = np.stack([k.valid for k in system.kfs])
        arrays["kf_desc"] = np.stack(
            [k.desc if k.desc is not None else np.zeros(1024) for k in system.kfs]
        )
        # persist each keyframe's finest pyramid level so loop closure can
        # fire against pre-checkpoint keyframes after resume (pyr + orb are
        # rebuilt on load; without them system.py's gates `old.pyr is None`
        # / `kf.orb is None` silently disabled loops across a resume)
        if all(k.pyr is not None for k in system.kfs):
            arrays["kf_img"] = np.stack(
                [np.clip(np.asarray(k.pyr[0]), 0, 255).astype(np.uint8)
                 for k in system.kfs]
            )
    if system.edges:
        arrays["edge_R"] = np.stack([e.R_ji for e in system.edges])
        arrays["edge_t"] = np.stack([e.t_ji for e in system.edges])
    arrays["points"] = system.map.xyz()
    obs_kf, obs_pid, obs_uv = system.map.obs_arrays()
    arrays["obs_kf"] = obs_kf
    arrays["obs_pid"] = obs_pid
    arrays["obs_uv"] = obs_uv
    if system.first_obs:
        arrays["first_obs_kf"] = np.array(
            [system.first_obs[t][0] for t in system.first_obs], np.int32
        )
        arrays["first_obs_uv"] = np.stack(
            [system.first_obs[t][1] for t in system.first_obs]
        )
    if system.state is not None:
        arrays["trk_pos"] = np.asarray(system.state.pos)
        arrays["trk_valid"] = np.asarray(system.state.valid)
        arrays["trk_ids"] = np.asarray(system.state.ids)
        arrays["trk_next"] = np.asarray(system.state.next_id)
    np.savez_compressed(path.with_suffix(".npz"), **arrays)
    path.with_suffix(".json").write_text(json.dumps(meta))


def load_checkpoint(system, path: str | Path) -> None:
    """Restore state saved by save_checkpoint into ``system`` (which must
    have been constructed with the same K/config). The previous-frame
    image pyramid is NOT stored; feed the last processed frame again (or
    the next frame) after loading."""
    import jax.numpy as jnp

    from sfm_tpu.models import tracker
    from sfm_tpu.models.mapstate import Edge, Keyframe

    path = Path(path)
    z = np.load(path.with_suffix(".npz"))
    meta = json.loads(path.with_suffix(".json").read_text())
    system.pose_R = z["pose_R"]
    system.pose_t = z["pose_t"]
    system._key = jnp.asarray(z["rng_key"])
    system.prev_frame_idx = meta["prev_frame_idx"]
    system.last_kf_frame = meta["last_kf_frame"]
    system.kfs = []
    for k, km in enumerate(meta["kf_meta"]):
        kf = Keyframe(
            kf_id=km["kf_id"], frame_idx=km["frame_idx"],
            img_name=km["img_name"], R_cw=z["kf_R"][k], t_cw=z["kf_t"][k],
            ids=z["kf_ids"][k], uv=z["kf_uv"][k], valid=z["kf_valid"][k],
            desc=z["kf_desc"][k],
        )
        if "kf_img" in z:
            from sfm_tpu.models.system import build_pyramid_u8

            kf.pyr = build_pyramid_u8(
                jnp.asarray(z["kf_img"][k]), system.cfg.klt.pyr_levels
            )
            if system.cfg.loop.enabled and system.cfg.loop.method == "orb":
                from sfm_tpu.ops import orb as orb_ops

                kf.orb = orb_ops.detect_and_describe(
                    kf.pyr[0], max_kp=system.cfg.loop.max_keypoints
                )
        system.kfs.append(kf)
    system.edges = []
    for k, em in enumerate(meta["edge_meta"]):
        system.edges.append(
            Edge(i=em["i"], j=em["j"], R_ji=z["edge_R"][k], t_ji=z["edge_t"][k],
                 inliers=em["inliers"], is_loop=em["is_loop"],
                 w_rot=em["w_rot"], w_trans=em["w_trans"],
                 s_rel=em.get("s_rel", 1.0))
        )
    m = system.map
    pts = np.asarray(z["points"], np.float64).reshape(-1, 3)
    m._n_points = len(pts)
    m._X = pts.copy() if len(pts) else np.zeros((1024, 3))
    tids = np.asarray(meta["point_tid"], np.int64)
    m._point_tid = tids.copy() if len(tids) else np.zeros(1024, np.int64)
    m.tid2pid = {int(t): i for i, t in enumerate(tids)}
    m.rebuild_lookup()
    m._n_obs = len(z["obs_kf"])
    m._obs_kf = np.asarray(z["obs_kf"], np.int32).copy()
    m._obs_pid = np.asarray(z["obs_pid"], np.int32).copy()
    m._obs_uv = np.asarray(z["obs_uv"], np.float64).reshape(-1, 2).copy()
    if m._n_obs == 0:
        m._obs_kf = np.zeros(4096, np.int32)
        m._obs_pid = np.zeros(4096, np.int32)
        m._obs_uv = np.zeros((4096, 2))
    system.first_obs = {}
    if "first_obs_kf" in z:
        for t, kf, uv in zip(meta["first_obs_tid"], z["first_obs_kf"],
                             z["first_obs_uv"]):
            system.first_obs[int(t)] = (int(kf), uv)
    if "trk_pos" in z:
        system.state = tracker.TrackerState(
            pos=jnp.asarray(z["trk_pos"]),
            valid=jnp.asarray(z["trk_valid"]),
            ids=jnp.asarray(z["trk_ids"]),
            next_id=jnp.asarray(z["trk_next"]),
        )


# ---------------------------------------------------------------------------
# Scan-pipeline (device-resident) checkpointing: the whole ScanCarry is a
# pytree of fixed-shape arrays, so serialization is field-by-field exact —
# a resumed run continues bit-identically when saved at a chunk boundary.
# ---------------------------------------------------------------------------


def save_scan_checkpoint(scan, path: str | Path) -> None:
    """Serialize a ScanSfM (models/scan_pipeline.py) mid-run. Flushes the
    pending frame buffer first so the carry is at a chunk boundary."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    scan._flush()
    c = scan.carry
    arrays: dict[str, np.ndarray] = {
        "R_cw": np.asarray(c.R_cw), "t_cw": np.asarray(c.t_cw),
        "slot_pid": np.asarray(c.slot_pid), "fo_kf": np.asarray(c.fo_kf),
        "fo_uv": np.asarray(c.fo_uv), "X": np.asarray(c.X),
        "key": np.asarray(c.key),
    }
    if scan._images:  # keyframe-only image store (frame_idx -> u8 gray)
        kf_frames = sorted(scan._images)
        arrays["images"] = np.stack(
            [scan._images[f] for f in kf_frames]).astype(np.uint8)
        arrays["image_frames"] = np.asarray(kf_frames, np.int64)
    for f in c.trk._fields:
        arrays[f"trk_{f}"] = np.asarray(getattr(c.trk, f))
    for f in c.ring._fields:
        arrays[f"ring_{f}"] = np.asarray(getattr(c.ring, f))
    for i, p in enumerate(c.prev_pyr):
        arrays[f"pyr{i}"] = np.asarray(p)
    meta = {
        "scan": True,
        "levels": len(c.prev_pyr),
        "last_kf_frame": int(c.last_kf_frame),
        "kf_count": int(c.kf_count),
        "n_pts": int(c.n_pts),
        "names": scan._names,
        "metrics": scan.metrics,
        "pg_ran": scan._pg_ran,
        "loop_edges": [
            dict(i=e.i, j=e.j, inliers=e.inliers, is_loop=e.is_loop,
                 w_rot=e.w_rot, w_trans=e.w_trans, s_rel=e.s_rel)
            for e in scan.loop_edges
        ],
    }
    np.savez_compressed(path.with_suffix(".npz"), **arrays)
    path.with_suffix(".json").write_text(json.dumps(meta))
    if scan.loop_edges:
        np.savez_compressed(
            path.with_suffix(".loops.npz"),
            R=np.stack([e.R_ji for e in scan.loop_edges]),
            t=np.stack([e.t_ji for e in scan.loop_edges]),
        )


def _carry_to_arrays(c) -> dict[str, np.ndarray]:
    """Flatten a ScanCarry — single-scene or scene-batched (every leaf
    with a leading S axis) — into named numpy arrays. Scalar carry fields
    (last_kf_frame/kf_count/n_pts) are stored as arrays so the batched
    (S,) case round-trips unchanged."""
    arrays = {
        "R_cw": np.asarray(c.R_cw), "t_cw": np.asarray(c.t_cw),
        "slot_pid": np.asarray(c.slot_pid), "fo_kf": np.asarray(c.fo_kf),
        "fo_uv": np.asarray(c.fo_uv), "X": np.asarray(c.X),
        "key": np.asarray(c.key),
        "last_kf_frame": np.asarray(c.last_kf_frame),
        "kf_count": np.asarray(c.kf_count),
        "n_pts": np.asarray(c.n_pts),
    }
    for f in c.trk._fields:
        arrays[f"trk_{f}"] = np.asarray(getattr(c.trk, f))
    for f in c.ring._fields:
        arrays[f"ring_{f}"] = np.asarray(getattr(c.ring, f))
    for i, p in enumerate(c.prev_pyr):
        arrays[f"pyr{i}"] = np.asarray(p)
    return arrays


def _carry_from_arrays(z, levels: int):
    import jax.numpy as jnp

    from sfm_tpu.models import tracker
    from sfm_tpu.models.scan_pipeline import KeyframeRing, ScanCarry

    trk = tracker.TrackerState(
        **{f: jnp.asarray(z[f"trk_{f}"])
           for f in tracker.TrackerState._fields})
    ring = KeyframeRing(
        **{f: jnp.asarray(z[f"ring_{f}"]) for f in KeyframeRing._fields})
    return ScanCarry(
        trk=trk,
        prev_pyr=tuple(jnp.asarray(z[f"pyr{i}"]) for i in range(levels)),
        R_cw=jnp.asarray(z["R_cw"]), t_cw=jnp.asarray(z["t_cw"]),
        last_kf_frame=jnp.asarray(z["last_kf_frame"]),
        kf_count=jnp.asarray(z["kf_count"]),
        slot_pid=jnp.asarray(z["slot_pid"]), fo_kf=jnp.asarray(z["fo_kf"]),
        fo_uv=jnp.asarray(z["fo_uv"]), ring=ring, X=jnp.asarray(z["X"]),
        n_pts=jnp.asarray(z["n_pts"]), key=jnp.asarray(z["key"]))


def save_multiscene_checkpoint(path: str | Path, carry, views,
                               ys_chunks: list[np.ndarray],
                               next_chunk: int, timers: dict) -> None:
    """Checkpoint a ``run_scenes_scan`` run at a chunk boundary (SURVEY §5
    "checkpointed re-entry for multi-sequence runs"): the scene-batched
    device carry, each scene's host-side loop/pose-graph state, and the
    pulled per-chunk metric rows. ``next_chunk`` indexes the chunk-start
    list; resuming re-enters the chunk loop there, bit-identically."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = _carry_to_arrays(carry)
    if ys_chunks:
        arrays["ys"] = np.concatenate(ys_chunks, axis=1)
    loops_R, loops_t, loop_meta = [], [], []
    for s, v in enumerate(views):
        for e in v.loop_edges:
            loops_R.append(e.R_ji)
            loops_t.append(e.t_ji)
            loop_meta.append(dict(
                scene=s, i=e.i, j=e.j, inliers=e.inliers, is_loop=e.is_loop,
                w_rot=e.w_rot, w_trans=e.w_trans, s_rel=e.s_rel))
    if loops_R:
        arrays["loops_R"] = np.stack(loops_R)
        arrays["loops_t"] = np.stack(loops_t)
    meta = {
        "multiscene": True,
        "n_scenes": len(views),
        "levels": len(carry.prev_pyr),
        "next_chunk": int(next_chunk),
        "timers": {k: float(vv) for k, vv in timers.items()},
        "pg_ran": [bool(v._pg_ran) for v in views],
        "loop_meta": loop_meta,
    }
    np.savez_compressed(path.with_suffix(".npz"), **arrays)
    path.with_suffix(".json").write_text(json.dumps(meta))


def load_multiscene_checkpoint(path: str | Path):
    """Returns (carry, meta, ys (S,C_done,NY) or None, loop_edges_by_scene)
    for ``run_scenes_scan(..., resume_from=path)``."""
    from sfm_tpu.models.mapstate import Edge

    path = Path(path)
    z = np.load(path.with_suffix(".npz"))
    meta = json.loads(path.with_suffix(".json").read_text())
    carry = _carry_from_arrays(z, meta["levels"])
    ys = np.asarray(z["ys"]) if "ys" in z else None
    loops: list[list] = [[] for _ in range(meta["n_scenes"])]
    for k, em in enumerate(meta["loop_meta"]):
        loops[em["scene"]].append(Edge(
            i=em["i"], j=em["j"], R_ji=z["loops_R"][k], t_ji=z["loops_t"][k],
            inliers=em["inliers"], is_loop=em["is_loop"], w_rot=em["w_rot"],
            w_trans=em["w_trans"], s_rel=em["s_rel"]))
    return carry, meta, ys, loops


def load_scan_checkpoint(scan, path: str | Path) -> None:
    """Restore into a freshly constructed ScanSfM with the same config
    and capacities. Continue by calling scan.process for later frames."""
    import jax.numpy as jnp

    from sfm_tpu.models import tracker
    from sfm_tpu.models.mapstate import Edge
    from sfm_tpu.models.scan_pipeline import KeyframeRing, ScanCarry

    path = Path(path)
    z = np.load(path.with_suffix(".npz"))
    meta = json.loads(path.with_suffix(".json").read_text())
    trk = tracker.TrackerState(
        **{f: jnp.asarray(z[f"trk_{f}"]) for f in tracker.TrackerState._fields}
    )
    def _ring_field(f):
        if f"ring_{f}" in z:
            return jnp.asarray(z[f"ring_{f}"])
        # pre-round-3 checkpoints lack the keyframe-image store
        # (loop.device_verify). Rebuild it from the checkpoint's
        # keyframe-image array when the restored config wants it, else
        # the (K,1,1) dummy.
        assert f == "img"
        K_ = z["ring_frame"].shape[0]
        lcfg = scan.cfg.loop
        if not (lcfg.enabled and lcfg.device_verify
                and "images" in z):
            return jnp.zeros((K_, 1, 1), jnp.uint8)
        imgs = np.zeros((K_, *z["images"].shape[1:]), np.uint8)
        frame_to_img = {int(fr): k for k, fr
                        in enumerate(z["image_frames"])}
        for k, fr in enumerate(z["ring_frame"]):
            if int(fr) in frame_to_img:
                imgs[k] = z["images"][frame_to_img[int(fr)]]
        return jnp.asarray(imgs)

    ring = KeyframeRing(
        **{f: _ring_field(f) for f in KeyframeRing._fields}
    )
    pyr = tuple(jnp.asarray(z[f"pyr{i}"]) for i in range(meta["levels"]))
    scan.carry = ScanCarry(
        trk=trk, prev_pyr=pyr,
        R_cw=jnp.asarray(z["R_cw"]), t_cw=jnp.asarray(z["t_cw"]),
        last_kf_frame=jnp.asarray(meta["last_kf_frame"], jnp.int32),
        kf_count=jnp.asarray(meta["kf_count"], jnp.int32),
        slot_pid=jnp.asarray(z["slot_pid"]), fo_kf=jnp.asarray(z["fo_kf"]),
        fo_uv=jnp.asarray(z["fo_uv"]), ring=ring,
        X=jnp.asarray(z["X"]),
        n_pts=jnp.asarray(meta["n_pts"], jnp.int32),
        key=jnp.asarray(z["key"]),
    )
    scan._images = {}
    if "images" in z:
        for f, im in zip(z["image_frames"], z["images"]):
            scan._images[int(f)] = im
    scan._names = list(meta["names"])
    scan.metrics = list(meta["metrics"])
    scan._pg_ran = bool(meta.get("pg_ran", False))
    scan.loop_edges = []
    if meta["loop_edges"]:
        lz = np.load(path.with_suffix(".loops.npz"))
        for k, em in enumerate(meta["loop_edges"]):
            scan.loop_edges.append(Edge(
                i=em["i"], j=em["j"], R_ji=lz["R"][k], t_ji=lz["t"][k],
                inliers=em["inliers"], is_loop=em.get("is_loop", True),
                w_rot=em["w_rot"], w_trans=em["w_trans"],
                s_rel=em.get("s_rel", 1.0)))
