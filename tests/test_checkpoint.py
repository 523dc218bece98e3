"""Checkpoint/resume: a run interrupted mid-sequence and resumed must
match an uninterrupted run's artifacts (SURVEY §5)."""

import numpy as np

from sfm_tpu.utils import checkpoint


def make_system(ds):
    from sfm_tpu.config import (KLTConfig, KeyframeConfig, RansacConfig,
                                SystemConfig, BAConfig)
    from sfm_tpu.models.system import SfMSystem

    cfg = SystemConfig(
        frames=12,
        klt=KLTConfig(max_tracks=512, min_tracks=300, min_distance=8,
                      pyr_levels=3, win_radius=5, iters=10),
        ransac=RansacConfig(num_hypotheses=256, sampson_thresh=2e-5,
                            min_inliers=40),
        keyframe=KeyframeConfig(min_inliers=150, min_gap=1, parallax_px=6.0),
        ba=BAConfig(window=6, iters=5, max_points=512, global_iters=0),
    )
    return SfMSystem(ds.K, cfg, gt_records=ds.records)


def test_checkpoint_roundtrip(synthetic_ring, tmp_path):
    ds = synthetic_ring
    # full run
    s_full = make_system(ds)
    for i in range(8):
        s_full.process(i, ds.records[i].img, ds.load_gray(i))

    # interrupted at frame 5, checkpoint, resume in a fresh system
    s_a = make_system(ds)
    for i in range(5):
        s_a.process(i, ds.records[i].img, ds.load_gray(i))
    ck = tmp_path / "ck"
    checkpoint.save_checkpoint(s_a, ck)

    s_b = make_system(ds)
    checkpoint.load_checkpoint(s_b, ck)
    assert len(s_b.kfs) == len(s_a.kfs)
    assert s_b.map.num_points == s_a.map.num_points
    np.testing.assert_allclose(s_b.pose_R, s_a.pose_R)
    # resume: re-feed the last processed frame to rebuild the pyramid,
    # then continue (the tracker state is restored, so re-feeding frame 4
    # then processing 5.. matches the continuous run's inputs)
    s_b.prev_pyr = None
    from sfm_tpu.models.system import build_pyramid_u8
    import jax.numpy as jnp

    s_b.prev_pyr = build_pyramid_u8(jnp.asarray(ds.load_gray(4)),
                                    s_b.cfg.klt.pyr_levels)
    for i in range(5, 8):
        s_b.process(i, ds.records[i].img, ds.load_gray(i))

    # resumed run must agree with the continuous one
    assert len(s_b.kfs) == len(s_full.kfs)
    assert abs(s_b.map.num_points - s_full.map.num_points) < 30
    C_full = np.stack([k.t_cw for k in s_full.kfs])
    C_res = np.stack([k.t_cw for k in s_b.kfs])
    np.testing.assert_allclose(C_res, C_full, atol=5e-3)


def test_resume_spans_loop_closure(tmp_path):
    """A loop closure whose candidate keyframe predates the checkpoint
    must still fire after resume (requires pyr restoration: system.py
    gates the LK verify on ``old.pyr is None``)."""
    import dataclasses

    from sfm_tpu.config import LoopConfig, PoseGraphConfig
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset

    lons = tuple(list(np.arange(0, 60, 5.0)) + list(np.arange(55, -1, -5.0)))
    dsdir = tmp_path / "ring"
    generate_dataset(dsdir, SyntheticRingSpec(
        n_frames=len(lons), width=480, height=360, fx=1100.0, fy=1100.0,
        path_lons_deg=lons,
    ))
    ds = TempleRing.from_dir(dsdir)

    def loop_system():
        s = make_system(ds)
        s.cfg = dataclasses.replace(
            s.cfg,
            loop=LoopConfig(enabled=True, min_kf_gap=8, score_thresh=0.94,
                            min_tracked=120, ransac_iters=1024,
                            ransac_thresh=2e-5, min_inliers=80),
            pose_graph=PoseGraphConfig(mode="se3", iters=10),
        )
        return s

    # run out (no revisit yet), checkpoint at frame 12
    s_a = loop_system()
    for i in range(12):
        s_a.process(i, ds.records[i].img, ds.load_gray(i))
    assert not any(e.is_loop for e in s_a.edges)
    ck = tmp_path / "ck_loop"
    checkpoint.save_checkpoint(s_a, ck)

    # resume in a fresh system and come back to the start
    s_b = loop_system()
    checkpoint.load_checkpoint(s_b, ck)
    assert all(k.pyr is not None for k in s_b.kfs), "pyr must be restored"
    from sfm_tpu.models.system import build_pyramid_u8
    import jax.numpy as jnp

    s_b.prev_pyr = build_pyramid_u8(jnp.asarray(ds.load_gray(11)),
                                    s_b.cfg.klt.pyr_levels)
    for i in range(12, len(ds)):
        s_b.process(i, ds.records[i].img, ds.load_gray(i))
    loops = [e for e in s_b.edges if e.is_loop]
    assert loops, "loop closure must fire against pre-checkpoint keyframes"
    assert any(s_b.kfs[e.i].frame_idx < 12 for e in loops)


def test_scan_checkpoint_roundtrip(synthetic_ring, tmp_path):
    """Scan-pipeline resume: saved at a chunk boundary, a resumed run
    must reproduce the uninterrupted run's keyframes exactly."""
    import sys as _s
    _s.path.insert(0, "tests")
    from test_scan_pipeline import _small_cfg

    from sfm_tpu.models.scan_pipeline import ScanSfM
    from sfm_tpu.utils.checkpoint import (load_scan_checkpoint,
                                          save_scan_checkpoint)

    ds = synthetic_ring
    n = len(ds.records)
    cfg = _small_cfg()
    kw = dict(n_frames=n, chunk=3, p_cap=4096, p_ba=256)

    ref = ScanSfM(ds.K, cfg, **kw)
    for i in range(n):
        ref.process(i, ds.records[i].img, ds.load_gray(i))
    ref.finalize()

    half = 7  # bootstrap + 6 = two full chunks of 3
    a = ScanSfM(ds.K, cfg, **kw)
    for i in range(half):
        a.process(i, ds.records[i].img, ds.load_gray(i))
    save_scan_checkpoint(a, tmp_path / "ck")

    b = ScanSfM(ds.K, cfg, **kw)
    load_scan_checkpoint(b, tmp_path / "ck")
    for i in range(half, n):
        b.process(i, ds.records[i].img, ds.load_gray(i))
    b.finalize()

    assert len(b.kfs) == len(ref.kfs)
    est_b = np.stack([kf.center for kf in b.kfs])
    est_r = np.stack([kf.center for kf in ref.kfs])
    np.testing.assert_allclose(est_b, est_r, atol=1e-4)
