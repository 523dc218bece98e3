"""Pallas kernels vs their XLA twins (interpret mode on CPU).

The round-1 LK Pallas kernel (per-track sequential grid with windowed
ref loads) was DELETED in round 2: its dynamic lane-dimension ref slices
cannot lower to Mosaic TC on real hardware at all, and the batched XLA
window formulation (ops/klt.py) already runs the level in ~0.02 ms.
The Shi-Tomasi kernel measured 1.3-1.9x faster than its XLA twin on a
v5e chip (tools/bench_pallas.py) and is the TPU-backend default."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import features, image as im, klt
from sfm_tpu.ops.pallas import shi_tomasi_kernel


def make_textured(rng, H=128, W=256):
    from scipy.ndimage import gaussian_filter

    return (gaussian_filter(rng.standard_normal((H, W)), 2.0) * 60 + 128).astype(
        np.float32
    )


def test_shi_tomasi_pallas_matches_xla(rng):
    img = jnp.asarray(make_textured(rng))
    ref = np.asarray(features.shi_tomasi_score(img, block_radius=2))
    out = np.asarray(
        shi_tomasi_kernel.shi_tomasi_score_pallas(img, block_radius=2,
                                                  interpret=True)
    )
    # borders differ (wrap vs zero); compare the interior
    b = 4
    np.testing.assert_allclose(out[b:-b, b:-b], ref[b:-b, b:-b], rtol=1e-4,
                               atol=1e-3)




def test_block_gather_pallas_exact(rng):
    """The per-track block gather (interpret mode) returns exactly the
    requested image windows, row-anchored at the 8-aligned row."""
    from sfm_tpu.ops.pallas.block_gather_kernel import load_blocks_pallas

    for H, W, T, WIN in ((120, 160, 37, 28), (60, 80, 200, 28),
                         (128, 256, 64, 16)):
        img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
        sx = rng.integers(0, W - WIN + 1, T)
        sy = rng.integers(0, H - WIN + 1, T)
        starts = jnp.asarray(np.stack([sx, sy], -1), jnp.int32)
        blocks, anchors = load_blocks_pallas(img, starts, WIN, TB=64,
                                             interpret=True)
        bn, an = np.asarray(blocks), np.asarray(anchors)
        imn = np.asarray(img)
        for t in range(T):
            dy = sy[t] - an[t, 1]
            np.testing.assert_array_equal(
                bn[t, dy:dy + WIN],
                imn[sy[t]:sy[t] + WIN, sx[t]:sx[t] + WIN])


def test_lk_level_pallas_loader_matches_xla(rng, monkeypatch):
    """_lk_level flows must be identical whichever block loader runs:
    the kernel's row-aligned rectangular blocks are absorbed exactly by
    _patch's per-axis anchor arithmetic."""
    import jax

    img0 = jnp.asarray(make_textured(rng, 120, 160))
    img1 = jnp.roll(img0, (2, -3), axis=(0, 1))
    T = 150
    pts = jnp.asarray(rng.uniform(20, [140, 100], (T, 2)), jnp.float32)
    v0 = jnp.zeros((T, 2), jnp.float32)

    def run():
        # fresh trace each time: _use_pallas() is read at TRACE time, so
        # a cached executable would ignore the monkeypatched value
        jax.clear_caches()
        return np.asarray(klt._lk_level(img0, img1, pts, v0, 8, 6, 1e-4))

    monkeypatch.setattr(klt, "_use_pallas", lambda: False)
    v_xla = run()
    monkeypatch.setattr(klt, "_use_pallas", lambda: True)
    v_pal = run()
    np.testing.assert_allclose(v_pal, v_xla, atol=1e-5)


def test_block_gather_pallas_garbage_starts_clamped(rng):
    """Out-of-range starts (as a NaN->int32 cast can produce for dead
    tracks) must be clamped inside the wrapper: the kernel's dynamic
    VMEM reads do not clamp, and an OOB start faults the TPU worker on
    hardware (found by an on-chip probe, round 3). Valid slots must be
    unaffected; garbage slots must return finite in-bounds data."""
    from sfm_tpu.ops.pallas.block_gather_kernel import load_blocks_pallas

    H, W, T, WIN = 120, 160, 64, 28
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    sx = rng.integers(0, W - WIN + 1, T)
    sy = rng.integers(0, H - WIN + 1, T)
    starts = np.stack([sx, sy], -1).astype(np.int64)
    bad = rng.random(T) < 0.5
    starts[bad] = np.array([-2**31, 2**31 - 1000])
    blocks, anchors = load_blocks_pallas(
        img, jnp.asarray(starts, jnp.int32), WIN, TB=32, interpret=True)
    bn, an = np.asarray(blocks), np.asarray(anchors)
    imn = np.asarray(img)
    assert np.isfinite(bn).all()
    assert (an[:, 0] >= 0).all() and (an[:, 0] <= W - WIN).all()
    assert (an[:, 1] >= 0).all() and (an[:, 1] <= H - WIN).all()
    for t in range(T):
        if bad[t]:
            continue
        dy = sy[t] - an[t, 1]
        np.testing.assert_array_equal(
            bn[t, dy:dy + WIN],
            imn[sy[t]:sy[t] + WIN, sx[t]:sx[t] + WIN])


def test_lk_track_pallas_path_bit_identical(rng, monkeypatch):
    """The Pallas block-gather branch of _load_blocks must return
    bit-identical (blocks, anchors) to the XLA strips path, so the LK
    flow is EXACTLY the same on either path. (Round 3: the 8-aligned
    taller pallas blocks shifted the LK sub-window clamp bounds for
    marginal tracks; self-consistent wrong flows passed the fb-gate and
    deterministically tripled the 47-frame bench ATE on chip.)"""
    import jax

    from scipy.ndimage import gaussian_filter

    H, W, T = 120, 160, 257
    img0 = (gaussian_filter(rng.standard_normal((H, W)), 1.5) * 60
            + 128).astype(np.float32)
    dx, dy = 2.3, -1.7
    img1 = np.roll(np.roll(img0, 2, axis=1), -2, axis=0)
    pos = rng.uniform([10, 10], [W - 10, H - 10], (T, 2)).astype(np.float32)
    pyr0 = (jnp.asarray(img0),)
    pyr1 = (jnp.asarray(img1),)
    outs = {}
    # pin the fused iteration kernel OFF: this test certifies the BLOCK
    # LOADER equivalence (bit-identical); the fused kernel's reduction
    # order differs at float rounding and has its own parity test below
    monkeypatch.setenv("SFM_TPU_LK_FUSED", "0")
    for flag in ("0", "1"):
        monkeypatch.setenv("SFM_TPU_PALLAS", flag)
        jax.clear_caches()
        p, ok = klt.lk_track_fb(pyr0, pyr1, jnp.asarray(pos),
                                jnp.ones(T, bool), levels=1, iters=8,
                                radius=6, fb_thresh=1.0)
        outs[flag] = (np.asarray(p), np.asarray(ok))
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])


def test_lk_fused_iter_matches_xla(rng, monkeypatch):
    """The fused Pallas LK-iteration kernel (whole iteration loop with
    VMEM-resident blocks, ops/pallas/lk_iter_kernel) must reproduce the
    XLA barrel-shift path's flows to float rounding: identical clamp
    bounds and shift selections, only the (deterministic) reduction
    order of the 2x2 normal equations differs."""
    import jax

    img0 = jnp.asarray(make_textured(rng, 120, 160))
    img1 = jnp.roll(img0, (2, -3), axis=(0, 1))
    T = 150
    pts = jnp.asarray(rng.uniform(20, [140, 100], (T, 2)), jnp.float32)
    v0 = jnp.zeros((T, 2), jnp.float32)

    def run(fused):
        monkeypatch.setenv("SFM_TPU_PALLAS", "1")
        monkeypatch.setenv("SFM_TPU_LK_FUSED", "1" if fused else "0")
        monkeypatch.setenv("SFM_TPU_LK_FUSED_TMPL", "0")
        jax.clear_caches()
        return np.asarray(klt._lk_level(img0, img1, pts, v0, 8, 6, 1e-4))

    v_xla = run(False)
    v_fused = run(True)
    np.testing.assert_allclose(v_fused, v_xla, atol=1e-4)
    # converged tracks (the vast majority on a pure-shift image) agree
    # far tighter than the fb-gate/keyframe scales that consume them
    med = np.median(np.abs(v_fused - v_xla))
    assert med < 1e-5, med


def test_block_gather_pair_exact(rng):
    """The pair gather (one per-track loop, two images) returns exactly
    the per-image windows the single gather returns."""
    from sfm_tpu.ops.pallas.block_gather_kernel import (
        load_blocks_pair_pallas, load_blocks_pallas)

    H, W, T, WIN0, WIN1 = 120, 160, 57, 14, 28
    img0 = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    img1 = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    s0 = jnp.asarray(np.stack([rng.integers(0, W - WIN0 + 1, T),
                               rng.integers(0, H - WIN0 + 1, T)], -1),
                     jnp.int32)
    s1 = jnp.asarray(np.stack([rng.integers(0, W - WIN1 + 1, T),
                               rng.integers(0, H - WIN1 + 1, T)], -1),
                     jnp.int32)
    b0, a0, b1, a1 = load_blocks_pair_pallas(img0, s0, WIN0, img1, s1,
                                             WIN1, TB=32, interpret=True)
    r0, ra0 = load_blocks_pallas(img0, s0, WIN0, TB=32, interpret=True)
    r1, ra1 = load_blocks_pallas(img1, s1, WIN1, TB=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(ra0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(ra1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(r0))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(r1))


def test_lk_fused_tmpl_matches_xla(rng, monkeypatch):
    """The fully fused path (pair gather + in-kernel template
    extraction, lk_iter_tmpl_pallas) must reproduce the XLA path's
    flows exactly like the tmpl-outside fused path does: identical
    anchor/clamp semantics, f32 template values bit-equal (upcast and
    shifts commute), only reduction order differs."""
    import jax

    img0 = jnp.asarray(make_textured(rng, 120, 160))
    img1 = jnp.roll(img0, (2, -3), axis=(0, 1))
    T = 150
    pts = jnp.asarray(rng.uniform(20, [140, 100], (T, 2)), jnp.float32)
    # nonzero incoming flow: the template/search origins must diverge
    v0 = jnp.asarray(rng.uniform(-2, 2, (T, 2)), jnp.float32)

    def run(pallas, tmpl):
        monkeypatch.setenv("SFM_TPU_PALLAS", "1" if pallas else "0")
        monkeypatch.setenv("SFM_TPU_LK_FUSED", "1" if pallas else "0")
        monkeypatch.setenv("SFM_TPU_LK_FUSED_TMPL", tmpl)
        jax.clear_caches()
        return np.asarray(klt._lk_level(img0, img1, pts, v0, 8, 6, 1e-4))

    v_xla = run(False, "0")
    v_tmpl = run(True, "1")
    np.testing.assert_allclose(v_tmpl, v_xla, atol=1e-4)
    med = np.median(np.abs(v_tmpl - v_xla))
    assert med < 1e-5, med
    # and against the tmpl-outside fused flavor (same kernel loop; the
    # bilinear template evaluation order differs at float rounding, so
    # a couple of marginal tracks drift ~1e-6 per iteration)
    v_fused = run(True, "0")
    np.testing.assert_allclose(v_tmpl, v_fused, atol=1e-4)
    assert np.median(np.abs(v_tmpl - v_fused)) < 1e-5


def test_lk_fused_iter_garbage_positions(rng, monkeypatch):
    """Dead/lost slots carry NaN positions; the fused kernel must stay
    in-bounds (ladder rolls wrap) and return finite flows for the valid
    slots while garbage slots are free to return garbage — exactly the
    XLA path's contract."""
    import jax

    img0 = jnp.asarray(make_textured(rng, 120, 160))
    img1 = jnp.roll(img0, (1, -2), axis=(0, 1))
    T = 64
    pos = rng.uniform([20, 20], [140, 100], (T, 2)).astype(np.float32)
    bad = rng.random(T) < 0.4
    pos[bad] = np.nan
    monkeypatch.setenv("SFM_TPU_PALLAS", "1")
    monkeypatch.setenv("SFM_TPU_LK_FUSED", "1")
    for tmpl in ("0", "1"):  # both fused flavors must honor the contract
        monkeypatch.setenv("SFM_TPU_LK_FUSED_TMPL", tmpl)
        jax.clear_caches()
        v = np.asarray(klt._lk_level(jnp.asarray(img0), jnp.asarray(img1),
                                     jnp.asarray(pos),
                                     jnp.zeros((T, 2), jnp.float32),
                                     8, 6, 1e-4))
        assert np.isfinite(v[~bad]).all()


def test_pallas_kernels_x64_clean():
    """Under jax_enable_x64 (the package default) the Pallas kernel
    jaxprs and BlockSpec index maps must stay 64-bit-free: a stray i64
    (a Python-int `//` divisor, `where` literal, fori_loop bound, or
    index-map `0`) either makes Mosaic's convert-element-type helper
    recurse forever at compile time (RecursionError) or fails MLIR
    legalization ("func.return (i32, i64)") on real hardware — CPU
    interpret-mode tests never see it. Trace-level check, CPU-safe."""
    import jax

    from sfm_tpu.ops.pallas.block_gather_kernel import load_blocks_pallas

    assert jax.config.jax_enable_x64  # the package default enables it

    def pallas_eqns(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                yield eqn
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    yield from pallas_eqns(v.jaxpr)

    from jax._src.core import Literal

    def assert_no_64bit(jaxpr, where):
        # Literal operands (e.g. the constant `1` in a `ref[c, 1]` read)
        # fold statically in Mosaic and are safe at any width; the
        # compile-time failures come from 64-bit VARIABLES — including
        # inner-jit closure binders that a literal i64 argument creates.
        for eqn in jaxpr.eqns:
            for v in (*eqn.invars, *eqn.outvars):
                if isinstance(v, Literal):
                    continue
                dt = getattr(getattr(v, "aval", None), "dtype", None)
                if dt is not None:
                    assert jnp.dtype(dt).itemsize <= 4, (
                        f"64-bit {dt} in {where}: {eqn}")
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    inner = p.jaxpr
                    inner = getattr(inner, "jaxpr", inner)
                    assert_no_64bit(inner, where)

    from sfm_tpu.ops.pallas.lk_iter_kernel import lk_iter_pallas

    traces = []
    img = jnp.zeros((64, 256), jnp.float32)
    starts = jnp.zeros((512, 2), jnp.int32)
    traces.append(jax.make_jaxpr(
        lambda i, s: load_blocks_pallas(i, s, 13))(img, starts))
    traces.append(jax.make_jaxpr(
        lambda i: shi_tomasi_kernel.shi_tomasi_score_pallas(
            i, block_radius=2))(img))
    T, P, WIN, slack = 200, 13, 28, 8
    traces.append(jax.make_jaxpr(
        lambda b, d, t, ba, v: lk_iter_pallas(
            b, d, t, ba, v, P=P, slack=slack, iters=4, min_det=1e-4))(
        jnp.zeros((T, WIN + slack, WIN), jnp.float32),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((P, P, T), jnp.float32),
        jnp.zeros((T, 2), jnp.float32),
        jnp.zeros((T, 2), jnp.float32)))

    from sfm_tpu.ops.pallas.block_gather_kernel import (
        load_blocks_pair_pallas)
    from sfm_tpu.ops.pallas.lk_iter_kernel import lk_iter_tmpl_pallas

    traces.append(jax.make_jaxpr(
        lambda i0, s0, i1, s1: load_blocks_pair_pallas(
            i0, s0, 13, i1, s1, 28))(
        img, starts, img, starts))
    WIN0 = P + 3
    traces.append(jax.make_jaxpr(
        lambda b, d, t, d0, f0, ba, v: lk_iter_tmpl_pallas(
            b, d, t, d0, f0, ba, v, P=P, slack=slack, slack0=slack,
            iters=4, min_det=1e-4))(
        jnp.zeros((T, WIN + slack, WIN), jnp.float32),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, WIN0 + slack, WIN0), jnp.float32),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 2), jnp.float32),
        jnp.zeros((T, 2), jnp.float32),
        jnp.zeros((T, 2), jnp.float32)))

    found = 0
    for jx in traces:
        for eqn in pallas_eqns(jx.jaxpr):
            found += 1
            inner = eqn.params["jaxpr"]
            inner = getattr(inner, "jaxpr", inner)
            assert_no_64bit(inner, "kernel body")
            for bm in eqn.params["grid_mapping"].block_mappings:
                imj = bm.index_map_jaxpr.jaxpr
                assert_no_64bit(imj, "index map")
                if not imj.invars:
                    # pallas-synthesized constant map for a whole-array
                    # BlockSpec: folds before MLIR, width is harmless
                    # (and not ours to control)
                    continue
                for v in imj.outvars:
                    dt = getattr(getattr(v, "aval", None), "dtype", None)
                    if dt is not None:
                        assert jnp.dtype(dt).itemsize <= 4, (
                            f"64-bit index-map output: {imj}")
    assert found == 5
