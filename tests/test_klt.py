"""KLT / Shi-Tomasi tests on synthetic translations (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import features, image as im, klt


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def make_textured(rng, H=240, W=320, sigma=2.0):
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.standard_normal((H, W)), sigma) * 60 + 128
    return img.astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel shift via scipy (ground truth warp)."""
    from scipy.ndimage import shift

    return shift(img, (dy, dx), order=3, mode="nearest").astype(np.float32)


def test_box_filter_matches_naive(rng):
    img = rng.standard_normal((20, 24)).astype(np.float32)
    r = 2
    out = np.asarray(im.box_filter(jnp.asarray(img), r))
    # naive box sum with zero padding
    pad = np.pad(img, r)
    ref = np.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            ref += pad[r + dy : r + dy + 20, r + dx : r + dx + 24]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_downsample2():
    img = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(im.downsample2(img))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0, 0], (0 + 1 + 4 + 5) / 4)


def test_bilinear_interpolation():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    pts = jnp.asarray([[1.5, 0.5], [0.0, 0.0], [3.0, 2.0]])
    vals = np.asarray(im.bilinear(img, pts))
    np.testing.assert_allclose(vals, [3.5, 0.0, 11.0], atol=1e-6)


def test_detect_corners_finds_strong_corners(rng):
    img = np.full((120, 160), 50.0, np.float32)
    # plant a few bright blocks: strong corners at their boundaries
    for (y, x) in [(30, 40), (60, 100), (90, 20)]:
        img[y : y + 12, x : x + 12] = 200.0
    xy, score, valid = features.detect_corners(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        max_new=64, cell=8, quality=0.05,
    )
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 8
    # every detection near a planted block corner region
    blocks = np.array([[40, 30], [100, 60], [20, 90]])
    for p in xy:
        d = np.abs(blocks - p[None]).max(axis=1).min()
        assert d < 16, (p, d)


def test_detect_corners_respects_exclusion(rng):
    img = make_textured(rng)
    xy1, _, v1 = features.detect_corners(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool), max_new=128, cell=8
    )
    # excluding all found corners must yield detections elsewhere
    xy2, _, v2 = features.detect_corners(
        jnp.asarray(img), xy1, v1, max_new=128, cell=8
    )
    a = np.asarray(xy1)[np.asarray(v1)]
    b = np.asarray(xy2)[np.asarray(v2)]
    if len(a) and len(b):
        d = np.linalg.norm(a[None, :, :] - b[:, None, :], axis=-1).min()
        assert d >= 8.0


def test_lk_tracks_known_shift(rng):
    img0 = make_textured(rng)
    dx, dy = 3.7, -2.2
    img1 = shift_image(img0, dx, dy)
    pyr0 = tuple(im.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(im.build_pyramid(jnp.asarray(img1), 3))
    xy, _, valid = features.detect_corners(
        jnp.asarray(img0), jnp.zeros((1, 2)), jnp.zeros(1, bool), max_new=64, cell=12
    )
    new_pts, ok = klt.lk_track_fb(pyr0, pyr1, xy, valid, levels=3, iters=10, radius=5)
    ok = np.asarray(ok & valid)
    assert ok.sum() > 20
    flow = np.asarray(new_pts - xy)[ok]
    np.testing.assert_allclose(flow[:, 0].mean(), dx, atol=0.1)
    np.testing.assert_allclose(flow[:, 1].mean(), dy, atol=0.1)
    assert np.abs(flow - [dx, dy]).max() < 0.5


def test_lk_fb_rejects_occluded(rng):
    """Tracks landing on destroyed texture must fail the fb check."""
    img0 = make_textured(rng)
    img1 = shift_image(img0, 2.0, 0.0)
    img1[:, :100] = 128.0  # wipe left strip
    pyr0 = tuple(im.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(im.build_pyramid(jnp.asarray(img1), 3))
    xy, _, valid = features.detect_corners(
        jnp.asarray(img0), jnp.zeros((1, 2)), jnp.zeros(1, bool), max_new=128, cell=10
    )
    _, ok = klt.lk_track_fb(pyr0, pyr1, xy, valid, levels=3, iters=10, radius=5)
    xy_np = np.asarray(xy)
    in_wiped = xy_np[:, 0] < 80
    ok_np = np.asarray(ok)
    # survivors should be concentrated outside the wiped strip
    if in_wiped.sum() > 5:
        assert ok_np[in_wiped].mean() < 0.4
    assert ok_np[~in_wiped & np.asarray(valid)].mean() > 0.6


def test_lk_bf16_matches_f32(rng, monkeypatch):
    """bf16 block storage (ops/klt._lk_dtype, the TPU default) must
    reproduce the f32 path's flows to well below the fb gate: pyramid
    values are box-filtered u8 intensities, exact-or-<=0.5-LSB in bf16,
    and all reductions still accumulate in f32 (_bil_t upcast)."""
    img0 = make_textured(rng)
    img1 = shift_image(img0, 3.7, -2.2)
    pyr0 = tuple(im.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(im.build_pyramid(jnp.asarray(img1), 3))
    xy, _, valid = features.detect_corners(
        jnp.asarray(img0), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        max_new=128, cell=10)

    def run(dt):
        import jax

        # the resolved dtype is memoized module state read at trace time,
        # so patch it directly and drop the stale compile cache
        monkeypatch.setattr(klt, "_LK_DTYPE_RESOLVED", dt)
        jax.clear_caches()
        return klt.lk_track_fb(pyr0, pyr1, xy, valid, levels=3, iters=10,
                               radius=5)

    new32, ok32 = map(np.asarray, run(jnp.float32))
    new16, ok16 = map(np.asarray, run(jnp.bfloat16))
    both = ok32 & ok16
    assert both.sum() > 20
    # near-identical survivor sets and sub-1e-2 px flow agreement
    assert (ok32 ^ ok16).sum() <= max(2, int(0.02 * ok32.sum()))
    d = np.linalg.norm(new32[both] - new16[both], axis=1)
    # converged flows agree to hundredths of a pixel — two orders below
    # the 1.0 px fb gate and the pipeline's keyframe parallax scales
    assert np.median(d) < 0.02 and d.max() < 0.3
