"""Oriented binary features: rotation invariance + matching tests."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import orb


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def textured(rng, H=240, W=320):
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.standard_normal((H, W)), 1.5) * 50
    img += gaussian_filter(rng.standard_normal((H, W)), 6.0) * 120
    return (img - img.min()) / (img.max() - img.min()) * 220 + 20


def test_detect_and_describe_shapes(rng):
    img = jnp.asarray(textured(rng), jnp.float32)
    xy, desc, valid = orb.detect_and_describe(img, max_kp=256)
    assert xy.shape == (256, 2)
    assert desc.shape == (256, orb.N_BITS)
    assert int(valid.sum()) > 50
    # bits should be balanced-ish, not constant
    bits = np.asarray(desc)[np.asarray(valid)]
    assert 0.2 < bits.mean() < 0.8


def test_matching_identity(rng):
    img = jnp.asarray(textured(rng), jnp.float32)
    xy, desc, valid = orb.detect_and_describe(img, max_kp=256)
    idx, ok, dist = orb.match_hamming(desc, valid, desc, valid)
    ok = np.asarray(ok)
    idx = np.asarray(idx)
    n_valid = int(np.asarray(valid).sum())
    # self-match: distance 0 to itself; ratio test compares with the 2nd
    # neighbor which should be far
    agree = (idx[np.asarray(valid)] == np.arange(256)[np.asarray(valid)]).mean()
    assert agree > 0.95
    assert np.asarray(dist)[np.asarray(valid)].max() == 0.0


def test_matching_under_rotation(rng):
    """Descriptors must match across a 25-degree in-plane rotation
    (the oriented-BRIEF property the loop closure relies on)."""
    from scipy.ndimage import rotate

    img0 = textured(rng)
    ang = 25.0
    img1 = rotate(img0, ang, reshape=False, order=3, mode="nearest")
    a = orb.detect_and_describe(jnp.asarray(img0, jnp.float32), max_kp=256)
    b = orb.detect_and_describe(jnp.asarray(img1, jnp.float32), max_kp=256)
    idx, ok, dist = orb.match_hamming(a[1], a[2], b[1], b[2])
    ok = np.asarray(ok)
    idx = np.asarray(idx)
    assert ok.sum() > 30, ok.sum()
    # verify geometric consistency of matches against the known rotation
    H, W = img0.shape
    c = np.array([(W - 1) / 2, (H - 1) / 2])
    t = np.deg2rad(ang)
    # scipy.ndimage.rotate(angle>0) maps output coords by rotating the
    # image content; the corresponding source position of an output pixel
    # p is R(t)(p-c)+c with this sign convention
    Rm = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    pa = np.asarray(a[0])[ok]
    pb = np.asarray(b[0])[idx[ok]]
    # predicted source in img0 for keypoints detected in img1
    pred = (pb - c) @ Rm.T + c
    err = np.linalg.norm(pred - pa, axis=1)
    frac_good = (err < 3.0).mean()
    err2 = np.linalg.norm((pb - c) @ Rm + c - pa, axis=1)
    frac_good = max(frac_good, (err2 < 3.0).mean())
    assert frac_good > 0.6, frac_good
