"""Umeyama / ATE tests against random Sim(3) transforms (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import lie, umeyama


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def test_umeyama_recovers_random_sim3(rng):
    for _ in range(5):
        src = rng.standard_normal((20, 3))
        w = rng.standard_normal(3)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        s = rng.uniform(0.5, 2.0)
        t = rng.standard_normal(3)
        dst = s * src @ R.T + t
        s2, R2, t2 = umeyama.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
        np.testing.assert_allclose(float(s2), s, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-9)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-9)


def test_umeyama_se3_mode(rng):
    src = rng.standard_normal((15, 3))
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3))))
    t = rng.standard_normal(3)
    dst = src @ R.T + t
    s2, R2, t2 = umeyama.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=False)
    assert float(s2) == 1.0
    res = umeyama.ate(jnp.asarray(src), jnp.asarray(dst), with_scale=False)
    assert float(res["rmse"]) < 1e-10


def test_umeyama_reflection_handling(rng):
    """Degenerate/reflected covariance must still return a proper rotation."""
    src = rng.standard_normal((10, 3))
    dst = src.copy()
    dst[:, 2] *= -1.0  # pure reflection
    _, R, _ = umeyama.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
    assert np.linalg.det(np.asarray(R)) > 0.9


def test_ate_two_points_sim3_is_exact(rng):
    """Sim(3) alignment of 2 points is exact — matches the reference's
    ~1e-11 N=2 numbers (BASELINE.md)."""
    est = rng.standard_normal((2, 3))
    gt = rng.standard_normal((2, 3))
    # align est baseline onto gt baseline: rotation + scale can match exactly
    from sfm_tpu.ops.umeyama import ate

    res = ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
    assert float(res["rmse"]) < 1e-9


def test_edge_errors_zero_for_exact(rng):
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3))))
    t = rng.standard_normal(3)
    rot_err, tr_err = umeyama.edge_errors(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(R), jnp.asarray(t)
    )
    assert float(rot_err) < 1e-6
    assert float(tr_err) < 1e-3
    # translation-direction error ignores sign (min vs ±GT)
    _, tr_err2 = umeyama.edge_errors(
        jnp.asarray(R), jnp.asarray(-t), jnp.asarray(R), jnp.asarray(t)
    )
    assert float(tr_err2) < 1e-3
