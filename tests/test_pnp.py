"""PnP pose refinement tests (ops/pnp.py)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import lie, pnp


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def make_pnp(rng, n=200, noise=1e-4, outliers=0):
    X = rng.standard_normal((n, 3)) * np.array([0.4, 0.4, 0.25]) + np.array(
        [0, 0, 4.0]
    )
    w = rng.standard_normal(3) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.standard_normal(3) * 0.3 + np.array([0, 0, 0.2])
    Xc = X @ R.T + t
    obs = Xc[:, :2] / Xc[:, 2:3] + rng.standard_normal((n, 2)) * noise
    if outliers:
        obs[:outliers] += rng.uniform(0.05, 0.2, (outliers, 2))
    return R, t, X, obs


def test_pnp_recovers_pose(rng):
    R, t, X, obs = make_pnp(rng, noise=0.0)
    # perturbed init
    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.03)))
    R0 = dR @ R
    t0 = t + rng.standard_normal(3) * 0.05
    R1, t1, info = pnp.refine_pose(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(obs),
        jnp.ones(len(X), bool), iters=12, huber_delta=1e-2,
    )
    ang = np.rad2deg(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R.T) @ R1))))
    assert ang < 1e-4
    np.testing.assert_allclose(np.asarray(t1), t, atol=1e-6)
    assert int(info["inliers"]) == len(X)


def test_pnp_robust_to_outliers(rng):
    R, t, X, obs = make_pnp(rng, noise=1e-4, outliers=20)
    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.02)))
    R0 = dR @ R
    t0 = t + rng.standard_normal(3) * 0.03
    R1, t1, info = pnp.refine_pose(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(obs),
        jnp.ones(len(X), bool), iters=12, huber_delta=2e-3,
    )
    ang = np.rad2deg(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R.T) @ R1))))
    assert ang < 0.05, ang
    assert np.linalg.norm(np.asarray(t1) - t) < 2e-3


def test_pnp_mask_invariance(rng):
    R, t, X, obs = make_pnp(rng, noise=1e-4)
    pad = 64
    X2 = np.concatenate([X, np.full((pad, 3), 1e5)])
    obs2 = np.concatenate([obs, np.full((pad, 2), 42.0)])
    v2 = np.concatenate([np.ones(len(X), bool), np.zeros(pad, bool)])
    args = dict(iters=8, huber_delta=1e-2)
    R1, t1, _ = pnp.refine_pose(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(X), jnp.asarray(obs),
        jnp.ones(len(X), bool), **args,
    )
    R2, t2, _ = pnp.refine_pose(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(X2), jnp.asarray(obs2),
        jnp.asarray(v2), **args,
    )
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-12)
