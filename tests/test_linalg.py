"""Unit tests for the small-matrix linear algebra kernels
(ops/linalg.py, ops/triangulate._solve33_closed): closed-form answers
on random well-conditioned systems (SURVEY §4 unit-layer strategy)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import linalg, triangulate


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def test_nullvec_inviter_matches_svd(rng):
    # random (N,4,4) DLT-like systems with an exact null direction
    N = 256
    v = rng.standard_normal((N, 4))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # build A with rows orthogonal to v (rank 3)
    B = rng.standard_normal((N, 4, 4))
    A = B - (B @ v[..., None]) * v[:, None, :]
    x = np.asarray(linalg.nullvec_inviter(jnp.asarray(A)))
    # recovered vector is the null direction up to sign
    dots = np.abs(np.sum(x * v, axis=1))
    assert dots.min() > 1.0 - 1e-6, dots.min()


def test_solve33_closed_matches_np(rng):
    N = 512
    Q = rng.standard_normal((N, 3, 3))
    M = Q @ np.swapaxes(Q, -1, -2) + 0.1 * np.eye(3)  # PSD, well-cond
    b = rng.standard_normal((N, 3))
    x = np.asarray(triangulate._solve33_closed(
        jnp.asarray(M), jnp.asarray(b), jnp.zeros(N)))
    ref = np.linalg.solve(M, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-9)


def test_dlt_exact_recovery_padded_rows(rng):
    """Padded identity/zero rows (the finalize retriangulation pads to
    pow2 buckets) must not produce NaNs that could leak via reductions."""
    from sfm_tpu.ops import lie

    N = 64
    X = rng.uniform([-1, -1, 4], [1, 1, 8], (N, 3))
    Rb = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.05)))
    tb = rng.standard_normal(3) * 0.3
    xa = X[:, :2] / X[:, 2:3]
    Xc = X @ Rb.T + tb
    xb = Xc[:, :2] / Xc[:, 2:3]
    P = 128  # pad with identity rotations + zero everything else
    R_a = np.tile(np.eye(3), (P, 1, 1))
    R_b = np.tile(np.eye(3), (P, 1, 1))
    R_b[:N] = Rb
    t_a = np.zeros((P, 3))
    t_b = np.zeros((P, 3))
    t_b[:N] = tb
    oa = np.zeros((P, 2))
    ob = np.zeros((P, 2))
    oa[:N] = xa
    ob[:N] = xb
    X3, za, zb = triangulate.triangulate_dlt(
        jnp.asarray(R_a), jnp.asarray(t_a), jnp.asarray(oa),
        jnp.asarray(R_b), jnp.asarray(t_b), jnp.asarray(ob))
    X3 = np.asarray(X3)
    np.testing.assert_allclose(X3[:N], X, atol=1e-5)
    assert np.isfinite(X3).all()
